"""Property-based tests (hypothesis): parser round-trips and aggregation
equivalence on randomized inputs — beyond the fixed goldens."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from wikipedia_wikidata_ray.sources.mysqldump import parse_dump_text

# field values a MySQL dump can carry (no NUL; NULL handled separately)
field = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=30,
)


def render_insert(rows: list[list[str | None]]) -> str:
    """Render rows the way mysqldump does: quoted strings with backslash
    escapes, bare NULL for nulls."""

    def f(v):
        if v is None:
            return "NULL"
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"

    tuples = ",".join("(" + ",".join(f(v) for v in row) + ")" for row in rows)
    return f"INSERT INTO `t` VALUES {tuples};"


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.lists(st.one_of(st.none(), field), min_size=1, max_size=5),
        min_size=1,
        max_size=5,
    )
)
def test_dump_parser_roundtrip(rows):
    # rows in one statement must share arity (real dumps do)
    arity = len(rows[0])
    rows = [r[:arity] + [""] * (arity - len(r)) for r in rows]
    parsed = parse_dump_text([render_insert(rows)])
    # reference semantics: None → '', and a literal 'NULL' string → ''
    want = [
        ["" if (v is None or v == "NULL") else v for v in row] for row in rows
    ]
    assert parsed == want


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.sampled_from(["a", "b", "c", None])),
        min_size=1,
        max_size=300,
    ),
    st.integers(1, 7),
)
def test_merge_group_sums_matches_pandas(pairs, nblocks):
    """Distributed sort-merge == pandas groupby, any block layout,
    including null keys."""
    import ray.data as rd

    from wikipedia_wikidata_ray.stages.salted import (
        _partial_count_batch,
        merge_group_sums,
    )

    df = pd.DataFrame(pairs, columns=["k", "s"])
    schema = pa.schema([("k", pa.int64()), ("s", pa.string())])
    tables = [
        pa.Table.from_pandas(part, preserve_index=False, schema=schema)
        for part in np.array_split(df, nblocks)
        if len(part)
    ]
    ds = rd.from_arrow(tables)
    partial = ds.map_batches(_partial_count_batch(["k", "s"], "n"), batch_format="pyarrow")
    got = (
        merge_group_sums(partial, ["k", "s"], ["n"], num_merge_blocks=2)
        .to_pandas()
        .sort_values(["k", "s"], ignore_index=True, na_position="last")
    )
    want = (
        df.groupby(["k", "s"], dropna=False)
        .size()
        .rename("n")
        .reset_index()
        .sort_values(["k", "s"], ignore_index=True, na_position="last")
    )
    want["s"] = want["s"].where(pd.notna(want["s"]), None)
    got["s"] = got["s"].where(pd.notna(got["s"]), None)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(  # left events: (key, ts-seconds)
        st.tuples(st.integers(0, 4), st.integers(0, 10_000)),
        min_size=1, max_size=60,
    ),
    st.lists(  # right events
        st.tuples(st.integers(0, 4), st.integers(0, 10_000)),
        min_size=0, max_size=60,
    ),
)
def test_asof_join_matches_pandas_merge_asof(left_rows, right_rows):
    import ray.data as rd

    from wikipedia_wikidata_ray.ops.asof import asof_join

    # unique (key, ts) per side → tie-break-free comparison vs merge_asof
    left_rows = sorted(set(left_rows))
    right_rows = sorted(set(right_rows))
    lt = pa.table(
        {
            "k": pa.array([r[0] for r in left_rows], type=pa.int64()),
            "ts": pa.array(
                np.array([r[1] for r in left_rows], dtype="datetime64[s]").astype(
                    "datetime64[us]"
                )
            ),
            "lid": pa.array(range(len(left_rows)), type=pa.int64()),
        }
    )
    rtbl = pa.table(
        {
            "k": pa.array([r[0] for r in right_rows], type=pa.int64()),
            "ts": pa.array(
                np.array([r[1] for r in right_rows], dtype="datetime64[s]").astype(
                    "datetime64[us]"
                )
            ),
            "rid": pa.array(range(len(right_rows)), type=pa.int64()),
        }
    )
    got = (
        asof_join(
            rd.from_arrow(lt),
            rd.from_arrow(rtbl) if len(rtbl) else rd.from_arrow(rtbl.schema.empty_table()),
            key="k", ts="ts", tie_col="rid", right_value_cols=["rid"],
        )
        .to_pandas()
        .sort_values("lid", ignore_index=True)
    )
    ldf = lt.to_pandas().sort_values("ts", kind="stable", ignore_index=True)
    rdf = rtbl.to_pandas().sort_values("ts", kind="stable", ignore_index=True)
    if len(rdf):
        want = pd.merge_asof(
            ldf, rdf, on="ts", by="k", direction="backward", suffixes=("", "_r")
        ).sort_values("lid", ignore_index=True)
        want_rid = want["rid"]
    else:
        want = ldf.sort_values("lid", ignore_index=True)
        want_rid = pd.Series([None] * len(want), dtype="float64")
    assert got["asof_rid"].astype("float64").equals(want_rid.astype("float64"))


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 5_000), st.integers(0, 100)),
        min_size=1, max_size=80,
    ),
    st.integers(1, 30),
)
def test_sessionize_matches_pandas(rows, gap_min):
    import ray.data as rd

    from wikipedia_wikidata_ray.ops.windows import sessionize

    rows = sorted(set((k, t) for k, t, _ in rows))
    vals = {kt: float(i % 17) for i, kt in enumerate(rows)}
    t = pa.table(
        {
            "user_id": pa.array([k for k, _ in rows], type=pa.int64()),
            "ts": pa.array(
                np.array([s for _, s in rows], dtype="datetime64[s]").astype(
                    "datetime64[us]"
                )
            ),
            "value": pa.array([vals[kt] for kt in rows]),
        }
    )
    got = (
        sessionize(rd.from_arrow(t), gap_minutes=gap_min)
        .to_pandas()
        .sort_values(["user_id", "session_no"], ignore_index=True)
    )
    df = t.to_pandas().sort_values(["user_id", "ts"], ignore_index=True)
    gap = pd.Timedelta(minutes=gap_min)
    new = (df["ts"] - df.groupby("user_id")["ts"].shift()).gt(gap) | (
        df.groupby("user_id")["ts"].shift().isna()
    )
    df["session_no"] = new.groupby(df["user_id"]).cumsum()
    want = (
        df.groupby(["user_id", "session_no"])
        .agg(
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("ts", "size"),
            sum_value=("value", "sum"),
        )
        .reset_index()
        .sort_values(["user_id", "session_no"], ignore_index=True)
    )
    want["sum_value"] = want["sum_value"].round(6)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(  # left (error) events: (key, ts-seconds)
        st.tuples(st.integers(0, 3), st.integers(0, 3_000)),
        min_size=1, max_size=50,
    ),
    st.lists(  # right (click) events
        st.tuples(st.integers(0, 3), st.integers(0, 3_000)),
        min_size=0, max_size=60,
    ),
    st.integers(30, 900),  # window seconds
)
def test_preceding_window_count_matches_bruteforce(left_rows, right_rows, win_s):
    import ray.data as rd

    from wikipedia_wikidata_ray.ops.rangejoin import preceding_window_count

    def tbl(rows, idc):
        return pa.table(
            {
                "k": pa.array([r[0] for r in rows], type=pa.int64()),
                "ts": pa.array(
                    np.array([r[1] for r in rows], dtype="datetime64[s]").astype(
                        "datetime64[us]"
                    )
                ),
                idc: pa.array(range(len(rows)), type=pa.int64()),
            }
        )

    lt, rt = tbl(left_rows, "lid"), tbl(right_rows, "rid")
    got = (
        preceding_window_count(
            rd.from_arrow(lt), rd.from_arrow(rt), key="k", ts="ts",
            window_us=win_s * 1_000_000, out="n",
        )
        .to_pandas()
        .sort_values("lid", ignore_index=True)
    )
    w = np.timedelta64(win_s * 1_000_000, "us")
    want = []
    for lk, lts in left_rows:
        lts64 = np.datetime64(lts, "s").astype("datetime64[us]")
        want.append(
            sum(
                1
                for rk, rts in right_rows
                if rk == lk
                and (rts64 := np.datetime64(rts, "s").astype("datetime64[us]"))
                <= lts64
                and rts64 > lts64 - w
            )
        )
    assert got["n"].tolist() == want
    assert len(got) == len(left_rows)
