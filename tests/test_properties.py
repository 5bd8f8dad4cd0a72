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
