"""Local replica of the driver's correctness gate: run each queries() entry
and its oracle_sql() side-by-side at a given sf, compare row-count, schema
(column names), and order-insensitive value equality.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

import ray


def to_pandas(obj):
    if hasattr(obj, "to_pandas"):
        try:
            return obj.to_pandas()
        except TypeError:
            return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    ncpu = int(os.environ.get("CHECK_CPUS", "8"))
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    names = sys.argv[2:] or list(qs)

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # Loud guard for the static range() caps baked into the oracle SQL:
    # a fixture doc exceeding a cap would silently truncate grams and turn
    # an oracle-parity failure into a hidden divergence (ADVICE r2).
    from wikipedia_wikidata_ray.ops.textstats import TOKEN_PATTERN
    from wikipedia_wikidata_ray.pipelines.corpusops import (
        ORACLE_CHARS_CAP, ORACLE_TOKENS_CAP)
    from wikipedia_wikidata_ray.pipelines.webtext import (
        ORACLE_TOKENS_CAP as DECON_TOKENS_CAP)

    max_chars, max_toks = con.execute(
        "SELECT COALESCE(MAX(length(text)), 0), "
        f"COALESCE(MAX(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))), 0) "
        "FROM documents"
    ).fetchone()
    assert max_chars <= ORACLE_CHARS_CAP, (
        f"fixture max doc length {max_chars} exceeds ORACLE_CHARS_CAP "
        f"{ORACLE_CHARS_CAP}: oracle SQL would silently truncate grams")
    assert max_toks <= min(ORACLE_TOKENS_CAP, DECON_TOKENS_CAP - 1), (
        f"fixture max tokens/doc {max_toks} exceeds an oracle range() cap "
        f"({ORACLE_TOKENS_CAP}/{DECON_TOKENS_CAP}): raise the caps")

    failures = 0
    for name in names:
        # a crashing query is recorded as CRASH and the gate continues —
        # a one-off Ray transient must not silently truncate the board
        # (observed once: run died mid-gate leaving 17 of 68 lines)
        try:
            res = to_pandas(qs[name](sf_dir))
        except Exception as e:
            failures += 1
            print(f"{name}: CRASH {type(e).__name__}: {str(e)[:300]}", flush=True)
            continue
        if name not in oracles:
            print(f"{name}: rows={len(res)} (no oracle — rows-only)", flush=True)
            continue
        want = con.execute(oracles[name]).fetchdf()
        a, b = canon(res), canon(want)
        ok_cols = list(a.columns) == list(b.columns)
        ok_rows = len(a) == len(b)
        ok_vals = False
        if ok_cols and ok_rows:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                              check_exact=True)
                ok_vals = True
            except AssertionError as err:
                msg = str(err).splitlines()[0]
        if ok_cols and ok_rows and ok_vals:
            print(f"{name}: OK rows={len(a)}", flush=True)
        else:
            failures += 1
            print(f"{name}: FAIL cols_match={ok_cols} rows {len(a)} vs {len(b)}")
            if not ok_cols:
                print("   ray:", list(a.columns), "\n   sql:", list(b.columns))
            elif ok_rows and not ok_vals:
                print("   ", msg)
                diff = (a != b) & ~(a.isna() & b.isna())
                bad = diff.any(axis=1)
                print(a[bad].head(3))
                print(b[bad].head(3))
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
