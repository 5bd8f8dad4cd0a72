"""Byte-exact golden tests for the per-record wiki filters (SURVEY.md §5
item (a)): the reference's own fixtures (/root/reference/tests/*) are run
through our vectorized Arrow implementations and compared byte-for-byte
with the reference's expected outputs (runner analog: tests/run.sh:15-24).

Plus unit tests for the MySQL-dump tokenizer (sources/mysqldump.py), whose
semantics mirror bin/mysqldump_to_csv.py:15-115.
"""

from __future__ import annotations

import csv
import io
import os

import pyarrow as pa
import pytest

from wikipedia_wikidata_ray.config import DEFAULT_CONFIG
from wikipedia_wikidata_ray.functions.textio import csv_minimal_quote, shortest_float_repr
from wikipedia_wikidata_ray.functions.wikifilters import (
    filter_geo_tags,
    filter_ips,
    filter_langlinks_lines,
    filter_page,
    filter_redirect,
    filter_wikidata_page,
)
from wikipedia_wikidata_ray.sources.mysqldump import parse_dump_text, rows_to_table

REF_TESTS = "/root/reference/tests"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_TESTS), reason="reference fixtures not present"
)


def _read(name: str) -> str:
    with open(os.path.join(REF_TESTS, name), encoding="utf-8") as f:
        return f.read()


def _csv_rows(text: str) -> list[list[str]]:
    return list(csv.reader(io.StringIO(text)))


def _positional(rows: list[list[str]], n: int) -> pa.Table:
    return rows_to_table([r + [""] * (n - len(r)) for r in rows], n)


# ---------------------------------------------------------------------------
# MySQL-dump tokenizer (A3)


def test_dump_parser_basics():
    line = "INSERT INTO `page` VALUES (1,0,'Title','x'),(2,1,'O''?','y');\n"
    # note: mysql escapes quotes as \' in real dumps; '' is not used there —
    # craft the realistic form:
    line = "INSERT INTO `page` VALUES (1,0,'Title','x'),(2,1,'O\\'Brien, Jr. (actor)','y');\n"
    rows = parse_dump_text([line])
    assert rows == [["1", "0", "Title", "x"], ["2", "1", "O'Brien, Jr. (actor)", "y"]]


def test_dump_parser_null_empty_escape():
    line = "INSERT INTO `t` VALUES (NULL,'',' spaced ','a\\\\b','with (parens), and commas',-3.5);"
    rows = parse_dump_text([line])
    assert rows == [["", "", " spaced ", "a\\b", "with (parens), and commas", "-3.5"]]


def test_dump_parser_quoted_null_and_noninsert_lines():
    lines = [
        "-- comment\n",
        "CREATE TABLE `t` (x int);\n",
        "INSERT INTO `t` VALUES ('NULL',1);\n",
    ]
    # quoted 'NULL' also maps to '' (reference compares post-csv value:
    # bin/mysqldump_to_csv.py:60-63)
    assert parse_dump_text(lines) == [["", "1"]]


def test_dump_parser_multiline_statements():
    lines = [
        "INSERT INTO `t` VALUES (1,'a');",
        "INSERT INTO `t` VALUES (2,'b'),(3,'c');",
    ]
    assert parse_dump_text(lines) == [["1", "a"], ["2", "b"], ["3", "c"]]


# ---------------------------------------------------------------------------
# B1/B2/B5/B6 unit semantics


def test_filter_page_semantics():
    t = _positional(
        [
            ["1", "0", "Keep_me"],
            ["2", "1", "Wrong_ns"],
            ["3", "0", ""],
            ["4", "0", "CR\rstripped"],
        ],
        3,
    )
    out = filter_page(t)
    assert out.column("page_id").to_pylist() == [1, 4]
    assert out.column("page_title").to_pylist() == ["Keep_me", "CRstripped"]


def test_filter_redirect_is_page_shaped():
    t = _positional([["9", "0", "T"]], 3)
    out = filter_redirect(t)
    assert out.column_names == ["id", "title"]


def test_filter_wikidata_page_semantics():
    t = _positional(
        [["1", "0", "Q42"], ["2", "0", "NotQ"], ["3", "1", "Q43"]], 3
    )
    out = filter_wikidata_page(t)
    assert out.column("page_id").to_pylist() == [1]
    assert out.column("page_title").to_pylist() == ["Q42"]


def test_filter_ips_removes_all_wiki_substrings():
    langs = frozenset({"en", "de"})
    t = _positional(
        [
            ["10", "7", "enwiki", "Title A"],
            ["11", "8", "dewikiwiki", "X"],  # replace-all → 'de' ∈ langs
            ["12", "9", "frwiki", "Y"],
            ["13", "1", "enwiki", ""],
        ],
        4,
    )
    out = filter_ips(t, langs)
    assert out.column("item_id").to_pylist() == [7, 8]
    assert out.column("title").to_pylist() == ["Title A", "X"]


# ---------------------------------------------------------------------------
# Byte-exact goldens vs reference fixtures


@needs_ref
def test_golden_langlinks_byte_exact():
    lines = _read("filter_langlinks.test1.txt").splitlines()
    out = filter_langlinks_lines(lines, DEFAULT_CONFIG.language_set())
    got = "".join(
        f"{t},{f},{l}\n"
        for t, f, l in zip(
            out.column("ll_title").to_pylist(),
            out.column("ll_from").to_pylist(),
            out.column("ll_lang").to_pylist(),
        )
    )
    assert got == _read("filter_langlinks.test1expected.txt")


@needs_ref
def test_golden_geo_tags_byte_exact():
    rows = _csv_rows(_read("filter_wikidata_geo_tags.test1.txt"))
    out = filter_geo_tags(_positional(rows, 13))
    got = "".join(
        f"{pid},{la},{lo}\n"
        for pid, la, lo in zip(
            out.column("gt_page_id").to_pylist(),
            shortest_float_repr(out.column("gt_lat").to_pylist()),
            shortest_float_repr(out.column("gt_lon").to_pylist()),
        )
    )
    assert got == _read("filter_wikidata_geo_tags.test1expected.txt")


@needs_ref
def test_golden_pagelinks_count_byte_exact():
    """C1 semantics: ns filter + id→title lookup join (misses dropped) +
    count per title; compared as a SET of byte-exact unix-csv lines (the
    reference emits insertion order, bin/filter_pagelinks.py:47-49 —
    parallel engines are unordered, SURVEY.md §2.C1)."""
    from wikipedia_wikidata_ray.pipelines.wikiprocess import LinktargetJoiner

    linktarget = {
        int(r[0]): r[1] for r in _csv_rows(_read("linktargets.txt"))
    }
    rows = _csv_rows(_read("filter_pagelinks.test1.txt"))
    batch = pa.table(
        {
            "lang": pa.array([r[0] for r in rows], type=pa.string()),
            "pl_namespace": pa.array([int(r[1]) for r in rows]),
            "pl_target_id": pa.array([int(r[2]) for r in rows]),
        }
    )
    joined = LinktargetJoiner(linktarget)(batch)
    counts = joined.group_by(["pl_title"]).aggregate([([], "count_all")])
    got_lines = {
        f"{csv_minimal_quote(t)},{c}"
        for t, c in zip(
            counts.column("pl_title").to_pylist(),
            counts.column("pl_title_count").to_pylist()
            if "pl_title_count" in counts.column_names
            else counts.column("count_all").to_pylist(),
        )
    }
    want_lines = set(_read("filter_pagelinks.test1expected.txt").splitlines())
    assert got_lines == want_lines


def test_csv_gz_source_roundtrip(ray_session, tmp_path):
    """A5-analog gz-CSV intermediate: headerless positional schema."""
    import gzip

    import pyarrow as pa

    from wikipedia_wikidata_ray.sources.csvgz import read_csv_gz

    p = tmp_path / "part.csv.gz"
    with gzip.open(p, "wt", encoding="utf-8") as f:
        f.write('1,Title_A\n2,"Title,B"\n')
    ds = read_csv_gz(
        str(p), ["page_id", "page_title"],
        {"page_id": pa.int64(), "page_title": pa.string()},
    )
    out = ds.to_pandas().sort_values("page_id", ignore_index=True)
    assert out["page_id"].tolist() == [1, 2]
    assert out["page_title"].tolist() == ["Title_A", "Title,B"]


def test_wikidump_e2e_runs(ray_session):
    """A3→B→C1→D2→D7→E5→D8/D9→F1 over real .sql.gz dump files: sorted
    output, articles before redirects, importance in (0, 1]."""
    from wikipedia_wikidata_ray.pipelines.wikidump import (
        wikimedia_importance_from_dumps,
    )
    from wikipedia_wikidata_ray.sources.wikidump_gen import ensure_wikidumps

    out = wikimedia_importance_from_dumps(
        ensure_wikidumps("/root/testdata/sf0.001")
    ).to_pandas()
    assert len(out) > 100
    assert set(out["type"]) == {"a", "r"}
    assert out["importance"].between(1e-10, 1.0).all()
    assert out["wikidata_id"].str.startswith("Q").all()
    # F1 order: within a language block, 'a' rows precede 'r' rows
    for _, g in out.groupby("language", sort=False):
        assert g["type"].tolist() == sorted(g["type"])
