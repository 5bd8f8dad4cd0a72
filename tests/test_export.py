"""A6 sorted-TSV sink: ordered parts, header, byte-exact float repr."""

from __future__ import annotations

import pytest

from wikipedia_wikidata_ray.pipelines.export import (
    export_wikimedia_importance,
    read_tsv_concat,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def exported(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tsv"))
    export_wikimedia_importance(SF, out)
    return read_tsv_concat(out)


def test_header_and_shape(exported):
    lines = exported.splitlines()
    assert lines[0] == "language\ttype\ttitle\timportance"
    assert len(lines) > 1
    assert all(line.count("\t") == 3 for line in lines[1:])


def test_float_repr_round_trips(exported):
    for line in exported.splitlines()[1:]:
        imp = line.rsplit("\t", 1)[1]
        # shortest-repr invariant: formatting the parsed value reproduces
        # the exact bytes (reference: str(float) in its py filters)
        assert repr(float(imp)) == imp


def test_rows_sorted_articles_before_redirects(exported):
    rows = [line.split("\t") for line in exported.splitlines()[1:]]
    # within one language, all 'a' rows precede all 'r' rows, titles
    # ascending within a type (steps/output.sh:118-124 order)
    by_lang: dict[str, list[list[str]]] = {}
    for r in rows:
        by_lang.setdefault(r[0], []).append(r)
    assert len(by_lang) >= 2
    for lang_rows in by_lang.values():
        types = [r[1] for r in lang_rows]
        assert types == sorted(types)  # 'a' < 'r'
        for t in ("a", "r"):
            titles = [r[2] for r in lang_rows if r[1] == t]
            assert titles == sorted(titles)


def test_wikidump_tsv_artifact(ray_session, tmp_path):
    """Raw dumps → the reference's final TSV artifact, float repr exact."""
    from wikipedia_wikidata_ray.pipelines.export import (
        export_wikidump_importance,
        read_tsv_concat,
    )
    from wikipedia_wikidata_ray.sources.wikidump_gen import ensure_wikidumps

    out = str(tmp_path / "wikidump_tsv")
    export_wikidump_importance(ensure_wikidumps("/root/testdata/sf0.001"), out)
    text = read_tsv_concat(out)
    lines = text.splitlines()
    assert lines[0] == "language\ttype\ttitle\timportance\twikidata_id"
    assert len(lines) > 100
    for line in lines[1:]:
        parts = line.split("\t")
        assert len(parts) == 5
        assert repr(float(parts[3])) == parts[3]
        assert parts[4].startswith("Q")


def test_gzip_parts_round_trip(ray_session, tmp_path):
    """compress=True writes .tsv.gz parts whose decompressed concat is
    byte-identical to the uncompressed export (reference: pigz -9 single
    artifact, steps/output.sh:126-128)."""
    import ray.data as rd
    import pyarrow as pa

    from wikipedia_wikidata_ray.pipelines.export import export_tsv, read_tsv_concat

    ds = rd.from_arrow(
        pa.table(
            {
                "language": ["en", "de", "fr"],
                "title": ["A", "B", "C"],
                "importance": [0.5, 0.25, 1e-10],
            }
        )
    )
    plain = str(tmp_path / "plain")
    gz = str(tmp_path / "gz")
    export_tsv(ds, plain)
    export_tsv(ds, gz, compress=True)
    assert read_tsv_concat(plain) == read_tsv_concat(gz)
    import os

    assert any(f.endswith(".tsv.gz") for f in os.listdir(gz))
