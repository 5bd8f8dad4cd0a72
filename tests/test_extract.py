"""Extraction invariant tests (BASELINE.json input_hint: byte-identical
extracted text per url) + deterministic pages generation."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from wikipedia_wikidata_ray.sources.pages_gen import (
    build_pages_batch,
    derive_geo,
    derive_outlinks,
    ensure_pages_parquet,
)
from wikipedia_wikidata_ray.stages.extract import HtmlExtractor

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages():
    return pq.read_table(ensure_pages_parquet(SF))


@pytest.fixture(scope="module")
def docs():
    return pq.read_table(f"{SF}/documents.parquet")


def test_generation_deterministic(docs):
    n = docs.num_rows
    a = build_pages_batch(docs.slice(0, 100), n)
    b = build_pages_batch(docs.slice(0, 100), n)
    assert a.equals(b)


def test_extracted_text_byte_identical(pages, docs):
    ex = HtmlExtractor()(pages)
    assert ex.column("text").to_pylist() == docs.column("text").to_pylist()
    # re-extracting is stable (pure function of html)
    ex2 = HtmlExtractor()(pages)
    assert ex.equals(ex2)


def test_meta_links_single_parse_equivalence(pages):
    """meta_links_batch (one parse) ≡ extract_batch + outlinks_batch
    (two parses) — the export/importance compositions rely on this."""
    from wikipedia_wikidata_ray.stages.extract import (
        extract_batch,
        meta_links_batch,
        outlinks_batch,
        outlinks_flatten,
    )

    tbl = pages.select(["url", "html", "lang"])
    ml = meta_links_batch(tbl)
    ex = extract_batch(tbl)
    for col in ("doc_id", "lang", "title", "has_geo"):
        assert ml.column(col).equals(ex.column(col)), col
    assert outlinks_flatten(ml).equals(outlinks_batch(tbl))
    # empty batch degrades to an empty, schema-stable table
    empty = meta_links_batch(tbl.slice(0, 0))
    assert empty.num_rows == 0
    assert outlinks_flatten(empty).num_rows == 0


def test_extract_escaping_roundtrip(docs):
    # pages whose text contains html-special chars still round-trip
    import pyarrow as pa

    tricky = pa.table(
        {
            "doc_id": pa.array([123], type=pa.int64()),
            "text": ['a < b & "c" > d &amp; <div id="content">x</div>'],
            "lang": ["en"],
        }
    )
    page = build_pages_batch(tricky, 1000)
    ex = HtmlExtractor()(page)
    assert ex.column("text").to_pylist() == tricky.column("text").to_pylist()


def test_geo_derivation_matches_extraction(pages, docs):
    ex = HtmlExtractor()(pages)
    doc_id = ex.column("doc_id").to_numpy()
    lat, lon, has_geo = derive_geo(doc_id)
    got_lat = ex.column("lat").to_numpy(zero_copy_only=False)
    got_lon = ex.column("lon").to_numpy(zero_copy_only=False)
    assert (ex.column("has_geo").to_numpy(zero_copy_only=False) == has_geo).all()
    m = has_geo
    # repr-formatted floats parse back to the exact same float64
    assert np.array_equal(got_lat[m], lat[m])
    assert np.array_equal(got_lon[m], lon[m])


def test_outlinks(pages, docs):
    ol = HtmlExtractor("outlinks")(pages)
    n = docs.num_rows
    assert ol.num_rows == 3 * n
    src = ol.column("src_doc_id").to_numpy()
    tgt = ol.column("target_doc_id").to_numpy()
    want = derive_outlinks(np.arange(n), n)
    # pages are generated in doc order and extraction preserves row order
    assert np.array_equal(src.reshape(n, 3)[:, 0], np.arange(n))
    assert np.array_equal(tgt.reshape(n, 3), want)


def test_config_env_override(monkeypatch):
    """Reference parity: LANGUAGES env overrides the 39-language default
    (tests/run.sh:3-13)."""
    from wikipedia_wikidata_ray.config import DEFAULT_LANGUAGES, EngineConfig

    assert len(EngineConfig().languages) == 39 == len(DEFAULT_LANGUAGES)
    monkeypatch.setenv("LANGUAGES", "de,fr,it,en")
    assert EngineConfig.from_env().languages == ("de", "fr", "it", "en")
    assert EngineConfig.from_env(languages=("xx",)).languages == ("xx",)


def test_warc_roundtrip(ray_session):
    """WARC shard render → parse → byte-identical html + timestamps."""
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.sources.pages_gen import ensure_pages_parquet
    from wikipedia_wikidata_ray.sources.warc import (
        ensure_warc_fixture,
        read_warc,
    )

    sf = "/root/testdata/sf0.001"
    warc_dir = ensure_warc_fixture(sf)
    got = (
        read_warc(f"{warc_dir}/")
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    want = (
        pq.read_table(ensure_pages_parquet(sf))
        .select(["url", "warc_ts", "html"])
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    assert got["url"].tolist() == want["url"].tolist()
    assert (got["warc_ts"] == want["warc_ts"]).all()
    assert all(a == b for a, b in zip(got["html"], want["html"]))
