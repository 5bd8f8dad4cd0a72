"""Deterministic Common-Crawl-style ``pages`` table generator.

The north rule (BASELINE.json input_hint) mandates an input table
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
No external data exists in the sandbox, so we synthesize it **derived 1:1
from the driver's ``documents`` table** with pure integer arithmetic. Every
derived quantity (coordinates, outlinks, timestamps) is a closed-form
function of ``doc_id`` that ANSI SQL can replicate — this is what makes the
spatial pipeline oracle-checkable in DuckDB (see __ray_entry__.oracle_sql).

Derivation rules (the contract; keep in sync with oracle SQL):

- ``title  = 'Doc_' || doc_id``
- ``url    = 'https://' || lang || '.example.org/wiki/Doc_' || doc_id``
- ``warc_ts = TIMESTAMP '2026-01-01' + doc_id seconds``
- geo (m = doc_id % 10):
    * m < 3  → megacity ``c = doc_id % 5`` from MEGACITIES, plus jitter
      ``dlat = ((doc_id*37) % 2001 - 1000)/10000.0``,
      ``dlon = ((doc_id*61) % 2001 - 1000)/10000.0``
      (~30% of geotagged rows pile into 5 hot cells → exercises salting)
    * 3 ≤ m < 7 → dispersed:
      ``lat = ((doc_id*7919) % 1600001)/10000.0 - 80``
      ``lon = ((doc_id*104729) % 3600001)/10000.0 - 180``
    * m ≥ 7 → no coordinates
- outlinks (N = row count of documents): every page links to
  ``t1 = (doc_id*3 + 1) % N``, ``t2 = (doc_id*5 + 2) % N`` and the hot
  target ``t3 = doc_id % 2`` (docs 0 and 1 each receive ~N/2 in-links —
  the "United States" hot-key analog, README.md:174-176).

The html payload embeds title, geo microdata, outlink anchors and the
escaped document text; extraction (stages/extract.py) must recover ``text``
byte-identically per url (BASELINE.json invariant; reference analog:
bin/mysqldump_to_csv.py round-trip + filter goldens).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..schemas import PAGES

# (lat, lon): Tokyo, New York, London, São Paulo, Delhi
MEGACITIES: tuple[tuple[float, float], ...] = (
    (35.6895, 139.6917),
    (40.7127, -74.0059),
    (51.5072, -0.1275),
    (-23.5505, -46.6333),
    (28.6139, 77.209),
)

WARC_EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds


def derive_geo(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized (lat, lon, has_geo) from doc_id per the contract above."""
    doc_id = np.asarray(doc_id, dtype=np.int64)
    m = doc_id % 10
    has_geo = m < 7
    lat = np.zeros(len(doc_id), dtype=np.float64)
    lon = np.zeros(len(doc_id), dtype=np.float64)

    mega = m < 3
    c = (doc_id % 5).astype(np.int64)
    city_lat = np.array([p[0] for p in MEGACITIES])[c]
    city_lon = np.array([p[1] for p in MEGACITIES])[c]
    dlat = ((doc_id * 37) % 2001 - 1000) / 10000.0
    dlon = ((doc_id * 61) % 2001 - 1000) / 10000.0
    lat = np.where(mega, city_lat + dlat, lat)
    lon = np.where(mega, city_lon + dlon, lon)

    disp = (m >= 3) & (m < 7)
    lat = np.where(disp, ((doc_id * 7919) % 1600001) / 10000.0 - 80.0, lat)
    lon = np.where(disp, ((doc_id * 104729) % 3600001) / 10000.0 - 180.0, lon)

    lat = np.where(has_geo, lat, np.nan)
    lon = np.where(has_geo, lon, np.nan)
    return lat, lon, has_geo


def derive_outlinks(doc_id: np.ndarray, n_docs: int) -> np.ndarray:
    """(len, 3) int64 array of outlink target doc_ids."""
    doc_id = np.asarray(doc_id, dtype=np.int64)
    t1 = (doc_id * 3 + 1) % n_docs
    t2 = (doc_id * 5 + 2) % n_docs
    t3 = doc_id % 2
    return np.stack([t1, t2, t3], axis=1)


def _escape(text: str) -> str:
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def build_pages_batch(batch: pa.Table, n_docs: int) -> pa.Table:
    """documents batch → pages batch (stateless map_batches body).

    Row-wise html templating is unavoidable (variable-length payloads); the
    numeric derivations stay vectorized, and the stage only runs at
    fixture-generation time (untimed), never inside the benchmarked path.
    """
    doc_id = batch.column("doc_id").to_numpy()
    langs = batch.column("lang").to_pylist()
    texts = batch.column("text").to_pylist()
    lat, lon, has_geo = derive_geo(doc_id)
    links = derive_outlinks(doc_id, n_docs)

    urls: list[str] = []
    htmls: list[bytes] = []
    for i, did in enumerate(doc_id):
        title = f"Doc_{did}"
        url = f"https://{langs[i]}.example.org/wiki/{title}"
        if has_geo[i]:
            geo_span = (
                f'<span class="geo" data-lat="{lat[i]!r}" '
                f'data-lon="{lon[i]!r}"></span>\n'
            )
        else:
            geo_span = ""
        anchors = "".join(
            f'<a href="/wiki/Doc_{t}">Doc_{t}</a>' for t in links[i]
        )
        html = (
            f'<!DOCTYPE html>\n<html lang="{langs[i]}"><head>'
            f'<meta charset="utf-8"><title>{title}</title></head>\n<body>\n'
            f"<h1>{title}</h1>\n{geo_span}"
            f'<div class="links">{anchors}</div>\n'
            f'<div id="content">{_escape(texts[i])}</div>\n'
            f"</body></html>\n"
        )
        urls.append(url)
        htmls.append(html.encode("utf-8"))

    ts = pa.array(WARC_EPOCH_US + doc_id * 1_000_000, type=pa.timestamp("us"))
    return pa.Table.from_arrays(
        [
            pa.array(urls, type=pa.string()),
            ts,
            pa.array(htmls, type=pa.large_binary()),
            pc.cast(batch.column("text"), pa.large_string()),
            pc.cast(batch.column("lang"), pa.string()),
        ],
        schema=PAGES,
    )


def ensure_bench_pages_parquet(sf_dir: str, multiplier: int = 40) -> str:
    """Replicated pages corpus for benchmarking: ``multiplier × n_docs``
    pages with ``doc_id ∈ [0, K·N)`` and text recycled from
    ``documents[doc_id % N]``. Same closed-form geo/link arithmetic over the
    full doc_id range, so skew (megacities, hot link targets) scales with
    the corpus. Deterministic; cached under /tmp (untimed fixture step)."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = f"/tmp/wwr_pages/{tag}_x{multiplier}/pages"
    if os.path.exists(out):
        return out
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    n = docs.num_rows
    total = n * multiplier
    texts = docs.column("text")
    langs = docs.column("lang")
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    # many files → parallel read tasks (a single file serializes the read
    # stage and starves every downstream operator)
    n_shards = 32
    step = 8192
    shard_edges = np.linspace(0, total, n_shards + 1, dtype=np.int64)
    for s in range(n_shards):
        writer = pq.ParquetWriter(f"{tmp}/part-{s:05d}.parquet", PAGES)
        for off in range(shard_edges[s], shard_edges[s + 1], step):
            ids = np.arange(off, min(off + step, int(shard_edges[s + 1])), dtype=np.int64)
            base = pa.array(ids % n)
            chunk = pa.Table.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pc.cast(pc.take(texts, base), pa.string()),
                    pc.cast(pc.take(langs, base), pa.string()),
                ],
                names=["doc_id", "text", "lang"],
            )
            writer.write_table(build_pages_batch(chunk, total), row_group_size=step)
        writer.close()
    os.replace(tmp, out)
    return out


def pages_path_for(sf_dir: str) -> str:
    """Cache location for the generated pages parquet of one sf dir."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return f"/tmp/wwr_pages/{tag}/pages.parquet"


def ensure_pages_parquet(sf_dir: str) -> str:
    """Generate (once, deterministically) pages.parquet for ``sf_dir``.

    Driver-side utility: runs with plain pyarrow (no Ray needed) because
    generation is an untimed fixture step; the benchmarked pipelines then
    ``ray.data.read_parquet`` the result. Partitioned row groups keep the
    downstream read parallel.
    """
    out = pages_path_for(sf_dir)
    if os.path.exists(out):
        return out
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    n_docs = docs.num_rows
    pieces = []
    step = 4096
    for off in range(0, n_docs, step):
        pieces.append(build_pages_batch(docs.slice(off, step), n_docs))
    table = pa.concat_tables(pieces)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    tmp = out + ".tmp"
    pq.write_table(table, tmp, row_group_size=2048)
    os.replace(tmp, out)
    return out
