"""JSONL corpus source — the line-delimited-JSON ingestion path web
corpora actually arrive in (one JSON object per line), read with
``ray.data.read_text`` + ONE vectorized Arrow RE2 kernel per field (the
props_extract_stats idiom) — no per-row ``json.loads``.

Supported subset (the honesty contract, like ops/multimodal's FakeCodec):
the reader parses records whose string values need NO JSON escaping
(no ``"``, ``\\``, control chars) — asserted by the writer below and by
the reader per batch. Arbitrary corpora route to a per-block
``json.loads`` fallback (named, not the vectorized default) — escaping
is rare in curated web text but must never be silently mis-parsed.

Fixture generation is deterministic and cached under /tmp/wwr_jsonl
(the pages_gen convention: atomic ``os.replace`` commit, many files so
the read stage parallelizes).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data import Dataset

_ESCAPE_NEEDED = r'["\\\x00-\x1f]'


def jsonl_path_for(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return f"/tmp/wwr_jsonl/{tag}/docs"


def ensure_docs_jsonl(sf_dir: str, n_shards: int = 8) -> str:
    """Write documents as sharded JSONL once (untimed fixture step)."""
    out = jsonl_path_for(sf_dir)
    if os.path.exists(out):
        return out
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "text"],
    )
    bad = pc.sum(
        pc.cast(pc.match_substring_regex(docs["text"], _ESCAPE_NEEDED),
                pa.int64())
    ).as_py()
    assert not bad, (
        f"{bad} documents need JSON escaping — regenerate with the "
        "json.loads fallback reader instead of the vectorized subset"
    )
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    n = docs.num_rows
    edges = [n * s // n_shards for s in range(n_shards + 1)]
    for s in range(n_shards):
        chunk = docs.slice(edges[s], edges[s + 1] - edges[s])
        with open(f"{tmp}/part-{s:05d}.jsonl", "w") as f:
            for did, lang, text in zip(
                chunk.column("doc_id").to_pylist(),
                chunk.column("lang").to_pylist(),
                chunk.column("text").to_pylist(),
            ):
                f.write(json.dumps(
                    {"doc_id": did, "lang": lang, "text": text}
                ) + "\n")
    os.replace(tmp, out)
    return out


def read_docs_jsonl(path: str) -> Dataset:
    """Parse JSONL lines into (doc_id, lang, text) — three vectorized
    extract_regex kernels per batch, zero per-row Python."""

    def parse(t: pa.Table) -> pa.Table:
        lines = t.column("text")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        did = pc.extract_regex(lines, r'"doc_id": (?P<v>\d+)')
        lang = pc.extract_regex(lines, r'"lang": "(?P<v>[^"]*)"')
        text = pc.extract_regex(lines, r'"text": "(?P<v>[^"]*)"\}$')
        fields = [pc.struct_field(x, "v") for x in (did, lang, text)]
        ok = pc.is_valid(fields[0])
        for f in fields[1:]:
            ok = pc.and_(ok, pc.is_valid(f))
        n_bad = len(lines) - pc.sum(pc.cast(ok, pa.int64())).as_py()
        assert n_bad == 0, (
            f"{n_bad} lines outside the escape-free subset — route this "
            "corpus through the json.loads fallback"
        )
        return pa.table(
            {
                "doc_id": pc.cast(fields[0], pa.int64()),
                "lang": fields[1],
                "text": fields[2],
            }
        )

    return rd.read_text(path).map_batches(parse, batch_format="pyarrow")
