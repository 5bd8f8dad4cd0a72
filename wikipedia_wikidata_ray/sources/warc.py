"""WARC (Web ARChive) source — the container format real Common-Crawl
pages arrive in (ISO 28500; public spec). The engine's 100 TB design point
reads WARC shards; this module provides:

- ``write_warc_gz``: render a pages table into a ``.warc.gz`` shard of
  WARC/1.0 ``response`` records (used for deterministic fixtures);
- ``read_warc``: ``read_binary_files`` over shard paths → stateless
  ``map_batches`` parser → the engine's ``pages``-shaped table
  (url, warc_ts, html) — one task per shard, shards ≫ cluster for
  parallelism (same layout discipline as the parquet corpus).

Parser notes: record-level strict on the headers the pipeline needs
(``WARC-Type``, ``WARC-Target-URI``, ``WARC-Date``, ``Content-Length``);
non-response records (warcinfo, request, metadata) are skipped, matching
how Common-Crawl consumers read WET/WARC files.
"""

from __future__ import annotations

import gzip
import io
import os

import numpy as np
import pyarrow as pa
from ray.data import Dataset

_CRLF = "\r\n"


def write_warc_gz(
    path: str,
    urls: list[str],
    timestamps_us: list[int],
    payloads: list[bytes],
) -> str:
    """Render one .warc.gz shard of WARC/1.0 response records."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        for url, ts, payload in zip(urls, timestamps_us, payloads):
            ts_s = int(ts // 1_000_000)
            # deterministic ISO-8601 from microseconds since epoch
            days = ts_s // 86400
            rem = ts_s % 86400
            # fixture epoch is 2026-01-01; render via civil-from-days
            y, m, d = _civil_from_days(days)
            date = (
                f"{y:04d}-{m:02d}-{d:02d}T"
                f"{rem // 3600:02d}:{(rem % 3600) // 60:02d}:{rem % 60:02d}Z"
            )
            header = (
                "WARC/1.0" + _CRLF
                + "WARC-Type: response" + _CRLF
                + f"WARC-Target-URI: {url}" + _CRLF
                + f"WARC-Date: {date}" + _CRLF
                + "Content-Type: application/http; msgtype=response" + _CRLF
                + f"Content-Length: {len(payload)}" + _CRLF
                + _CRLF
            )
            gz.write(header.encode("utf-8"))
            gz.write(payload)
            gz.write((_CRLF + _CRLF).encode("utf-8"))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)
    return path


def _civil_from_days(days: int) -> tuple[int, int, int]:
    """Gregorian date from days-since-unix-epoch (Howard Hinnant's public
    civil_from_days algorithm)."""
    z = days + 719468
    era = z // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = mp + 3 if mp < 10 else mp - 9
    return y + (1 if m <= 2 else 0), m, d


def parse_warc_bytes(data: bytes) -> dict[str, list]:
    """One WARC(.gz) shard → columns (url, warc_date, html)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    urls: list[str] = []
    dates: list[str] = []
    payloads: list[bytes] = []
    pos = 0
    n = len(data)
    while pos < n:
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        head = data[pos:hdr_end].decode("utf-8", errors="replace")
        lines = head.split(_CRLF)
        if not lines or not lines[0].startswith("WARC/"):
            break
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        body = data[hdr_end + 4 : hdr_end + 4 + length]
        if headers.get("warc-type") == "response":
            urls.append(headers.get("warc-target-uri", ""))
            dates.append(headers.get("warc-date", ""))
            payloads.append(bytes(body))
        pos = hdr_end + 4 + length
        # skip the record-terminating CRLF CRLF
        while data[pos : pos + 2] == b"\r\n":
            pos += 2
    return {"url": urls, "warc_date": dates, "html": payloads}


def read_warc(paths: str | list[str]) -> Dataset:
    """WARC shards → pages-shaped Dataset (url, warc_ts, html)."""
    import ray.data as rd

    files = rd.read_binary_files(paths)

    def parse(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        dates: list[str] = []
        payloads: list[bytes] = []
        for blob in batch.column("bytes").to_pylist():
            cols = parse_warc_bytes(blob)
            urls.extend(cols["url"])
            dates.extend(cols["warc_date"])
            payloads.extend(cols["html"])
        ts = pa.compute.cast(
            pa.compute.strptime(
                pa.array(dates, type=pa.string()), "%Y-%m-%dT%H:%M:%SZ", "s"
            ),
            pa.timestamp("us"),
        )
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "warc_ts": ts,
                "html": pa.array(payloads, type=pa.large_binary()),
            }
        )

    return files.map_batches(parse, batch_format="pyarrow")


def ensure_warc_fixture(sf_dir: str, n_shards: int = 4) -> str:
    """Deterministic .warc.gz shard tree rendered from the pages corpus."""
    from .pages_gen import ensure_pages_parquet

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = f"/tmp/wwr_warc/{tag}"
    if os.path.exists(os.path.join(out, "_COMPLETE")):
        return out
    import pyarrow.parquet as pq

    pages = pq.read_table(ensure_pages_parquet(sf_dir))
    n = pages.num_rows
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    edges = np.linspace(0, n, n_shards + 1, dtype=np.int64)
    ts_us = pages.column("warc_ts").cast(pa.int64()).to_numpy()
    for s_ in range(n_shards):
        sl = pages.slice(edges[s_], edges[s_ + 1] - edges[s_])
        write_warc_gz(
            os.path.join(tmp, f"part-{s_:04d}.warc.gz"),
            sl.column("url").to_pylist(),
            list(ts_us[edges[s_] : edges[s_ + 1]]),
            sl.column("html").to_pylist(),
        )
    open(os.path.join(tmp, "_COMPLETE"), "w").close()
    os.replace(tmp, out)
    return out
