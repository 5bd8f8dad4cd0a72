"""HTML → text/geo/link extraction (SURVEY.md §2.C3/I1).

The Ray-Data analog of the reference's streaming dump parser
(bin/mysqldump_to_csv.py:15-115) + per-record filters (bin/filter_*.py):
a deterministic pure function of the ``html`` column, applied as a
stateless ``map_batches`` stage over zero-copy Arrow batches. The north
rule's invariant is **byte-identical extracted text per url**
(BASELINE.json input_hint) — tested in tests/test_extract.py.

Parsing is anchored on the fixed sentinels of the page template
(sources/pages_gen.py) using C-speed ``str.find`` slicing plus one
compiled regex for anchors; state (compiled patterns) lives in the
callable-class instance so it is built once per actor, not per batch
(SURVEY.md §2.C — actor-pool rule).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..schemas import EXTRACTED, OUTLINKS

_ANCHOR_RE = re.compile(r'<a href="/wiki/Doc_(\d+)">')
_CONTENT_OPEN = '<div id="content">'
_CONTENT_CLOSE = "</div>\n</body>"
_TITLE_OPEN = "<title>"
_TITLE_CLOSE = "</title>"
_GEO_LAT = 'class="geo" data-lat="'
_GEO_LON = '" data-lon="'


def _unescape(text: str) -> str:
    # exact inverse of pages_gen._escape (order matters: &amp; last)
    return text.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")


class HtmlExtractor:
    """Actor-pool ``map_batches`` callable: pages → EXTRACTED (+ outlinks).

    ``emit`` selects the output: "extracted" (one row per page) or
    "outlinks" (one row per anchor — the pagelinks analog, SURVEY.md §2.E1).
    """

    def __init__(self, emit: str = "extracted"):
        assert emit in ("extracted", "outlinks")
        self.emit = emit
        self.anchor_re = _ANCHOR_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        langs = batch.column("lang").to_pylist()
        n = len(urls)

        if self.emit == "outlinks":
            src_ids: list[int] = []
            src_langs: list[str] = []
            targets: list[int] = []
            for i in range(n):
                h = htmls[i].decode("utf-8")
                did = int(urls[i].rsplit("Doc_", 1)[1])
                for mtch in self.anchor_re.finditer(h):
                    src_ids.append(did)
                    src_langs.append(langs[i])
                    targets.append(int(mtch.group(1)))
            return pa.Table.from_arrays(
                [
                    pa.array(src_ids, type=pa.int64()),
                    pa.array(src_langs, type=pa.string()),
                    pa.array(targets, type=pa.int64()),
                ],
                schema=OUTLINKS,
            )

        doc_ids = np.empty(n, dtype=np.int64)
        titles: list[str] = []
        texts: list[str] = []
        lat = np.full(n, np.nan)
        lon = np.full(n, np.nan)
        has_geo = np.zeros(n, dtype=bool)
        n_out = np.zeros(n, dtype=np.int32)
        for i in range(n):
            h = htmls[i].decode("utf-8")
            doc_ids[i] = int(urls[i].rsplit("Doc_", 1)[1])

            t0 = h.find(_TITLE_OPEN) + len(_TITLE_OPEN)
            titles.append(h[t0 : h.find(_TITLE_CLOSE, t0)])

            c0 = h.find(_CONTENT_OPEN) + len(_CONTENT_OPEN)
            texts.append(_unescape(h[c0 : h.rfind(_CONTENT_CLOSE)]))

            g0 = h.find(_GEO_LAT)
            if g0 >= 0:
                g0 += len(_GEO_LAT)
                g1 = h.find(_GEO_LON, g0)
                g2 = h.find('"', g1 + len(_GEO_LON))
                lat[i] = float(h[g0:g1])
                lon[i] = float(h[g1 + len(_GEO_LON) : g2])
                has_geo[i] = True
            n_out[i] = len(self.anchor_re.findall(h))

        return pa.Table.from_arrays(
            [
                pa.array(urls, type=pa.string()),
                pa.array(doc_ids),
                pa.array(langs, type=pa.string()),
                pa.array(titles, type=pa.string()),
                pa.array(texts, type=pa.large_string()),
                pa.array(lat, from_pandas=True),  # NaN → null
                pa.array(lon, from_pandas=True),
                pa.array(has_geo),
                pa.array(n_out),
            ],
            schema=EXTRACTED,
        )
