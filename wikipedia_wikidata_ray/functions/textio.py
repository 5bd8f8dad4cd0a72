"""Byte-exact text formatting helpers (SURVEY.md §2.G).

The reference's text goldens depend on Python shortest-float repr
(bin/filter_wikidata_geo_tags.py:50-53 prints ``str(round(x, 5))`` → e.g.
``55.9214`` not ``55.92140``) and on specific CSV dialects
(bin/filter_page.py:26 unix minimal quoting; bin/filter_langlinks.py:40 raw
join). Centralizing the formatting here keeps every sink byte-compatible.
"""

from __future__ import annotations

import numpy as np


def shortest_float_repr(values) -> list[str]:
    """Python ``repr`` (shortest round-trip) formatting per value.

    Matches the reference's ``str(float)`` output byte-for-byte
    (bin/filter_wikidata_geo_tags.py:53). Vectorization note: CPython's
    float repr is already a C fast path; per-value calls are fine for the
    narrow formatted-export columns this is used on.
    """
    return [repr(float(v)) for v in values]


def round5(values: np.ndarray) -> np.ndarray:
    """``round(x, 5)`` with Python banker's-rounding semantics.

    numpy.round also uses round-half-to-even, matching Python's
    ``round(x, 5)`` in bin/filter_wikidata_geo_tags.py:50-51.
    """
    return np.round(np.asarray(values, dtype=np.float64), 5)


def csv_minimal_quote(field: str) -> str:
    """Unix-dialect minimal quoting (csv.writer dialect='unix' with
    QUOTE_MINIMAL): quote only when the field contains ``"``, ``,``,
    ``\\r`` or ``\\n``; embedded quotes doubled. bin/filter_page.py:26."""
    if any(c in field for c in (',', '"', '\n', '\r')):
        return '"' + field.replace('"', '""') + '"'
    return field
