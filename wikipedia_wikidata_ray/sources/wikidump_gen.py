"""Deterministic MySQL-dump fixture generator (.sql.gz files) — the raw
input format of the reference (steps/wikipedia_download.sh fetches these;
our A3 parser + B-filters consume them). Derived 1:1 from the driver's
``documents`` table with closed-form arithmetic so the end-to-end
dump→importance pipeline (pipelines/wikidump.py) is DuckDB-oracle-checkable.

Contract (N = documents row count; langs = distinct documents.lang):

per language L (docs d with lang L; li = 0-based index of L in the sorted
lang list):
- {L}page:       (d, 0, 'Doc_<d>', 'x')  + noise rows (ns=1; empty title)
- {L}linktarget: (t, 0, 'Doc_<t>') for ALL t in [0,N) with t % 13 != 0
                 AND (t + li) % 11 != 0 — DISTINCT per language, so a
                 pipeline that reuses one language's mapping for every
                 language (the round-1 simplification) produces wrong
                 counts and fails the oracle
- {L}pagelinks:  6 edges per doc d of L, targeting SAME-LANGUAGE docs by
                 per-language ordinal r(d) (0-based doc_id rank within L,
                 C_L docs): ordinals (r*3+1), (r*5+2), r%2, (r*7+3),
                 (r*13+7), (r*17+11) all mod C_L; pl_namespace =
                 (src + tgt_doc_id) % 4 (kept only when 0). r%2 makes the
                 first two docs of every language hot targets (skew).
- {L}langlinks:  for each doc d of L × each other lang O:
                 (d, O, 'Doc <(d*11+5)%N>')  (space → B3 underscores)
                 + noise row with ll_lang='xx' (not in config → dropped)
- {L}redirect:   d%7==3 → (d, 0, title of same-lang ordinal (r*11+3)%C_L)

wikidata (global):
- wikidata_page: (d, 0, 'Q<d>') for d%3!=1  + non-Q noise
- wikidata_place_types: for d%4!=2 two rows (d, 'T<d%5>') and
  (d, 'T<(d*3+1)%5>') — feeds the D4/E7/F5 place-type→ont-level pick
  (types overlap non-injectively with PLACE_TYPE_LEVELS so the
  max-level + min-type tie-break is exercised)
- wikidata_geo_tags: earth+primary rows for d%10<7 with the pages_gen
  coordinate contract (8-dp decimals)  + moon / non-primary / (0,0) / out-of-bounds
  noise rows (all dropped by B4)
- wikidata_wb_items_per_site: (row, d, '<lang_d>wiki', 'Doc <d>')
"""

from __future__ import annotations

import gzip
import os

import pyarrow.parquet as pq

from .pages_gen import derive_geo


def _q(v: str) -> str:
    return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _render(table: str, rows: list[list], per_line: int = 500) -> str:
    out = []
    for ofs in range(0, len(rows), per_line):
        chunk = rows[ofs : ofs + per_line]
        tuples = ",".join("(" + ",".join(map(str, r)) + ")" for r in chunk)
        out.append(f"INSERT INTO `{table}` VALUES {tuples};\n")
    return "".join(out)


def dumps_dir_for(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return f"/tmp/wwr_dumps/{tag}"


def ensure_wikidumps(sf_dir: str) -> str:
    """Generate (once) the .sql.gz dump fixture tree for ``sf_dir``."""
    out = dumps_dir_for(sf_dir)
    if os.path.exists(os.path.join(out, "_COMPLETE")):
        return out
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )
    ids = docs.column("doc_id").to_numpy()
    langs = docs.column("lang").to_pylist()
    n = len(ids)
    by_lang: dict[str, list[int]] = {}
    for d, l in zip(ids, langs):
        by_lang.setdefault(l, []).append(int(d))
    lang_list = sorted(by_lang)

    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)

    def write(name: str, text: str) -> None:
        with gzip.open(os.path.join(tmp, name), "wt", encoding="utf-8") as f:
            f.write("-- synthetic dump fixture\n")
            f.write(text)

    for li, L in enumerate(lang_list):
        dl = by_lang[L]
        page = [[d, 0, _q(f"Doc_{d}"), _q("x")] for d in dl]
        page.append([900000, 1, _q("Talk:Noise'Page"), _q("x")])
        page.append([900001, 0, _q(""), _q("x")])
        write(f"{L}page.sql.gz", _render("page", page))
        lt_rows = [
            [t, 0, _q(f"Doc_{t}")]
            for t in range(n)
            if t % 13 != 0 and (t + li) % 11 != 0
        ]
        write(f"{L}linktarget.sql.gz", _render("linktarget", lt_rows))
        dl = sorted(dl)
        cl = len(dl)
        pl = []
        for r, d in enumerate(dl):
            ordinals = (
                (r * 3 + 1) % cl, (r * 5 + 2) % cl, r % 2,
                (r * 7 + 3) % cl, (r * 13 + 7) % cl, (r * 17 + 11) % cl,
            )
            for o in ordinals:
                t = dl[o]
                pl.append([d, (d + t) % 4, t])
        write(f"{L}pagelinks.sql.gz", _render("pagelinks", pl))
        ll = []
        for d in dl:
            tgt = (d * 11 + 5) % n
            for O in lang_list:
                if O != L:
                    ll.append([d, _q(O), _q(f"Doc {tgt}")])
            ll.append([d, _q("xx"), _q("Doc 0")])  # dropped by B9 filter
        write(f"{L}langlinks.sql.gz", _render("langlinks", ll))
        red = [
            [d, 0, _q(f"Doc_{dl[(r * 11 + 3) % cl]}")]
            for r, d in enumerate(dl)
            if d % 7 == 3
        ]
        write(f"{L}redirect.sql.gz", _render("redirect", red))

    wdp = [[int(d), 0, _q(f"Q{d}")] for d in ids if d % 3 != 1]
    wdp.append([900100, 0, _q("NotQ")])
    wdp.append([900101, 1, _q("Q900101")])
    write("wikidata_page.sql.gz", _render("page", wdp))

    pt = []
    for d in ids:
        if d % 4 != 2:
            pt.append([int(d), _q(f"T{d % 5}")])
            pt.append([int(d), _q(f"T{(d * 3 + 1) % 5}")])
    write("wikidata_place_types.sql.gz", _render("place_types", pt))

    lat, lon, has_geo = derive_geo(ids)
    geo = []
    gid = 1
    for d, la, lo, hg in zip(ids, lat, lon, has_geo):
        if hg:
            geo.append([gid, int(d), _q("earth"), 1, f"{la:.8f}", f"{lo:.8f}"])
            gid += 1
    # noise: moon, non-primary, (0,0), out-of-bounds
    geo.append([99001, 900200, _q("moon"), 1, "10.00000000", "10.00000000"])
    geo.append([99002, 900201, _q("earth"), 0, "10.00000000", "10.00000000"])
    geo.append([99003, 900202, _q("earth"), 1, "0.00000000", "0.00000000"])
    geo.append([99004, 900203, _q("earth"), 1, "95.00000000", "10.00000000"])
    write("wikidata_geo_tags.sql.gz", _render("geo_tags", geo))

    ips = [
        [i, int(d), _q(f"{l}wiki"), _q(f"Doc {d}")]
        for i, (d, l) in enumerate(zip(ids, langs))
    ]
    write("wikidata_wb_items_per_site.sql.gz", _render("wb_items_per_site", ips))

    open(os.path.join(tmp, "_COMPLETE"), "w").close()
    os.replace(tmp, out)
    return out
