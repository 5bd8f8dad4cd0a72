"""Distributed analytics operators the catalog did not yet cover:
ordered-window prefix aggregation (running totals) and sweep-line
interval-overlap counting (max concurrent sessions).

Both instantiate the same two-pass exact-prefix shape (the NTILE ranker
``queries.q_zorder_shards`` pioneered, generalized here from counts to
value sums):

1. per-KEY partial sums (combiner inside ``map_batches``) → ONE small
   grouped-sum shuffle → a BOUNDED driver pull (one row per distinct
   day / hour — calendar-bounded regardless of corpus size, documented
   per query) → exclusive scan → ``ray.put`` broadcast;
2. one range sort on the key via ``ops.runs.sorted_group_apply``; each
   block resolves its COMPLETE key groups with a vectorized in-block
   cumulative sum plus the broadcast offset. Exact at any parallelism
   (edge groups coalesce as usual), and raw rows shuffle exactly once.

Float policy: money moves as integer cents end-to-end (order-free sums;
CLAUDE.md e-integer rule); session deltas are ±1 int64.

Reference anchor: the reference's ordered TSV export + importance scan
(steps/output.sh) is the closest shape — a global ORDER BY with running
state — re-expressed Ray-Data-first instead of a single-process scan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset

from ..ops.runs import run_starts, sorted_group_apply
from ..ops.windows import sessionize
from ..stages.salted import merge_group_sums

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000


def _cents(col: pa.ChunkedArray) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(100.0))), pa.int64())


def _pull_merged(ds: Dataset, cols: list[str]) -> pa.Table:
    """Bounded driver pull of a merged grouped-sum Dataset: per-block
    column select + permissive concat (string keys arrive as
    string/large_string depending on the block's path through the merge
    sort — the round-5 dtype rule)."""
    import ray

    tbls = []
    for r in ds.to_arrow_refs():
        t = ray.get(r)
        if t.num_rows == 0:
            # empty blocks out of a union can arrive schema-less or with
            # stale presort columns (round-5 drift rule) — they carry no
            # data, skip rather than select
            continue
        tbls.append(t.select(cols))
    if not tbls:
        return pa.table({c: pa.array([], type=pa.int64()) for c in cols})
    return pa.concat_tables(tbls, promote_options="permissive")


def _exclusive_offsets(tbl: pa.Table, key: str, val: str):
    """Driver-side exclusive scan over a key-sorted grouped-sum table.

    BOUNDED PULL: callers pass tables with one row per distinct calendar
    day/hour — cardinality is time-span-bounded, not corpus-bounded.
    Returns (sorted_keys, exclusive_offsets, grand_total) as numpy."""
    t = tbl.sort_by(key)
    ks = t.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
    vs = t.column(val).to_numpy(zero_copy_only=False).astype(np.int64)
    csum = np.cumsum(vs)
    offs = np.concatenate(([0], csum[:-1]))
    total = int(csum[-1]) if len(csum) else 0
    return ks, offs, total


def q_running_revenue(sf_dir: str) -> Dataset:
    """Global ordered running total — ``SUM(cents) OVER (ORDER BY
    o_orderdate, o_orderkey)`` for every order, distributed.

    Plan: per-day cent sums (combiner partials, ONE grouped-sum
    shuffle) → bounded driver pull (≤ #distinct orderdates ≈ 2,400 for
    TPC-H's 7-year calendar at ANY scale factor) → exclusive scan
    broadcast → one range sort on the day key; each block computes the
    intra-day inclusive cumsum (lexsorted by orderkey) and adds the
    day's offset. int64 cents overflow only past ~9e16 cents ≈ $900T
    total revenue — quote the bound rather than guard it.
    """
    import ray

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_totalprice"],
    )

    def derive(t: pa.Table) -> pa.Table:
        day = pc.divide(
            pc.cast(t["o_orderdate"], pa.int64()),
            pa.scalar(US_PER_DAY, type=pa.int64()),
        )
        part = pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "day": day,
                "cents": _cents(t["o_totalprice"]),
            }
        )
        return part

    rows = orders.map_batches(derive, batch_format="pyarrow")

    def day_partials(t: pa.Table) -> pa.Table:
        g = pa.table({"day": t["day"], "cents": t["cents"]}).group_by(
            ["day"]
        ).aggregate([("cents", "sum")])
        return g.rename_columns(["day", "cents"])

    day_sums = merge_group_sums(
        rows.map_batches(day_partials, batch_format="pyarrow"),
        ["day"], ["cents"],
    )
    day_tbl = _pull_merged(day_sums, ["day", "cents"])
    days, offs, _ = _exclusive_offsets(day_tbl, "day", "cents")
    lut_ref = ray.put((days, offs))

    empty = pa.table(
        {
            "o_orderkey": pa.array([], type=pa.int64()),
            "running_cents": pa.array([], type=pa.int64()),
        }
    )

    def block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        ds_, offs_ = ray.get(lut_ref)
        day = t.column("day").to_numpy(zero_copy_only=False)
        okey = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, day))
        day, okey, cents = day[order], okey[order], cents[order]
        csum = np.cumsum(cents)
        starts = run_starts([day])
        first_idx = np.maximum.accumulate(
            np.where(starts, np.arange(len(day)), 0)
        )
        # inclusive cumsum restarted at each day run
        before_run = np.where(first_idx > 0, csum[first_idx - 1], 0)
        local = csum - before_run
        running = offs_[np.searchsorted(ds_, day)] + local
        return pa.table(
            {
                "o_orderkey": pa.array(okey),
                "running_cents": pa.array(running, type=pa.int64()),
            }
        )

    return sorted_group_apply(rows, ["day"], block)


SQL_RUNNING_REVENUE = """
SELECT o_orderkey,
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT)) OVER (
         ORDER BY o_orderdate, o_orderkey
         ROWS UNBOUNDED PRECEDING
       ) AS BIGINT) AS running_cents
FROM orders
"""


def q_session_concurrency(sf_dir: str) -> Dataset:
    """Sweep-line interval overlap: per calendar hour, the MAXIMUM number
    of simultaneously-open user sessions (30-min-gap sessionize, the
    event_sessions convention; a session is open on [start, end]
    inclusive).

    Plan: sessions (ops/windows.sessionize — one range sort) → ±1
    boundary rows (end shifted +1 µs so inclusive ends release AFTER the
    instant) → per-hour delta sums → bounded driver pull (≤ #calendar
    hours: 720 for the fixtures' 30-day stream, time-span-bounded at
    any corpus size) → exclusive scan gives each hour's carry-in
    concurrency → one range sort of boundaries on the hour key; each
    block computes intra-hour prefix maxima (ties resolved starts-first:
    sort (t, -delta), which makes the per-hour MAX order-independent) →
    hour max = carry_in + max(0, local prefix max). Spine hours with no
    boundaries emit carry_in directly from the driver-side spine (one
    row per calendar hour).
    """
    import ray

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    sess = sessionize(events).select_columns(["session_start", "session_end"])

    def boundaries(t: pa.Table) -> pa.Table:
        s = pc.cast(t["session_start"], pa.int64())
        e = pc.add(pc.cast(t["session_end"], pa.int64()), pa.scalar(1, type=pa.int64()))
        tus = pa.concat_arrays(
            [pc.cast(c, pa.int64()).combine_chunks() for c in (s, e)]
        )
        delta = pa.concat_arrays(
            [
                pa.array(np.ones(len(t), dtype=np.int64)),
                pa.array(-np.ones(len(t), dtype=np.int64)),
            ]
        )
        hour = pc.divide(tus, pa.scalar(US_PER_HOUR, type=pa.int64()))
        return pa.table({"tus": tus, "delta": delta, "hour": hour})

    b = sess.map_batches(boundaries, batch_format="pyarrow")

    def hour_partials(t: pa.Table) -> pa.Table:
        g = pa.table({"hour": t["hour"], "delta": t["delta"]}).group_by(
            ["hour"]
        ).aggregate([("delta", "sum")])
        return g.rename_columns(["hour", "delta"])

    hour_sums = merge_group_sums(
        b.map_batches(hour_partials, batch_format="pyarrow"),
        ["hour"], ["delta"],
    )
    hs_tbl = _pull_merged(hour_sums, ["hour", "delta"])
    hours, carry, _ = _exclusive_offsets(hs_tbl, "hour", "delta")
    lut_ref = ray.put((hours, carry))

    empty = pa.table(
        {
            "hour": pa.array([], type=pa.int64()),
            "max_concurrent": pa.array([], type=pa.int64()),
        }
    )

    def block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        hrs, car = ray.get(lut_ref)
        hour = t.column("hour").to_numpy(zero_copy_only=False)
        tus = t.column("tus").to_numpy(zero_copy_only=False)
        delta = t.column("delta").to_numpy(zero_copy_only=False)
        order = np.lexsort((-delta, tus, hour))
        hour, delta = hour[order], delta[order]
        csum = np.cumsum(delta)
        starts = run_starts([hour])
        first_idx = np.maximum.accumulate(
            np.where(starts, np.arange(len(hour)), 0)
        )
        before_run = np.where(first_idx > 0, csum[first_idx - 1], 0)
        local = csum - before_run
        # per-hour max of the local prefix (floored at 0 = the carry-in
        # instant before the first boundary of the hour)
        local_max = np.maximum.reduceat(local, np.flatnonzero(starts))
        local_max = np.maximum(local_max, 0)
        run_hours = hour[starts]
        carry_in = car[np.searchsorted(hrs, run_hours)]
        return pa.table(
            {
                "hour": pa.array(run_hours),
                "max_concurrent": pa.array(carry_in + local_max, type=pa.int64()),
            }
        )

    with_bounds = sorted_group_apply(b, ["hour"], block)

    # spine hours with no boundary events carry their offset concurrency;
    # the spine is calendar-bounded (one row per hour of stream span)
    spine = (
        np.arange(hours[0], hours[-1] + 1, dtype=np.int64)
        if len(hours) else np.array([], dtype=np.int64)
    )
    missing = spine[~np.isin(spine, hours)]
    if len(missing):
        # concurrency throughout a boundary-free hour = cumulative deltas
        # of all prior hours = the exclusive offset of the NEXT boundary
        # hour (pos == len cannot happen: missing hours lie strictly
        # inside [hours[0], hours[-1]])
        pos = np.searchsorted(hours, missing)
        carry_missing = carry[pos]
        miss_tbl = pa.table(
            {
                "hour": pa.array(missing),
                "max_concurrent": pa.array(carry_missing, type=pa.int64()),
            }
        )
        with_bounds = with_bounds.union(rd.from_arrow(miss_tbl))
    return with_bounds


SQL_SESSION_CONCURRENCY = """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
              OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTES THEN 1 ELSE 0 END
           AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
         ) AS session_no
  FROM g
),
sess AS (
  SELECT user_id, session_no,
         epoch_us(MIN(ts)) AS s_us, epoch_us(MAX(ts)) + 1 AS e_us
  FROM s GROUP BY 1, 2
),
b AS (
  SELECT s_us AS tus, CAST(1 AS BIGINT) AS delta FROM sess
  UNION ALL
  SELECT e_us, CAST(-1 AS BIGINT) FROM sess
),
r AS (
  SELECT tus // 3600000000 AS hour, delta,
         SUM(delta) OVER (
           ORDER BY tus, delta DESC ROWS UNBOUNDED PRECEDING
         ) AS run
  FROM b
),
hb AS (
  SELECT hour, CAST(MAX(run) AS BIGINT) AS bmax,
         CAST(SUM(delta) AS BIGINT) AS dsum
  FROM r GROUP BY hour
),
spine AS (
  SELECT UNNEST(generate_series(
    (SELECT MIN(hour) FROM hb), (SELECT MAX(hour) FROM hb))) AS hour
),
c AS (
  SELECT spine.hour, hb.bmax,
         CAST(COALESCE(SUM(hb.dsum) OVER (
           ORDER BY spine.hour ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING), 0) AS BIGINT)
           AS carry_in
  FROM spine LEFT JOIN hb ON spine.hour = hb.hour
)
SELECT hour,
       CASE WHEN bmax IS NULL THEN carry_in
            WHEN carry_in > bmax THEN carry_in ELSE bmax END
         AS max_concurrent
FROM c
"""


# ---------------------------------------------------------------------------
# Embedding second-moment matrix + PCA power iteration
#
# The covariance/Gram reduction is the distributed stage (outer-product
# partials, dim²-bounded output); the d×d eigen-iteration is
# driver-bounded BY DEFINITION (d = embedding dim), mirroring the
# kmeans_2iter bounded-fit pattern. All arithmetic is fixed-point
# integer on BOTH sides (e10 products, e3 iterate, shared exact
# floor-division identity), so the oracle parity is bitwise at any
# parallelism.

EMB_DIM = 64
_COV_CHUNK = 256  # rows per outer-product slab (keeps the b×d² temp <17 MB)


def _emb_matrix(col: pa.ChunkedArray) -> np.ndarray:
    from ..ops.ann import _as_matrix

    return _as_matrix(col)


def _cov_cells(sf_dir: str) -> Dataset:
    """Merged (di, dj, n, sx_e10, sy_e10, sxy_e10) sufficient statistics
    for the upper triangle (di ≤ dj, 1-based dims, matching DuckDB's
    generate_subscripts). Products are rounded to e10 int64 PER ELEMENT
    before summing (order-free; the round-5 comparison rule); |x|<1 keeps
    x·x·1e10 < 2⁵³ so the double is exact pre-round."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    iu, ju = np.triu_indices(EMB_DIM)

    def partials(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t["embedding"])
        n = len(m)
        sxy = np.zeros((EMB_DIM, EMB_DIM), dtype=np.int64)
        for s in range(0, n, _COV_CHUNK):
            sl = m[s:s + _COV_CHUNK]
            prod = np.einsum("bi,bj->bij", sl, sl)
            sxy += np.round(prod * 1e10).astype(np.int64).sum(axis=0)
        sx = np.round(m * 1e10).astype(np.int64).sum(axis=0)
        return pa.table(
            {
                "di": pa.array(iu + 1, type=pa.int64()),
                "dj": pa.array(ju + 1, type=pa.int64()),
                "n": pa.array(np.full(len(iu), n, dtype=np.int64)),
                "sx_e10": pa.array(sx[iu]),
                "sy_e10": pa.array(sx[ju]),
                "sxy_e10": pa.array(sxy[iu, ju]),
            }
        )

    parts = emb.map_batches(partials, batch_format="pyarrow")
    return merge_group_sums(
        parts, ["di", "dj"], ["n", "sx_e10", "sy_e10", "sxy_e10"]
    )


def q_embedding_covariance(sf_dir: str) -> Dataset:
    """d(d+1)/2 covariance sufficient-statistic cells for the embedding
    table: each batch contributes chunked outer-product slabs; only the
    2,080 integer cells shuffle (ONE grouped-sum merge) — the vectors
    never leave their blocks. Covariance itself is one downstream
    float expression over the exact integers (sufficient-statistics
    convention, as morans_i_stats / event_value_correlation)."""
    return _cov_cells(sf_dir)


SQL_EMBEDDING_COVARIANCE = """
WITH e AS (
  SELECT vec_id, CAST(i AS BIGINT) AS i, CAST(x AS DOUBLE) AS x FROM (
    SELECT vec_id, UNNEST(embedding) AS x,
           generate_subscripts(embedding, 1) AS i
    FROM embeddings)
)
SELECT a.i AS di, b.i AS dj, COUNT(*) AS n,
       CAST(SUM(CAST(round_even(a.x * 1e10, 0) AS BIGINT)) AS BIGINT) AS sx_e10,
       CAST(SUM(CAST(round_even(b.x * 1e10, 0) AS BIGINT)) AS BIGINT) AS sy_e10,
       CAST(SUM(CAST(round_even(a.x * b.x * 1e10, 0) AS BIGINT)) AS BIGINT) AS sxy_e10
FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY 1, 2
"""


def _floor_div(a: int, m: int) -> int:
    """Exact floored division via the shared identity
    ``(a - ((a % m + m) % m)) / m`` — written this way because DuckDB's
    ``//``/``%`` truncate toward zero on negatives while Python floors
    (round-5 rule); the identity is branch-free and exact in both."""
    return (a - ((a % m + m) % m)) // m


def _power_iterate(S: np.ndarray, iters: int = 2) -> list[int]:
    """Fixed-point power iteration on the symmetric int64 Gram matrix.

    v₀ = 1000·1; each round: w = S·v (exact Python-int matvec — w·1000
    can exceed int64, so this 64-vector loop runs on driver big ints),
    v ← floor(w·1000 / max|w|) ∈ [-1000, 1000]. Deterministic, integer,
    and replicated verbatim by the SQL oracle. int64-boundedness of the
    DISTRIBUTED stages is unaffected (this is a d-sized driver step);
    S entries grow ~n·1e9, documented bound n < 1.4e5 vectors for the
    all-int64 SQL twin — production would rescale S by 1/n first."""
    d = S.shape[0]
    v = [1000] * d
    Sl = [[int(x) for x in row] for row in S]
    for _ in range(iters):
        w = [sum(Sl[j][i] * v[i] for i in range(d)) for j in range(d)]
        mx = max(abs(x) for x in w)
        if mx == 0:
            return v
        v = [_floor_div(x * 1000, mx) for x in w]
    return v


def q_pca_power_iter(sf_dir: str) -> Dataset:
    """Dominant component of the uncentered second-moment matrix by two
    fixed-point power-iteration rounds, then the DISTRIBUTED projection
    of every vector onto it: proj_fx = Σᵢ round(xᵢ·1e5)·vᵢ (per-term
    int64 products ≤5e7, d-sum ≤3.2e9 — order-free exact).

    Distribution: Gram suff-stats via _cov_cells (one grouped-sum
    merge), d²-bounded driver pull, 64-int broadcast, stateless
    projection map. The vectors shuffle zero times."""
    import ray

    cells = _pull_merged(
        _cov_cells(sf_dir), ["di", "dj", "n", "sx_e10", "sy_e10", "sxy_e10"]
    )
    di = cells.column("di").to_numpy(zero_copy_only=False).astype(np.int64)
    dj = cells.column("dj").to_numpy(zero_copy_only=False).astype(np.int64)
    sxy = cells.column("sxy_e10").to_numpy(zero_copy_only=False)
    S = np.zeros((EMB_DIM, EMB_DIM), dtype=np.int64)
    S[di - 1, dj - 1] = sxy
    S[dj - 1, di - 1] = sxy
    v = np.asarray(_power_iterate(S), dtype=np.int64)
    v_ref = ray.put(v)

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def project(t: pa.Table) -> pa.Table:
        vv = ray.get(v_ref)
        m = _emb_matrix(t["embedding"])
        xf = np.round(m * 1e5).astype(np.int64)
        proj = (xf * vv[None, :]).sum(axis=1)
        return pa.table(
            {"vec_id": t["vec_id"], "proj_fx": pa.array(proj, type=pa.int64())}
        )

    return emb.map_batches(project, batch_format="pyarrow")


SQL_PCA_POWER_ITER = """
WITH e AS (
  SELECT vec_id, CAST(i AS BIGINT) AS i, CAST(x AS DOUBLE) AS x FROM (
    SELECT vec_id, UNNEST(embedding) AS x,
           generate_subscripts(embedding, 1) AS i
    FROM embeddings)
),
cells AS (
  SELECT a.i AS di, b.i AS dj,
         SUM(CAST(round_even(a.x * b.x * 1e10, 0) AS BIGINT)) AS sxy
  FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY 1, 2
),
s AS (
  SELECT di AS j, dj AS i, sxy FROM cells
  UNION ALL
  SELECT dj AS j, di AS i, sxy FROM cells WHERE di < dj
),
w1 AS (
  SELECT j, SUM(CAST(sxy AS HUGEINT) * 1000) AS w FROM s GROUP BY j
),
m1 AS (SELECT MAX(ABS(w)) AS mx FROM w1),
v1 AS (
  SELECT j AS i,
         CAST((w * 1000 - ((w * 1000 % mx + mx) % mx)) // mx AS BIGINT) AS v
  FROM w1, m1
),
w2 AS (
  SELECT s.j, SUM(s.sxy * v1.v) AS w
  FROM s JOIN v1 ON s.i = v1.i GROUP BY s.j
),
m2 AS (SELECT MAX(ABS(w)) AS mx FROM w2),
v2 AS (
  SELECT j AS i,
         CAST((w * 1000 - ((w * 1000 % mx + mx) % mx)) // mx AS BIGINT) AS v
  FROM w2, m2
)
SELECT e.vec_id,
       CAST(SUM(CAST(round_even(e.x * 1e5, 0) AS BIGINT) * v2.v) AS BIGINT) AS proj_fx
FROM e JOIN v2 ON e.i = v2.i
GROUP BY e.vec_id
"""


# ---------------------------------------------------------------------------
# Gap-fill + forward-fill resampling and information-theory statistics


def q_user_hourly_ffill(sf_dir: str) -> Dataset:
    """Per-user hourly resample with forward fill: for every hour from a
    user's first to last event hour, the value of their most recent
    event (hour close; ties within an hour broken by (ts, event_id) —
    the round-5 deterministic-tiebreaker rule, mirrored in the SQL
    window).

    Machinery this adds: SPINE GENERATION + CROSS-GAP CARRY inside the
    sorted-run idiom — each block vectorizes across ALL its complete
    users (no per-user Python): one lexsort → per-(user,hour) last event
    → per-user hour spans via reduceat → concatenated aranges build the
    spine → ONE packed-key searchsorted ((user_rank << 21) | hour; epoch
    hours < 2²⁰ through year 2089, asserted) resolves every spine row's
    carry index. Output is span-bounded (≤ users × stream hours); values
    pass through untouched (no float arithmetic → hash-safe)."""
    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"],
    )

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "hour": pa.array([], type=pa.int64()),
            "last_value": pa.array([], type=pa.float64()),
        }
    )

    def block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        tsv = t.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        val = t.column("value").to_numpy(zero_copy_only=False)
        hour = tsv // US_PER_HOUR
        assert hour.max() < (1 << 20), "packed key exhausted (year 2089+)"
        order = np.lexsort((eid, tsv, hour, uid))
        uid, hour, val = uid[order], hour[order], val[order]
        # last event of each (user, hour) run
        uh_starts = run_starts([uid, hour])
        last_idx = np.append(np.flatnonzero(uh_starts)[1:] - 1, len(uid) - 1)
        r_uid, r_hour, r_val = uid[last_idx], hour[last_idx], val[last_idx]
        # per-user spans over the reduced rows
        u_starts = run_starts([r_uid])
        seg = np.flatnonzero(u_starts)
        seg_end = np.append(seg[1:], len(r_uid)) - 1
        h0, h1 = r_hour[seg], r_hour[seg_end]
        span = (h1 - h0 + 1).astype(np.int64)
        # concatenated aranges: global arange minus per-user offsets
        total = int(span.sum())
        starts_g = np.concatenate(([0], np.cumsum(span)[:-1]))
        urep = np.repeat(np.arange(len(seg)), span)
        sh = np.arange(total) - starts_g[urep] + h0[urep]
        # packed-key carry lookup (reduced rows are sorted by (user, hour))
        urank = np.cumsum(u_starts) - 1
        ev_key = (urank << 21) | r_hour
        sp_key = (urep.astype(np.int64) << 21) | sh
        carry = np.searchsorted(ev_key, sp_key, side="right") - 1
        out_uid = r_uid[seg][urep]
        return pa.table(
            {
                "user_id": pa.array(out_uid),
                "hour": pa.array(sh),
                "last_value": pa.array(r_val[carry]),
            }
        )

    return sorted_group_apply(events, ["user_id"], block)


SQL_USER_HOURLY_FFILL = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 3600000000 AS hour, value, ts, event_id
  FROM events
),
lastv AS (
  SELECT user_id, hour, value FROM (
    SELECT user_id, hour, value,
           ROW_NUMBER() OVER (
             PARTITION BY user_id, hour
             ORDER BY ts DESC, event_id DESC) AS rn
    FROM ev) WHERE rn = 1
),
span AS (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM ev GROUP BY 1),
spine AS (
  SELECT user_id, UNNEST(generate_series(h0, h1)) AS hour FROM span
)
SELECT s.user_id, CAST(s.hour AS BIGINT) AS hour,
       LAST_VALUE(l.value IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.hour
         ROWS UNBOUNDED PRECEDING) AS last_value
FROM spine s LEFT JOIN lastv l
  ON s.user_id = l.user_id AND s.hour = l.hour
"""


def q_event_hour_mutual_info(sf_dir: str) -> Dataset:
    """Mutual information between event type and hour-of-day, shipped as
    the per-cell sufficient-statistic table (event_type, hod, n,
    term_e10) with term = (n/N)·ln(n·N / (n_x·n_y)) rounded e10 — the
    counting is the distributed stage (cell partials, one grouped-sum
    merge, output category×24-bounded); marginals derive from the pulled
    cell table (≤ |types|·24 rows BY DEFINITION). n·N must stay exact in
    double: bound n·N < 2⁵³ (9e15 — beyond any realistic event count
    squared at 1e7×1e8; documented, not guarded). LN/division are in the
    bitwise-parity family over identical exact integers."""
    import ray

    from ..stages.salted import partial_count

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        hod = np.mod(
            pc.divide(us, pa.scalar(US_PER_HOUR, type=pa.int64())).to_numpy(
                zero_copy_only=False
            ),
            24,
        )
        return pa.table({"event_type": t["event_type"], "hod": pa.array(hod)})

    cells_ds = merge_group_sums(
        partial_count(
            events.map_batches(derive, batch_format="pyarrow"),
            ["event_type", "hod"], out="n",
        ),
        ["event_type", "hod"], ["n"],
    )
    cells = _pull_merged(cells_ds, ["event_type", "hod", "n"])
    et = cells.column("event_type").to_pylist()
    hod = cells.column("hod").to_numpy(zero_copy_only=False)
    n = cells.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    big_n = int(n.sum())
    import pandas as pd

    df = pd.DataFrame({"et": et, "hod": hod, "n": n})
    nx = df.groupby("et").n.transform("sum").to_numpy()
    ny = df.groupby("hod").n.transform("sum").to_numpy()
    a = n.astype(np.float64) / np.float64(big_n)
    arg = (n * big_n).astype(np.float64) / (nx * ny).astype(np.float64)
    term = np.round((a * np.log(arg)) * 1e10).astype(np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(et),
                "hod": pa.array(hod, type=pa.int64()),
                "n": pa.array(n),
                "term_e10": pa.array(term),
            }
        )
    )


SQL_EVENT_HOUR_MUTUAL_INFO = """
WITH c AS (
  SELECT event_type,
         CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hod,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type, hod, n,
         SUM(n) OVER (PARTITION BY event_type) AS nx,
         SUM(n) OVER (PARTITION BY hod) AS ny,
         SUM(n) OVER () AS nn
  FROM c
)
SELECT event_type, hod, CAST(n AS BIGINT) AS n,
       CAST(ROUND(((CAST(n AS DOUBLE) / CAST(nn AS DOUBLE))
              * LN(CAST(n * nn AS DOUBLE) / CAST(nx * ny AS DOUBLE)))
             * 1e10) AS BIGINT) AS term_e10
FROM m
"""


# ---------------------------------------------------------------------------
# Grouped OLS regression, snapshot diff, and categorical set overlap

SEGMENT_BROADCAST_LIMIT = 20_000_000
TPCH_DAY0 = 9131  # days 1970-01-01 → 1995-01-01, the TPC-H calendar start


def q_segment_price_trend(
    sf_dir: str, broadcast_limit: int | None = None
) -> Dataset:
    """Per-market-segment OLS slope of order price (cents) against order
    day — grouped linear regression via exact integer sufficient
    statistics (n, Σx, Σy, Σxy, Σx², x rebased to days-since-1995 so the
    int64 partial bound is ~1.5e7 rows/segment·batch; the merged sums
    become driver big-ints before the single slope division, so the
    final arithmetic is exact at any scale).

    Segment attach follows the gated-broadcast convention
    (part_brand_revenue, relational.py:1201): customer (custkey →
    segment) broadcasts via index_in under the 20M-row footer gate, hash
    join above."""
    import pyarrow.parquet as pq_
    import ray

    if broadcast_limit is None:
        broadcast_limit = SEGMENT_BROADCAST_LIMIT

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def derive(t: pa.Table) -> pa.Table:
        day = pc.subtract(
            pc.divide(
                pc.cast(t["o_orderdate"], pa.int64()),
                pa.scalar(US_PER_DAY, type=pa.int64()),
            ),
            pa.scalar(TPCH_DAY0, type=pa.int64()),
        )
        return pa.table(
            {
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "x": day,
                "y": _cents(t["o_totalprice"]),
            }
        )

    keyed = orders.map_batches(derive, batch_format="pyarrow")

    n_cust = pq_.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    if n_cust <= broadcast_limit:
        cust = pq_.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        )
        ref = ray.put(
            (
                pc.cast(cust["c_custkey"], pa.int64()).combine_chunks(),
                pc.cast(cust["c_mktsegment"], pa.string()).combine_chunks(),
            )
        )

        def attach(t: pa.Table) -> pa.Table:
            keys, segs = ray.get(ref)
            pos = pc.index_in(t["o_custkey"], value_set=keys)
            return t.append_column("c_mktsegment", segs.take(pos))

        seg_rows = keyed.map_batches(attach, batch_format="pyarrow")
    else:  # >20M-customer plan: custkey hash join (plan-equality pytest)
        from ..stages.salted import join_partitions

        cust_ds = rd.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        ).map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("c_custkey"),
                "c_custkey",
                pc.cast(t["c_custkey"], pa.int64()),
            ),
            batch_format="pyarrow",
        )
        n_orders = pq_.read_metadata(f"{sf_dir}/orders.parquet").num_rows
        seg_rows = keyed.join(
            cust_ds, join_type="inner",
            num_partitions=join_partitions(n_orders),
            on=("o_custkey",), right_on=("c_custkey",),
        )

    def partials(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        g = pa.table(
            {
                "c_mktsegment": t["c_mktsegment"],
                "n": pa.array(np.ones(len(t), dtype=np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxy": pa.array(x * y),
                "sxx": pa.array(x * x),
            }
        ).group_by(["c_mktsegment"]).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxy", "sum"), ("sxx", "sum")]
        )
        return g.rename_columns(["c_mktsegment", "n", "sx", "sy", "sxy", "sxx"])

    sums = merge_group_sums(
        seg_rows.map_batches(partials, batch_format="pyarrow"),
        ["c_mktsegment"], ["n", "sx", "sy", "sxy", "sxx"],
    )
    import ray as _ray

    t = _pull_merged(sums, ["c_mktsegment", "n", "sx", "sy", "sxy", "sxx"])
    segs = t.column("c_mktsegment").to_pylist()
    slope = []
    for i in range(len(t)):
        n = int(t.column("n")[i].as_py())
        sx, sy = int(t.column("sx")[i].as_py()), int(t.column("sy")[i].as_py())
        sxy, sxx = int(t.column("sxy")[i].as_py()), int(t.column("sxx")[i].as_py())
        num = n * sxy - sx * sy  # exact big ints
        den = n * sxx - sx * sx
        slope.append(int(round((float(num) / float(den)) * 1e10)))
    return rd.from_arrow(
        pa.table(
            {
                "c_mktsegment": pa.array(segs, type=pa.string()),
                "n": pa.array(t.column("n").to_numpy(zero_copy_only=False)),
                "slope_e10": pa.array(slope, type=pa.int64()),
            }
        )
    )


SQL_SEGMENT_PRICE_TREND = """
WITH oc AS (
  SELECT c.c_mktsegment,
         epoch_us(o.o_orderdate) // 86400000000 - 9131 AS x,
         CAST(ROUND(o.o_totalprice * 100.0, 0) AS BIGINT) AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
s AS (
  SELECT c_mktsegment, COUNT(*) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx
  FROM oc GROUP BY 1
)
SELECT c_mktsegment, CAST(n AS BIGINT) AS n,
       CAST(ROUND((CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE)) * 1e10)
            AS BIGINT) AS slope_e10
FROM s
"""


def q_snapshot_orders_diff(sf_dir: str) -> Dataset:
    """SCD-style snapshot reconciliation: classify every order key as
    same / changed / removed / added between the stored snapshot and a
    deterministic closed-form "recrawl" (house augmentation convention,
    tile_dup_stats/_augmented_docs): keys ≡0 (mod 7) deleted, ≡1 price
    +1000 cents, ≡2 re-published at key+10,000,000 with price +5000.

    Join-free: both snapshots union with a side tag, then ONE range sort
    on the key (sorted_group_apply) classifies each complete key run —
    the full-outer-join shape without the hash join's sparse-side
    schema hazards (round-4 rule)."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def old_side(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(t["o_orderkey"], pa.int64()),
                "c": _cents(t["o_totalprice"]),
                "side": pa.array(np.zeros(len(t), dtype=np.int64)),
            }
        )

    def new_side(t: pa.Table) -> pa.Table:
        k = pc.cast(t["o_orderkey"], pa.int64()).to_numpy(zero_copy_only=False)
        c = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        mod = k % 7
        keep = mod != 0
        kk, cc = k[keep], c[keep]
        cc = np.where(kk % 7 == 1, cc + 1000, cc)
        added = k[mod == 2]
        out_k = np.concatenate([kk, added + 10_000_000])
        out_c = np.concatenate([cc, c[mod == 2] + 5000])
        return pa.table(
            {
                "k": pa.array(out_k),
                "c": pa.array(out_c),
                "side": pa.array(np.ones(len(out_k), dtype=np.int64)),
            }
        )

    both = orders.map_batches(old_side, batch_format="pyarrow").union(
        orders.map_batches(new_side, batch_format="pyarrow")
    )

    empty = pa.table(
        {
            "o_orderkey": pa.array([], type=pa.int64()),
            "change": pa.array([], type=pa.string()),
            "old_cents": pa.array([], type=pa.int64()),
            "new_cents": pa.array([], type=pa.int64()),
        }
    )

    def block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        k = t.column("k").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        side = t.column("side").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, k))
        k, c, side = k[order], c[order], side[order]
        starts = run_starts([k])
        first = np.flatnonzero(starts)
        last = np.append(first[1:] - 1, len(k) - 1)
        has_old = side[first] == 0
        has_new = side[last] == 1
        old_c = np.where(has_old, c[first], -1)
        new_c = np.where(has_new, c[last], -1)
        label = np.where(
            ~has_new, "removed",
            np.where(~has_old, "added",
                     np.where(old_c != new_c, "changed", "same")),
        )
        return pa.table(
            {
                "o_orderkey": pa.array(k[first]),
                "change": pa.array(label, type=pa.string()),
                "old_cents": pa.array(old_c, type=pa.int64()),
                "new_cents": pa.array(new_c, type=pa.int64()),
            }
        )

    return sorted_group_apply(both, ["k"], block)


SQL_SNAPSHOT_ORDERS_DIFF = """
WITH old AS (
  SELECT o_orderkey AS k,
         CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT) AS c
  FROM orders
),
new AS (
  SELECT k, CASE WHEN k % 7 = 1 THEN c + 1000 ELSE c END AS c
  FROM old WHERE k % 7 <> 0
  UNION ALL
  SELECT k + 10000000, c + 5000 FROM old WHERE k % 7 = 2
)
SELECT COALESCE(o.k, n.k) AS o_orderkey,
       CASE WHEN n.k IS NULL THEN 'removed'
            WHEN o.k IS NULL THEN 'added'
            WHEN o.c <> n.c THEN 'changed' ELSE 'same' END AS change,
       COALESCE(o.c, -1) AS old_cents,
       COALESCE(n.c, -1) AS new_cents
FROM old o FULL OUTER JOIN new n ON o.k = n.k
"""


def q_event_type_user_overlap(sf_dir: str) -> Dataset:
    """Pairwise user-set Jaccard between event types (co-occurring pairs
    only): distinct (user, type) → type-index broadcast (the type
    vocabulary is category-bounded BY DEFINITION — the high-cardinality
    fallback is the pairwise self-join counted per pair) → per-user
    bitmask (one grouped-sum merge; each bit appears once after the
    distinct) → mask histogram (≤2^|types| rows) → driver combinatorics
    on the bounded mask table. Raw events shuffle zero times; users
    shuffle once as (user, bit) ints."""
    import ray

    from ..stages.salted import partial_count

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    distinct = merge_group_sums(
        partial_count(events, ["user_id", "event_type"], out="n"),
        ["user_id", "event_type"], ["n"],
    ).materialize()  # consumed twice (type vocab + bitmasks)
    # bounded driver pull: the distinct types (category column), derived
    # from the already-distinct pairs — no second events scan
    types = sorted(
        set(
            _pull_merged(
                merge_group_sums(
                    partial_count(distinct, ["event_type"], out="n"),
                    ["event_type"], ["n"],
                ),
                ["event_type"],
            ).column("event_type").to_pylist()
        )
    )
    tmap_ref = ray.put(pa.array(types, type=pa.string()))

    def to_bits(t: pa.Table) -> pa.Table:
        vocab = ray.get(tmap_ref)
        pos = pc.index_in(t["event_type"], value_set=vocab).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "user_id": t["user_id"],
                "bit": pa.array(np.int64(1) << pos.astype(np.int64)),
            }
        )

    masks = merge_group_sums(
        distinct.map_batches(to_bits, batch_format="pyarrow"),
        ["user_id"], ["bit"],
    )
    hist = _pull_merged(
        merge_group_sums(
            partial_count(masks, ["bit"], out="n_users"), ["bit"], ["n_users"]
        ),
        ["bit", "n_users"],
    )
    mv = hist.column("bit").to_numpy(zero_copy_only=False)
    nv = hist.column("n_users").to_numpy(zero_copy_only=False)
    rows = []
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            bi, bj = 1 << i, 1 << j
            inter = int(nv[(mv & bi > 0) & (mv & bj > 0)].sum())
            if inter == 0:
                continue
            either = int(nv[(mv & bi > 0) | (mv & bj > 0)].sum())
            jac = int(np.round((inter / either) * 1e10))
            rows.append((types[i], types[j], inter, either, jac))
    return rd.from_arrow(
        pa.table(
            {
                "type_a": pa.array([r[0] for r in rows], type=pa.string()),
                "type_b": pa.array([r[1] for r in rows], type=pa.string()),
                "n_common": pa.array([r[2] for r in rows], type=pa.int64()),
                "n_either": pa.array([r[3] for r in rows], type=pa.int64()),
                "jac_e10": pa.array([r[4] for r in rows], type=pa.int64()),
            }
        )
    )


SQL_EVENT_TYPE_USER_OVERLAP = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
tc AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1),
pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb, COUNT(*) AS n_common
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT ta AS type_a, tb AS type_b,
       CAST(n_common AS BIGINT) AS n_common,
       CAST(x.n + y.n - n_common AS BIGINT) AS n_either,
       CAST(ROUND((CAST(n_common AS DOUBLE)
                   / CAST(x.n + y.n - n_common AS DOUBLE)) * 1e10)
            AS BIGINT) AS jac_e10
FROM pairs JOIN tc x ON ta = x.event_type JOIN tc y ON tb = y.event_type
"""


# ---------------------------------------------------------------------------
# Sliding-window distinct, moment-based outliers, global percent rank


def q_sliding_distinct_users(sf_dir: str) -> Dataset:
    """Per hour, the count of DISTINCT users active in the trailing
    3-hour window [h-2, h]. Exact sliding-window distinct without
    re-scanning raw events per window: distinct (hour, user) pairs →
    ×3 window fan-out → second distinct (a user active in several
    source hours of one window collapses) → per-window count. Movement
    is (hour, user) int pairs — never raw events; fan-out factor = the
    window span (documented: a w-hour window ships w rows per active
    user-hour)."""
    from ..stages.salted import partial_count

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def derive_fanout(t: pa.Table) -> pa.Table:
        # in-batch dedupe of (hour, user) BEFORE the ×3 fan-out — saves
        # the dedicated first distinct merge (3 shuffles → 2; global
        # dedupe still happens at the (window, user) distinct below)
        us = pc.cast(t["ts"], pa.int64())
        hour = pc.divide(
            us, pa.scalar(US_PER_HOUR, type=pa.int64())
        ).to_numpy(zero_copy_only=False)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        assert u.max(initial=0) < (1 << 21), "pack key exhausted (use 2 cols)"
        key = np.unique((hour.astype(np.int64) << 21) | u.astype(np.int64))
        h = key >> 21
        uu = key & ((1 << 21) - 1)
        reps = np.repeat(np.arange(len(h)), 3)
        off = np.tile(np.arange(3, dtype=np.int64), len(h))
        return pa.table(
            {"hour": pa.array(h[reps] + off), "user_id": pa.array(uu[reps])}
        )

    win = merge_group_sums(
        partial_count(
            events.map_batches(derive_fanout, batch_format="pyarrow"),
            ["hour", "user_id"], out="n",
        ),
        ["hour", "user_id"], ["n"],
    )
    return merge_group_sums(
        partial_count(win, ["hour"], out="n_users"), ["hour"], ["n_users"]
    )


SQL_SLIDING_DISTINCT_USERS = """
WITH hu AS (
  SELECT DISTINCT epoch_us(ts) // 3600000000 AS h, user_id FROM events
),
w AS (
  SELECT DISTINCT h + i AS hour, user_id
  FROM hu, (SELECT UNNEST([0, 1, 2]) AS i)
)
SELECT CAST(hour AS BIGINT) AS hour, COUNT(*) AS n_users
FROM w GROUP BY 1
"""


def q_acctbal_z_outliers(sf_dir: str) -> Dataset:
    """Per-nation z-score outliers on customer balances (|z| > 1.5 —
    balances are ~uniform, max |z| = sqrt(3), so a 2-sigma fence is
    vacuous BY CONSTRUCTION; 1.5 sigma exercises both tails):
    exact integer moments (n, Σcents, Σcents²) per nation through ONE
    grouped-sum merge → nation-bounded driver pull → population σ from
    big-int moments (one float sequence, identical in SQL) → broadcast →
    stateless filter with the |z| test done on e10 INTEGERS (the round-5
    comparison rule — float threshold ties cannot flip). Σcents² int64
    partial bound ≈ 9e6 rows/nation·batch documented (SQL side is
    HUGEINT-exact)."""
    import ray

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )

    def derive(t: pa.Table) -> pa.Table:
        c = _cents(t["c_acctbal"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_nationkey": pc.cast(t["c_nationkey"], pa.int64()),
                "cents": pa.array(c),
            }
        )

    rows = cust.map_batches(derive, batch_format="pyarrow")

    def moment_partials(t: pa.Table) -> pa.Table:
        c = t.column("cents").to_numpy(zero_copy_only=False)
        g = pa.table(
            {
                "c_nationkey": t["c_nationkey"],
                "n": pa.array(np.ones(len(t), dtype=np.int64)),
                "s": pa.array(c),
                "sq": pa.array(c * c),
            }
        ).group_by(["c_nationkey"]).aggregate(
            [("n", "sum"), ("s", "sum"), ("sq", "sum")]
        )
        return g.rename_columns(["c_nationkey", "n", "s", "sq"])

    mom = _pull_merged(
        merge_group_sums(
            rows.map_batches(moment_partials, batch_format="pyarrow"),
            ["c_nationkey"], ["n", "s", "sq"],
        ),
        ["c_nationkey", "n", "s", "sq"],
    )
    nk = mom.column("c_nationkey").to_numpy(zero_copy_only=False)
    mu, sig = {}, {}
    for i in range(len(mom)):
        n = int(mom.column("n")[i].as_py())
        s = int(mom.column("s")[i].as_py())
        sq = int(mom.column("sq")[i].as_py())
        m = float(s) / float(n)
        var = float(n * sq - s * s) / float(n * n)
        mu[int(nk[i])] = m
        sig[int(nk[i])] = float(np.sqrt(var))
    keys = np.array(sorted(mu), dtype=np.int64)
    mus = np.array([mu[k] for k in keys])
    sigs = np.array([sig[k] for k in keys])
    ref = ray.put((keys, mus, sigs))

    def flag(t: pa.Table) -> pa.Table:
        ks, m_, s_ = ray.get(ref)
        nat = t.column("c_nationkey").to_numpy(zero_copy_only=False)
        c = t.column("cents").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ks, nat)
        z = (c.astype(np.float64) - m_[pos]) / s_[pos]
        z_e10 = np.round(z * 1e10).astype(np.int64)
        keep = np.abs(z_e10) > 15 * 10**9
        return pa.table(
            {
                "c_custkey": pa.array(
                    t.column("c_custkey").to_numpy(zero_copy_only=False)[keep]
                ),
                "c_nationkey": pa.array(nat[keep]),
                "z_e10": pa.array(z_e10[keep]),
            }
        )

    return rows.map_batches(flag, batch_format="pyarrow")


SQL_ACCTBAL_Z_OUTLIERS = """
WITH c AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
         CAST(ROUND(c_acctbal * 100.0, 0) AS BIGINT) AS cents
  FROM customer
),
m AS (
  SELECT c_nationkey, COUNT(*) AS n,
         SUM(CAST(cents AS HUGEINT)) AS s,
         SUM(CAST(cents AS HUGEINT) * cents) AS sq
  FROM c GROUP BY 1
),
p AS (
  SELECT c_nationkey,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         SQRT(CAST(n * sq - s * s AS DOUBLE)
              / CAST(n * n AS DOUBLE)) AS sigma
  FROM m
),
z AS (
  SELECT c.c_custkey, c.c_nationkey,
         CAST(ROUND(((CAST(c.cents AS DOUBLE) - p.mu) / p.sigma) * 1e10)
              AS BIGINT) AS z_e10
  FROM c JOIN p USING (c_nationkey)
)
SELECT c_custkey, c_nationkey, z_e10 FROM z
WHERE ABS(z_e10) > 15000000000
"""


PR_BUCKET_CENTS = 100_000  # $1,000 percent-rank histogram buckets


def q_order_percent_rank(sf_dir: str) -> Dataset:
    """Distributed global PERCENT_RANK over order value: the exact-prefix
    shape with a VALUE-HISTOGRAM key — per-$1000-bucket counts (bounded:
    price-range/1000 rows) → exclusive-offset broadcast → one range sort
    on the bucket; each block resolves min-rank ties among its complete
    buckets (equal cents always share a bucket, so tie groups never
    straddle the broadcast boundary). pr_e10 = round(rank0/(n-1)·1e10) —
    the same single division DuckDB's PERCENT_RANK performs."""
    import ray

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def derive(t: pa.Table) -> pa.Table:
        c = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "cents": pa.array(c),
                "bucket": pa.array(c // PR_BUCKET_CENTS),
            }
        )

    rows = orders.map_batches(derive, batch_format="pyarrow")

    def bucket_partials(t: pa.Table) -> pa.Table:
        g = pa.table(
            {"bucket": t["bucket"], "n": pa.array(np.ones(len(t), dtype=np.int64))}
        ).group_by(["bucket"]).aggregate([("n", "sum")])
        return g.rename_columns(["bucket", "n"])

    hist = _pull_merged(
        merge_group_sums(
            rows.map_batches(bucket_partials, batch_format="pyarrow"),
            ["bucket"], ["n"],
        ),
        ["bucket", "n"],
    )
    buckets, offs, n_total = _exclusive_offsets(hist, "bucket", "n")
    ref = ray.put((buckets, offs, n_total))

    empty = pa.table(
        {
            "o_orderkey": pa.array([], type=pa.int64()),
            "pr_e10": pa.array([], type=pa.int64()),
        }
    )

    def block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        bks, off_, n = ray.get(ref)
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        c = t.column("cents").to_numpy(zero_copy_only=False)
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((k, c, b))
        b, c, k = b[order], c[order], k[order]
        starts = run_starts([b])
        first_idx = np.maximum.accumulate(np.where(starts, np.arange(len(b)), 0))
        local = np.arange(len(b)) - first_idx
        # min-rank ties: rows with equal cents take their tie-group's
        # first local index
        tie_starts = run_starts([b, c])
        tie_first = np.maximum.accumulate(
            np.where(tie_starts, np.arange(len(b)), 0)
        )
        local = local[tie_first]
        rank0 = off_[np.searchsorted(bks, b)] + local
        pr = np.round((rank0.astype(np.float64) / np.float64(n - 1)) * 1e10)
        return pa.table(
            {
                "o_orderkey": pa.array(k),
                "pr_e10": pa.array(pr.astype(np.int64)),
            }
        )

    return sorted_group_apply(rows, ["bucket"], block)


SQL_ORDER_PERCENT_RANK = """
SELECT o_orderkey,
       CAST(ROUND(PERCENT_RANK() OVER (
         ORDER BY CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT)
       ) * 1e10) AS BIGINT) AS pr_e10
FROM orders
"""


# ---------------------------------------------------------------------------
# Context-window packing and grouped exact boxplot statistics

PACK_BIN_TOKENS = 4096
PACK_BUCKET = 1000  # doc_id bucket width for the prefix offsets


def q_token_packing(sf_dir: str) -> Dataset:
    """Sequential context-window packing — the training-data step that
    concatenates documents in corpus order and cuts 4096-token windows:
    each doc gets its bin id and intra-bin offset from the EXCLUSIVE
    running token total (docs longer than a window simply span bins, the
    standard packed-sequential-dataset behavior).

    Token proxy: ceil(n_chars/4) (the 4-chars/token heuristic — honest
    stand-in; the BPE token counter of token_counts_bpe is the drop-in
    upgrade). Machinery: the exact-prefix shape keyed on doc_id buckets
    (width 1000; the bounded pull is id-range/1000 rows — at 1e9 docs
    production widens the bucket to id_range/cluster_cpus)."""
    import ray

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def derive(t: pa.Table) -> pa.Table:
        nch = t.column("n_chars").to_numpy(zero_copy_only=False)
        tok = (nch + 3) // 4
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(did),
                "tok": pa.array(tok.astype(np.int64)),
                "bucket": pa.array(did // PACK_BUCKET),
            }
        )

    rows = docs.map_batches(derive, batch_format="pyarrow")

    def bucket_partials(t: pa.Table) -> pa.Table:
        g = pa.table({"bucket": t["bucket"], "tok": t["tok"]}).group_by(
            ["bucket"]
        ).aggregate([("tok", "sum")])
        return g.rename_columns(["bucket", "tok"])

    hist = _pull_merged(
        merge_group_sums(
            rows.map_batches(bucket_partials, batch_format="pyarrow"),
            ["bucket"], ["tok"],
        ),
        ["bucket", "tok"],
    )
    buckets, offs, _ = _exclusive_offsets(hist, "bucket", "tok")
    ref = ray.put((buckets, offs))

    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "bin_id": pa.array([], type=pa.int64()),
            "bin_offset": pa.array([], type=pa.int64()),
        }
    )

    def block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        bks, off_ = ray.get(ref)
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        tok = t.column("tok").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, b))
        b, did, tok = b[order], did[order], tok[order]
        csum = np.cumsum(tok)
        starts = run_starts([b])
        first_idx = np.maximum.accumulate(np.where(starts, np.arange(len(b)), 0))
        before_run = np.where(first_idx > 0, csum[first_idx - 1], 0)
        excl = off_[np.searchsorted(bks, b)] + (csum - before_run) - tok
        return pa.table(
            {
                "doc_id": pa.array(did),
                "bin_id": pa.array(excl // PACK_BIN_TOKENS),
                "bin_offset": pa.array(excl % PACK_BIN_TOKENS),
            }
        )

    return sorted_group_apply(rows, ["bucket"], block)


SQL_TOKEN_PACKING = """
WITH d AS (
  SELECT doc_id, (n_chars + 3) // 4 AS tok FROM documents
),
p AS (
  SELECT doc_id,
         SUM(tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - tok
           AS excl
  FROM d
)
SELECT doc_id, CAST(excl // 4096 AS BIGINT) AS bin_id,
       CAST(excl % 4096 AS BIGINT) AS bin_offset
FROM p
"""


def q_segment_boxplot(sf_dir: str) -> Dataset:
    """Per-market-segment exact boxplot: PERCENTILE_DISC quartiles
    (1-based element at ceil(p·n) — the property-tested round-2 rule),
    integer IQR whiskers (q1 − 3·iqr//2, q3 + 3·iqr//2 — floor-div on a
    NON-NEGATIVE operand both sides), and outlier counts beyond each
    whisker. Segments are FEW LARGE groups, the shape sorted_group_apply
    (and map_groups) handle well; everything is integer cents."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_mktsegment", "c_acctbal"]
    )

    def derive(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": pc.cast(t["c_mktsegment"], pa.string()),
                "cents": _cents(t["c_acctbal"]),
            }
        )

    rows = cust.map_batches(derive, batch_format="pyarrow")

    empty = pa.table(
        {
            "c_mktsegment": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
            "q1": pa.array([], type=pa.int64()),
            "q2": pa.array([], type=pa.int64()),
            "q3": pa.array([], type=pa.int64()),
            "lo_whisker": pa.array([], type=pa.int64()),
            "hi_whisker": pa.array([], type=pa.int64()),
            "n_low_outliers": pa.array([], type=pa.int64()),
            "n_high_outliers": pa.array([], type=pa.int64()),
        }
    )

    def block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        seg = t.column("c_mktsegment").to_numpy(zero_copy_only=False)
        c = t.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((c, seg))
        seg, c = seg[order], c[order]
        starts = run_starts([seg])
        first = np.flatnonzero(starts)
        counts = np.diff(np.append(first, len(seg)))
        out = {k: [] for k in empty.schema.names}
        for s, n in zip(first, counts):
            vals = c[s:s + n]
            q = [int(vals[int(np.ceil(p * n)) - 1]) for p in (0.25, 0.5, 0.75)]
            iqr = q[2] - q[0]
            lo = q[0] - (3 * iqr) // 2
            hi = q[2] + (3 * iqr) // 2
            out["c_mktsegment"].append(str(seg[s]))
            out["n"].append(int(n))
            out["q1"].append(q[0])
            out["q2"].append(q[1])
            out["q3"].append(q[2])
            out["lo_whisker"].append(lo)
            out["hi_whisker"].append(hi)
            out["n_low_outliers"].append(int((vals < lo).sum()))
            out["n_high_outliers"].append(int((vals > hi).sum()))
        return pa.table(
            {k: pa.array(v, type=empty.schema.field(k).type) for k, v in out.items()}
        )

    return sorted_group_apply(rows, ["c_mktsegment"], block)


SQL_SEGMENT_BOXPLOT = """
WITH c AS (
  SELECT c_mktsegment,
         CAST(ROUND(c_acctbal * 100.0, 0) AS BIGINT) AS cents
  FROM customer
),
q AS (
  SELECT c_mktsegment, COUNT(*) AS n,
         PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY cents) AS q1,
         PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY cents) AS q2,
         PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY cents) AS q3
  FROM c GROUP BY 1
),
w AS (
  SELECT *, q1 - (3 * (q3 - q1)) // 2 AS lo_whisker,
            q3 + (3 * (q3 - q1)) // 2 AS hi_whisker
  FROM q
)
SELECT w.c_mktsegment, CAST(w.n AS BIGINT) AS n, w.q1, w.q2, w.q3,
       w.lo_whisker, w.hi_whisker,
       CAST(COUNT(*) FILTER (c.cents < w.lo_whisker) AS BIGINT)
         AS n_low_outliers,
       CAST(COUNT(*) FILTER (c.cents > w.hi_whisker) AS BIGINT)
         AS n_high_outliers
FROM w JOIN c ON c.c_mktsegment = w.c_mktsegment
GROUP BY 1, 2, 3, 4, 5, 6, 7
"""


# ---------------------------------------------------------------------------
# Distributed BPE merge learning

BPE_MAX_WORD = 64  # matches the SQL oracle's generate_series cap (asserted)


def _pack_tokens(T: np.ndarray, tok_len: np.ndarray) -> np.ndarray:
    """Byte-string tokens → order-preserving uint64 keys: left-aligned
    big-endian, zero-padded (tokens never contain 0x00, so shorter
    strings sort first — exactly lexicographic byte order, matching the
    SQL tie-break ORDER BY lhs, rhs)."""
    L = T.shape[1]
    key = np.zeros(len(T), dtype=np.uint64)
    for j in range(L):
        key |= T[:, j].astype(np.uint64) << np.uint64(8 * (7 - j))
    del tok_len  # length is implicit in the zero padding
    return key


def _unpack_token(key: int) -> str:
    b = int(key).to_bytes(8, "big").rstrip(b"\x00")
    return b.decode("ascii")


def _bpe_tokens(words: pa.Array, merges: list[tuple[bytes, bytes]]):
    """Char-tokenize a batch of words and apply ``merges`` in order with
    the CLASSIC greedy left-to-right rule (consecutive overlapping
    matches resolve to the odd ranks of each run — 'aaa' merges once).
    Fully vectorized on the flat Arrow string buffer; the padded token
    matrix is (n_tokens × (len(merges)+1)) bytes, vocabulary-bounded.
    Returns (word_id, T, tok_len)."""
    w = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
    offs = np.frombuffer(w.buffers()[1], dtype=np.int32)[
        w.offset:w.offset + len(w) + 1
    ].astype(np.int64)
    data = np.frombuffer(w.buffers()[2], dtype=np.uint8)
    lengths = offs[1:] - offs[:-1]
    assert lengths.max(initial=0) <= BPE_MAX_WORD, "word exceeds SQL cap"
    n_tok = int(lengths.sum())
    word_id = np.repeat(np.arange(len(w)), lengths)
    flat_idx = np.arange(n_tok) + np.repeat(
        offs[:-1] - np.concatenate(([0], np.cumsum(lengths)[:-1])), lengths
    )
    # max token bytes doubles per merge round (two merged tokens can
    # themselves merge); 8 is also the _pack_tokens key capacity
    L = min(8, 1 << len(merges))
    T = np.zeros((n_tok, L), dtype=np.uint8)
    T[:, 0] = data[flat_idx]
    tok_len = np.ones(n_tok, dtype=np.int64)

    for lb, rb in merges:
        la, ra = len(lb), len(rb)
        m_a = tok_len == la
        for j, ch in enumerate(lb):
            m_a &= T[:, j] == ch
        m_b = tok_len == ra
        for j, ch in enumerate(rb):
            m_b &= T[:, j] == ch
        same = word_id[1:] == word_id[:-1]
        m = m_a[:-1] & m_b[1:] & same
        # greedy left-to-right: odd ranks of consecutive-match runs
        prev_m = np.concatenate(([False], m[:-1]))
        run_start = m & ~prev_m
        idx = np.arange(len(m))
        run_first = np.maximum.accumulate(np.where(run_start, idx, 0))
        take = m & (((idx - run_first) % 2) == 0)
        consumed = np.concatenate(([False], take))
        merged_bytes = lb + rb
        rows = np.flatnonzero(take)
        for j, ch in enumerate(merged_bytes):
            T[rows, j] = ch
        if len(merged_bytes) < L:
            T[rows, len(merged_bytes):] = 0
        tok_len[rows] = len(merged_bytes)
        keep = ~consumed
        T, tok_len, word_id = T[keep], tok_len[keep], word_id[keep]
    return word_id, T, tok_len


def _bpe_pair_counts(sf_dir: str, merges: list[tuple[bytes, bytes]]) -> Dataset:
    """(packed_l, packed_r, n) pair-count partials over the word vocab
    with ``merges`` applied — one grouped-sum merge; pair keys ride the
    shuffle as uint64s, strings materialize only for the winners."""
    from ..stages.salted import partial_count

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def explode(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(t["text"], " "))
        return pa.table({"w": words})

    vocab = merge_group_sums(
        partial_count(
            docs.map_batches(explode, batch_format="pyarrow"), ["w"], out="cnt"
        ),
        ["w"], ["cnt"],
    )

    def pair_partials(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "lk": pa.array([], type=pa.uint64()),
                    "rk": pa.array([], type=pa.uint64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)
        wid, T, tok_len = _bpe_tokens(
            pc.cast(t["w"], pa.string()).combine_chunks(), merges
        )
        key = _pack_tokens(T, tok_len)
        same = wid[1:] == wid[:-1]
        lk = key[:-1][same]
        rk = key[1:][same]
        wgt = cnt[wid[:-1][same]]
        g = pa.table(
            {"lk": pa.array(lk), "rk": pa.array(rk), "n": pa.array(wgt)}
        ).group_by(["lk", "rk"]).aggregate([("n", "sum")])
        return g.rename_columns(["lk", "rk", "n"])

    return merge_group_sums(
        vocab.map_batches(pair_partials, batch_format="pyarrow"),
        ["lk", "rk"], ["n"],
    )


def _bpe_argmax(pairs: Dataset) -> tuple[int, int, int]:
    """Global argmax pair under (n DESC, lhs ASC, rhs ASC): block-local
    top-1 rows (bounded: one row per merged block) → driver pick."""
    def local_top(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        n = t.column("n").to_numpy(zero_copy_only=False)
        lk = t.column("lk").to_numpy(zero_copy_only=False)
        rk = t.column("rk").to_numpy(zero_copy_only=False)
        best = np.lexsort((rk, lk, -n))[0]
        return t.take([int(best)])

    top = _pull_merged(
        pairs.map_batches(local_top, batch_format="pyarrow"), ["lk", "rk", "n"]
    )
    n = top.column("n").to_numpy(zero_copy_only=False)
    lk = top.column("lk").to_numpy(zero_copy_only=False).astype(np.uint64)
    rk = top.column("rk").to_numpy(zero_copy_only=False).astype(np.uint64)
    best = np.lexsort((rk, lk, -n))[0]
    return int(lk[best]), int(rk[best]), int(n[best])


def q_bpe_merges(sf_dir: str) -> Dataset:
    """Distributed BPE vocabulary learning, 2 merge rounds: word counts
    (vocab-sized movement — the J13 vocabulary-never-shuffles argument)
    → per-round pair counts over the merged token streams (uint64 pair
    keys ride the one grouped-sum shuffle) → global argmax with the
    deterministic (n DESC, pair ASC) tie-break → merge applied with the
    CLASSIC greedy left-to-right rule, exactly replicated by the SQL
    oracle's windowed odd-run selection. Output: the two learned merges
    and their pre-merge pair counts."""
    merges: list[tuple[bytes, bytes]] = []
    out_rows = []
    for rank in (1, 2):
        lk, rk, n = _bpe_argmax(_bpe_pair_counts(sf_dir, merges))
        l_s, r_s = _unpack_token(lk), _unpack_token(rk)
        out_rows.append((rank, l_s, r_s, n))
        merges.append((l_s.encode(), r_s.encode()))
    return rd.from_arrow(
        pa.table(
            {
                "rank": pa.array([r[0] for r in out_rows], type=pa.int64()),
                "lhs": pa.array([r[1] for r in out_rows], type=pa.string()),
                "rhs": pa.array([r[2] for r in out_rows], type=pa.string()),
                "n": pa.array([r[3] for r in out_rows], type=pa.int64()),
            }
        )
    )


SQL_BPE_MERGES = """
WITH words AS (
  SELECT w, COUNT(*) AS cnt FROM (
    SELECT UNNEST(string_split(text, ' ')) AS w FROM documents) GROUP BY 1
),
toks1 AS (
  SELECT w, cnt, i AS pos, SUBSTRING(w, i, 1) AS tok
  FROM words, (SELECT UNNEST(generate_series(1, 64)) AS i) s
  WHERE i <= LENGTH(w)
),
p1 AS (
  SELECT a.tok AS l, b.tok AS r, SUM(a.cnt) AS n
  FROM toks1 a JOIN toks1 b ON a.w = b.w AND b.pos = a.pos + 1
  GROUP BY 1, 2
),
m1 AS (SELECT l, r, n FROM p1 ORDER BY n DESC, l, r LIMIT 1),
mt AS (
  SELECT t.w, t.cnt, t.pos, t.tok,
         CASE WHEN t.tok = (SELECT l FROM m1)
               AND LEAD(t.tok) OVER (PARTITION BY t.w ORDER BY t.pos)
                   = (SELECT r FROM m1)
              THEN 1 ELSE 0 END AS m
  FROM toks1 t
),
runs AS (
  SELECT *, CASE WHEN m = 1 THEN pos - ROW_NUMBER() OVER (
              PARTITION BY w, m ORDER BY pos) END AS rid
  FROM mt
),
sel AS (
  SELECT *, CASE WHEN m = 1 AND (ROW_NUMBER() OVER (
              PARTITION BY w, rid ORDER BY pos) % 2) = 1
            THEN 1 ELSE 0 END AS take
  FROM runs
),
nx AS (
  SELECT *, LEAD(tok) OVER (PARTITION BY w ORDER BY pos) AS next_tok,
         LAG(take) OVER (PARTITION BY w ORDER BY pos) AS prev_take
  FROM sel
),
toks2 AS (
  SELECT w, cnt,
         ROW_NUMBER() OVER (PARTITION BY w ORDER BY pos) AS pos,
         CASE WHEN take = 1 THEN tok || next_tok ELSE tok END AS tok
  FROM nx WHERE COALESCE(prev_take, 0) = 0
),
p2 AS (
  SELECT a.tok AS l, b.tok AS r, SUM(a.cnt) AS n
  FROM toks2 a JOIN toks2 b ON a.w = b.w AND b.pos = a.pos + 1
  GROUP BY 1, 2
),
m2 AS (SELECT l, r, n FROM p2 ORDER BY n DESC, l, r LIMIT 1)
SELECT CAST(1 AS BIGINT) AS rank, l AS lhs, r AS rhs, CAST(n AS BIGINT) AS n
FROM m1
UNION ALL
SELECT CAST(2 AS BIGINT), l, r, CAST(n AS BIGINT) FROM m2
"""


# ---------------------------------------------------------------------------
# Weighted shortest paths and scalar quantization error

SSSP_ROUNDS = 2


def q_weighted_sssp_2round(sf_dir: str) -> Dataset:
    """Weighted single-source shortest paths, two Bellman-Ford
    relaxation rounds from node 0 over the shared link graph
    (queries._link_graph_edges) with closed-form integer weights
    w = (lo+hi) % 97 + 1. Exact k-round semantics (not converged —
    honest, mirrored by the SQL's two unrolled min-plus rounds).

    Per round: edges scan both directions against the broadcast dist
    vector → in-batch grouped-min candidates → ONE merged min →
    node-bounded driver update (the bfs_hops convention — dist is
    node-sized; the all-distributed alternative keeps dist as a Dataset
    and turns each round into a dist⋈edges hash join + grouped-min
    merge, the plan for node counts past driver memory)."""
    import ray

    from .queries import _link_graph_edges
    from ..stages.salted import merge_group_aggs

    edges, n_docs = _link_graph_edges(sf_dir)
    INF = np.int64(-1)
    dist = np.full(n_docs, INF, dtype=np.int64)
    dist[0] = 0
    for _ in range(SSSP_ROUNDS):
        ref = ray.put(dist)

        def scan(t: pa.Table, _ref=ref) -> pa.Table:
            d = ray.get(_ref)
            lo = t.column("lo").to_numpy(zero_copy_only=False)
            hi = t.column("hi").to_numpy(zero_copy_only=False)
            w = (lo + hi) % 97 + 1
            outs, ds = [], []
            for a, b in ((lo, hi), (hi, lo)):
                m = d[a] >= 0
                outs.append(b[m])
                ds.append(d[a][m] + w[m])
            p = pa.table(
                {
                    "node": pa.array(np.concatenate(outs)),
                    "dist": pa.array(np.concatenate(ds)),
                }
            )
            g = p.group_by(["node"]).aggregate([("dist", "min")])
            return g.rename_columns(["node", "dist"])

        cand = _pull_merged(
            merge_group_aggs(
                edges.map_batches(scan, batch_format="pyarrow"),
                ["node"], [("dist", "min")],
            ),
            ["node", "dist"],
        )
        nodes = cand.column("node").to_numpy(zero_copy_only=False)
        nd = cand.column("dist").to_numpy(zero_copy_only=False)
        cur = dist[nodes]
        better = (cur < 0) | (nd < cur)
        dist[nodes[better]] = nd[better]

    reach = np.flatnonzero(dist >= 0)
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(reach.astype(np.int64)),
                "dist": pa.array(dist[reach]),
            }
        )
    )


SQL_WEIGHTED_SSSP_2ROUND = """
WITH n AS (SELECT COUNT(*) AS nd FROM documents),
arms AS (
  SELECT doc_id AS s, (doc_id * 3 + 1) % nd AS t FROM documents, n
  UNION ALL SELECT doc_id, (doc_id * 5 + 2) % nd FROM documents, n
  UNION ALL SELECT doc_id, doc_id % 2 FROM documents, n
),
e AS (
  SELECT DISTINCT LEAST(s, t) AS lo, GREATEST(s, t) AS hi
  FROM arms WHERE s <> t
),
ew AS (SELECT lo, hi, (lo + hi) % 97 + 1 AS w FROM e),
d0 AS (SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist),
r1 AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT ew.hi AS node, d0.dist + ew.w AS dist
    FROM d0 JOIN ew ON ew.lo = d0.node
    UNION ALL
    SELECT ew.lo, d0.dist + ew.w FROM d0 JOIN ew ON ew.hi = d0.node
    UNION ALL SELECT node, dist FROM d0
  ) x GROUP BY 1
),
r2 AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT ew.hi AS node, r1.dist + ew.w AS dist
    FROM r1 JOIN ew ON ew.lo = r1.node
    UNION ALL
    SELECT ew.lo, r1.dist + ew.w FROM r1 JOIN ew ON ew.hi = r1.node
    UNION ALL SELECT node, dist FROM r1
  ) x GROUP BY 1
)
SELECT CAST(node AS BIGINT) AS node, CAST(dist AS BIGINT) AS dist FROM r2
"""


def q_sq8_quant_error(sf_dir: str) -> Dataset:
    """Int8 scalar quantization round-trip error per vector: per-dim
    min/max (ONE combined min/max merge, dim-bounded pull) → per-dim
    scale (mx−mn)/255 broadcast → stateless quantize/dequantize map;
    output Σ err² as e10 int64 (order-free; err is a generic double so
    plain e-rounding applies, round_even used for belt-and-braces).
    Degenerate dims (mn == mx) contribute zero error by definition
    (guarded both sides). The vectors never shuffle."""
    import ray

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def dim_partials(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "di": pa.array([], type=pa.int64()),
                    "mn": pa.array([], type=pa.float64()),
                    "mx": pa.array([], type=pa.float64()),
                }
            )
        m = _emb_matrix(t["embedding"])
        return pa.table(
            {
                "di": pa.array(np.arange(1, EMB_DIM + 1, dtype=np.int64)),
                "mn": pa.array(m.min(axis=0)),
                "mx": pa.array(m.max(axis=0)),
            }
        )

    from ..stages.salted import merge_group_aggs

    stats = _pull_merged(
        merge_group_aggs(
            emb.map_batches(dim_partials, batch_format="pyarrow"),
            ["di"], [("mn", "min"), ("mx", "max")],
        ),
        ["di", "mn", "mx"],
    ).sort_by("di")
    mn = stats.column("mn").to_numpy(zero_copy_only=False)
    mx = stats.column("mx").to_numpy(zero_copy_only=False)
    sc = (mx - mn) / 255.0
    ref = ray.put((mn, sc))

    def quant(t: pa.Table) -> pa.Table:
        mn_, sc_ = ray.get(ref)
        m = _emb_matrix(t["embedding"])
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.round((m - mn_) / sc_)
        err = m - (mn_ + q * sc_)
        err = np.where(sc_ == 0, 0.0, err)
        sse = np.round((err * err) * 1e10).astype(np.int64).sum(axis=1)
        return pa.table(
            {"vec_id": t["vec_id"], "sse_e10": pa.array(sse, type=pa.int64())}
        )

    return emb.map_batches(quant, batch_format="pyarrow")


SQL_SQ8_QUANT_ERROR = """
WITH e AS (
  SELECT vec_id, CAST(i AS BIGINT) AS i, CAST(x AS DOUBLE) AS x FROM (
    SELECT vec_id, UNNEST(embedding) AS x,
           generate_subscripts(embedding, 1) AS i
    FROM embeddings)
),
s AS (SELECT i, MIN(x) AS mn, MAX(x) AS mx FROM e GROUP BY 1),
d AS (
  SELECT e.vec_id,
         CASE WHEN s.mx = s.mn THEN 0.0
              ELSE e.x - (s.mn + round_even((e.x - s.mn)
                            / ((s.mx - s.mn) / 255.0), 0)
                          * ((s.mx - s.mn) / 255.0))
         END AS err
  FROM e JOIN s USING (i)
)
SELECT vec_id,
       CAST(SUM(CAST(round_even(err * err * 1e10, 0) AS BIGINT))
            AS BIGINT) AS sse_e10
FROM d GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Borůvka minimum-spanning-forest rounds

BORUVKA_ROUNDS = 2


def q_boruvka_mst_2round(sf_dir: str) -> Dataset:
    """Two Borůvka rounds of minimum-spanning-forest construction over
    the shared link graph with w = (lo+hi) % 97 + 1: per round, every
    component picks its minimum outgoing edge (deterministic (w, lo, hi)
    tie-break packed into ONE int64 so the pick is a grouped-min merge),
    then components contract. Output: (node, comp) labels after the two
    rounds, comp = min node id of the merged component — exactly the SQL
    oracle's recursive-reach MIN(label) over the selected edge union.

    Movement per round: edge scan against the broadcast label vector →
    per-component min partials → ONE grouped-min merge → component-
    bounded driver pull; contraction runs on the comp graph (≤ #comps
    rows). Labels are node-sized driver state (bfs_hops convention; the
    all-distributed plan keeps labels as a Dataset with hash-join
    attach, named not needed below ~1e9 nodes)."""
    import ray

    from .queries import _link_graph_edges
    from ..stages.salted import merge_group_aggs

    edges, n_docs = _link_graph_edges(sf_dir)
    assert n_docs < (1 << 21), "edge pack key exhausted"
    labels = np.arange(n_docs, dtype=np.int64)
    for _ in range(BORUVKA_ROUNDS):
        ref = ray.put(labels)

        def scan(t: pa.Table, _ref=ref) -> pa.Table:
            lab = ray.get(_ref)
            lo = t.column("lo").to_numpy(zero_copy_only=False)
            hi = t.column("hi").to_numpy(zero_copy_only=False)
            w = (lo + hi) % 97 + 1
            ca, cb = lab[lo], lab[hi]
            m = ca != cb
            key = (w[m] << 42) | (lo[m] << 21) | hi[m]
            p = pa.table(
                {
                    "comp": pa.array(np.concatenate([ca[m], cb[m]])),
                    "key": pa.array(np.concatenate([key, key])),
                }
            )
            g = p.group_by(["comp"]).aggregate([("key", "min")])
            return g.rename_columns(["comp", "key"])

        picked = _pull_merged(
            merge_group_aggs(
                edges.map_batches(scan, batch_format="pyarrow"),
                ["comp"], [("key", "min")],
            ),
            ["comp", "key"],
        )
        if len(picked) == 0:
            break
        key = picked.column("key").to_numpy(zero_copy_only=False)
        lo = (key >> 21) & ((1 << 21) - 1)
        hi = key & ((1 << 21) - 1)
        # contract on the comp graph (component-bounded driver work):
        # min-label propagation over selected edges until fixpoint
        ca, cb = labels[lo], labels[hi]
        canon = {}
        parent = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(ca.tolist(), cb.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                lo_r, hi_r = min(ra, rb), max(ra, rb)
                parent[hi_r] = lo_r
        uniq = np.unique(labels)
        canon_arr = np.array([find(int(c)) for c in uniq], dtype=np.int64)
        labels = canon_arr[np.searchsorted(uniq, labels)]

    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(np.arange(n_docs, dtype=np.int64)),
                "comp": pa.array(labels),
            }
        )
    )


SQL_BORUVKA_MST_2ROUND = """
WITH RECURSIVE n AS (SELECT COUNT(*) AS nd FROM documents),
arms AS (
  SELECT doc_id AS s, (doc_id * 3 + 1) % nd AS t FROM documents, n
  UNION ALL SELECT doc_id, (doc_id * 5 + 2) % nd FROM documents, n
  UNION ALL SELECT doc_id, doc_id % 2 FROM documents, n
),
e AS (
  SELECT DISTINCT LEAST(s, t) AS lo, GREATEST(s, t) AS hi
  FROM arms WHERE s <> t
),
ew AS (SELECT lo, hi, (lo + hi) % 97 + 1 AS w FROM e),
inc1 AS (
  SELECT lo AS g, w, lo, hi FROM ew
  UNION ALL SELECT hi, w, lo, hi FROM ew
),
sel1 AS (
  SELECT DISTINCT lo, hi FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY g ORDER BY w, lo, hi) AS rn
    FROM inc1) WHERE rn = 1
),
reach1(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT CASE WHEN r.node = s.lo THEN s.hi ELSE s.lo END, r.label
  FROM reach1 r JOIN sel1 s ON r.node IN (s.lo, s.hi)
),
lab1 AS (SELECT node, MIN(label) AS c FROM reach1 GROUP BY 1),
inc2 AS (
  SELECT la.c AS g, ew.w, ew.lo, ew.hi
  FROM ew JOIN lab1 la ON la.node = ew.lo
          JOIN lab1 lb ON lb.node = ew.hi
  WHERE la.c <> lb.c
  UNION ALL
  SELECT lb.c, ew.w, ew.lo, ew.hi
  FROM ew JOIN lab1 la ON la.node = ew.lo
          JOIN lab1 lb ON lb.node = ew.hi
  WHERE la.c <> lb.c
),
sel2 AS (
  SELECT DISTINCT lo, hi FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY g ORDER BY w, lo, hi) AS rn
    FROM inc2) WHERE rn = 1
),
alledges AS (SELECT lo, hi FROM sel1 UNION SELECT lo, hi FROM sel2),
reach2(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT CASE WHEN r.node = s.lo THEN s.hi ELSE s.lo END, r.label
  FROM reach2 r JOIN alledges s ON r.node IN (s.lo, s.hi)
)
SELECT node, CAST(MIN(label) AS BIGINT) AS comp
FROM reach2 GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Funnel latency and self-supervised mask generation


def q_conversion_latency(sf_dir: str) -> Dataset:
    """Per-user time-to-convert: seconds from the FIRST view to the first
    purchase AT OR AFTER it (users without both stages drop out). One
    range sort on user_id; each block resolves all its complete users
    with two segmented reduceat passes — no joins, no per-user Python.
    Floor-division to whole seconds on a non-negative gap (the round-2
    interarrival convention)."""
    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "latency_s": pa.array([], type=pa.int64()),
        }
    )

    def block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        tsv = t.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).astype(np.int64)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((tsv, uid))
        uid, tsv, et = uid[order], tsv[order], et[order]
        starts = run_starts([uid])
        seg = np.flatnonzero(starts)
        seg_id = np.cumsum(starts) - 1
        n_seg = len(seg)
        INF = np.iinfo(np.int64).max
        # first view per user
        tv = np.full(n_seg, INF, dtype=np.int64)
        is_v = et == "view"
        np.minimum.at(tv, seg_id[is_v], tsv[is_v])
        # first purchase >= tv per user
        tp = np.full(n_seg, INF, dtype=np.int64)
        is_p = et == "purchase"
        pm = is_p & (tv[seg_id] != INF) & (tsv >= tv[seg_id])
        np.minimum.at(tp, seg_id[pm], tsv[pm])
        ok = (tv != INF) & (tp != INF)
        users = uid[seg][ok]
        lat = (tp[ok] - tv[ok]) // 1_000_000
        return pa.table(
            {"user_id": pa.array(users), "latency_s": pa.array(lat)}
        )

    return sorted_group_apply(events, ["user_id"], block)


SQL_CONVERSION_LATENCY = """
WITH v AS (
  SELECT user_id, MIN(ts) AS tv FROM events
  WHERE event_type = 'view' GROUP BY 1
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS tp
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= v.tv
  GROUP BY 1
)
SELECT v.user_id,
       CAST((epoch_us(p.tp) - epoch_us(v.tv)) // 1000000 AS BIGINT)
         AS latency_s
FROM v JOIN p USING (user_id)
"""


MASK_SPAN_LEN = 16
MASK_CHARS_PER_SPAN = 50
MASK_MIX = 2654435761  # Knuth multiplicative constant


def q_mask_spans(sf_dir: str) -> Dataset:
    """Deterministic span-corruption masks for denoising pretraining
    (T5-style): each document gets n_chars // 50 spans of 16 chars at
    closed-form pseudo-random offsets ((doc_id+1)·(span+1)·2654435761
    mod (n_chars − 16)) — reproducible at any parallelism, zero RNG
    state. Stateless fan-out; the text itself never moves (masks are
    (doc, start, len) coordinates for the consuming trainer)."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def spans(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        nch = t.column("n_chars").to_numpy(zero_copy_only=False)
        k = nch // MASK_CHARS_PER_SPAN
        reps = np.repeat(np.arange(len(did)), k)
        total = int(k.sum())
        starts_g = np.concatenate(([0], np.cumsum(k)[:-1]))
        j = np.arange(total) - starts_g[reps]
        d = did[reps]
        m = nch[reps] - MASK_SPAN_LEN
        start = ((d + 1) * (j + 1) * MASK_MIX) % m
        return pa.table(
            {
                "doc_id": pa.array(d),
                "span_id": pa.array(j.astype(np.int64)),
                "start": pa.array(start.astype(np.int64)),
                "span_len": pa.array(
                    np.full(total, MASK_SPAN_LEN, dtype=np.int64)
                ),
            }
        )

    return docs.map_batches(spans, batch_format="pyarrow")


SQL_MASK_SPANS = """
SELECT doc_id, CAST(j AS BIGINT) AS span_id,
       CAST(((doc_id + 1) * (j + 1) * 2654435761)
            % (n_chars - 16) AS BIGINT) AS start,
       CAST(16 AS BIGINT) AS span_len
FROM documents, (SELECT UNNEST(generate_series(0, 63)) AS j) s
WHERE j < n_chars // 50
"""


# ---------------------------------------------------------------------------
# Graded retrieval eval (NDCG), coordinated sampling, pseudonymization

NDCG_K = 10
NDCG_TRUNC_DIMS = 16


def q_ndcg_truncation_eval(sf_dir: str) -> Dataset:
    """NDCG@10 of truncated-dimension retrieval (first 16 of 64 dims)
    against full-precision ground truth — the graded companion to
    dim_truncation_recall: every query vector ranks all others by e6-int
    cosine (the ann_topk ROUND(s,6) convention; ulp boundary risk
    ~1e-10/pair, the round-5 boundary-risk arithmetic), gain of the
    approx item at position i is (11 − exact_rank) when it sits in the
    exact top-10, and discounts use LN (base change cancels in the
    ratio; LN is in the bitwise-parity family). Per-position terms round
    to e10 ints before summing (order-free), the final NDCG is one
    division of two exact ints.

    Distribution: the candidate matrix broadcasts once (the ann_topk
    brute shape); each batch of queries resolves independently — at
    corpus scale the sharded-IVF path replaces the broadcast, the eval
    harness is unchanged."""
    import ray

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    import pyarrow.parquet as pq_

    full_tbl = pq_.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = full_tbl.column("vec_id").to_numpy(zero_copy_only=False)
    M = _emb_matrix(full_tbl.column("embedding"))
    order = np.argsort(ids)
    ids, M = ids[order], M[order]
    norm_full = np.sqrt((M * M).sum(axis=1))
    Mt = M[:, :NDCG_TRUNC_DIMS]
    norm_tr = np.sqrt((Mt * Mt).sum(axis=1))
    ref = ray.put((ids, M, norm_full, Mt, norm_tr))

    idcg_e10 = int(
        sum(
            int(np.round(((NDCG_K + 1 - j) / np.log(j + 1.0)) * 1e10))
            for j in range(1, NDCG_K + 1)
        )
    )

    def rank_block(t: pa.Table) -> pa.Table:
        ids_, M_, nf_, Mt_, nt_ = ray.get(ref)
        q = _emb_matrix(t["embedding"])
        qid = t.column("vec_id").to_numpy(zero_copy_only=False)
        qn_f = np.sqrt((q * q).sum(axis=1))
        qt = q[:, :NDCG_TRUNC_DIMS]
        qn_t = np.sqrt((qt * qt).sum(axis=1))

        def topk(sim_e6: np.ndarray, self_pos: np.ndarray) -> np.ndarray:
            # rank by (sim DESC, vec_id ASC), self excluded
            key = sim_e6 * np.int64(1 << 21) - ids_[None, :]
            # min+1: plain min wraps under the argpartition negation
            key[np.arange(len(key)), self_pos] = np.iinfo(np.int64).min + 1
            part = np.argpartition(-key, NDCG_K, axis=1)[:, :NDCG_K]
            kk = np.take_along_axis(key, part, axis=1)
            ordk = np.argsort(-kk, axis=1, kind="stable")
            return np.take_along_axis(part, ordk, axis=1)

        self_pos = np.searchsorted(ids_, qid)
        cos_f = (q @ M_.T) / (qn_f[:, None] * nf_[None, :])
        exact = topk(np.round(cos_f * 1e6).astype(np.int64), self_pos)
        cos_t = (qt @ Mt_.T) / (qn_t[:, None] * nt_[None, :])
        approx = topk(np.round(cos_t * 1e6).astype(np.int64), self_pos)

        # gains: 11 - exact_rank for approx hits inside the exact top-10
        dcg = np.zeros(len(q), dtype=np.int64)
        for i in range(NDCG_K):  # K=10 positions, constant-bounded loop
            hit = (approx[:, i][:, None] == exact).any(axis=1)
            pos_in_exact = np.argmax(
                approx[:, i][:, None] == exact, axis=1
            )
            rel = np.where(hit, NDCG_K - pos_in_exact, 0)
            term = np.round((rel / np.log(i + 2.0)) * 1e10).astype(np.int64)
            dcg += term
        ndcg = np.round(
            (dcg.astype(np.float64) / np.float64(idcg_e10)) * 1e10
        ).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(qid),
                "dcg_e10": pa.array(dcg),
                "ndcg_e10": pa.array(ndcg),
            }
        )

    return emb.map_batches(rank_block, batch_format="pyarrow")


SQL_NDCG_TRUNCATION_EVAL = """
WITH p AS (
  SELECT a.vec_id AS q, b.vec_id AS c,
         CAST(ROUND(list_cosine_similarity(
           CAST(a.embedding AS DOUBLE[]),
           CAST(b.embedding AS DOUBLE[])) * 1e6) AS BIGINT) AS sf,
         CAST(ROUND(list_cosine_similarity(
           CAST(a.embedding[1:16] AS DOUBLE[]),
           CAST(b.embedding[1:16] AS DOUBLE[])) * 1e6) AS BIGINT) AS st
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
ex AS (
  SELECT q, c, ROW_NUMBER() OVER (
    PARTITION BY q ORDER BY sf DESC, c) AS r
  FROM p
),
ap AS (
  SELECT q, c, ROW_NUMBER() OVER (
    PARTITION BY q ORDER BY st DESC, c) AS r
  FROM p
),
terms AS (
  SELECT ap.q,
         CAST(ROUND((CAST(CASE WHEN ex.r IS NULL THEN 0
                               ELSE 11 - ex.r END AS DOUBLE)
                     / LN(CAST(ap.r + 1 AS DOUBLE))) * 1e10) AS BIGINT)
           AS term
  FROM ap LEFT JOIN ex ON ex.q = ap.q AND ex.c = ap.c AND ex.r <= 10
  WHERE ap.r <= 10
),
idcg AS (
  SELECT CAST(SUM(CAST(ROUND((CAST(11 - j AS DOUBLE)
                / LN(CAST(j + 1 AS DOUBLE))) * 1e10) AS BIGINT)) AS BIGINT)
           AS v
  FROM (SELECT UNNEST(generate_series(1, 10)) AS j)
)
SELECT q AS vec_id,
       CAST(SUM(term) AS BIGINT) AS dcg_e10,
       CAST(ROUND((CAST(SUM(term) AS DOUBLE) / CAST(idcg.v AS DOUBLE))
                  * 1e10) AS BIGINT) AS ndcg_e10
FROM terms, idcg
GROUP BY q, idcg.v
"""


SAMPLE_MOD = 1_000_003  # prime; keeps the residue uniform-ish
SAMPLE_KEEP = 100_000  # ~10% coordinated keep rate


def q_coordinated_sample_join(sf_dir: str) -> Dataset:
    """Coordinated (consistent) sampling across tables: orders AND
    lineitem keep a row iff the SAME key predicate holds
    ((o_orderkey·2654435761) mod 1000003 < 100000), so the join of the
    samples IS the sample of the join — the property ad-hoc per-table
    sampling destroys. Output: per-orderpriority row counts and revenue
    over the sampled join. Both sides filter at the scan (stateless);
    the join then runs on ~1% of the pair volume."""
    from ..stages.salted import join_partitions
    import pyarrow.parquet as pq_

    def keep_mask(k: np.ndarray) -> np.ndarray:
        return (k * MASK_MIX) % SAMPLE_MOD < SAMPLE_KEEP

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
    )

    def o_filter(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        m = keep_mask(k)
        return pa.table(
            {
                "o_orderkey": pa.array(k[m]),
                "o_orderpriority": pc.cast(
                    t["o_orderpriority"], pa.string()
                ).combine_chunks().take(pa.array(np.flatnonzero(m))),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def l_filter(t: pa.Table) -> pa.Table:
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        m = keep_mask(k)
        price_c = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        disc_c = _cents(t["l_discount"]).to_numpy(zero_copy_only=False)
        rev = price_c * (100 - disc_c)
        return pa.table(
            {
                "l_orderkey": pa.array(k[m]),
                "rev_c4": pa.array(rev[m]),
            }
        )

    n_orders = pq_.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    joined = li.map_batches(l_filter, batch_format="pyarrow").join(
        orders.map_batches(o_filter, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=join_partitions(n_orders // 10),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partials(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "n": pa.array(np.ones(len(t), dtype=np.int64)),
                "rev_c4": t["rev_c4"],
            }
        ).group_by(["o_orderpriority"]).aggregate(
            [("n", "sum"), ("rev_c4", "sum")]
        )
        return g.rename_columns(["o_orderpriority", "n", "rev_c4"])

    return merge_group_sums(
        joined.map_batches(partials, batch_format="pyarrow"),
        ["o_orderpriority"], ["n", "rev_c4"],
    )


SQL_COORDINATED_SAMPLE_JOIN = """
WITH so AS (
  SELECT o_orderkey, o_orderpriority FROM orders
  WHERE (o_orderkey * 2654435761) % 1000003 < 100000
),
sl AS (
  SELECT l_orderkey,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev_c4
  FROM lineitem
  WHERE (l_orderkey * 2654435761) % 1000003 < 100000
)
SELECT so.o_orderpriority, COUNT(*) AS n,
       CAST(SUM(sl.rev_c4) AS BIGINT) AS rev_c4
FROM sl JOIN so ON sl.l_orderkey = so.o_orderkey
GROUP BY 1
"""


def q_pseudonymize_users(sf_dir: str) -> Dataset:
    """Privacy pass: replace user ids with keyed MD5 tokens (first 16 hex
    chars — the two_hop_hll register-oracle convention) and prove
    referential integrity survives: per-token event counts. Tokens are
    computed once per DISTINCT user per batch (dictionary-encode then
    hash unique values only); events shuffle as (token, count) partials."""
    import hashlib

    from ..stages.salted import partial_count

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def tokenize(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(uid, return_inverse=True)
        toks = np.array(
            [
                hashlib.md5(str(int(u)).encode()).hexdigest()[:16]
                for u in uniq
            ]
        )
        return pa.table({"user_token": pa.array(toks[inv])})

    return merge_group_sums(
        partial_count(
            events.map_batches(tokenize, batch_format="pyarrow"),
            ["user_token"], out="n_events",
        ),
        ["user_token"], ["n_events"],
    )


SQL_PSEUDONYMIZE_USERS = """
SELECT SUBSTRING(md5(CAST(user_id AS VARCHAR)), 1, 16) AS user_token,
       COUNT(*) AS n_events
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Geostatistics: empirical semivariogram; market-basket lift

VARIOGRAM_BINS = (0.05, 0.1, 0.2)  # annulus upper bounds, degrees


def q_tile_semivariogram(sf_dir: str) -> Dataset:
    """Empirical semivariogram sufficient statistics over the geotagged
    pages: for each distance annulus (0,.05], (.05,.1], (.1,.2], the
    pair count and Σ(vₐ−v_b)² with v = text length — all-integer
    numerators (γ(h) = sum/(2n) downstream). Same grid-bucket scatter as
    ripley_pair_counts (each unordered pair lands in exactly one bucket;
    quadratic-cell caveat shared); dist² is the identical IEEE
    expression on identical closed-form coordinates both sides, so bin
    -boundary comparisons cannot flip."""
    from .queries import _geotagged
    from ..stages.salted import default_partitions

    pts = _geotagged(sf_dir)
    rmax = max(VARIOGRAM_BINS)
    edges = [(int(round(r * 1e6)), r * r) for r in VARIOGRAM_BINS]

    def scatter_left(t: pa.Table) -> pa.Table:
        t = t.filter(t.column("has_geo"))
        lat = t.column("lat").to_numpy(zero_copy_only=False)
        lon = t.column("lon").to_numpy(zero_copy_only=False)
        did = pc.cast(t.column("doc_id"), pa.int64()).to_numpy(zero_copy_only=False)
        v = pc.utf8_length(t.column("text")).to_numpy(zero_copy_only=False).astype(np.int64)
        clat = np.floor(lat / rmax).astype(np.int64)
        clon = np.floor(lon / rmax).astype(np.int64)
        n = len(did)
        d = np.array([-1, 0, 1], dtype=np.int64)
        rep = np.repeat(np.arange(n), 9)
        dy = np.tile(np.repeat(d, 3), n)
        dx = np.tile(np.tile(d, 3), n)
        cell = (clat[rep] + dy + 9000) * 100000 + (clon[rep] + dx + 18000)
        return pa.table(
            {
                "cell": pa.array(cell),
                "doc_a": pa.array(did[rep]),
                "lat_a": pa.array(lat[rep]),
                "lon_a": pa.array(lon[rep]),
                "v_a": pa.array(v[rep]),
            }
        )

    def right_side(t: pa.Table) -> pa.Table:
        t = t.filter(t.column("has_geo"))
        lat = t.column("lat").to_numpy(zero_copy_only=False)
        lon = t.column("lon").to_numpy(zero_copy_only=False)
        did = pc.cast(t.column("doc_id"), pa.int64()).to_numpy(zero_copy_only=False)
        v = pc.utf8_length(t.column("text")).to_numpy(zero_copy_only=False).astype(np.int64)
        clat = np.floor(lat / rmax).astype(np.int64)
        clon = np.floor(lon / rmax).astype(np.int64)
        return pa.table(
            {
                "cell_r": pa.array((clat + 9000) * 100000 + (clon + 18000)),
                "doc_b": pa.array(did),
                "lat_b": pa.array(lat),
                "lon_b": pa.array(lon),
                "v_b": pa.array(v),
            }
        )

    joined = pts.map_batches(scatter_left, batch_format="pyarrow").join(
        pts.map_batches(right_side, batch_format="pyarrow"),
        "inner",
        num_partitions=default_partitions(),
        on=("cell",),
        right_on=("cell_r",),
    )

    def bucket(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        dlat = t.column("lat_a").to_numpy(zero_copy_only=False) - t.column(
            "lat_b"
        ).to_numpy(zero_copy_only=False)
        dlon = t.column("lon_a").to_numpy(zero_copy_only=False) - t.column(
            "lon_b"
        ).to_numpy(zero_copy_only=False)
        dv = t.column("v_a").to_numpy(zero_copy_only=False) - t.column(
            "v_b"
        ).to_numpy(zero_copy_only=False)
        dist2 = dlat * dlat + dlon * dlon
        lt = a < b
        keys, counts, sums = [], [], []
        lo2 = 0.0
        for r_e6, r2 in edges:
            m = lt & (dist2 > lo2) & (dist2 <= r2)
            c = int(np.count_nonzero(m))
            if c:
                keys.append(r_e6)
                counts.append(c)
                sums.append(int((dv[m] * dv[m]).sum()))
            lo2 = r2
        return pa.table(
            {
                "bin_e6": pa.array(np.asarray(keys, dtype=np.int64)),
                "n_pairs": pa.array(np.asarray(counts, dtype=np.int64)),
                "sum_sqdiff": pa.array(np.asarray(sums, dtype=np.int64)),
            }
        )

    return merge_group_sums(
        joined.map_batches(bucket, batch_format="pyarrow"),
        ["bin_e6"], ["n_pairs", "sum_sqdiff"],
    )


def _sql_variogram() -> str:
    from .queries import SQL_GEO_CTE

    arms, lo = [], "0.0"
    for r in VARIOGRAM_BINS:
        arms.append(
            f"""  SELECT {int(round(r * 1e6))} AS bin_e6,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(sq) AS BIGINT) AS sum_sqdiff
  FROM pairs WHERE dist2 > {lo} AND dist2 <= {r!r} * {r!r}"""
        )
        lo = f"{r!r} * {r!r}"
    arms_sql = "\n  UNION ALL\n".join(arms)
    return f"""
WITH {SQL_GEO_CTE},
gv AS (
  SELECT g.doc_id, g.lat, g.lon, CAST(d.n_chars AS BIGINT) AS v
  FROM geo g JOIN documents d USING (doc_id)
),
pairs AS (
  SELECT (a.lat - b.lat) * (a.lat - b.lat)
         + (a.lon - b.lon) * (a.lon - b.lon) AS dist2,
         (a.v - b.v) * (a.v - b.v) AS sq
  FROM gv a JOIN gv b ON b.doc_id > a.doc_id
)
SELECT * FROM (
{arms_sql}
) WHERE n_pairs > 0
"""


def q_brand_cooccurrence(sf_dir: str) -> Dataset:
    """Market-basket lift between part brands co-ordered in one order:
    distinct (order, brand) rows (ONE grouped merge) → per-order brand
    pairs on the sorted-run idiom (fan-out ≤ C(brands-in-order, 2),
    order-size-bounded) → pair-count merge → brand-bounded driver pull
    (≤ |brands|² rows) → lift = n_ab·n_orders / (n_a·n_b) on exact big
    ints, one float division. Brand attach rides the gated part
    broadcast (the part_brand_revenue convention)."""
    import pyarrow.parquet as pq_
    import ray

    from ..stages.salted import partial_count

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    part = pq_.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    ref = ray.put(
        (
            pc.cast(part["p_partkey"], pa.int64()).combine_chunks(),
            pc.cast(part["p_brand"], pa.string()).combine_chunks(),
        )
    )

    def attach(t: pa.Table) -> pa.Table:
        keys, brands = ray.get(ref)
        pos = pc.index_in(
            pc.cast(t["l_partkey"], pa.int64()), value_set=keys
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "p_brand": brands.take(pos),
            }
        )

    ob = merge_group_sums(
        partial_count(
            li.map_batches(attach, batch_format="pyarrow"),
            ["l_orderkey", "p_brand"], out="n",
        ),
        ["l_orderkey", "p_brand"], ["n"],
    ).materialize()  # distinct-pairs-sized; consumed by 3 stages below

    empty = pa.table(
        {
            "brand_a": pa.array([], type=pa.string()),
            "brand_b": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
        }
    )

    def pair_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        br = t.column("p_brand").to_numpy(zero_copy_only=False)
        order = np.lexsort((br, ok))
        ok, br = ok[order], br[order]
        starts = run_starts([ok])
        # (earlier, later) fan-out within each order run (the
        # doc_cooccurrence idiom): element at local index L pairs with
        # its L predecessors
        n = len(ok)
        run_start = np.maximum.accumulate(np.where(starts, np.arange(n), 0))
        local = np.arange(n) - run_start
        total = int(local.sum())
        if total == 0:
            return empty
        b_idx = np.repeat(np.arange(n), local)
        offsets = np.concatenate(([0], np.cumsum(local)))[:-1]
        a_idx = (
            np.arange(total)
            - np.repeat(offsets, local)
            + np.repeat(run_start, local)
        )
        a = br[a_idx]
        b = br[b_idx]
        g = pa.table(
            {
                "brand_a": pa.array(a),
                "brand_b": pa.array(b),
                "n": pa.array(np.ones(total, dtype=np.int64)),
            }
        ).group_by(["brand_a", "brand_b"]).aggregate([("n", "sum")])
        return g.rename_columns(["brand_a", "brand_b", "n"])

    pair_counts = _pull_merged(
        merge_group_sums(
            sorted_group_apply(ob, ["l_orderkey"], pair_block),
            ["brand_a", "brand_b"], ["n"],
        ),
        ["brand_a", "brand_b", "n"],
    )
    brand_tot = _pull_merged(
        merge_group_sums(
            partial_count(ob, ["p_brand"], out="nb"), ["p_brand"], ["nb"]
        ),
        ["p_brand", "nb"],
    )
    n_orders = merge_group_sums(
        partial_count(ob, ["l_orderkey"], out="x"), ["l_orderkey"], ["x"]
    ).count()

    nb = dict(
        zip(
            brand_tot.column("p_brand").to_pylist(),
            brand_tot.column("nb").to_numpy(zero_copy_only=False).tolist(),
        )
    )
    rows = []
    for i in range(len(pair_counts)):
        a = pair_counts.column("brand_a")[i].as_py()
        b = pair_counts.column("brand_b")[i].as_py()
        n_ab = int(pair_counts.column("n")[i].as_py())
        lift = int(
            round(
                (float(n_ab * n_orders) / float(nb[a] * nb[b])) * 1e10
            )
        )
        rows.append((a, b, n_ab, lift))
    rows.sort()
    return rd.from_arrow(
        pa.table(
            {
                "brand_a": pa.array([r[0] for r in rows], type=pa.string()),
                "brand_b": pa.array([r[1] for r in rows], type=pa.string()),
                "n_ab": pa.array([r[2] for r in rows], type=pa.int64()),
                "lift_e10": pa.array([r[3] for r in rows], type=pa.int64()),
            }
        )
    )


SQL_BRAND_COOCCURRENCE = """
WITH lb AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM lb),
bt AS (SELECT p_brand, COUNT(*) AS nb FROM lb GROUP BY 1),
pr AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS n_ab
  FROM lb a JOIN lb b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
)
SELECT brand_a, brand_b, CAST(n_ab AS BIGINT) AS n_ab,
       CAST(ROUND((CAST(n_ab * tot.n AS DOUBLE)
                   / CAST(x.nb * y.nb AS DOUBLE)) * 1e10) AS BIGINT)
         AS lift_e10
FROM pr, tot
JOIN bt x ON pr.brand_a = x.p_brand
JOIN bt y ON pr.brand_b = y.p_brand
"""


# ---------------------------------------------------------------------------
# Recursive smoothing and experiment health

EWMA_DIV = 8  # alpha = 1/8


def q_hourly_ewma(sf_dir: str) -> Dataset:
    """Exponentially-weighted moving average of hourly event volume
    (alpha = 1/8): the distributed stage is the hourly count merge
    (calendar-bounded output); the recursion e_t = e_{t-1} +
    (x_t − e_{t-1})/8 is inherently serial but runs over the BOUNDED
    hourly table (driver side; the SQL twin is a recursive CTE over the
    same rows — identical float sequence, e10 output rounding). Hours
    with no events count zero (contiguous spine)."""
    from ..stages.salted import partial_count

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def derive(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        return pa.table(
            {"hour": pc.divide(us, pa.scalar(US_PER_HOUR, type=pa.int64()))}
        )

    hourly = _pull_merged(
        merge_group_sums(
            partial_count(
                events.map_batches(derive, batch_format="pyarrow"),
                ["hour"], out="n",
            ),
            ["hour"], ["n"],
        ),
        ["hour", "n"],
    ).sort_by("hour")
    hrs = hourly.column("hour").to_numpy(zero_copy_only=False)
    ns = hourly.column("n").to_numpy(zero_copy_only=False)
    spine = np.arange(hrs[0], hrs[-1] + 1, dtype=np.int64)
    full = np.zeros(len(spine), dtype=np.int64)
    full[np.searchsorted(spine, hrs)] = ns
    e = 0.0
    out = np.empty(len(spine), dtype=np.int64)
    for i, x in enumerate(full.tolist()):  # calendar-bounded serial loop
        if i == 0:
            e = float(x)
        else:
            e = e + (x - e) / 8.0
        out[i] = int(np.round(e * 1e10))
    return rd.from_arrow(
        pa.table(
            {
                "hour": pa.array(spine),
                "n_events": pa.array(full),
                "ewma_e10": pa.array(out),
            }
        )
    )


SQL_HOURLY_EWMA = """
WITH RECURSIVE h AS (
  SELECT epoch_us(ts) // 3600000000 AS hour, COUNT(*) AS n
  FROM events GROUP BY 1
),
spine AS (
  SELECT UNNEST(generate_series(
    (SELECT MIN(hour) FROM h), (SELECT MAX(hour) FROM h))) AS hour
),
x AS (
  SELECT spine.hour,
         CAST(COALESCE(h.n, 0) AS BIGINT) AS n,
         ROW_NUMBER() OVER (ORDER BY spine.hour) AS i
  FROM spine LEFT JOIN h ON spine.hour = h.hour
),
r(i, hour, n, e) AS (
  SELECT i, hour, n, CAST(n AS DOUBLE) FROM x WHERE i = 1
  UNION ALL
  SELECT x.i, x.hour, x.n, r.e + (CAST(x.n AS DOUBLE) - r.e) / 8.0
  FROM r JOIN x ON x.i = r.i + 1
)
SELECT hour, n AS n_events,
       CAST(ROUND(e * 1e10) AS BIGINT) AS ewma_e10
FROM r
"""


AB_ARMS = 2


def q_ab_srm_check(sf_dir: str) -> Dataset:
    """Experiment-health sample-ratio-mismatch check: users hash-split
    into 2 arms ((user_id·2654435761) mod 1000003 parity), per-arm
    distinct-user and event counts, plus the chi-square SRM statistic
    against the 50/50 design as e10 (one fixed float sequence over exact
    ints). Counting is the distributed stage; the 2-row stat is driver
    arithmetic BY DEFINITION."""
    from ..stages.salted import partial_count

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        arm = ((u * MASK_MIX) % SAMPLE_MOD) % AB_ARMS
        return pa.table({"arm": pa.array(arm), "user_id": pa.array(u)})

    per_user = merge_group_sums(
        partial_count(
            events.map_batches(derive, batch_format="pyarrow"),
            ["arm", "user_id"], out="n_events",
        ),
        ["arm", "user_id"], ["n_events"],
    )

    def arm_partials(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "arm": t["arm"],
                "n_users": pa.array(np.ones(len(t), dtype=np.int64)),
                "n_events": t["n_events"],
            }
        ).group_by(["arm"]).aggregate([("n_users", "sum"), ("n_events", "sum")])
        return g.rename_columns(["arm", "n_users", "n_events"])

    arms = _pull_merged(
        merge_group_sums(
            per_user.map_batches(arm_partials, batch_format="pyarrow"),
            ["arm"], ["n_users", "n_events"],
        ),
        ["arm", "n_users", "n_events"],
    ).sort_by("arm")
    nu = arms.column("n_users").to_numpy(zero_copy_only=False)
    ne = arms.column("n_events").to_numpy(zero_copy_only=False)
    total = int(nu.sum())
    exp = total / 2.0
    chi = sum(
        ((float(int(x)) - exp) * (float(int(x)) - exp)) / exp for x in nu
    )
    chi_e10 = int(np.round(chi * 1e10))
    return rd.from_arrow(
        pa.table(
            {
                "arm": arms.column("arm"),
                "n_users": pa.array(nu),
                "n_events": pa.array(ne),
                "srm_chi2_e10": pa.array(
                    np.full(len(nu), chi_e10, dtype=np.int64)
                ),
            }
        )
    )


SQL_AB_SRM_CHECK = """
WITH u AS (
  SELECT ((user_id * 2654435761) % 1000003) % 2 AS arm, user_id,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
a AS (
  SELECT arm, COUNT(*) AS n_users,
         CAST(SUM(n_events) AS BIGINT) AS n_events
  FROM u GROUP BY 1
),
t AS (SELECT CAST(SUM(n_users) AS DOUBLE) / 2.0 AS exp_u FROM a),
c AS (
  SELECT CAST(SUM((CAST(n_users AS DOUBLE) - exp_u)
                  * (CAST(n_users AS DOUBLE) - exp_u) / exp_u) AS DOUBLE)
           AS chi
  FROM a, t
)
SELECT a.arm, CAST(a.n_users AS BIGINT) AS n_users, a.n_events,
       CAST(ROUND(c.chi * 1e10) AS BIGINT) AS srm_chi2_e10
FROM a, c
"""


# ---------------------------------------------------------------------------
# Interval-overlap join between per-user session sets

OVERLAP_TS_BASE = 1_700_000_000_000_000  # 2023-11; packed-key epoch floor


def q_session_overlap_pairs(sf_dir: str) -> Dataset:
    """Interval-overlap join: per user, how many (click-session,
    error-session) pairs overlap in time (a.start ≤ b.end ∧ b.start ≤
    a.end; 6-HOUR-gap sessionize per type — the default 30-min gap
    yields point intervals on this stream and zero overlaps, a vacuous
    oracle; never-weaken rule). The overlap COUNT for each
    click session is #errors starting ≤ its end MINUS #errors ending <
    its start — two packed-key searchsorted passes over the complete
    users of each sorted block (no pair materialization, no per-user
    Python; the ffill packed-key idiom with (user_rank << 43) | (ts −
    2023-11 base), asserted in range)."""
    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"],
    )
    clicks = sessionize(
        events.filter(expr="event_type == 'click'"), gap_minutes=360
    ).select_columns(["user_id", "session_start", "session_end"])
    errors = sessionize(
        events.filter(expr="event_type == 'error'"), gap_minutes=360
    ).select_columns(["user_id", "session_start", "session_end"])

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "user_id": t["user_id"],
                    "s_us": pc.cast(t["session_start"], pa.int64()),
                    "e_us": pc.cast(t["session_end"], pa.int64()),
                    "side": pa.array(np.full(len(t), side, dtype=np.int64)),
                }
            )

        return f

    both = clicks.map_batches(tag(0), batch_format="pyarrow").union(
        errors.map_batches(tag(1), batch_format="pyarrow")
    )

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "n_overlaps": pa.array([], type=pa.int64()),
        }
    )

    def block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        s = t.column("s_us").to_numpy(zero_copy_only=False)
        e = t.column("e_us").to_numpy(zero_copy_only=False)
        side = t.column("side").to_numpy(zero_copy_only=False)
        assert s.min() >= OVERLAP_TS_BASE and e.max() < OVERLAP_TS_BASE + (1 << 43)
        # user ranks shared across both sides
        order = np.argsort(uid, kind="stable")
        uid_sorted = uid[order]
        uranks = np.cumsum(run_starts([uid_sorted])) - 1
        rank_of = np.empty(len(uid), dtype=np.int64)
        rank_of[order] = uranks
        a = side == 0
        b = side == 1
        key_b_start = np.sort(
            (rank_of[b] << 43) | (s[b] - OVERLAP_TS_BASE)
        )
        key_b_end = np.sort(
            (rank_of[b] << 43) | (e[b] - OVERLAP_TS_BASE)
        )
        qa_hi = (rank_of[a] << 43) | (e[a] - OVERLAP_TS_BASE)
        qa_lo = (rank_of[a] << 43) | (s[a] - OVERLAP_TS_BASE)
        n_start_le = np.searchsorted(key_b_start, qa_hi, side="right")
        n_end_lt = np.searchsorted(key_b_end, qa_lo, side="left")
        per_click = n_start_le - n_end_lt
        # collapse per user
        ua = uid[a]
        g = pa.table(
            {
                "user_id": pa.array(ua),
                "n_overlaps": pa.array(per_click),
            }
        ).group_by(["user_id"]).aggregate([("n_overlaps", "sum")])
        g = g.rename_columns(["user_id", "n_overlaps"])
        return g.filter(pc.greater(g["n_overlaps"], 0))

    return sorted_group_apply(both, ["user_id"], block)


SQL_SESSION_OVERLAP_PAIRS = """
WITH g AS (
  SELECT user_id, ts, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
              OR ts - LAG(ts) OVER w > INTERVAL 360 MINUTES THEN 1 ELSE 0 END
           AS new_sess
  FROM events WHERE event_type IN ('click', 'error')
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts)
),
s AS (
  SELECT user_id, event_type, ts,
         SUM(new_sess) OVER (
           PARTITION BY user_id, event_type ORDER BY ts
           ROWS UNBOUNDED PRECEDING) AS sn
  FROM g
),
sess AS (
  SELECT user_id, event_type, sn,
         MIN(ts) AS st, MAX(ts) AS en
  FROM s GROUP BY 1, 2, 3
)
SELECT c.user_id, COUNT(*) AS n_overlaps
FROM sess c JOIN sess e
  ON c.user_id = e.user_id
 AND c.event_type = 'click' AND e.event_type = 'error'
 AND c.st <= e.en AND e.st <= c.en
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Vocabulary coverage and term momentum

COVERAGE_KS = (10, 20, 40)


def q_vocab_coverage_curve(sf_dir: str) -> Dataset:
    """Vocabulary coverage curve: what share of corpus tokens the top-k
    vocabulary covers, k ∈ {10, 20, 40} (rank by count DESC, term ASC —
    deterministic). Word counts merge once (vocab-sized movement); the
    curve itself is a k-bounded driver computation over the pulled count
    vector (vocab-bounded pull, the J13 argument — at a 10M-type corpus
    the pull becomes block-local top-max(k) pruning first, same
    machinery as vocab_topk). share_e10 = one exact-int division."""
    from ..stages.salted import partial_count

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def explode(t: pa.Table) -> pa.Table:
        return pa.table(
            {"w": pc.list_flatten(pc.split_pattern(t["text"], " "))}
        )

    vocab = _pull_merged(
        merge_group_sums(
            partial_count(
                docs.map_batches(explode, batch_format="pyarrow"),
                ["w"], out="cnt",
            ),
            ["w"], ["cnt"],
        ),
        ["w", "cnt"],
    )
    w = np.asarray(vocab.column("w").to_pylist())
    c = vocab.column("cnt").to_numpy(zero_copy_only=False)
    order = np.lexsort((w, -c))
    c = c[order]
    total = int(c.sum())
    csum = np.cumsum(c)
    rows = []
    for k in COVERAGE_KS:
        covered = int(csum[min(k, len(c)) - 1]) if len(c) else 0
        rows.append(
            (k, covered, total,
             int(np.round((covered / total) * 1e10)) if total else 0)
        )
    return rd.from_arrow(
        pa.table(
            {
                "k": pa.array([r[0] for r in rows], type=pa.int64()),
                "covered": pa.array([r[1] for r in rows], type=pa.int64()),
                "total": pa.array([r[2] for r in rows], type=pa.int64()),
                "share_e10": pa.array([r[3] for r in rows], type=pa.int64()),
            }
        )
    )


SQL_VOCAB_COVERAGE_CURVE = """
WITH wc AS (
  SELECT w, COUNT(*) AS cnt FROM (
    SELECT UNNEST(string_split(text, ' ')) AS w FROM documents) GROUP BY 1
),
r AS (
  SELECT cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS rnk,
         SUM(cnt) OVER (ORDER BY cnt DESC, w
                        ROWS UNBOUNDED PRECEDING) AS csum,
         SUM(cnt) OVER () AS total
  FROM wc
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(r.csum AS BIGINT) AS covered,
       CAST(r.total AS BIGINT) AS total,
       CAST(ROUND((CAST(r.csum AS DOUBLE) / CAST(r.total AS DOUBLE))
                  * 1e10) AS BIGINT) AS share_e10
FROM (SELECT UNNEST([10, 20, 40]) AS k) ks
JOIN r ON r.rnk = LEAST(k, (SELECT COUNT(*) FROM wc))
"""


def q_term_momentum(sf_dir: str) -> Dataset:
    """Trending-term detection: per term, counts in the first vs second
    half of the corpus (doc_id < / ≥ max_id/2 — the recrawl-delta shape)
    and the add-one-smoothed log momentum ln((b+1)/(a+1)) as e10. ONE
    conditional-partial merge carries both halves' counts (no second
    scan, no join); output is vocab-sized."""
    import pyarrow.parquet as pq_

    n_docs = pq_.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    half = n_docs // 2
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def explode(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t["text"], " ")
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        is_b = np.repeat((did >= half).astype(np.int64), lens)
        flat = pc.list_flatten(words)
        g = pa.table(
            {
                "w": flat,
                "cnt_a": pa.array(1 - is_b),
                "cnt_b": pa.array(is_b),
            }
        ).group_by(["w"]).aggregate([("cnt_a", "sum"), ("cnt_b", "sum")])
        return g.rename_columns(["w", "cnt_a", "cnt_b"])

    merged = merge_group_sums(
        docs.map_batches(explode, batch_format="pyarrow"),
        ["w"], ["cnt_a", "cnt_b"],
    )

    def momentum(t: pa.Table) -> pa.Table:
        a = t.column("cnt_a").to_numpy(zero_copy_only=False)
        b = t.column("cnt_b").to_numpy(zero_copy_only=False)
        mom = np.round(
            np.log((b + 1).astype(np.float64) / (a + 1).astype(np.float64))
            * 1e10
        ).astype(np.int64)
        return pa.table(
            {
                "w": t["w"],
                "cnt_a": pa.array(a),
                "cnt_b": pa.array(b),
                "momentum_e10": pa.array(mom),
            }
        )

    return merged.map_batches(momentum, batch_format="pyarrow")


SQL_TERM_MOMENTUM = """
WITH n AS (SELECT COUNT(*) // 2 AS half FROM documents),
wc AS (
  SELECT w,
         SUM(CASE WHEN doc_id < n.half THEN 1 ELSE 0 END) AS cnt_a,
         SUM(CASE WHEN doc_id >= n.half THEN 1 ELSE 0 END) AS cnt_b
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
        FROM documents), n
  GROUP BY 1
)
SELECT w, CAST(cnt_a AS BIGINT) AS cnt_a, CAST(cnt_b AS BIGINT) AS cnt_b,
       CAST(ROUND(LN(CAST(cnt_b + 1 AS DOUBLE)
                     / CAST(cnt_a + 1 AS DOUBLE)) * 1e10) AS BIGINT)
         AS momentum_e10
FROM wc
"""


# ---------------------------------------------------------------------------
# Nearest-neighbor distance distribution (spatial G-function)


NN_BINS = (0.024, 0.025, 0.026, 0.2)  # annuli splitting the cluster mode


def q_nn_distance_histogram(sf_dir: str) -> Dataset:
    """G-function sufficient statistics: per geotagged page, the squared
    distance to its nearest OTHER page, binned into annuli chosen to
    split the fixture's cluster mode (bins at the variogram scale left
    one populated row — vacuous-fixture rule) — truncated at rmax = 0.2° (points whose true NN lies beyond
    every 3×3 bucket window drop out; the standard truncated-G estimate,
    documented). Same one-bucket pair scatter as ripley/variogram; the
    per-point min collapses through ONE grouped-min merge before
    binning, so pair volume never reaches the histogram shuffle."""
    from .queries import _geotagged
    from ..stages.salted import default_partitions, merge_group_aggs

    pts = _geotagged(sf_dir)
    rmax = max(NN_BINS)
    edges = [(int(round(r * 1e6)), r * r) for r in NN_BINS]

    def scatter_left(t: pa.Table) -> pa.Table:
        t = t.filter(t.column("has_geo"))
        lat = t.column("lat").to_numpy(zero_copy_only=False)
        lon = t.column("lon").to_numpy(zero_copy_only=False)
        did = pc.cast(t.column("doc_id"), pa.int64()).to_numpy(zero_copy_only=False)
        clat = np.floor(lat / rmax).astype(np.int64)
        clon = np.floor(lon / rmax).astype(np.int64)
        n = len(did)
        d = np.array([-1, 0, 1], dtype=np.int64)
        rep = np.repeat(np.arange(n), 9)
        dy = np.tile(np.repeat(d, 3), n)
        dx = np.tile(np.tile(d, 3), n)
        cell = (clat[rep] + dy + 9000) * 100000 + (clon[rep] + dx + 18000)
        return pa.table(
            {
                "cell": pa.array(cell),
                "doc_a": pa.array(did[rep]),
                "lat_a": pa.array(lat[rep]),
                "lon_a": pa.array(lon[rep]),
            }
        )

    def right_side(t: pa.Table) -> pa.Table:
        t = t.filter(t.column("has_geo"))
        lat = t.column("lat").to_numpy(zero_copy_only=False)
        lon = t.column("lon").to_numpy(zero_copy_only=False)
        did = pc.cast(t.column("doc_id"), pa.int64()).to_numpy(zero_copy_only=False)
        clat = np.floor(lat / rmax).astype(np.int64)
        clon = np.floor(lon / rmax).astype(np.int64)
        return pa.table(
            {
                "cell_r": pa.array((clat + 9000) * 100000 + (clon + 18000)),
                "doc_b": pa.array(did),
                "lat_b": pa.array(lat),
                "lon_b": pa.array(lon),
            }
        )

    joined = pts.map_batches(scatter_left, batch_format="pyarrow").join(
        pts.map_batches(right_side, batch_format="pyarrow"),
        "inner",
        num_partitions=default_partitions(),
        on=("cell",),
        right_on=("cell_r",),
    )

    def local_min(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        dlat = t.column("lat_a").to_numpy(zero_copy_only=False) - t.column(
            "lat_b"
        ).to_numpy(zero_copy_only=False)
        dlon = t.column("lon_a").to_numpy(zero_copy_only=False) - t.column(
            "lon_b"
        ).to_numpy(zero_copy_only=False)
        d2 = dlat * dlat + dlon * dlon
        m = a != b
        g = pa.table(
            {"doc_a": pa.array(a[m]), "d2": pa.array(d2[m])}
        ).group_by(["doc_a"]).aggregate([("d2", "min")])
        return g.rename_columns(["doc_a", "d2"])

    per_point = merge_group_aggs(
        joined.map_batches(local_min, batch_format="pyarrow"),
        ["doc_a"], [("d2", "min")],
    )

    def bin_counts(t: pa.Table) -> pa.Table:
        d2 = t.column("d2").to_numpy(zero_copy_only=False)
        keys, counts = [], []
        lo2 = 0.0
        for r_e6, r2 in edges:
            c = int(np.count_nonzero((d2 > lo2) & (d2 <= r2)))
            if c:
                keys.append(r_e6)
                counts.append(c)
            lo2 = r2
        return pa.table(
            {
                "bin_e6": pa.array(np.asarray(keys, dtype=np.int64)),
                "n_points": pa.array(np.asarray(counts, dtype=np.int64)),
            }
        )

    return merge_group_sums(
        per_point.map_batches(bin_counts, batch_format="pyarrow"),
        ["bin_e6"], ["n_points"],
    )


def _sql_nn_histogram() -> str:
    from .queries import SQL_GEO_CTE

    arms, lo = [], "0.0"
    for r in NN_BINS:
        arms.append(
            f"""  SELECT {int(round(r * 1e6))} AS bin_e6,
         CAST(COUNT(*) AS BIGINT) AS n_points
  FROM nn WHERE d2 > {lo} AND d2 <= {r!r} * {r!r}"""
        )
        lo = f"{r!r} * {r!r}"
    arms_sql = "\n  UNION ALL\n".join(arms)
    return f"""
WITH {SQL_GEO_CTE},
nn AS (
  SELECT a.doc_id,
         MIN((a.lat - b.lat) * (a.lat - b.lat)
             + (a.lon - b.lon) * (a.lon - b.lon)) AS d2
  FROM geo a JOIN geo b ON a.doc_id <> b.doc_id
  GROUP BY 1
)
SELECT * FROM (
{arms_sql}
) WHERE n_points > 0
"""


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov distribution drift test


def q_doclen_ks_test(sf_dir: str) -> Dataset:
    """Exact two-sample KS statistic between the doc-length
    distributions of the first and second corpus halves (the
    term_momentum split): D = max|F₁−F₂| evaluated with the
    cross-multiplied ALL-INTEGER numerator max|c₁·n₂ − c₂·n₁| (one final
    division → e10). Distributed stage: per-(half, value) count merge —
    movement bounded by distinct lengths (for continuous columns,
    fixed-point bucket first, the percentiles convention); the cumsum +
    max runs on the bounded pulled table."""
    import pyarrow.parquet as pq_

    n_docs = pq_.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    half = n_docs // 2
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def partials(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        v = t.column("n_chars").to_numpy(zero_copy_only=False)
        h = (did >= half).astype(np.int64)
        g = pa.table(
            {
                "v": pa.array(v),
                "c1": pa.array(1 - h),
                "c2": pa.array(h),
            }
        ).group_by(["v"]).aggregate([("c1", "sum"), ("c2", "sum")])
        return g.rename_columns(["v", "c1", "c2"])

    cells = _pull_merged(
        merge_group_sums(
            docs.map_batches(partials, batch_format="pyarrow"),
            ["v"], ["c1", "c2"],
        ),
        ["v", "c1", "c2"],
    ).sort_by("v")
    c1 = np.cumsum(cells.column("c1").to_numpy(zero_copy_only=False))
    c2 = np.cumsum(cells.column("c2").to_numpy(zero_copy_only=False))
    n1, n2 = int(c1[-1]), int(c2[-1])
    d_num = int(np.abs(c1 * n2 - c2 * n1).max())
    d_e10 = int(np.round((float(d_num) / float(n1 * n2)) * 1e10))
    return rd.from_arrow(
        pa.table(
            {
                "n1": pa.array([n1], type=pa.int64()),
                "n2": pa.array([n2], type=pa.int64()),
                "d_num": pa.array([d_num], type=pa.int64()),
                "d_e10": pa.array([d_e10], type=pa.int64()),
            }
        )
    )


SQL_DOCLEN_KS_TEST = """
WITH n AS (SELECT COUNT(*) // 2 AS half FROM documents),
s AS (
  SELECT n_chars AS v,
         CASE WHEN doc_id < n.half THEN 0 ELSE 1 END AS h
  FROM documents, n
),
tot AS (
  SELECT SUM(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS n1,
         SUM(h) AS n2
  FROM s
),
c AS (
  SELECT v, SUM(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS c1,
         SUM(h) AS c2
  FROM s GROUP BY 1
),
cum AS (
  SELECT v,
         SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f1,
         SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f2
  FROM c
)
SELECT CAST(tot.n1 AS BIGINT) AS n1, CAST(tot.n2 AS BIGINT) AS n2,
       CAST(MAX(ABS(f1 * tot.n2 - f2 * tot.n1)) AS BIGINT) AS d_num,
       CAST(ROUND(CAST(MAX(ABS(f1 * tot.n2 - f2 * tot.n1)) AS DOUBLE)
                  / CAST(tot.n1 * tot.n2 AS DOUBLE) * 1e10) AS BIGINT)
         AS d_e10
FROM cum, tot GROUP BY tot.n1, tot.n2
"""


# ---------------------------------------------------------------------------
# Wilson confidence intervals and exact grouped mode

WILSON_Z = 1.96


def q_wilson_ci_conversion(sf_dir: str) -> Dataset:
    """Per event type, the share of ALL users who performed it, with the
    Wilson 95% score interval — one fixed float sequence over the two
    exact integers (k reached, n total users), z = 1.96 literal both
    sides; sqrt is in the bitwise-parity family. Counting distributes
    (distinct merges); the interval arithmetic is category-bounded."""
    from ..stages.salted import partial_count

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    per_type = _pull_merged(
        merge_group_sums(
            partial_count(
                merge_group_sums(
                    partial_count(
                        events, ["event_type", "user_id"], out="x"
                    ),
                    ["event_type", "user_id"], ["x"],
                ),
                ["event_type"], out="k",
            ),
            ["event_type"], ["k"],
        ),
        ["event_type", "k"],
    )
    n_total = merge_group_sums(
        partial_count(events, ["user_id"], out="x"), ["user_id"], ["x"]
    ).count()

    types = per_type.column("event_type").to_pylist()
    ks = per_type.column("k").to_numpy(zero_copy_only=False)
    rows = []
    z = WILSON_Z
    for t_, k_ in sorted(zip(types, ks.tolist())):
        n = float(n_total)
        p = float(k_) / n
        denom = 1.0 + (z * z) / n
        center = p + (z * z) / (2.0 * n)
        spread = z * np.sqrt(p * (1.0 - p) / n + (z * z) / (4.0 * n * n))
        lo = (center - spread) / denom
        hi = (center + spread) / denom
        rows.append(
            (
                t_, int(k_), int(n_total),
                int(np.round(lo * 1e10)), int(np.round(hi * 1e10)),
            )
        )
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], type=pa.string()),
                "k": pa.array([r[1] for r in rows], type=pa.int64()),
                "n": pa.array([r[2] for r in rows], type=pa.int64()),
                "lo_e10": pa.array([r[3] for r in rows], type=pa.int64()),
                "hi_e10": pa.array([r[4] for r in rows], type=pa.int64()),
            }
        )
    )


SQL_WILSON_CI_CONVERSION = """
WITH ut AS (SELECT DISTINCT event_type, user_id FROM events),
k AS (SELECT event_type, COUNT(*) AS k FROM ut GROUP BY 1),
n AS (SELECT COUNT(DISTINCT user_id) AS n FROM events),
w AS (
  SELECT event_type, k, n.n,
         CAST(k AS DOUBLE) / CAST(n.n AS DOUBLE) AS p,
         1.0 + (1.96 * 1.96) / CAST(n.n AS DOUBLE) AS denom,
         CAST(k AS DOUBLE) / CAST(n.n AS DOUBLE)
           + (1.96 * 1.96) / (2.0 * CAST(n.n AS DOUBLE)) AS center,
         1.96 * SQRT((CAST(k AS DOUBLE) / CAST(n.n AS DOUBLE))
                     * (1.0 - CAST(k AS DOUBLE) / CAST(n.n AS DOUBLE))
                     / CAST(n.n AS DOUBLE)
                     + (1.96 * 1.96)
                       / (4.0 * CAST(n.n AS DOUBLE)
                          * CAST(n.n AS DOUBLE))) AS spread
  FROM k, n
)
SELECT event_type, CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
       CAST(ROUND(((center - spread) / denom) * 1e10) AS BIGINT) AS lo_e10,
       CAST(ROUND(((center + spread) / denom) * 1e10) AS BIGINT) AS hi_e10
FROM w
"""


def q_quantity_mode(sf_dir: str) -> Dataset:
    """Exact MODE of l_quantity per return flag (ties → smallest
    quantity): (flag, qty) count partials through ONE grouped-sum merge
    — the cell table is domain-bounded (flags × 50 integer quantities)
    BY DEFINITION, so the argmax runs on the bounded pull."""
    from ..stages.salted import partial_count

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]
    )

    def derive(t: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(t["l_quantity"]), pa.int64())
        return pa.table({"l_returnflag": t["l_returnflag"], "qty": q})

    cells = _pull_merged(
        merge_group_sums(
            partial_count(
                li.map_batches(derive, batch_format="pyarrow"),
                ["l_returnflag", "qty"], out="n",
            ),
            ["l_returnflag", "qty"], ["n"],
        ),
        ["l_returnflag", "qty", "n"],
    )
    flags = np.asarray(cells.column("l_returnflag").to_pylist())
    qty = cells.column("qty").to_numpy(zero_copy_only=False)
    n = cells.column("n").to_numpy(zero_copy_only=False)
    order = np.lexsort((qty, -n, flags))
    flags, qty, n = flags[order], qty[order], n[order]
    starts = run_starts([flags])
    first = np.flatnonzero(starts)
    return rd.from_arrow(
        pa.table(
            {
                "l_returnflag": pa.array(flags[first], type=pa.string()),
                "mode_qty": pa.array(qty[first]),
                "n": pa.array(n[first]),
            }
        )
    )


SQL_QUANTITY_MODE = """
SELECT l_returnflag, mode_qty, n FROM (
  SELECT l_returnflag,
         CAST(ROUND(l_quantity, 0) AS BIGINT) AS mode_qty,
         COUNT(*) AS n,
         ROW_NUMBER() OVER (
           PARTITION BY l_returnflag
           ORDER BY COUNT(*) DESC, CAST(ROUND(l_quantity, 0) AS BIGINT)
         ) AS rn
  FROM lineitem GROUP BY 1, 2
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Distributed logistic-regression training steps (fixed-point exact)

LR_XSCALE = 100_000       # x fixed-point (e5)
LR_WSCALE = 1_000_000     # w fixed-point (e6)
LR_STEPS = 2


def q_logreg_2step(sf_dir: str) -> Dataset:
    """Two full-batch gradient-descent steps of logistic regression
    (y = label < 5, lr = 1) over the embedding table, exact at any
    parallelism: margins come from ALL-INTEGER dots (x e5 × w e6 →
    /1e11 as ONE division), σ uses EXP (bitwise family), per-element
    gradient terms round to e10 int64 before the ONE grouped-sum merge
    per step (order-free; round_even in SQL — x is float32-derived, the
    covariance tie rule), and the weight update is one exact-int
    division+round. Output: (di, w_fx) after step 2 — d-bounded.

    Movement per step: d partial rows per block; vectors never shuffle.
    The SQL oracle unrolls both steps over the unnest CTE."""
    import pyarrow.parquet as pq_
    import ray

    n_vecs = pq_.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    )
    w_fx = np.zeros(EMB_DIM, dtype=np.int64)
    for _ in range(LR_STEPS):
        ref = ray.put(w_fx)

        def grad_partials(t: pa.Table, _ref=ref) -> pa.Table:
            if len(t) == 0:
                return pa.table(
                    {
                        "di": pa.array([], type=pa.int64()),
                        "g": pa.array([], type=pa.int64()),
                    }
                )
            w = ray.get(_ref)
            m = _emb_matrix(t["embedding"])
            y = (
                t.column("label").to_numpy(zero_copy_only=False) < 5
            ).astype(np.float64)
            x_fx = np.round(m * LR_XSCALE).astype(np.int64)
            dot = (x_fx * w[None, :]).sum(axis=1)
            margin = dot.astype(np.float64) / np.float64(
                LR_XSCALE * LR_WSCALE
            )
            p = 1.0 / (1.0 + np.exp(-margin))
            resid = y - p
            g = np.round((resid[:, None] * m) * 1e10).astype(np.int64).sum(
                axis=0
            )
            return pa.table(
                {
                    "di": pa.array(np.arange(1, EMB_DIM + 1, dtype=np.int64)),
                    "g": pa.array(g),
                }
            )

        gt = _pull_merged(
            merge_group_sums(
                emb.map_batches(grad_partials, batch_format="pyarrow"),
                ["di"], ["g"],
            ),
            ["di", "g"],
        ).sort_by("di")
        g = gt.column("g").to_numpy(zero_copy_only=False)
        # w += lr·(g/1e10)/n in e6 fixed point = round(g / (n·1e4))
        delta = np.round(
            g.astype(np.float64) / np.float64(n_vecs * 10_000)
        ).astype(np.int64)
        w_fx = w_fx + delta

    return rd.from_arrow(
        pa.table(
            {
                "di": pa.array(np.arange(1, EMB_DIM + 1, dtype=np.int64)),
                "w_fx": pa.array(w_fx),
            }
        )
    )


SQL_LOGREG_2STEP = """
WITH e AS (
  SELECT vec_id, CAST(i AS BIGINT) AS i, CAST(x AS DOUBLE) AS x,
         CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS y,
         CAST(round_even(CAST(x AS DOUBLE) * 100000, 0) AS BIGINT) AS xf
  FROM (
    SELECT vec_id, label, UNNEST(embedding) AS x,
           generate_subscripts(embedding, 1) AS i
    FROM embeddings)
),
n AS (SELECT COUNT(*) AS nv FROM embeddings),
g1 AS (  -- step 1: w0 = 0 so every margin is 0 and p = 0.5
  SELECT i AS di,
         SUM(CAST(round_even((y - 0.5) * x * 1e10, 0) AS BIGINT)) AS g
  FROM e GROUP BY 1
),
w1 AS (
  SELECT di, CAST(ROUND(CAST(g AS DOUBLE)
               / CAST(n.nv * 10000 AS DOUBLE)) AS BIGINT) AS w
  FROM g1, n
),
m2 AS (
  SELECT e.vec_id,
         CAST(SUM(e.xf * w1.w) AS DOUBLE) / 1e11 AS margin
  FROM e JOIN w1 ON e.i = w1.di
  GROUP BY 1
),
p2 AS (
  SELECT vec_id, 1.0 / (1.0 + EXP(-margin)) AS p FROM m2
),
g2 AS (
  SELECT e.i AS di,
         SUM(CAST(round_even((e.y - p2.p) * e.x * 1e10, 0) AS BIGINT)) AS g
  FROM e JOIN p2 USING (vec_id)
  GROUP BY 1
)
SELECT w1.di,
       CAST(w1.w + CAST(ROUND(CAST(g2.g AS DOUBLE)
              / CAST(n.nv * 10000 AS DOUBLE)) AS BIGINT) AS BIGINT) AS w_fx
FROM w1 JOIN g2 USING (di), n
"""


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes language classifier (trained on the corpus)


def q_nb_lang_classify(sf_dir: str) -> Dataset:
    """Multinomial Naive Bayes: TRAIN per-(lang, word) add-one-smoothed
    log-likelihoods + log priors on the corpus itself (distributed count
    merges), then classify every document by integer log-posterior
    argmax (per-term ln rounded e10 → order-free int sums; ties break to
    the lexicographically smaller language — fully deterministic, the
    kmeans/PQ integer-ranking rule). Output (doc_id, pred_lang,
    score_e10).

    The model table broadcasts (vocab × langs — Heap's-law-bounded; the
    gated token-keyed join is the >20M-vocab fallback, attach_df
    convention); documents score in place and never shuffle."""
    import ray

    from ..stages.salted import partial_count

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def explode(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t["text"], " ")
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "lang": pc.cast(t["lang"], pa.string())
                .take(pa.array(np.repeat(np.arange(len(t)), lens))),
                "word": pc.list_flatten(words),
            }
        )

    cnt = _pull_merged(
        merge_group_sums(
            partial_count(
                docs.map_batches(explode, batch_format="pyarrow"),
                ["lang", "word"], out="n",
            ),
            ["lang", "word"], ["n"],
        ),
        ["lang", "word", "n"],
    )
    pri = _pull_merged(
        merge_group_sums(
            partial_count(docs, ["lang"], out="nd"), ["lang"], ["nd"]
        ),
        ["lang", "nd"],
    )
    langs = sorted(pri.column("lang").to_pylist())
    nd = dict(zip(pri.column("lang").to_pylist(),
                  pri.column("nd").to_numpy(zero_copy_only=False).tolist()))
    n_docs = sum(nd.values())
    cl = np.asarray(cnt.column("lang").to_pylist())
    cw = np.asarray(cnt.column("word").to_pylist())
    cn = cnt.column("n").to_numpy(zero_copy_only=False)
    vocab = np.unique(cw)
    V = len(vocab)
    tot = {L: int(cn[cl == L].sum()) for L in langs}
    # per-lang term vectors over the vocab + unseen default + prior
    term = np.zeros((len(langs), V), dtype=np.int64)
    default = np.zeros(len(langs), dtype=np.int64)
    prior = np.zeros(len(langs), dtype=np.int64)
    for li, L in enumerate(langs):
        denom = float(tot[L] + V)
        default[li] = int(np.round(np.log(1.0 / denom) * 1e10))
        term[li, :] = default[li]
        m = cl == L
        pos = np.searchsorted(vocab, cw[m])
        term[li, pos] = np.round(
            np.log((cn[m] + 1).astype(np.float64) / denom) * 1e10
        ).astype(np.int64)
        prior[li] = int(np.round(np.log(float(nd[L]) / float(n_docs)) * 1e10))
    vocab_arrow = pa.array(vocab.tolist(), type=pa.string())
    ref = ray.put((vocab_arrow, term, default, prior, np.asarray(langs)))

    def classify(t: pa.Table) -> pa.Table:
        voc, tm, df, pr, ls = ray.get(ref)
        words = pc.split_pattern(t["text"], " ")
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(t)), lens)
        # Arrow C++ dictionary lookup — no per-token Python
        pos = pc.index_in(
            pc.list_flatten(words), value_set=voc
        ).to_numpy(zero_copy_only=False)
        hit = ~np.isnan(pos) if pos.dtype.kind == "f" else np.ones(
            len(pos), dtype=bool
        )
        pos_clip = np.where(hit, pos, 0).astype(np.int64)
        scores = np.tile(pr[:, None], (1, len(t)))
        for li in range(len(ls)):
            tv = np.where(hit, tm[li][pos_clip], df[li])
            acc = np.zeros(len(t), dtype=np.int64)
            np.add.at(acc, doc_idx, tv)
            scores[li] += acc
        # argmax with lexicographic lang tie-break: langs are sorted, so
        # the FIRST maximal row wins
        best = np.argmax(scores, axis=0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "pred_lang": pa.array(ls[best], type=pa.string()),
                "score_e10": pa.array(
                    scores[best, np.arange(len(t))], type=pa.int64()
                ),
            }
        )

    return docs.map_batches(classify, batch_format="pyarrow")


SQL_NB_LANG_CLASSIFY = """
WITH w AS (
  SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS word
  FROM documents
),
cnt AS (SELECT lang, word, COUNT(*) AS n FROM w GROUP BY 1, 2),
tot AS (SELECT lang, SUM(n) AS t FROM cnt GROUP BY 1),
v AS (SELECT COUNT(DISTINCT word) AS v FROM w),
pri AS (SELECT lang, COUNT(*) AS nd FROM documents GROUP BY 1),
ndoc AS (SELECT COUNT(*) AS n FROM documents),
cand AS (
  SELECT p.lang AS cand, t.t, v.v,
         CAST(ROUND(LN(CAST(p.nd AS DOUBLE) / CAST(ndoc.n AS DOUBLE))
                    * 1e10) AS BIGINT) AS prior
  FROM pri p JOIN tot t ON t.lang = p.lang, v, ndoc
),
terms AS (
  SELECT wd.doc_id, c.cand,
         CAST(ROUND(LN(CAST(COALESCE(k.n, 0) + 1 AS DOUBLE)
                       / CAST(c.t + c.v AS DOUBLE)) * 1e10) AS BIGINT)
           AS term
  FROM w wd
  CROSS JOIN cand c
  LEFT JOIN cnt k ON k.lang = c.cand AND k.word = wd.word
),
scores AS (
  SELECT t.doc_id, t.cand,
         CAST(MIN(c.prior) + SUM(t.term) AS BIGINT) AS score
  FROM terms t JOIN cand c ON c.cand = t.cand
  GROUP BY 1, 2
),
ranked AS (
  SELECT doc_id, cand, score,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY score DESC, cand) AS rn
  FROM scores
)
SELECT doc_id, cand AS pred_lang, score AS score_e10
FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion of two retrieval rankings

RRF_K = 60
RRF_TOP = 5


def q_rrf_fusion_topk(sf_dir: str) -> Dataset:
    """Reciprocal-rank fusion (RRF, k=60) of the full-precision and
    truncated-dimension top-10 rankings (the ndcg_truncation_eval pair):
    fused(c) = Σ_lists 1/(60+rank). Scores are two IEEE divisions + one
    commutative add over exact integer ranks → bitwise both sides;
    fusion ranking happens on e10 INTEGERS with candidate-id ties
    (round-5 comparison rule). Output: top-5 fused per query.

    Same broadcast-once distribution as the eval op — each query batch
    fuses independently; the sharded-IVF path swaps in identically."""
    import pyarrow.parquet as pq_
    import ray

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    full_tbl = pq_.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = full_tbl.column("vec_id").to_numpy(zero_copy_only=False)
    M = _emb_matrix(full_tbl.column("embedding"))
    order = np.argsort(ids)
    ids, M = ids[order], M[order]
    nf = np.sqrt((M * M).sum(axis=1))
    Mt = M[:, :NDCG_TRUNC_DIMS]
    nt = np.sqrt((Mt * Mt).sum(axis=1))
    ref = ray.put((ids, M, nf, Mt, nt))

    def fuse_block(t: pa.Table) -> pa.Table:
        ids_, M_, nf_, Mt_, nt_ = ray.get(ref)
        q = _emb_matrix(t["embedding"])
        qid = t.column("vec_id").to_numpy(zero_copy_only=False)
        qn_f = np.sqrt((q * q).sum(axis=1))
        qt = q[:, :NDCG_TRUNC_DIMS]
        qn_t = np.sqrt((qt * qt).sum(axis=1))

        def topk(sim_e6: np.ndarray, self_pos: np.ndarray) -> np.ndarray:
            key = sim_e6 * np.int64(1 << 21) - ids_[None, :]
            key[np.arange(len(key)), self_pos] = np.iinfo(np.int64).min + 1
            part = np.argpartition(-key, NDCG_K, axis=1)[:, :NDCG_K]
            kk = np.take_along_axis(key, part, axis=1)
            ordk = np.argsort(-kk, axis=1, kind="stable")
            return np.take_along_axis(part, ordk, axis=1)

        self_pos = np.searchsorted(ids_, qid)
        cos_f = (q @ M_.T) / (qn_f[:, None] * nf_[None, :])
        exact = topk(np.round(cos_f * 1e6).astype(np.int64), self_pos)
        cos_t = (qt @ Mt_.T) / (qn_t[:, None] * nt_[None, :])
        approx = topk(np.round(cos_t * 1e6).astype(np.int64), self_pos)

        out_q, out_c, out_s, out_r = [], [], [], []
        for row in range(len(q)):  # queries per batch; inner work is K-bounded
            scores: dict[int, float] = {}
            for lst in (exact[row], approx[row]):
                for r_, cpos in enumerate(lst):
                    c = int(ids_[cpos])
                    scores[c] = scores.get(c, 0.0) + 1.0 / (RRF_K + r_ + 1)
            fused = sorted(
                ((int(np.round(s * 1e10)), c) for c, s in scores.items()),
                key=lambda kv: (-kv[0], kv[1]),
            )[:RRF_TOP]
            for rk, (s_e10, c) in enumerate(fused, 1):
                out_q.append(int(qid[row]))
                out_c.append(c)
                out_s.append(s_e10)
                out_r.append(rk)
        return pa.table(
            {
                "vec_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_c, type=pa.int64()),
                "rrf_e10": pa.array(out_s, type=pa.int64()),
                "fused_rank": pa.array(out_r, type=pa.int64()),
            }
        )

    return emb.map_batches(fuse_block, batch_format="pyarrow")


SQL_RRF_FUSION_TOPK = """
WITH p AS (
  SELECT a.vec_id AS q, b.vec_id AS c,
         CAST(ROUND(list_cosine_similarity(
           CAST(a.embedding AS DOUBLE[]),
           CAST(b.embedding AS DOUBLE[])) * 1e6) AS BIGINT) AS sf,
         CAST(ROUND(list_cosine_similarity(
           CAST(a.embedding[1:16] AS DOUBLE[]),
           CAST(b.embedding[1:16] AS DOUBLE[])) * 1e6) AS BIGINT) AS st
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
ex AS (
  SELECT q, c, ROW_NUMBER() OVER (
    PARTITION BY q ORDER BY sf DESC, c) AS r
  FROM p QUALIFY r <= 10
),
ap AS (
  SELECT q, c, ROW_NUMBER() OVER (
    PARTITION BY q ORDER BY st DESC, c) AS r
  FROM p QUALIFY r <= 10
),
fused AS (
  SELECT COALESCE(ex.q, ap.q) AS q, COALESCE(ex.c, ap.c) AS c,
         CAST(ROUND((COALESCE(1.0 / (60 + ex.r), 0.0)
                     + COALESCE(1.0 / (60 + ap.r), 0.0)) * 1e10)
              AS BIGINT) AS rrf_e10
  FROM ex FULL OUTER JOIN ap ON ex.q = ap.q AND ex.c = ap.c
),
ranked AS (
  SELECT q, c, rrf_e10,
         ROW_NUMBER() OVER (
           PARTITION BY q ORDER BY rrf_e10 DESC, c) AS fused_rank
  FROM fused
)
SELECT q AS vec_id, c AS neighbor_id, rrf_e10,
       CAST(fused_rank AS BIGINT) AS fused_rank
FROM ranked WHERE fused_rank <= 5
"""


# ---------------------------------------------------------------------------
# Churn feature/label extraction and Jensen–Shannon divergence panel

CHURN_WEEK_US = 7 * 24 * US_PER_HOUR


def q_churn_features(sf_dir: str) -> Dataset:
    """Feature/label extraction for churn modeling: per user, event
    counts in stream-weeks 1–3 as features and churned = no events in
    week 4+ as the label (week boundaries from the global stream start —
    a parquet-footer min, zero-pass). ONE conditional-partial merge
    carries all four counters; output is user-sized, all-integer."""
    import pyarrow.parquet as pq_

    meta = pq_.read_metadata(f"{sf_dir}/events.parquet")
    # footer stats give the global min ts (the round-5 zero-pass rule)
    from datetime import datetime

    t0 = None
    for rg in range(meta.num_row_groups):
        col = meta.row_group(rg).column(1)  # ts column
        mn = col.statistics.min
        if hasattr(mn, "year"):
            td = mn.replace(tzinfo=None) - datetime(1970, 1, 1)
            # exact integer epoch-us (float .timestamp() rounds the µs)
            v = (td.days * 86_400_000_000
                 + td.seconds * 1_000_000 + td.microseconds)
        else:
            v = int(mn)
        t0 = v if t0 is None else min(t0, v)

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def partials(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        week = (us - t0) // CHURN_WEEK_US
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        cols = {"user_id": pa.array(u)}
        for w in range(3):
            cols[f"w{w + 1}"] = pa.array((week == w).astype(np.int64))
        cols["later"] = pa.array((week >= 3).astype(np.int64))
        g = pa.table(cols).group_by(["user_id"]).aggregate(
            [(f"w{w + 1}", "sum") for w in range(3)] + [("later", "sum")]
        )
        return g.rename_columns(["user_id", "w1", "w2", "w3", "later"])

    merged = merge_group_sums(
        events.map_batches(partials, batch_format="pyarrow"),
        ["user_id"], ["w1", "w2", "w3", "later"],
    )

    def finalize(t: pa.Table) -> pa.Table:
        later = t.column("later").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t["user_id"],
                "w1": t["w1"],
                "w2": t["w2"],
                "w3": t["w3"],
                "churned": pa.array((later == 0).astype(np.int64)),
            }
        )

    return merged.map_batches(finalize, batch_format="pyarrow")


SQL_CHURN_FEATURES = """
WITH t0 AS (SELECT epoch_us(MIN(ts)) AS v FROM events),
w AS (
  SELECT user_id,
         (epoch_us(ts) - t0.v) // 604800000000 AS wk
  FROM events, t0
)
SELECT user_id,
       CAST(SUM(CASE WHEN wk = 0 THEN 1 ELSE 0 END) AS BIGINT) AS w1,
       CAST(SUM(CASE WHEN wk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS w2,
       CAST(SUM(CASE WHEN wk = 2 THEN 1 ELSE 0 END) AS BIGINT) AS w3,
       CAST(CASE WHEN SUM(CASE WHEN wk >= 3 THEN 1 ELSE 0 END) = 0
                 THEN 1 ELSE 0 END AS BIGINT) AS churned
FROM w GROUP BY 1
"""


def q_lang_js_divergence(sf_dir: str) -> Dataset:
    """Pairwise Jensen–Shannon divergence between the language unigram
    distributions: (lang, word) counts merge (the nb_lang training
    movement), then the vocabulary-bounded pairwise panel — per term
    0.5·(p·ln(2p/(p+q)) + q·ln(2q/(p+q))) rounded e10 and integer-summed
    (order-free). Zero-count terms contribute their one-sided limit
    (q=0 ⇒ 0.5·p·ln 2) exactly via the same formula with the 0 literal
    (guarded: ln term skipped when the numerator count is 0)."""
    from ..stages.salted import partial_count

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text", "lang"])

    def explode(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t["text"], " ")
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "lang": pc.cast(t["lang"], pa.string()).take(
                    pa.array(np.repeat(np.arange(len(t)), lens))
                ),
                "word": pc.list_flatten(words),
            }
        )

    cnt = _pull_merged(
        merge_group_sums(
            partial_count(
                docs.map_batches(explode, batch_format="pyarrow"),
                ["lang", "word"], out="n",
            ),
            ["lang", "word"], ["n"],
        ),
        ["lang", "word", "n"],
    )
    cl = np.asarray(cnt.column("lang").to_pylist())
    cw = np.asarray(cnt.column("word").to_pylist())
    cn = cnt.column("n").to_numpy(zero_copy_only=False)
    langs = sorted(set(cl.tolist()))
    vocab = np.unique(cw)
    mat = np.zeros((len(langs), len(vocab)), dtype=np.int64)
    for li, L in enumerate(langs):
        m = cl == L
        mat[li, np.searchsorted(vocab, cw[m])] = cn[m]
    tot = mat.sum(axis=1).astype(np.float64)
    rows = []
    for i in range(len(langs)):
        for j in range(i + 1, len(langs)):
            p = mat[i].astype(np.float64) / tot[i]
            q = mat[j].astype(np.float64) / tot[j]
            s = p + q
            with np.errstate(divide="ignore", invalid="ignore"):
                tp = np.where(
                    mat[i] > 0, p * np.log((2.0 * p) / s), 0.0
                )
                tq = np.where(
                    mat[j] > 0, q * np.log((2.0 * q) / s), 0.0
                )
            terms = np.round((0.5 * (tp + tq)) * 1e10).astype(np.int64)
            rows.append((langs[i], langs[j], int(terms.sum())))
    return rd.from_arrow(
        pa.table(
            {
                "lang_a": pa.array([r[0] for r in rows], type=pa.string()),
                "lang_b": pa.array([r[1] for r in rows], type=pa.string()),
                "jsd_e10": pa.array([r[2] for r in rows], type=pa.int64()),
            }
        )
    )


SQL_LANG_JS_DIVERGENCE = """
WITH wc AS (
  SELECT lang, word, COUNT(*) AS n FROM (
    SELECT lang, UNNEST(string_split(text, ' ')) AS word FROM documents)
  GROUP BY 1, 2
),
tot AS (SELECT lang, SUM(n) AS t FROM wc GROUP BY 1),
vocab AS (SELECT DISTINCT word FROM wc),
grid AS (
  SELECT a.lang AS la, b.lang AS lb, v.word
  FROM tot a JOIN tot b ON a.lang < b.lang, vocab v
),
cells AS (
  SELECT g.la, g.lb, g.word,
         CAST(COALESCE(ca.n, 0) AS DOUBLE)
           / CAST(ta.t AS DOUBLE) AS p,
         CAST(COALESCE(cb.n, 0) AS DOUBLE)
           / CAST(tb.t AS DOUBLE) AS q,
         COALESCE(ca.n, 0) AS na, COALESCE(cb.n, 0) AS nb
  FROM grid g
  JOIN tot ta ON ta.lang = g.la
  JOIN tot tb ON tb.lang = g.lb
  LEFT JOIN wc ca ON ca.lang = g.la AND ca.word = g.word
  LEFT JOIN wc cb ON cb.lang = g.lb AND cb.word = g.word
)
SELECT la AS lang_a, lb AS lang_b,
       CAST(SUM(CAST(ROUND((0.5 * (
           CASE WHEN na > 0 THEN p * LN((2.0 * p) / (p + q)) ELSE 0.0 END
         + CASE WHEN nb > 0 THEN q * LN((2.0 * q) / (p + q)) ELSE 0.0 END
       )) * 1e10) AS BIGINT)) AS BIGINT) AS jsd_e10
FROM cells GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Farthest-point (k-center greedy) seeding

KCENTER_K = 4


def q_kcenter_seeds(sf_dir: str) -> Dataset:
    """Deterministic k-means++-style seeding without RNG: farthest-point
    greedy (k-center) — seed₀ = vec 0, then k−1 rounds of the
    DISTRIBUTED ARGMAX of min-distance-to-seeds (squared euclidean on
    e5 fixed-point ints: per-dim diff² ≤ 4e10, 64-dim sums ≤ 2.6e12 —
    exact int64, order-free; ties break to the smaller vec_id). Per
    round: seeds broadcast (≤ k·d ints) → per-batch min over seeds →
    block-local top-1 rows → driver pick (block-count-bounded pull).
    Output: (seed_rank, vec_id, mindist_fx) — mindist is the chosen
    point's distance to the PRIOR seed set (seed₀'s is 0)."""
    import pyarrow.parquet as pq_
    import ray

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    first = pq_.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids0 = first.column("vec_id").to_numpy(zero_copy_only=False)
    M0 = np.round(
        _emb_matrix(first.column("embedding")) * LR_XSCALE
    ).astype(np.int64)
    seed_ids = [int(ids0.min())]
    seed_vecs = [M0[np.argmin(ids0)]]
    out_rows = [(1, seed_ids[0], 0)]
    for rank in range(2, KCENTER_K + 1):
        ref = ray.put((np.vstack(seed_vecs), np.asarray(seed_ids)))

        def local_best(t: pa.Table, _ref=ref) -> pa.Table:
            if len(t) == 0:
                return pa.table(
                    {
                        "vec_id": pa.array([], type=pa.int64()),
                        "d": pa.array([], type=pa.int64()),
                    }
                )
            sv, sid = ray.get(_ref)
            m = np.round(_emb_matrix(t["embedding"]) * LR_XSCALE).astype(
                np.int64
            )
            vid = t.column("vec_id").to_numpy(zero_copy_only=False)
            dmin = None
            for s in sv:  # ≤ k seeds, constant-bounded loop
                diff = m - s[None, :]
                d = (diff * diff).sum(axis=1)
                dmin = d if dmin is None else np.minimum(dmin, d)
            dmin = np.where(np.isin(vid, sid), -1, dmin)
            best = np.lexsort((vid, -dmin))[0]
            return pa.table(
                {
                    "vec_id": pa.array([int(vid[best])]),
                    "d": pa.array([int(dmin[best])]),
                }
            )

        winners = _pull_merged(
            emb.map_batches(local_best, batch_format="pyarrow"),
            ["vec_id", "d"],
        )
        wid = winners.column("vec_id").to_numpy(zero_copy_only=False)
        wd = winners.column("d").to_numpy(zero_copy_only=False)
        pick = np.lexsort((wid, -wd))[0]
        seed_ids.append(int(wid[pick]))
        seed_vecs.append(M0[np.flatnonzero(ids0 == wid[pick])[0]])
        out_rows.append((rank, int(wid[pick]), int(wd[pick])))

    return rd.from_arrow(
        pa.table(
            {
                "seed_rank": pa.array([r[0] for r in out_rows], type=pa.int64()),
                "vec_id": pa.array([r[1] for r in out_rows], type=pa.int64()),
                "mindist_fx": pa.array([r[2] for r in out_rows], type=pa.int64()),
            }
        )
    )


SQL_KCENTER_SEEDS = """
WITH e AS (
  SELECT vec_id, CAST(i AS BIGINT) AS i,
         CAST(round_even(CAST(x AS DOUBLE) * 100000, 0) AS BIGINT) AS xf
  FROM (
    SELECT vec_id, UNNEST(embedding) AS x,
           generate_subscripts(embedding, 1) AS i
    FROM embeddings)
),
s0 AS (SELECT MIN(vec_id) AS id FROM e),
d0 AS (
  SELECT a.vec_id, SUM((a.xf - b.xf) * (a.xf - b.xf)) AS d
  FROM e a JOIN e b ON b.vec_id = (SELECT id FROM s0) AND a.i = b.i
  WHERE a.vec_id <> (SELECT id FROM s0)
  GROUP BY 1
),
s1 AS (SELECT vec_id AS id, d FROM d0 ORDER BY d DESC, vec_id LIMIT 1),
d1 AS (
  SELECT a.vec_id, LEAST(d0.d,
           SUM((a.xf - b.xf) * (a.xf - b.xf))) AS d
  FROM e a JOIN e b ON b.vec_id = (SELECT id FROM s1) AND a.i = b.i
  JOIN d0 ON d0.vec_id = a.vec_id
  WHERE a.vec_id NOT IN ((SELECT id FROM s0), (SELECT id FROM s1))
  GROUP BY 1, d0.d
),
s2 AS (SELECT vec_id AS id, d FROM d1 ORDER BY d DESC, vec_id LIMIT 1),
d2 AS (
  SELECT a.vec_id, LEAST(d1.d,
           SUM((a.xf - b.xf) * (a.xf - b.xf))) AS d
  FROM e a JOIN e b ON b.vec_id = (SELECT id FROM s2) AND a.i = b.i
  JOIN d1 ON d1.vec_id = a.vec_id
  WHERE a.vec_id <> (SELECT id FROM s2)
  GROUP BY 1, d1.d
),
s3 AS (SELECT vec_id AS id, d FROM d2 ORDER BY d DESC, vec_id LIMIT 1)
SELECT CAST(1 AS BIGINT) AS seed_rank, (SELECT id FROM s0) AS vec_id,
       CAST(0 AS BIGINT) AS mindist_fx
UNION ALL SELECT 2, id, CAST(d AS BIGINT) FROM s1
UNION ALL SELECT 3, id, CAST(d AS BIGINT) FROM s2
UNION ALL SELECT 4, id, CAST(d AS BIGINT) FROM s3
"""


# ---------------------------------------------------------------------------
# Hysteresis burst-state labeling over hourly volume


def q_burst_states(sf_dir: str) -> Dataset:
    """Burst detection with hysteresis over hourly event volume: state
    flips to BURST when 4·x > 5·mean (x > 1.25·mean) and back when
    4·x < 3·mean, carrying the previous state in between (the two-state
    Kleinberg shape with exact INTEGER thresholds — 4·x·H vs 5·total
    cross-multiplication, no float comparisons anywhere). Counting
    distributes; the carry runs on the calendar-bounded hourly spine
    (LAST_VALUE IGNORE NULLS twin in SQL)."""
    from ..stages.salted import partial_count

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def derive(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        return pa.table(
            {"hour": pc.divide(us, pa.scalar(US_PER_HOUR, type=pa.int64()))}
        )

    hourly = _pull_merged(
        merge_group_sums(
            partial_count(
                events.map_batches(derive, batch_format="pyarrow"),
                ["hour"], out="n",
            ),
            ["hour"], ["n"],
        ),
        ["hour", "n"],
    ).sort_by("hour")
    hrs = hourly.column("hour").to_numpy(zero_copy_only=False)
    ns = hourly.column("n").to_numpy(zero_copy_only=False)
    spine = np.arange(hrs[0], hrs[-1] + 1, dtype=np.int64)
    full = np.zeros(len(spine), dtype=np.int64)
    full[np.searchsorted(spine, hrs)] = ns
    H = len(spine)
    total = int(full.sum())
    hi = 4 * full * H > 5 * total
    lo = 4 * full * H < 3 * total
    flag = np.where(hi, 1, np.where(lo, 0, -1))
    # carry: last non-(-1) flag, default 0
    state = np.zeros(H, dtype=np.int64)
    cur = 0
    for i, f in enumerate(flag.tolist()):  # calendar-bounded serial carry
        if f >= 0:
            cur = int(f)
        state[i] = cur
    return rd.from_arrow(
        pa.table(
            {
                "hour": pa.array(spine),
                "n_events": pa.array(full),
                "burst": pa.array(state),
            }
        )
    )


SQL_BURST_STATES = """
WITH h AS (
  SELECT epoch_us(ts) // 3600000000 AS hour, COUNT(*) AS n
  FROM events GROUP BY 1
),
spine AS (
  SELECT UNNEST(generate_series(
    (SELECT MIN(hour) FROM h), (SELECT MAX(hour) FROM h))) AS hour
),
x AS (
  SELECT spine.hour, CAST(COALESCE(h.n, 0) AS BIGINT) AS n
  FROM spine LEFT JOIN h ON spine.hour = h.hour
),
tot AS (SELECT SUM(n) AS total, COUNT(*) AS hh FROM x),
f AS (
  SELECT x.hour, x.n,
         CASE WHEN 4 * x.n * tot.hh > 5 * tot.total THEN 1
              WHEN 4 * x.n * tot.hh < 3 * tot.total THEN 0
              ELSE NULL END AS flag
  FROM x, tot
)
SELECT hour, n AS n_events,
       CAST(COALESCE(LAST_VALUE(flag IGNORE NULLS) OVER (
         ORDER BY hour ROWS UNBOUNDED PRECEDING), 0) AS BIGINT) AS burst
FROM f
"""


# ---------------------------------------------------------------------------
# Theil–Sen robust trend of hourly volume


def q_theil_sen_hourly(sf_dir: str) -> Dataset:
    """Robust (Theil–Sen) trend of hourly event volume: the MEDIAN of
    all pairwise slopes (nⱼ−nᵢ)/(hⱼ−hᵢ) over the calendar-bounded hourly
    spine. Slopes are one exact-int division each (bitwise both sides),
    ranked as e10 integers with PERCENTILE_DISC's 1-based ceil(n/2)
    element (the property-tested round-2 rule). The hourly count merge
    is the distributed stage; the C(H,2) pair table is spine-bounded
    (720 hours → 259K pairs) and never touches raw events."""
    from ..stages.salted import partial_count

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def derive(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        return pa.table(
            {"hour": pc.divide(us, pa.scalar(US_PER_HOUR, type=pa.int64()))}
        )

    hourly = _pull_merged(
        merge_group_sums(
            partial_count(
                events.map_batches(derive, batch_format="pyarrow"),
                ["hour"], out="n",
            ),
            ["hour"], ["n"],
        ),
        ["hour", "n"],
    ).sort_by("hour")
    hrs = hourly.column("hour").to_numpy(zero_copy_only=False)
    ns = hourly.column("n").to_numpy(zero_copy_only=False)
    spine = np.arange(hrs[0], hrs[-1] + 1, dtype=np.int64)
    full = np.zeros(len(spine), dtype=np.int64)
    full[np.searchsorted(spine, hrs)] = ns
    i, j = np.triu_indices(len(spine), k=1)
    slopes = np.round(
        (full[j] - full[i]).astype(np.float64)
        / (spine[j] - spine[i]).astype(np.float64) * 1e10
    ).astype(np.int64)
    slopes.sort()
    n_pairs = len(slopes)
    med = int(slopes[int(np.ceil(0.5 * n_pairs)) - 1])
    return rd.from_arrow(
        pa.table(
            {
                "n_pairs": pa.array([n_pairs], type=pa.int64()),
                "slope_e10": pa.array([med], type=pa.int64()),
            }
        )
    )


SQL_THEIL_SEN_HOURLY = """
WITH h AS (
  SELECT epoch_us(ts) // 3600000000 AS hour, COUNT(*) AS n
  FROM events GROUP BY 1
),
spine AS (
  SELECT UNNEST(generate_series(
    (SELECT MIN(hour) FROM h), (SELECT MAX(hour) FROM h))) AS hour
),
x AS (
  SELECT spine.hour, CAST(COALESCE(h.n, 0) AS BIGINT) AS n
  FROM spine LEFT JOIN h ON spine.hour = h.hour
),
p AS (
  SELECT CAST(ROUND(CAST(b.n - a.n AS DOUBLE)
               / CAST(b.hour - a.hour AS DOUBLE) * 1e10) AS BIGINT) AS s
  FROM x a JOIN x b ON b.hour > a.hour
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY s) AS BIGINT)
         AS slope_e10
FROM p
"""


# ---------------------------------------------------------------------------
# Classifier agreement: confusion matrix + Cohen's kappa


def q_nb_confusion_kappa(sf_dir: str) -> Dataset:
    """Confusion matrix of the Naive Bayes classifier against the true
    language, with Cohen's kappa attached to every cell: kappa =
    (p_o − p_e)/(1 − p_e) from EXACT integer cell counts (one shared
    float sequence, e10). The classify map carries the true lang
    through (1:1 row alignment, no join); cells merge once
    (|langs|²-bounded)."""
    import ray

    from ..stages.salted import partial_count

    # re-run the classifier map with lang carried (same broadcast model)
    base = q_nb_lang_classify(sf_dir)
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    truth = pa.concat_tables(
        [ray.get(r) for r in docs.to_arrow_refs()],
        promote_options="permissive",
    )
    tmap = dict(
        zip(
            truth.column("doc_id").to_numpy(zero_copy_only=False).tolist(),
            truth.column("lang").to_pylist(),
        )
    )
    tref = ray.put(
        (
            np.sort(truth.column("doc_id").to_numpy(zero_copy_only=False)),
            np.asarray(
                [tmap[k] for k in sorted(tmap)], dtype=object
            ),
        )
    )

    def attach_truth(t: pa.Table) -> pa.Table:
        ks, ls = ray.get(tref)
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ks, did)
        return pa.table(
            {
                "lang": pa.array(ls[pos].tolist(), type=pa.string()),
                "pred_lang": t["pred_lang"],
            }
        )

    cells = _pull_merged(
        merge_group_sums(
            partial_count(
                base.map_batches(attach_truth, batch_format="pyarrow"),
                ["lang", "pred_lang"], out="n",
            ),
            ["lang", "pred_lang"], ["n"],
        ),
        ["lang", "pred_lang", "n"],
    )
    la = np.asarray(cells.column("lang").to_pylist())
    pr = np.asarray(cells.column("pred_lang").to_pylist())
    n = cells.column("n").to_numpy(zero_copy_only=False)
    total = int(n.sum())
    agree = int(n[la == pr].sum())
    langs = sorted(set(la.tolist()) | set(pr.tolist()))
    pe_num = 0
    for L in langs:
        row = int(n[la == L].sum())
        col = int(n[pr == L].sum())
        pe_num += row * col
    po = float(agree) / float(total)
    pe = float(pe_num) / float(total * total)
    kappa = int(np.round(((po - pe) / (1.0 - pe)) * 1e10))
    order = np.lexsort((pr, la))
    return rd.from_arrow(
        pa.table(
            {
                "lang": pa.array(la[order].tolist(), type=pa.string()),
                "pred_lang": pa.array(pr[order].tolist(), type=pa.string()),
                "n": pa.array(n[order]),
                "kappa_e10": pa.array(
                    np.full(len(n), kappa, dtype=np.int64)
                ),
            }
        )
    )


SQL_NB_CONFUSION_KAPPA = f"""
WITH pred AS ({SQL_NB_LANG_CLASSIFY.strip()}),
conf AS (
  SELECT d.lang, p.pred_lang, COUNT(*) AS n
  FROM pred p JOIN documents d USING (doc_id)
  GROUP BY 1, 2
),
tot AS (SELECT SUM(n) AS t FROM conf),
agree AS (
  SELECT COALESCE(SUM(n), 0) AS a FROM conf WHERE lang = pred_lang
),
pe AS (
  SELECT SUM(r.rn * c.cn) AS num FROM
    (SELECT lang AS L, SUM(n) AS rn FROM conf GROUP BY 1) r
  JOIN (SELECT pred_lang AS L, SUM(n) AS cn FROM conf GROUP BY 1) c
    USING (L)
),
k AS (
  SELECT CAST(ROUND((((CAST(agree.a AS DOUBLE) / CAST(tot.t AS DOUBLE))
            - (CAST(pe.num AS DOUBLE) / CAST(tot.t * tot.t AS DOUBLE)))
           / (1.0 - (CAST(pe.num AS DOUBLE)
                     / CAST(tot.t * tot.t AS DOUBLE)))) * 1e10) AS BIGINT)
           AS kappa
  FROM agree, tot, pe
)
SELECT conf.lang, conf.pred_lang, CAST(conf.n AS BIGINT) AS n,
       k.kappa AS kappa_e10
FROM conf, k
"""


# ---------------------------------------------------------------------------
# Chi-square independence test (lang × source)


def q_lang_source_chisq(sf_dir: str) -> Dataset:
    """Pearson chi-square independence test between document language
    and source: joint cell counts merge once (category²-bounded), the
    statistic assembles from exact integers — per cell
    (n·N − r·c)²/(r·c·N) as e10 with the products kept in big-int space
    (SQL HUGEINT / Python int) before ONE float division per cell,
    summed as integers (order-free). Output: cells + dof + chi2."""
    from ..stages.salted import partial_count

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "source"]
    )
    cells = _pull_merged(
        merge_group_sums(
            partial_count(docs, ["lang", "source"], out="n"),
            ["lang", "source"], ["n"],
        ),
        ["lang", "source", "n"],
    )
    la = np.asarray(cells.column("lang").to_pylist())
    so = np.asarray(cells.column("source").to_pylist())
    n = cells.column("n").to_numpy(zero_copy_only=False)
    N = int(n.sum())
    langs = sorted(set(la.tolist()))
    sources = sorted(set(so.tolist()))
    row = {L: int(n[la == L].sum()) for L in langs}
    col = {S: int(n[so == S].sum()) for S in sources}
    # chi2 over the FULL grid (zero cells contribute r·c/N²·N = rc/N)
    chi_terms = []
    obs = {(a, b): int(v) for a, b, v in zip(la, so, n)}
    for L in langs:
        for S in sources:
            o = obs.get((L, S), 0)
            num = (o * N - row[L] * col[S]) ** 2  # exact big int
            den = row[L] * col[S] * N
            chi_terms.append(int(np.round(float(num) / float(den) * 1e10)))
    chi2 = sum(chi_terms)
    dof = (len(langs) - 1) * (len(sources) - 1)
    order = np.lexsort((so, la))
    return rd.from_arrow(
        pa.table(
            {
                "lang": pa.array(la[order].tolist(), type=pa.string()),
                "source": pa.array(so[order].tolist(), type=pa.string()),
                "n": pa.array(n[order]),
                "dof": pa.array(np.full(len(n), dof, dtype=np.int64)),
                "chi2_e10": pa.array(
                    np.full(len(n), chi2, dtype=np.int64)
                ),
            }
        )
    )


SQL_LANG_SOURCE_CHISQ = """
WITH c AS (
  SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2
),
r AS (SELECT lang, SUM(n) AS rn FROM c GROUP BY 1),
s AS (SELECT source, SUM(n) AS cn FROM c GROUP BY 1),
t AS (SELECT SUM(n) AS nn FROM c),
grid AS (
  SELECT r.lang, s.source, r.rn, s.cn, t.nn,
         COALESCE(c.n, 0) AS o
  FROM r CROSS JOIN s CROSS JOIN t
  LEFT JOIN c USING (lang, source)
),
k AS (
  SELECT CAST(SUM(CAST(ROUND(
           CAST((o * nn - rn * cn) * (o * nn - rn * cn) AS DOUBLE)
           / CAST(rn * cn * nn AS DOUBLE) * 1e10) AS BIGINT)) AS BIGINT)
           AS chi2,
         CAST(((SELECT COUNT(*) FROM r) - 1)
              * ((SELECT COUNT(*) FROM s) - 1) AS BIGINT) AS dof
  FROM grid
)
SELECT c.lang, c.source, CAST(c.n AS BIGINT) AS n, k.dof,
       k.chi2 AS chi2_e10
FROM c, k
"""


# ---------------------------------------------------------------------------
# Q: cohort_retention — the classic signup-cohort × week-offset
# retention matrix over the events stream.


def q_cohort_retention(sf_dir: str) -> Dataset:
    """Cohort retention matrix: users are cohorted by their FIRST
    active day (days from the global stream start — a parquet-footer
    min, zero-pass, the churn_features spine) and counted once per
    (cohort_day, day_offset) they were active in.

    Distributed shape: in-batch distinct (user, week) partials → ONE
    merge on (user, day) — the only corpus-sized movement, bounded by
    users × calendar days — then ``sorted_group_apply`` on user_id
    resolves each user's cohort (min day of its run) with one lexsort
    per block and emits (cohort, offset) COUNT partials, merged by a
    second calendar-bounded shuffle. Raw events never co-locate.
    Every user contributes exactly one offset-0 row, so the cohort
    size is the offset-0 cell of its own row group."""
    import pyarrow.parquet as pq_
    from datetime import datetime

    meta = pq_.read_metadata(f"{sf_dir}/events.parquet")
    t0 = None
    for rg in range(meta.num_row_groups):
        mn = meta.row_group(rg).column(1).statistics.min
        if hasattr(mn, "year"):
            td = mn.replace(tzinfo=None) - datetime(1970, 1, 1)
            v = (td.days * 86_400_000_000
                 + td.seconds * 1_000_000 + td.microseconds)
        else:
            v = int(mn)
        t0 = v if t0 is None else min(t0, v)

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def pair_partials(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        day = (us - t0) // US_PER_DAY
        g = pa.table(
            {
                "user_id": t["user_id"],
                "day": pa.array(day, type=pa.int64()),
                "n": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        ).group_by(["user_id", "day"]).aggregate([("n", "sum")])
        return g.rename_columns(["user_id", "day", "n"])

    pairs = merge_group_sums(
        events.map_batches(pair_partials, batch_format="pyarrow"),
        ["user_id", "day"], ["n"],
    )

    def cohort_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "cohort_day": pa.array([], type=pa.int64()),
                    "day_offset": pa.array([], type=pa.int64()),
                    "n_users": pa.array([], type=pa.int64()),
                }
            )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        w = t.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u))
        us, ws = u[order], w[order]
        starts = np.flatnonzero(np.r_[True, us[1:] != us[:-1]])
        run_id = np.cumsum(np.r_[False, us[1:] != us[:-1]])
        cohort = ws[starts][run_id]  # per-user min day (day-sorted runs)
        g = pa.table(
            {
                "cohort_day": pa.array(cohort, type=pa.int64()),
                "day_offset": pa.array(ws - cohort, type=pa.int64()),
                "n_users": pa.array(np.ones(len(ws), dtype=np.int64)),
            }
        ).group_by(["cohort_day", "day_offset"]).aggregate(
            [("n_users", "sum")]
        )
        return g.rename_columns(["cohort_day", "day_offset", "n_users"])

    partial = sorted_group_apply(pairs, ["user_id"], cohort_counts)
    return merge_group_sums(
        partial, ["cohort_day", "day_offset"], ["n_users"]
    )


SQL_COHORT_RETENTION = """
WITH t0 AS (SELECT epoch_us(MIN(ts)) AS v FROM events),
uw AS (
  SELECT DISTINCT user_id,
         (epoch_us(ts) - t0.v) // 86400000000 AS d
  FROM events, t0
),
c AS (SELECT user_id, MIN(d) AS cd FROM uw GROUP BY 1)
SELECT CAST(c.cd AS BIGINT) AS cohort_day,
       CAST(uw.d - c.cd AS BIGINT) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM uw JOIN c ON uw.user_id = c.user_id
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q: fd_violations — approximate-functional-dependency audit (the
# data-profiling primitive: does X determine Y, and how far off is it).

# (fd_name, table file, X column, Y column) — fixed candidate set; the
# operator is generic over any (X, Y) pair.
FD_CANDIDATES = (
    ("orders_custkey_to_priority", "orders", "o_custkey", "o_orderpriority"),
    ("lineitem_partkey_to_suppkey", "lineitem", "l_partkey", "l_suppkey"),
    ("events_user_to_type", "events", "user_id", "event_type"),
    ("customer_nation_to_segment", "customer", "c_nationkey", "c_mktsegment"),
)


def q_fd_violations(sf_dir: str) -> Dataset:
    """Functional-dependency audit X→Y for a fixed candidate list:
    per FD reports distinct-X group count, distinct (X,Y) pairs,
    groups violating the FD (>1 Y), total rows, rows kept by the
    majority Y per group (the g3-measure complement) and rows_to_fix
    = total − kept (min deletions to make the FD hold exactly).

    Distributed shape, per candidate: in-batch (X,Y,n) count partials
    → ONE merge on (X,Y) — movement bounded by the pair cardinality,
    not rows — then ``sorted_group_apply`` on X turns each complete
    run into four in-block integer reductions and emits ONE partial
    row per block; a constant-key merge folds blocks to one row per
    FD. The per-branch block count is capped (round-5 third-session
    multi-branch union rule) so 4 tiny branches don't fan out to
    4×CPUs micro-blocks."""
    import ray

    n_blocks = max(2, int(ray.cluster_resources().get("CPU", 8)) // 4)
    outs = []
    for fd_name, table, xcol, ycol in FD_CANDIDATES:
        src = rd.read_parquet(
            f"{sf_dir}/{table}.parquet", columns=[xcol, ycol],
            override_num_blocks=n_blocks,
        )

        def pair_partials(t: pa.Table, xcol=xcol, ycol=ycol) -> pa.Table:
            g = pa.table(
                {
                    "x": pc.cast(t[xcol], pa.int64())
                    if pa.types.is_integer(t.schema.field(xcol).type)
                    else pc.cast(t[xcol], pa.string()),
                    "y": pc.cast(t[ycol], pa.string())
                    if not pa.types.is_integer(t.schema.field(ycol).type)
                    else pc.cast(t[ycol], pa.int64()),
                    "n": pa.array(np.ones(len(t), dtype=np.int64)),
                }
            ).group_by(["x", "y"]).aggregate([("n", "sum")])
            return g.rename_columns(["x", "y", "n"])

        pairs = merge_group_sums(
            src.map_batches(pair_partials, batch_format="pyarrow"),
            ["x", "y"], ["n"],
        )

        def fd_block(t: pa.Table, fd_name=fd_name) -> pa.Table:
            empty = {
                "fd_name": pa.array([], type=pa.string()),
                "n_groups": pa.array([], type=pa.int64()),
                "n_pairs": pa.array([], type=pa.int64()),
                "violating_groups": pa.array([], type=pa.int64()),
                "rows_total": pa.array([], type=pa.int64()),
                "rows_keep": pa.array([], type=pa.int64()),
            }
            if t.num_rows == 0:
                return pa.table(empty)
            x = t.column("x")
            n = t.column("n").to_numpy(zero_copy_only=False)
            # null-safe int64 order/equality proxy for arbitrary X dtype
            xk = pc.rank(
                x, sort_keys="ascending", tiebreaker="dense",
                null_placement="at_start",
            ).to_numpy(zero_copy_only=False)
            order = np.argsort(xk, kind="stable")
            xs, ns = xk[order], n[order]
            new = np.r_[True, xs[1:] != xs[:-1]]
            run_id = np.cumsum(new) - 1
            n_groups = int(run_id[-1]) + 1
            rows_per = np.zeros(n_groups, dtype=np.int64)
            np.add.at(rows_per, run_id, ns)
            max_per = np.zeros(n_groups, dtype=np.int64)
            np.maximum.at(max_per, run_id, ns)
            ys = np.bincount(run_id)  # distinct Y per group
            return pa.table(
                {
                    "fd_name": pa.array([fd_name], type=pa.string()),
                    "n_groups": pa.array([n_groups], type=pa.int64()),
                    "n_pairs": pa.array([len(t)], type=pa.int64()),
                    "violating_groups": pa.array(
                        [int((ys > 1).sum())], type=pa.int64()
                    ),
                    "rows_total": pa.array([int(ns.sum())], type=pa.int64()),
                    "rows_keep": pa.array(
                        [int(max_per.sum())], type=pa.int64()
                    ),
                }
            )

        partial = sorted_group_apply(
            pairs, ["x"], fd_block, num_blocks=n_blocks
        )
        outs.append(
            merge_group_sums(
                partial, ["fd_name"],
                ["n_groups", "n_pairs", "violating_groups",
                 "rows_total", "rows_keep"],
            )
        )
    unioned = outs[0].union(*outs[1:])

    def finish(t: pa.Table) -> pa.Table:
        cols = ["fd_name", "n_groups", "n_pairs", "violating_groups",
                "rows_total", "rows_keep"]
        if t.num_rows == 0 or t.schema.names == []:
            return pa.table(
                {c: pa.array([], type=pa.string() if c == "fd_name"
                             else pa.int64()) for c in cols}
                | {"rows_to_fix": pa.array([], type=pa.int64())}
            )
        t = t.select(cols)
        return t.append_column(
            "rows_to_fix",
            pc.subtract(t.column("rows_total"), t.column("rows_keep")),
        )

    return unioned.map_batches(finish, batch_format="pyarrow")


def _fd_sql() -> str:
    parts = []
    for fd_name, table, xcol, ycol in FD_CANDIDATES:
        parts.append(f"""
SELECT '{fd_name}' AS fd_name,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(ny) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS violating_groups,
       CAST(SUM(rows_) AS BIGINT) AS rows_total,
       CAST(SUM(keep_) AS BIGINT) AS rows_keep,
       CAST(SUM(rows_) - SUM(keep_) AS BIGINT) AS rows_to_fix
FROM (
  SELECT x, COUNT(*) AS ny, SUM(n) AS rows_, MAX(n) AS keep_
  FROM (
    SELECT {xcol} AS x, {ycol} AS y, COUNT(*) AS n
    FROM {table} GROUP BY 1, 2
  ) GROUP BY 1
)""")
    return "\nUNION ALL\n".join(parts)


SQL_FD_VIOLATIONS = _fd_sql()


# ---------------------------------------------------------------------------
# Q: apriori_triples — frequent 3-itemset mining (Apriori candidate
# pruning) over per-order brand baskets.


def q_apriori_triples(sf_dir: str) -> Dataset:
    """Frequent brand triples (support ≥ max(2, n_orders/300)) by the
    Apriori algorithm: count 1- and 2-itemsets first, generate
    candidate triples ONLY where all three sub-pairs are frequent
    (downward closure), then count candidates in a second pass.

    Distributed plan: distinct (order, brand) rows via ONE grouped
    merge (the brand_cooccurrence basket spine, materialized once and
    consumed by both counting passes); pair counts ride the same
    sorted-run fan-out; candidate triples broadcast as 32-bit BRAND
    BITMASKS (the brand universe is a fixed-small catalog dimension —
    25 TPC-H brands — so each basket is one int32 and a candidate test
    is one AND+compare; for unbounded item universes swap in the
    posting self-join pair path with a hashed candidate broadcast —
    named fallback). Per-block triple counting is a ≤|C3|-iteration
    loop of whole-block vectorized mask tests, merged by a
    candidate-bounded shuffle. The SQL twin enumerates ALL triples
    with a 3-way self-join and filters by support — parity proves the
    pruning lossless (downward closure), not just the counting."""
    import pyarrow.parquet as pq_
    import ray

    from ..stages.salted import partial_count

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    part = pq_.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    ref = ray.put(
        (
            pc.cast(part["p_partkey"], pa.int64()).combine_chunks(),
            pc.cast(part["p_brand"], pa.string()).combine_chunks(),
        )
    )

    def attach(t: pa.Table) -> pa.Table:
        keys, brands = ray.get(ref)
        pos = pc.index_in(pc.cast(t["l_partkey"], pa.int64()), value_set=keys)
        return pa.table(
            {"l_orderkey": t["l_orderkey"], "p_brand": brands.take(pos)}
        )

    ob = merge_group_sums(
        partial_count(
            li.map_batches(attach, batch_format="pyarrow"),
            ["l_orderkey", "p_brand"], out="n",
        ),
        ["l_orderkey", "p_brand"], ["n"],
    ).materialize()

    n_orders = merge_group_sums(
        partial_count(ob, ["l_orderkey"], out="x"), ["l_orderkey"], ["x"]
    ).count()
    minsup = max(2, n_orders // 300)

    item_tbl = _pull_merged(
        merge_group_sums(
            partial_count(ob, ["p_brand"], out="nb"), ["p_brand"], ["nb"]
        ),
        ["p_brand", "nb"],
    )
    brands_all = sorted(item_tbl.column("p_brand").to_pylist())
    bit = {b: i for i, b in enumerate(brands_all)}
    assert len(brands_all) <= 32, "bitmask basket requires a small catalog"
    f1 = {
        b
        for b, nv in zip(
            item_tbl.column("p_brand").to_pylist(),
            item_tbl.column("nb").to_numpy(zero_copy_only=False),
        )
        if int(nv) >= minsup
    }

    empty_pairs = pa.table(
        {
            "brand_a": pa.array([], type=pa.string()),
            "brand_b": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
        }
    )

    def pair_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty_pairs
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        br = t.column("p_brand").to_numpy(zero_copy_only=False)
        order = np.lexsort((br, ok))
        ok, br = ok[order], br[order]
        starts = run_starts([ok])
        n = len(ok)
        run_start = np.maximum.accumulate(np.where(starts, np.arange(n), 0))
        local = np.arange(n) - run_start
        total = int(local.sum())
        if total == 0:
            return empty_pairs
        b_idx = np.repeat(np.arange(n), local)
        offsets = np.concatenate(([0], np.cumsum(local)))[:-1]
        a_idx = (
            np.arange(total)
            - np.repeat(offsets, local)
            + np.repeat(run_start, local)
        )
        g = pa.table(
            {
                "brand_a": pa.array(br[a_idx]),
                "brand_b": pa.array(br[b_idx]),
                "n": pa.array(np.ones(total, dtype=np.int64)),
            }
        ).group_by(["brand_a", "brand_b"]).aggregate([("n", "sum")])
        return g.rename_columns(["brand_a", "brand_b", "n"])

    pair_tbl = _pull_merged(
        merge_group_sums(
            sorted_group_apply(ob, ["l_orderkey"], pair_block),
            ["brand_a", "brand_b"], ["n"],
        ),
        ["brand_a", "brand_b", "n"],
    )
    f2 = {
        (a, b)
        for a, b, nv in zip(
            pair_tbl.column("brand_a").to_pylist(),
            pair_tbl.column("brand_b").to_pylist(),
            pair_tbl.column("n").to_numpy(zero_copy_only=False),
        )
        if int(nv) >= minsup
    }
    # Apriori candidate generation: every 2-subset frequent
    f1s = sorted(b for b in f1)
    cands = [
        (a, b, c)
        for i, a in enumerate(f1s)
        for j, b in enumerate(f1s[i + 1:], i + 1)
        if (a, b) in f2
        for c in f1s[j + 1:]
        if (a, c) in f2 and (b, c) in f2
    ]
    out_schema = pa.schema(
        [
            ("brand_a", pa.string()),
            ("brand_b", pa.string()),
            ("brand_c", pa.string()),
            ("support", pa.int64()),
        ]
    )
    if not cands:
        return rd.from_arrow(out_schema.empty_table())
    masks = np.array(
        [(1 << bit[a]) | (1 << bit[b]) | (1 << bit[c]) for a, b, c in cands],
        dtype=np.int64,
    )
    bits_ref = ray.put(
        (np.array([bit[b] for b in brands_all], dtype=np.int64), masks)
    )
    pos_arr = pa.array(brands_all, type=pa.string())

    def triple_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "ci": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        _, cand_masks = ray.get(bits_ref)
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        bpos = pc.index_in(
            pc.cast(t["p_brand"], pa.string()), value_set=pos_arr
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ok, kind="stable")
        ok, bpos = ok[order], bpos[order]
        starts = run_starts([ok])
        run_id = np.cumsum(starts) - 1
        n_runs = int(run_id[-1]) + 1
        basket = np.zeros(n_runs, dtype=np.int64)
        np.bitwise_or.at(basket, run_id, np.int64(1) << bpos)
        counts = np.empty(len(cand_masks), dtype=np.int64)
        for i, m in enumerate(cand_masks):  # ≤|C3| whole-block mask tests
            counts[i] = int(((basket & m) == m).sum())
        keep = counts > 0
        return pa.table(
            {
                "ci": pa.array(
                    np.flatnonzero(keep).astype(np.int64), type=pa.int64()
                ),
                "n": pa.array(counts[keep], type=pa.int64()),
            }
        )

    merged = _pull_merged(
        merge_group_sums(
            sorted_group_apply(ob, ["l_orderkey"], triple_block),
            ["ci"], ["n"],
        ),
        ["ci", "n"],
    )
    ci = merged.column("ci").to_numpy(zero_copy_only=False)
    cn = merged.column("n").to_numpy(zero_copy_only=False)
    rows = sorted(
        (cands[int(i)] + (int(v),)) for i, v in zip(ci, cn) if int(v) >= minsup
    )
    return rd.from_arrow(
        pa.table(
            {
                "brand_a": pa.array([r[0] for r in rows], type=pa.string()),
                "brand_b": pa.array([r[1] for r in rows], type=pa.string()),
                "brand_c": pa.array([r[2] for r in rows], type=pa.string()),
                "support": pa.array([r[3] for r in rows], type=pa.int64()),
            }
        )
    )


SQL_APRIORI_TRIPLES = """
WITH ob AS (
  SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
ms AS (
  SELECT GREATEST(2, COUNT(DISTINCT o) // 300) AS v FROM ob
)
SELECT a.b AS brand_a, c.b AS brand_b, d.b AS brand_c,
       CAST(COUNT(*) AS BIGINT) AS support
FROM ob a
JOIN ob c ON a.o = c.o AND a.b < c.b
JOIN ob d ON a.o = d.o AND c.b < d.b
GROUP BY 1, 2, 3
HAVING COUNT(*) >= (SELECT v FROM ms)
"""


# ---------------------------------------------------------------------------
# Q: ams_f2_users — AMS (Alon–Matias–Szegedy) second-frequency-moment
# sketch of the per-user event counts, against the exact F2.

AMS_R = 16
# fixed odd multipliers (closed-form seeded sign hash, the seeded-
# MinHash convention): sign(u) = 1 − 2·(((u+1)·A) // 8192 mod 2)
_AMS_A = tuple(2654435761 + 2 * k * 40503 for k in range(AMS_R))


def q_ams_f2_users(sf_dir: str) -> Dataset:
    """Sixteen AMS sign-counters Z_r = Σ_events s_r(user) whose squares
    are unbiased estimates of F2 = Σ_u c_u² — the classic one-pass
    streaming moment sketch: each event updates R ints, merge is
    addition, NOTHING user-keyed ever shuffles for the estimate. The
    exact F2 rides the per-user count merge (user-bounded movement) so
    the output row carries both the estimator and its ground truth —
    the estimator-quality-as-oracled-output convention
    (lang_confusion_matrix). Sign hashes are pure integer closed forms
    mirrored in SQL; no float anywhere (z², F2 exact int64)."""
    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    a_vec = np.asarray(_AMS_A, dtype=np.int64)

    def sketch_partials(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        zs = []
        for a in a_vec:
            s = 1 - 2 * ((((uid + 1) * a) // 8192) % 2)
            zs.append(int(s.sum()))
        return pa.table(
            {
                "r": pa.array(
                    np.arange(1, AMS_R + 1, dtype=np.int64)
                ),
                "z": pa.array(np.asarray(zs, dtype=np.int64)),
            }
        )

    z_tbl = _pull_merged(
        merge_group_sums(
            events.map_batches(sketch_partials, batch_format="pyarrow"),
            ["r"], ["z"],
        ),
        ["r", "z"],
    ).sort_by("r")

    def count_partials(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "user_id": t["user_id"],
                "c": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        ).group_by(["user_id"]).aggregate([("c", "sum")])
        return g.rename_columns(["user_id", "c"])

    ucnt = merge_group_sums(
        events.map_batches(count_partials, batch_format="pyarrow"),
        ["user_id"], ["c"],
    )

    def sq_partial(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array([0], type=pa.int64()),
                "f2": pa.array([int((c * c).sum())], type=pa.int64()),
            }
        )

    f2 = int(
        _pull_merged(
            merge_group_sums(
                ucnt.map_batches(sq_partial, batch_format="pyarrow"),
                ["k"], ["f2"],
            ),
            ["k", "f2"],
        ).column("f2")[0].as_py()
    )
    z = z_tbl.column("z").to_numpy(zero_copy_only=False)
    return rd.from_arrow(
        pa.table(
            {
                "r": pa.array(
                    z_tbl.column("r").to_numpy(zero_copy_only=False),
                    type=pa.int64(),
                ),
                "z": pa.array(z, type=pa.int64()),
                "z_sq": pa.array(z * z, type=pa.int64()),
                "f2_exact": pa.array([f2] * len(z), type=pa.int64()),
            }
        )
    )


def _ams_sql() -> str:
    consts = ", ".join(f"({r + 1}, {a})" for r, a in enumerate(_AMS_A))
    return f"""
WITH u AS (
  SELECT user_id AS uid, COUNT(*) AS c FROM events GROUP BY 1
),
f2 AS (SELECT SUM(c * c) AS v FROM u),
k(r, a) AS (VALUES {consts}),
z AS (
  SELECT k.r,
         SUM(u.c * (1 - 2 * ((((u.uid + 1) * k.a) // 8192) % 2))) AS z
  FROM u, k GROUP BY 1
)
SELECT CAST(z.r AS BIGINT) AS r, CAST(z.z AS BIGINT) AS z,
       CAST(z.z * z.z AS BIGINT) AS z_sq,
       CAST(f2.v AS BIGINT) AS f2_exact
FROM z, f2
"""


SQL_AMS_F2_USERS = _ams_sql()


# ---------------------------------------------------------------------------
# Q: linear_counting_users — Whang linear-counting distinct estimator
# (the bitmap complement of HLL), with exact ground truth on the row.

LC_M = 4096


def q_linear_counting_users(sf_dir: str) -> Dataset:
    """Distinct-user estimate from a {LC_M}-bit occupancy bitmap:
    n̂ = m·ln(m/u₀) with u₀ = empty bits (Whang et al.). Bits assign by
    the closed-form middle-bits hash ((uid+1)·2654435761)//65536 mod m
    — mirrored in SQL. LN is in the bitwise parity family and the
    estimate is ONE fixed float sequence over two exact integers.

    Distributed: per-batch DISTINCT bit rows (≤ m per block) → one
    m-bounded merge; the occupancy is its row count. Exact distinct
    rides a user-keyed count merge beside it — estimator quality ships
    as an oracled output (the ams_f2_users convention)."""
    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def bit_partials(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        bits = np.unique((((uid + 1) * 2654435761) // 65536) % LC_M)
        return pa.table(
            {
                "bit": pa.array(bits, type=pa.int64()),
                "n": pa.array(np.ones(len(bits), dtype=np.int64)),
            }
        )

    occupied = merge_group_sums(
        events.map_batches(bit_partials, batch_format="pyarrow"),
        ["bit"], ["n"],
    ).count()

    def user_partials(t: pa.Table) -> pa.Table:
        u = np.unique(t.column("user_id").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "user_id": pa.array(u, type=pa.int64()),
                "n": pa.array(np.ones(len(u), dtype=np.int64)),
            }
        )

    exact = merge_group_sums(
        events.map_batches(user_partials, batch_format="pyarrow"),
        ["user_id"], ["n"],
    ).count()
    u0 = LC_M - occupied
    est_e8 = (
        int(np.round(float(LC_M) * np.log(float(LC_M) / float(u0)) * 1e8))
        if u0 > 0 else -1
    )
    return rd.from_arrow(
        pa.table(
            {
                "m": pa.array([LC_M], type=pa.int64()),
                "occupied": pa.array([occupied], type=pa.int64()),
                "exact_distinct": pa.array([exact], type=pa.int64()),
                "est_e8": pa.array([est_e8], type=pa.int64()),
            }
        )
    )


SQL_LINEAR_COUNTING_USERS = f"""
WITH b AS (
  SELECT DISTINCT (((user_id + 1) * 2654435761) // 65536) % {LC_M} AS bit
  FROM events
),
o AS (SELECT COUNT(*) AS occ FROM b),
x AS (SELECT COUNT(DISTINCT user_id) AS ex FROM events)
SELECT CAST({LC_M} AS BIGINT) AS m,
       CAST(o.occ AS BIGINT) AS occupied,
       CAST(x.ex AS BIGINT) AS exact_distinct,
       CAST(CASE WHEN {LC_M} - o.occ = 0 THEN -1
            ELSE ROUND(CAST({LC_M} AS DOUBLE)
                 * LN(CAST({LC_M} AS DOUBLE)
                      / CAST({LC_M} - o.occ AS DOUBLE)) * 1e8)
            END AS BIGINT) AS est_e8
FROM o, x
"""


# ---------------------------------------------------------------------------
# Q: join_skew_audit — per-join-key skew report: the planner
# introspection a shuffle engine runs BEFORE picking a join strategy
# (salt hot keys? broadcast? — CLAUDE.md's skew rules, quantified).

SKEW_KEYS = (
    ("lineitem_orderkey", "lineitem", "l_orderkey"),
    ("lineitem_partkey", "lineitem", "l_partkey"),
    ("orders_custkey", "orders", "o_custkey"),
    ("events_user", "events", "user_id"),
)


def q_join_skew_audit(sf_dir: str) -> Dataset:
    """Per candidate join key: row count, distinct keys, the hottest
    key's frequency, and Σc² — the self-join amplification numerator
    (expected hash-join partition skew is max_freq/avg; Σc² IS the
    exact row count of a self-equijoin). All integers, zero floats.

    Distributed, per key: per-batch (key → c) partials → ONE
    key-space-bounded merge → a constant-key (sum, max) merge of the
    four block statistics. Branch block counts capped (multi-branch
    union rule)."""
    import ray

    from ..stages.salted import merge_group_aggs

    n_blocks = max(2, int(ray.cluster_resources().get("CPU", 8)) // 4)
    outs = []
    for name, table, col in SKEW_KEYS:
        src = rd.read_parquet(
            f"{sf_dir}/{table}.parquet", columns=[col],
            override_num_blocks=n_blocks,
        )

        def key_partials(t: pa.Table, col=col) -> pa.Table:
            g = pa.table(
                {
                    "k": pc.cast(t[col], pa.int64()),
                    "c": pa.array(np.ones(len(t), dtype=np.int64)),
                }
            ).group_by(["k"]).aggregate([("c", "sum")])
            return g.rename_columns(["k", "c"])

        counts = merge_group_sums(
            src.map_batches(key_partials, batch_format="pyarrow"),
            ["k"], ["c"],
        )

        def stats_partial(t: pa.Table, name=name) -> pa.Table:
            c = t.column("c").to_numpy(zero_copy_only=False)
            if len(c) == 0:
                return pa.table(
                    {
                        "key_name": pa.array([], type=pa.string()),
                        "n_rows": pa.array([], type=pa.int64()),
                        "n_distinct": pa.array([], type=pa.int64()),
                        "max_freq": pa.array([], type=pa.int64()),
                        "sum_sq": pa.array([], type=pa.int64()),
                    }
                )
            return pa.table(
                {
                    "key_name": pa.array([name], type=pa.string()),
                    "n_rows": pa.array([int(c.sum())], type=pa.int64()),
                    "n_distinct": pa.array([len(c)], type=pa.int64()),
                    "max_freq": pa.array([int(c.max())], type=pa.int64()),
                    "sum_sq": pa.array([int((c * c).sum())], type=pa.int64()),
                }
            )

        outs.append(
            merge_group_aggs(
                counts.map_batches(stats_partial, batch_format="pyarrow"),
                ["key_name"],
                [("n_rows", "sum"), ("n_distinct", "sum"),
                 ("max_freq", "max"), ("sum_sq", "sum")],
            )
        )
    unioned = outs[0].union(*outs[1:])
    cols = ["key_name", "n_rows", "n_distinct", "max_freq", "sum_sq"]

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.schema.names == []:
            return pa.table(
                {c: pa.array(
                    [], type=pa.string() if c == "key_name" else pa.int64()
                ) for c in cols}
            )
        return t.select(cols)

    return unioned.map_batches(project, batch_format="pyarrow")


def _skew_sql() -> str:
    parts = []
    for name, table, col in SKEW_KEYS:
        parts.append(f"""
SELECT '{name}' AS key_name,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(MAX(c) AS BIGINT) AS max_freq,
       CAST(SUM(c * c) AS BIGINT) AS sum_sq
FROM (SELECT {col} AS k, COUNT(*) AS c FROM {table} GROUP BY 1)""")
    return "\nUNION ALL\n".join(parts)


SQL_JOIN_SKEW_AUDIT = _skew_sql()


# ---------------------------------------------------------------------------
# Q: range_partition_audit — how good are SAMPLE-based range-partition
# boundaries versus exact quantiles? (Range sort engines — Ray Data's
# included — pick boundaries from a sample; this op measures the rank
# error that choice costs, on the engine's own data.)

RPA_K = 8  # partition count
RPA_SAMPLE_MOD = 1_000_003
RPA_SAMPLE_THR = 10_000  # ≈1% deterministic hash sample


def q_range_partition_audit(sf_dir: str) -> Dataset:
    """For each interior boundary i of an {RPA_K}-way range partition
    of o_totalprice cents: the exact quantile boundary (1-based
    element at ⌈i·n/K⌉ — the PERCENTILE_DISC rule), the boundary the
    deterministic 1% hash sample would pick, the sampled boundary's
    TRUE rank, and the scaled rank error |K·rank − i·n| (exact
    integers; /(K·n) gives the fractional skew a partition would
    inherit).

    Distributed: ONE money-domain-bounded merge of (cent → n,
    n_sampled) count partials (the trimmed-mean movement profile);
    every boundary falls out of two cumulative scans of the pulled
    value histogram. No row-level sort anywhere."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def partials(t: pa.Table) -> pa.Table:
        key = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        cents = _cents(t.column("o_totalprice")).to_numpy(
            zero_copy_only=False
        )
        samp = (
            (key * 2654435761) % RPA_SAMPLE_MOD < RPA_SAMPLE_THR
        ).astype(np.int64)
        g = pa.table(
            {
                "v": pa.array(cents, type=pa.int64()),
                "n": pa.array(np.ones(len(key), dtype=np.int64)),
                "ns": pa.array(samp),
            }
        ).group_by(["v"]).aggregate([("n", "sum"), ("ns", "sum")])
        return g.rename_columns(["v", "n", "ns"])

    hist = _pull_merged(
        merge_group_sums(
            orders.map_batches(partials, batch_format="pyarrow"),
            ["v"], ["n", "ns"],
        ),
        ["v", "n", "ns"],
    ).sort_by("v")
    v = hist.column("v").to_numpy(zero_copy_only=False)
    cn = np.cumsum(hist.column("n").to_numpy(zero_copy_only=False))
    cs = np.cumsum(hist.column("ns").to_numpy(zero_copy_only=False))
    n, ns = int(cn[-1]), int(cs[-1])
    rows = {"boundary": [], "exact_v": [], "sampled_v": [],
            "sampled_rank": [], "rank_err_scaled": []}
    for i in range(1, RPA_K):
        # PERCENTILE_DISC: 1-based element at ceil(i*n/K) — the
        # non-negative ceil form (DuckDB // truncates on negatives)
        r_exact = (i * n + RPA_K - 1) // RPA_K
        exact_v = int(v[np.searchsorted(cn, r_exact, side="left")])
        r_samp = (i * ns + RPA_K - 1) // RPA_K
        samp_v = int(v[np.searchsorted(cs, r_samp, side="left")])
        rank = int(cn[np.searchsorted(v, samp_v, side="left")])
        rows["boundary"].append(i)
        rows["exact_v"].append(exact_v)
        rows["sampled_v"].append(samp_v)
        rows["sampled_rank"].append(rank)
        rows["rank_err_scaled"].append(abs(RPA_K * rank - i * n))
    return rd.from_arrow(
        pa.table({k: pa.array(x, type=pa.int64()) for k, x in rows.items()})
    )


SQL_RANGE_PARTITION_AUDIT = f"""
WITH c AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
         COUNT(*) AS n,
         SUM(CASE WHEN (o_orderkey * 2654435761) % {RPA_SAMPLE_MOD}
                       < {RPA_SAMPLE_THR} THEN 1 ELSE 0 END) AS ns
  FROM orders GROUP BY 1
),
w AS (
  SELECT v, n, ns,
         SUM(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cn,
         SUM(ns) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cs
  FROM c
),
tot AS (SELECT SUM(n) AS n, SUM(ns) AS ns FROM c),
b(i) AS (SELECT UNNEST(generate_series(1, {RPA_K - 1}))),
ex AS (
  SELECT b.i, MIN(w.v) AS exact_v
  FROM b, tot JOIN w ON w.cn >= (b.i * tot.n + {RPA_K} - 1) // {RPA_K}
  GROUP BY 1
),
sp AS (
  SELECT b.i, MIN(w.v) AS sampled_v
  FROM b, tot JOIN w ON w.cs >= (b.i * tot.ns + {RPA_K} - 1) // {RPA_K}
  GROUP BY 1
),
rk AS (
  SELECT sp.i, sp.sampled_v, w.cn AS sampled_rank
  FROM sp JOIN w ON w.v = sp.sampled_v
)
SELECT CAST(ex.i AS BIGINT) AS boundary,
       CAST(ex.exact_v AS BIGINT) AS exact_v,
       CAST(rk.sampled_v AS BIGINT) AS sampled_v,
       CAST(rk.sampled_rank AS BIGINT) AS sampled_rank,
       CAST(ABS({RPA_K} * rk.sampled_rank - ex.i * tot.n) AS BIGINT)
         AS rank_err_scaled
FROM ex JOIN rk ON rk.i = ex.i, tot
"""


# ---------------------------------------------------------------------------
# Q: consistent_hash_balance — load-balance audit of a consistent-hash
# ring (the stateful-shard placement scheme actor routers use): W
# workers × R virtual nodes, keys walk clockwise to the next vnode.

CH_WORKERS = 8
CH_REPLICAS = 8
CH_M = 4_294_967_296  # 2^32 ring positions


def q_consistent_hash_balance(sf_dir: str) -> Dataset:
    """Per worker: vnode count, assigned events, assigned distinct
    users — quantifying the imbalance R virtual nodes leave (stddev ~
    1/√R of mean). Ring positions and key hashes are the house
    multiplicative closed form mod 2³²; assignment = first vnode ≥
    key hash (wrap to the ring minimum), ties by (position, worker).

    Distributed: the 64-entry ring broadcasts (a constant); per batch
    ONE searchsorted assigns every event; (worker, user) distinct
    partials → one merge → per-worker fold. The audit's movement is
    user-space-bounded."""
    vw = np.repeat(np.arange(CH_WORKERS, dtype=np.int64), CH_REPLICAS)
    vr = np.tile(np.arange(CH_REPLICAS, dtype=np.int64), CH_WORKERS)
    vh = ((vw * CH_REPLICAS + vr + 1) * 2654435761) % CH_M
    order = np.lexsort((vw, vh))
    ring_h, ring_w = vh[order], vw[order]

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partials(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        hk = ((uid + 1) * 2654435761) % CH_M
        pos = np.searchsorted(ring_h, hk, side="left")
        pos = np.where(pos == len(ring_h), 0, pos)  # wrap
        g = pa.table(
            {
                "worker": pa.array(ring_w[pos], type=pa.int64()),
                "user_id": pa.array(uid, type=pa.int64()),
                "n": pa.array(np.ones(len(uid), dtype=np.int64)),
            }
        ).group_by(["worker", "user_id"]).aggregate([("n", "sum")])
        return g.rename_columns(["worker", "user_id", "n"])

    merged = merge_group_sums(
        events.map_batches(partials, batch_format="pyarrow"),
        ["worker", "user_id"], ["n"],
    )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "worker": pa.array([], type=pa.int64()),
                    "n_users": pa.array([], type=pa.int64()),
                    "n_events": pa.array([], type=pa.int64()),
                }
            )
        g = pa.table(
            {
                "worker": t["worker"],
                "n_users": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "n_events": t["n"],
            }
        ).group_by(["worker"]).aggregate(
            [("n_users", "sum"), ("n_events", "sum")]
        )
        return g.rename_columns(["worker", "n_users", "n_events"])

    per_worker = merge_group_sums(
        merged.map_batches(fold, batch_format="pyarrow"),
        ["worker"], ["n_users", "n_events"],
    )
    vcount = np.bincount(ring_w, minlength=CH_WORKERS).astype(np.int64)

    def attach_vnodes(t: pa.Table) -> pa.Table:
        w = t.column("worker").to_numpy(zero_copy_only=False)
        return t.append_column(
            "n_vnodes", pa.array(vcount[w], type=pa.int64())
        )

    return per_worker.map_batches(attach_vnodes, batch_format="pyarrow")


SQL_CONSISTENT_HASH_BALANCE = f"""
WITH vn AS (
  SELECT (i.i // {CH_REPLICAS}) AS w,
         ((i.i + 1) * 2654435761) % {CH_M} AS h
  FROM range(0, {CH_WORKERS * CH_REPLICAS}) i(i)
),
uh AS (
  SELECT user_id, COUNT(*) AS n,
         ((user_id + 1) * 2654435761) % {CH_M} AS hk
  FROM events GROUP BY 1, 3
),
asg AS (
  SELECT u.user_id, u.n,
         COALESCE(
           (SELECT v.w FROM vn v WHERE v.h >= u.hk
            ORDER BY v.h, v.w LIMIT 1),
           (SELECT v.w FROM vn v ORDER BY v.h, v.w LIMIT 1)
         ) AS worker
  FROM uh u
)
SELECT CAST(worker AS BIGINT) AS worker,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST((SELECT COUNT(*) FROM vn WHERE vn.w = asg.worker) AS BIGINT)
         AS n_vnodes
FROM asg GROUP BY worker
"""


# ---------------------------------------------------------------------------
# Q: association_rules — top rules {x, y} → z from the frequent
# triples, ranked by LIFT (confidence thresholds dilute with basket
# size across scales; lift — conf / P(z) — is scale-stable, and a
# rank-based output is non-vacuous at every sf by construction).

RULE_K = 50


def q_association_rules(sf_dir: str) -> Dataset:
    """The top-{RULE_K} rotations {x,y} → z of the frequent triples by
    (lift_e8 desc, x, y, z): lift_e8 is the EXACT floored half-up of
    the integer rational sup_xyz·n_orders·1e8 / (sup_xy·sup_z) — no
    float division anywhere, and integer ranking (the round-5 rule).
    Composes three oracle-green basket surfaces — triples from
    q_apriori_triples, pair supports from q_brand_cooccurrence, item
    supports + n_orders re-derived from the same basket spine — all
    pulls bounded by the catalog dimension, so rule generation is
    driver arithmetic over model-sized tables."""
    import pyarrow.parquet as pq_
    import ray

    from ..stages.salted import partial_count

    tri = q_apriori_triples(sf_dir).take_all()
    pairs = {
        (r["brand_a"], r["brand_b"]): r["n_ab"]
        for r in q_brand_cooccurrence(sf_dir).take_all()
    }

    # item supports + n_orders from the basket spine (catalog-bounded)
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    part = pq_.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    ref = ray.put(
        (
            pc.cast(part["p_partkey"], pa.int64()).combine_chunks(),
            pc.cast(part["p_brand"], pa.string()).combine_chunks(),
        )
    )

    def attach(t: pa.Table) -> pa.Table:
        keys, brands = ray.get(ref)
        pos = pc.index_in(pc.cast(t["l_partkey"], pa.int64()), value_set=keys)
        return pa.table(
            {"l_orderkey": t["l_orderkey"], "p_brand": brands.take(pos)}
        )

    ob = merge_group_sums(
        partial_count(
            li.map_batches(attach, batch_format="pyarrow"),
            ["l_orderkey", "p_brand"], out="n",
        ),
        ["l_orderkey", "p_brand"], ["n"],
    ).materialize()
    n_orders = merge_group_sums(
        partial_count(ob, ["l_orderkey"], out="x"), ["l_orderkey"], ["x"]
    ).count()
    item_tbl = _pull_merged(
        merge_group_sums(
            partial_count(ob, ["p_brand"], out="nb"), ["p_brand"], ["nb"]
        ),
        ["p_brand", "nb"],
    )
    item = dict(
        zip(
            item_tbl.column("p_brand").to_pylist(),
            (int(x) for x in
             item_tbl.column("nb").to_numpy(zero_copy_only=False)),
        )
    )
    rows = []
    for t in tri:
        a, b, c, s = t["brand_a"], t["brand_b"], t["brand_c"], t["support"]
        for x, y, z in ((a, b, c), (a, c, b), (b, c, a)):
            p = pairs[(x, y)]
            den = p * item[z]
            lift = (2 * s * n_orders * 10**8 + den) // (2 * den)
            conf = (2 * s * 10**8 + p) // (2 * p)
            rows.append((-lift, x, y, z, s, p, conf))
    rows.sort()
    rows = rows[:RULE_K]
    return rd.from_arrow(
        pa.table(
            {
                "ant_a": pa.array([r[1] for r in rows], type=pa.string()),
                "ant_b": pa.array([r[2] for r in rows], type=pa.string()),
                "cons": pa.array([r[3] for r in rows], type=pa.string()),
                "sup_abc": pa.array([r[4] for r in rows], type=pa.int64()),
                "sup_ab": pa.array([r[5] for r in rows], type=pa.int64()),
                "conf_e8": pa.array([r[6] for r in rows], type=pa.int64()),
                "lift_e8": pa.array([-r[0] for r in rows], type=pa.int64()),
            }
        )
    )


SQL_ASSOCIATION_RULES = f"""
WITH ob AS (
  SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
n AS (SELECT COUNT(DISTINCT o) AS c FROM ob),
ms AS (SELECT GREATEST(2, (SELECT c FROM n) // 300) AS v),
item AS (SELECT b, COUNT(*) AS sup FROM ob GROUP BY 1),
pair AS (
  SELECT a.b AS b1, c.b AS b2, COUNT(*) AS sup
  FROM ob a JOIN ob c ON a.o = c.o AND a.b < c.b GROUP BY 1, 2
),
tri AS (
  SELECT a.b AS b1, c.b AS b2, d.b AS b3, COUNT(*) AS sup
  FROM ob a
  JOIN ob c ON a.o = c.o AND a.b < c.b
  JOIN ob d ON a.o = d.o AND c.b < d.b
  GROUP BY 1, 2, 3 HAVING COUNT(*) >= (SELECT v FROM ms)
),
rot AS (
  SELECT b1 AS x, b2 AS y, b3 AS z, sup FROM tri
  UNION ALL SELECT b1, b3, b2, sup FROM tri
  UNION ALL SELECT b2, b3, b1, sup FROM tri
),
scored AS (
  SELECT rot.x, rot.y, rot.z, rot.sup AS sup_abc, p.sup AS sup_ab,
         (2 * rot.sup * 100000000 + p.sup) // (2 * p.sup) AS conf_e8,
         (2 * rot.sup * (SELECT c FROM n) * 100000000 + p.sup * i.sup)
           // (2 * p.sup * i.sup) AS lift_e8
  FROM rot
  JOIN pair p ON p.b1 = rot.x AND p.b2 = rot.y
  JOIN item i ON i.b = rot.z
)
SELECT x AS ant_a, y AS ant_b, z AS cons,
       CAST(sup_abc AS BIGINT) AS sup_abc,
       CAST(sup_ab AS BIGINT) AS sup_ab,
       CAST(conf_e8 AS BIGINT) AS conf_e8,
       CAST(lift_e8 AS BIGINT) AS lift_e8
FROM scored
ORDER BY lift_e8 DESC, x, y, z
LIMIT {RULE_K}
"""


ANALYTICS_QUERIES = {
    "association_rules": q_association_rules,
    "consistent_hash_balance": q_consistent_hash_balance,
    "range_partition_audit": q_range_partition_audit,
    "join_skew_audit": q_join_skew_audit,
    "linear_counting_users": q_linear_counting_users,
    "ams_f2_users": q_ams_f2_users,
    "apriori_triples": q_apriori_triples,
    "cohort_retention": q_cohort_retention,
    "fd_violations": q_fd_violations,
    "running_revenue": q_running_revenue,
    "session_concurrency": q_session_concurrency,
    "embedding_covariance": q_embedding_covariance,
    "pca_power_iter": q_pca_power_iter,
    "user_hourly_ffill": q_user_hourly_ffill,
    "event_hour_mutual_info": q_event_hour_mutual_info,
    "segment_price_trend": q_segment_price_trend,
    "snapshot_orders_diff": q_snapshot_orders_diff,
    "event_type_user_overlap": q_event_type_user_overlap,
    "sliding_distinct_users": q_sliding_distinct_users,
    "acctbal_z_outliers": q_acctbal_z_outliers,
    "order_percent_rank": q_order_percent_rank,
    "token_packing": q_token_packing,
    "segment_boxplot": q_segment_boxplot,
    "bpe_merges": q_bpe_merges,
    "weighted_sssp_2round": q_weighted_sssp_2round,
    "sq8_quant_error": q_sq8_quant_error,
    "boruvka_mst_2round": q_boruvka_mst_2round,
    "conversion_latency": q_conversion_latency,
    "mask_spans": q_mask_spans,
    "ndcg_truncation_eval": q_ndcg_truncation_eval,
    "coordinated_sample_join": q_coordinated_sample_join,
    "pseudonymize_users": q_pseudonymize_users,
    "tile_semivariogram": q_tile_semivariogram,
    "brand_cooccurrence": q_brand_cooccurrence,
    "hourly_ewma": q_hourly_ewma,
    "ab_srm_check": q_ab_srm_check,
    "session_overlap_pairs": q_session_overlap_pairs,
    "vocab_coverage_curve": q_vocab_coverage_curve,
    "term_momentum": q_term_momentum,
    "nn_distance_histogram": q_nn_distance_histogram,
    "doclen_ks_test": q_doclen_ks_test,
    "wilson_ci_conversion": q_wilson_ci_conversion,
    "quantity_mode": q_quantity_mode,
    "logreg_2step": q_logreg_2step,
    "nb_lang_classify": q_nb_lang_classify,
    "rrf_fusion_topk": q_rrf_fusion_topk,
    "churn_features": q_churn_features,
    "lang_js_divergence": q_lang_js_divergence,
    "kcenter_seeds": q_kcenter_seeds,
    "burst_states": q_burst_states,
    "theil_sen_hourly": q_theil_sen_hourly,
    "nb_confusion_kappa": q_nb_confusion_kappa,
    "lang_source_chisq": q_lang_source_chisq,
}

ANALYTICS_ORACLES = {
    "association_rules": SQL_ASSOCIATION_RULES,
    "consistent_hash_balance": SQL_CONSISTENT_HASH_BALANCE,
    "range_partition_audit": SQL_RANGE_PARTITION_AUDIT,
    "join_skew_audit": SQL_JOIN_SKEW_AUDIT,
    "linear_counting_users": SQL_LINEAR_COUNTING_USERS,
    "ams_f2_users": SQL_AMS_F2_USERS,
    "apriori_triples": SQL_APRIORI_TRIPLES,
    "cohort_retention": SQL_COHORT_RETENTION,
    "fd_violations": SQL_FD_VIOLATIONS,
    "running_revenue": SQL_RUNNING_REVENUE,
    "session_concurrency": SQL_SESSION_CONCURRENCY,
    "embedding_covariance": SQL_EMBEDDING_COVARIANCE,
    "pca_power_iter": SQL_PCA_POWER_ITER,
    "user_hourly_ffill": SQL_USER_HOURLY_FFILL,
    "event_hour_mutual_info": SQL_EVENT_HOUR_MUTUAL_INFO,
    "segment_price_trend": SQL_SEGMENT_PRICE_TREND,
    "snapshot_orders_diff": SQL_SNAPSHOT_ORDERS_DIFF,
    "event_type_user_overlap": SQL_EVENT_TYPE_USER_OVERLAP,
    "sliding_distinct_users": SQL_SLIDING_DISTINCT_USERS,
    "acctbal_z_outliers": SQL_ACCTBAL_Z_OUTLIERS,
    "order_percent_rank": SQL_ORDER_PERCENT_RANK,
    "token_packing": SQL_TOKEN_PACKING,
    "segment_boxplot": SQL_SEGMENT_BOXPLOT,
    "bpe_merges": SQL_BPE_MERGES,
    "weighted_sssp_2round": SQL_WEIGHTED_SSSP_2ROUND,
    "sq8_quant_error": SQL_SQ8_QUANT_ERROR,
    "boruvka_mst_2round": SQL_BORUVKA_MST_2ROUND,
    "conversion_latency": SQL_CONVERSION_LATENCY,
    "mask_spans": SQL_MASK_SPANS,
    "ndcg_truncation_eval": SQL_NDCG_TRUNCATION_EVAL,
    "coordinated_sample_join": SQL_COORDINATED_SAMPLE_JOIN,
    "pseudonymize_users": SQL_PSEUDONYMIZE_USERS,
    # tile_semivariogram's oracle is registered by queries.py via
    # _sql_variogram() — building it here would import queries at
    # analytics-module-init time (circular when tests import analytics
    # first)
    "brand_cooccurrence": SQL_BRAND_COOCCURRENCE,
    "hourly_ewma": SQL_HOURLY_EWMA,
    "ab_srm_check": SQL_AB_SRM_CHECK,
    "session_overlap_pairs": SQL_SESSION_OVERLAP_PAIRS,
    "vocab_coverage_curve": SQL_VOCAB_COVERAGE_CURVE,
    "term_momentum": SQL_TERM_MOMENTUM,
    "doclen_ks_test": SQL_DOCLEN_KS_TEST,
    "wilson_ci_conversion": SQL_WILSON_CI_CONVERSION,
    "quantity_mode": SQL_QUANTITY_MODE,
    "logreg_2step": SQL_LOGREG_2STEP,
    "nb_lang_classify": SQL_NB_LANG_CLASSIFY,
    "rrf_fusion_topk": SQL_RRF_FUSION_TOPK,
    "churn_features": SQL_CHURN_FEATURES,
    "lang_js_divergence": SQL_LANG_JS_DIVERGENCE,
    "kcenter_seeds": SQL_KCENTER_SEEDS,
    "burst_states": SQL_BURST_STATES,
    "theil_sen_hourly": SQL_THEIL_SEN_HOURLY,
    "nb_confusion_kappa": SQL_NB_CONFUSION_KAPPA,
    "lang_source_chisq": SQL_LANG_SOURCE_CHISQ,
}
