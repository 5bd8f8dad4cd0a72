"""Classical statistical tests and robust summaries as distributed
Ray Data operators — the inferential layer over the engine's existing
descriptive statistics (KS drift test, chi-square independence,
Wilson intervals, Theil–Sen trends).

Every operator here follows the same two-stage shape:

1. a DISTRIBUTED sufficient-statistic reduction — per-batch combiner
   partials inside ``map_batches`` → ONE ``merge_group_sums`` shuffle
   whose key space is bounded by something other than corpus size
   (2 segments, 9 digits, a calendar-hour spine, the 2-decimal money
   domain) — raw rows never co-locate;
2. a BOUNDED driver finish over the pulled sufficient statistics —
   the test statistic itself is a fixed IEEE-754 operation sequence
   over EXACT integers, mirrored token-for-token in the DuckDB twin
   (the house e-integer policy: sums/sums-of-squares/rank sums move
   as int64; each float division/sqrt happens once, in the same
   order, on both sides; final rounding to eN int64).

Reference anchor: the reference publishes importance *scores* but no
significance machinery (README.md:95 "importance"); these operators
are the additions a 100-TB curation pipeline needs to decide whether
two corpus slices actually differ (Welch/Mann-Whitney), whether a
money column was fabricated (Benford), where a volume series broke
(CUSUM), and whether a quasi-identifier release is safe (k-anonymity).

Float policy (CLAUDE.md): money moves as integer cents (pc.round =
half-even, matching the fixture's never-on-.5 products, the idiom
every green money query shares); SQRT/LN/LOG10 are in the bitwise
parity family; generic double-derived statistics round with plain
ROUND at e8/e10; Benford expectations are pinned by embedding the
SAME repr'd double literal in both sides (verified bitwise).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset

from ..stages.salted import merge_group_sums, partial_count
from .analytics import US_PER_HOUR, _pull_merged

SEG_A = "BUILDING"
SEG_B = "AUTOMOBILE"
ANON_K = 10


def _cents_col(col: pa.ChunkedArray) -> pa.ChunkedArray:
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(100.0))), pa.int64())


# ---------------------------------------------------------------------------
# Q: welch_ttest_segments — Welch's unequal-variance t between two
# customer segments' account balances.


def q_welch_ttest_segments(sf_dir: str) -> Dataset:
    """Welch's t-test (BUILDING vs AUTOMOBILE acctbal, integer cents).

    Distributed stage: per-batch (segment → n, Σx, Σx²) combiner →
    ONE 2-key grouped-sum merge; the pull is 2 rows regardless of
    corpus size. Sums and sums-of-squares are exact int64 (cents² ≤
    1e12/row — overflow headroom to ~9e6 rows/segment at this value
    domain; beyond that, split ss into per-shard partials and widen to
    float in the merge — documented fallback). The t statistic and
    Welch–Satterthwaite df are ONE fixed float sequence over the six
    integers, mirrored exactly in SQL; e8 integer publication."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_mktsegment", "c_acctbal"]
    )

    def partials(t: pa.Table) -> pa.Table:
        seg = t.column("c_mktsegment")
        keep = pc.is_in(seg, value_set=pa.array([SEG_A, SEG_B]))
        t = t.filter(keep)
        cents = _cents_col(t.column("c_acctbal"))
        g = pa.table(
            {
                "seg": t.column("c_mktsegment"),
                "n": pa.array(np.ones(len(t), dtype=np.int64)),
                "s": cents,
                "ss": pc.multiply(cents, cents),
            }
        ).group_by(["seg"]).aggregate([("n", "sum"), ("s", "sum"), ("ss", "sum")])
        return g.rename_columns(["seg", "n", "s", "ss"])

    rows = _pull_merged(
        merge_group_sums(
            cust.map_batches(partials, batch_format="pyarrow"),
            ["seg"], ["n", "s", "ss"],
        ),
        ["seg", "n", "s", "ss"],
    ).sort_by("seg")
    segs = rows.column("seg").to_pylist()
    n = dict(zip(segs, rows.column("n").to_pylist()))
    s = dict(zip(segs, rows.column("s").to_pylist()))
    ss = dict(zip(segs, rows.column("ss").to_pylist()))
    n1, s1, ss1 = int(n[SEG_A]), int(s[SEG_A]), int(ss[SEG_A])
    n2, s2, ss2 = int(n[SEG_B]), int(s[SEG_B]), int(ss[SEG_B])
    mu1 = float(s1) / float(n1)
    mu2 = float(s2) / float(n2)
    var1 = (float(ss1) - mu1 * float(s1)) / float(n1 - 1)
    var2 = (float(ss2) - mu2 * float(s2)) / float(n2 - 1)
    se1 = var1 / float(n1)
    se2 = var2 / float(n2)
    se = se1 + se2
    t_stat = (mu1 - mu2) / math.sqrt(se)
    df = (se * se) / (
        se1 * se1 / float(n1 - 1) + se2 * se2 / float(n2 - 1)
    )
    return rd.from_arrow(
        pa.table(
            {
                "n1": pa.array([n1], type=pa.int64()),
                "n2": pa.array([n2], type=pa.int64()),
                "s1": pa.array([s1], type=pa.int64()),
                "s2": pa.array([s2], type=pa.int64()),
                "ss1": pa.array([ss1], type=pa.int64()),
                "ss2": pa.array([ss2], type=pa.int64()),
                "t_e8": pa.array(
                    [int(np.round(t_stat * 1e8))], type=pa.int64()
                ),
                "df_e8": pa.array(
                    [int(np.round(df * 1e8))], type=pa.int64()
                ),
            }
        )
    )


SQL_WELCH_TTEST_SEGMENTS = f"""
WITH g AS (
  SELECT c_mktsegment AS seg, COUNT(*) AS n,
         SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS s,
         SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)
             * CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS ss
  FROM customer
  WHERE c_mktsegment IN ('{SEG_A}', '{SEG_B}')
  GROUP BY 1
),
w AS (
  SELECT
    (SELECT n FROM g WHERE seg = '{SEG_A}') AS n1,
    (SELECT n FROM g WHERE seg = '{SEG_B}') AS n2,
    (SELECT s FROM g WHERE seg = '{SEG_A}') AS s1,
    (SELECT s FROM g WHERE seg = '{SEG_B}') AS s2,
    (SELECT ss FROM g WHERE seg = '{SEG_A}') AS ss1,
    (SELECT ss FROM g WHERE seg = '{SEG_B}') AS ss2
),
f AS (
  SELECT *,
    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mu1,
    CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS mu2
  FROM w
),
v AS (
  SELECT *,
    (CAST(ss1 AS DOUBLE) - mu1 * CAST(s1 AS DOUBLE))
      / CAST(n1 - 1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS se1,
    (CAST(ss2 AS DOUBLE) - mu2 * CAST(s2 AS DOUBLE))
      / CAST(n2 - 1 AS DOUBLE) / CAST(n2 AS DOUBLE) AS se2
  FROM f
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2,
       CAST(ss1 AS BIGINT) AS ss1, CAST(ss2 AS BIGINT) AS ss2,
       CAST(ROUND((mu1 - mu2) / SQRT(se1 + se2) * 1e8) AS BIGINT) AS t_e8,
       CAST(ROUND((se1 + se2) * (se1 + se2)
                  / (se1 * se1 / CAST(n1 - 1 AS DOUBLE)
                     + se2 * se2 / CAST(n2 - 1 AS DOUBLE)) * 1e8)
            AS BIGINT) AS df_e8
FROM v
"""


# ---------------------------------------------------------------------------
# Q: mannwhitney_u_segments — the rank-sum (nonparametric) sibling of
# Welch: no normality assumption, tie-corrected normal approximation.


def q_mannwhitney_u_segments(sf_dir: str) -> Dataset:
    """Mann-Whitney U between the same two segments, exact average
    ranks with tie correction — ALL-INTEGER rank arithmetic: doubled
    rank sums (2·R₁ = Σ_v c₁ᵥ·(2·below_v + t_v + 1)) never create a
    .5, so every intermediate is int64 until the single z-score float
    sequence at the end (e8).

    Distributed stage: per-(value → c₁, c₂) count merge — movement is
    bounded by the money DOMAIN (2-decimal balances: ≤ 1.1M distinct
    cent values whatever the corpus size), not by rows. The cumsum +
    statistic run on that bounded pulled table."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_mktsegment", "c_acctbal"]
    )

    def partials(t: pa.Table) -> pa.Table:
        seg = t.column("c_mktsegment")
        keep = pc.is_in(seg, value_set=pa.array([SEG_A, SEG_B]))
        t = t.filter(keep)
        is_a = pc.equal(t.column("c_mktsegment"), pa.scalar(SEG_A))
        a = pc.cast(is_a, pa.int64())
        g = pa.table(
            {
                "v": _cents_col(t.column("c_acctbal")),
                "c1": a,
                "c2": pc.subtract(pa.scalar(1, type=pa.int64()), a),
            }
        ).group_by(["v"]).aggregate([("c1", "sum"), ("c2", "sum")])
        return g.rename_columns(["v", "c1", "c2"])

    cells = _pull_merged(
        merge_group_sums(
            cust.map_batches(partials, batch_format="pyarrow"),
            ["v"], ["c1", "c2"],
        ),
        ["v", "c1", "c2"],
    ).sort_by("v")
    c1 = cells.column("c1").to_numpy(zero_copy_only=False)
    c2 = cells.column("c2").to_numpy(zero_copy_only=False)
    t_v = c1 + c2
    below = np.concatenate(([0], np.cumsum(t_v)[:-1]))
    n1, n2 = int(c1.sum()), int(c2.sum())
    n_tot = n1 + n2
    two_r1 = int((c1 * (2 * below + t_v + 1)).sum())
    two_u1 = two_r1 - n1 * (n1 + 1)
    tie_t = int((t_v * t_v * t_v - t_v).sum())
    mu = float(n1 * n2) / 2.0
    u1 = float(two_u1) / 2.0
    var = (
        float(n1) * float(n2) / 12.0
        * (
            float(n_tot + 1)
            - float(tie_t) / (float(n_tot) * float(n_tot - 1))
        )
    )
    z = (u1 - mu) / math.sqrt(var)
    return rd.from_arrow(
        pa.table(
            {
                "n1": pa.array([n1], type=pa.int64()),
                "n2": pa.array([n2], type=pa.int64()),
                "two_r1": pa.array([two_r1], type=pa.int64()),
                "two_u1": pa.array([two_u1], type=pa.int64()),
                "tie_t": pa.array([tie_t], type=pa.int64()),
                "z_e8": pa.array(
                    [int(np.round(z * 1e8))], type=pa.int64()
                ),
            }
        )
    )


SQL_MANNWHITNEY_U_SEGMENTS = f"""
WITH s AS (
  SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) AS v,
         CASE WHEN c_mktsegment = '{SEG_A}' THEN 1 ELSE 0 END AS a
  FROM customer
  WHERE c_mktsegment IN ('{SEG_A}', '{SEG_B}')
),
c AS (
  SELECT v, SUM(a) AS c1, SUM(1 - a) AS c2, COUNT(*) AS t
  FROM s GROUP BY 1
),
w AS (
  SELECT v, c1, c2, t,
         SUM(t) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - t AS below
  FROM c
),
agg AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
         CAST(SUM(c1 * (2 * below + t + 1)) AS BIGINT) AS two_r1,
         CAST(SUM(t * t * t - t) AS BIGINT) AS tie_t
  FROM w
),
f AS (
  SELECT n1, n2, two_r1, tie_t,
         two_r1 - n1 * (n1 + 1) AS two_u1,
         CAST(n1 * n2 AS DOUBLE) / 2.0 AS mu,
         CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
           * (CAST(n1 + n2 + 1 AS DOUBLE)
              - CAST(tie_t AS DOUBLE)
                / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE)))
           AS var
  FROM agg
)
SELECT n1, n2, two_r1, CAST(two_u1 AS BIGINT) AS two_u1, tie_t,
       CAST(ROUND((CAST(two_u1 AS DOUBLE) / 2.0 - mu) / SQRT(var) * 1e8)
            AS BIGINT) AS z_e8
FROM f
"""


# ---------------------------------------------------------------------------
# Q: benford_chisq — first-significant-digit distribution of order
# totals vs Benford's law, per-digit chi-square terms.

_BENFORD_P = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def q_benford_chisq(sf_dir: str) -> Dataset:
    """Benford first-digit audit of o_totalprice: observed counts per
    leading digit of the integer-cent amount, expected n·log₁₀(1+1/d),
    and the per-digit chi-square contribution (o−e)²/e at e6.

    The Benford expectations are pinned by embedding the SAME repr'd
    double literal on both sides (verified bitwise vs DuckDB's literal
    parser AND its LOG10). Distributed stage: per-batch digit
    bincount (the leading digit falls out of ≤7 vectorized integer
    halvings — no strings on the Ray side) → ONE 9-key merge."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
    )

    def partials(t: pa.Table) -> pa.Table:
        cents = _cents_col(t.column("o_totalprice")).to_numpy(
            zero_copy_only=False
        ).copy()
        # strip trailing digits until every value is a single digit;
        # cents ≤ ~6e7 in the money domain → ≤ 7 rounds, each a
        # vectorized masked floor-div (non-negative: // == truncation)
        while cents.max(initial=0) >= 10:
            big = cents >= 10
            cents[big] //= 10
        obs = np.bincount(cents, minlength=10)[1:10]
        return pa.table(
            {
                "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
                "obs": pa.array(obs.astype(np.int64)),
            }
        )

    cells = _pull_merged(
        merge_group_sums(
            orders.map_batches(partials, batch_format="pyarrow"),
            ["digit"], ["obs"],
        ),
        ["digit", "obs"],
    ).sort_by("digit")
    obs = cells.column("obs").to_numpy(zero_copy_only=False)
    digits = cells.column("digit").to_numpy(zero_copy_only=False)
    n = int(obs.sum())
    exp_e6 = np.empty(len(digits), dtype=np.int64)
    term_e6 = np.empty(len(digits), dtype=np.int64)
    for i, d in enumerate(digits):
        e = float(n) * _BENFORD_P[int(d)]
        o = float(int(obs[i]))
        exp_e6[i] = int(np.round(e * 1e6))
        term_e6[i] = int(np.round((o - e) * (o - e) / e * 1e6))
    return rd.from_arrow(
        pa.table(
            {
                "digit": pa.array(digits, type=pa.int64()),
                "obs": pa.array(obs, type=pa.int64()),
                "n": pa.array(np.full(len(digits), n), type=pa.int64()),
                "exp_e6": pa.array(exp_e6, type=pa.int64()),
                "term_e6": pa.array(term_e6, type=pa.int64()),
            }
        )
    )


def _benford_sql() -> str:
    p_rows = ", ".join(
        f"({d}, {_BENFORD_P[d]!r}e0)" for d in range(1, 10)
    )
    return f"""
WITH p(digit, prob) AS (VALUES {p_rows}),
s AS (
  SELECT CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders
),
c AS (SELECT digit, COUNT(*) AS obs FROM s GROUP BY 1),
n AS (SELECT SUM(obs) AS n FROM c),
j AS (
  SELECT p.digit, COALESCE(c.obs, 0) AS obs, n.n,
         CAST(n.n AS DOUBLE) * p.prob AS e
  FROM p LEFT JOIN c ON p.digit = c.digit, n
)
SELECT CAST(digit AS BIGINT) AS digit, CAST(obs AS BIGINT) AS obs,
       CAST(n AS BIGINT) AS n,
       CAST(ROUND(e * 1e6) AS BIGINT) AS exp_e6,
       CAST(ROUND((CAST(obs AS DOUBLE) - e) * (CAST(obs AS DOUBLE) - e)
                  / e * 1e6) AS BIGINT) AS term_e6
FROM j
"""


SQL_BENFORD_CHISQ = _benford_sql()


# ---------------------------------------------------------------------------
# shared: the dense hourly spine (theil_sen's idiom, factored)


def _hourly_spine(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Dense (hour, count) series over [min_hour, max_hour] with zero
    fill. The distributed stage is the hourly count merge; the pull is
    calendar-bounded (one row per hour of corpus time-span)."""
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
    return spine, full


SQL_SPINE_CTE = """
h AS (
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
)
"""


# ---------------------------------------------------------------------------
# Q: hourly_acf — lag-1..3 autocorrelation of the hourly volume series.


ACF_LAGS = (1, 2, 3)


def q_hourly_acf(sf_dir: str) -> Dataset:
    """Autocorrelation of hourly event counts at lags 1–3 over the
    dense zero-filled spine: rₖ = Σ(cₜ−m)(cₜ₊ₖ−m) / Σ(cₜ−m)² with the
    cross-multiplied ALL-INTEGER numerators Σ(n·cₜ−S)(n·cₜ₊ₖ−S) (n²
    cancels in the ratio; one final division → e10). Spine arithmetic
    is calendar-bounded; only hourly count partials shuffle."""
    spine, full = _hourly_spine(sf_dir)
    n = len(spine)
    s_tot = int(full.sum())
    d = full * n - s_tot  # scaled deviations, exact int64
    den = int((d * d).sum())
    lags, nums, r10 = [], [], []
    for k in ACF_LAGS:
        num = int((d[:-k] * d[k:]).sum())
        lags.append(k)
        nums.append(num)
        r10.append(int(np.round(float(num) / float(den) * 1e10)))
    return rd.from_arrow(
        pa.table(
            {
                "lag": pa.array(lags, type=pa.int64()),
                "n_hours": pa.array([n] * len(lags), type=pa.int64()),
                "num_scaled": pa.array(nums, type=pa.int64()),
                "den_scaled": pa.array([den] * len(lags), type=pa.int64()),
                "r_e10": pa.array(r10, type=pa.int64()),
            }
        )
    )


SQL_HOURLY_ACF = f"""
WITH {SQL_SPINE_CTE},
tot AS (SELECT COUNT(*) AS nh, SUM(n) AS s FROM x),
d AS (
  SELECT hour, CAST(n * tot.nh - tot.s AS BIGINT) AS d FROM x, tot
),
den AS (SELECT SUM(d * d) AS den FROM d),
lags(lag) AS (VALUES (1), (2), (3)),
num AS (
  SELECT lags.lag, SUM(a.d * b.d) AS num
  FROM lags
  JOIN d a ON TRUE
  JOIN d b ON b.hour = a.hour + lags.lag
  GROUP BY 1
)
SELECT CAST(num.lag AS BIGINT) AS lag,
       CAST(tot.nh AS BIGINT) AS n_hours,
       CAST(num.num AS BIGINT) AS num_scaled,
       CAST(den.den AS BIGINT) AS den_scaled,
       CAST(ROUND(CAST(num.num AS DOUBLE) / CAST(den.den AS DOUBLE) * 1e10)
            AS BIGINT) AS r_e10
FROM num, den, tot
"""


# ---------------------------------------------------------------------------
# Q: cusum_changepoint — single change-point location on the hourly
# volume series (max absolute centered-cumulative-sum deviation).


def q_cusum_changepoint(sf_dir: str) -> Dataset:
    """CUSUM change-point: k* = argmax over prefixes of |n·Sₖ − k·Sₙ|
    (the all-integer form of max|Sₖ − (k/n)·Sₙ|), smallest hour wins
    ties; publishes the exact integer statistic plus before/after mean
    rates (one float division each, e8). Same movement profile as the
    ACF — hourly partials only."""
    spine, full = _hourly_spine(sf_dir)
    n = len(spine)
    csum = np.cumsum(full)
    s_n = int(csum[-1])
    k = np.arange(1, n + 1, dtype=np.int64)
    stat = np.abs(csum * n - k * s_n)
    stat_head = stat[:-1]  # splits k = 1..n-1
    k_star = int(np.argmax(stat_head)) + 1  # first max = smallest hour
    stat_num = int(stat_head[k_star - 1])
    s_k = int(csum[k_star - 1])
    mean_before = float(s_k) / float(k_star)
    mean_after = float(s_n - s_k) / float(n - k_star)
    return rd.from_arrow(
        pa.table(
            {
                "n_hours": pa.array([n], type=pa.int64()),
                "s_total": pa.array([s_n], type=pa.int64()),
                "k_star": pa.array([k_star], type=pa.int64()),
                "split_hour": pa.array(
                    [int(spine[k_star - 1])], type=pa.int64()
                ),
                "stat_num": pa.array([stat_num], type=pa.int64()),
                "mean_before_e8": pa.array(
                    [int(np.round(mean_before * 1e8))], type=pa.int64()
                ),
                "mean_after_e8": pa.array(
                    [int(np.round(mean_after * 1e8))], type=pa.int64()
                ),
            }
        )
    )


SQL_CUSUM_CHANGEPOINT = f"""
WITH {SQL_SPINE_CTE},
tot AS (SELECT COUNT(*) AS nh, SUM(n) AS sn FROM x),
c AS (
  SELECT hour,
         ROW_NUMBER() OVER (ORDER BY hour) AS k,
         SUM(n) OVER (ORDER BY hour ROWS UNBOUNDED PRECEDING) AS sk
  FROM x
),
best AS (
  SELECT c.hour, c.k, c.sk, tot.nh, tot.sn,
         ABS(c.sk * tot.nh - c.k * tot.sn) AS stat
  FROM c, tot
  WHERE c.k < tot.nh
  ORDER BY stat DESC, c.hour ASC
  LIMIT 1
)
SELECT CAST(nh AS BIGINT) AS n_hours, CAST(sn AS BIGINT) AS s_total,
       CAST(k AS BIGINT) AS k_star, CAST(hour AS BIGINT) AS split_hour,
       CAST(stat AS BIGINT) AS stat_num,
       CAST(ROUND(CAST(sk AS DOUBLE) / CAST(k AS DOUBLE) * 1e8) AS BIGINT)
         AS mean_before_e8,
       CAST(ROUND(CAST(sn - sk AS DOUBLE) / CAST(nh - k AS DOUBLE) * 1e8)
            AS BIGINT) AS mean_after_e8
FROM best
"""


# ---------------------------------------------------------------------------
# Q: trimmed_mean_segments — 10% two-sided trimmed mean per segment.


def q_trimmed_mean_segments(sf_dir: str) -> Dataset:
    """Per-segment 10% trimmed mean of acctbal (drop exactly g = n//10
    rows off each end of the sorted multiset). Exact at any
    parallelism: per-(segment, cent-value) count merge (movement
    bounded by the 2-decimal money DOMAIN, not rows) → per-segment
    cumulative counts → each value keeps
    clip(min(cum, n−g) − max(cum−c, g), ≥0) copies — the closed-form
    partial-inclusion trim, no row numbering. kept_sum is an exact
    int64 cents sum; the mean is ONE division at e8."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_mktsegment", "c_acctbal"]
    )

    def partials(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "seg": t.column("c_mktsegment"),
                "v": _cents_col(t.column("c_acctbal")),
                "c": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        ).group_by(["seg", "v"]).aggregate([("c", "sum")])
        return g.rename_columns(["seg", "v", "c"])

    cells = _pull_merged(
        merge_group_sums(
            cust.map_batches(partials, batch_format="pyarrow"),
            ["seg", "v"], ["c"],
        ),
        ["seg", "v", "c"],
    ).sort_by([("seg", "ascending"), ("v", "ascending")])
    seg = np.asarray(cells.column("seg").to_pylist(), dtype=object)
    v = cells.column("v").to_numpy(zero_copy_only=False)
    c = cells.column("c").to_numpy(zero_copy_only=False)
    out_seg, out_n, out_g, out_sum, out_mean = [], [], [], [], []
    for s in sorted(set(seg.tolist())):
        m = seg == s
        vs, cs = v[m], c[m]
        n = int(cs.sum())
        g = n // 10
        cum = np.cumsum(cs)
        prev = cum - cs
        kept = np.minimum(cum, n - g) - np.maximum(prev, g)
        kept = np.maximum(kept, 0)
        kept_sum = int((vs * kept).sum())
        kept_n = n - 2 * g
        out_seg.append(s)
        out_n.append(n)
        out_g.append(g)
        out_sum.append(kept_sum)
        out_mean.append(
            int(np.round(float(kept_sum) / float(kept_n) * 1e8))
        )
    return rd.from_arrow(
        pa.table(
            {
                "c_mktsegment": pa.array(out_seg, type=pa.string()),
                "n": pa.array(out_n, type=pa.int64()),
                "g": pa.array(out_g, type=pa.int64()),
                "kept_sum": pa.array(out_sum, type=pa.int64()),
                "mean_e8": pa.array(out_mean, type=pa.int64()),
            }
        )
    )


SQL_TRIMMED_MEAN_SEGMENTS = """
WITH c AS (
  SELECT c_mktsegment AS seg, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS v,
         COUNT(*) AS c
  FROM customer GROUP BY 1, 2
),
w AS (
  SELECT seg, v, c,
         SUM(c) OVER (PARTITION BY seg ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER (PARTITION BY seg) AS n
  FROM c
),
k AS (
  SELECT seg, v, n, n // 10 AS g,
         GREATEST(LEAST(cum, n - n // 10)
                  - GREATEST(cum - c, n // 10), 0) AS kept
  FROM w
)
SELECT seg AS c_mktsegment, CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(g) AS BIGINT) AS g,
       CAST(SUM(v * kept) AS BIGINT) AS kept_sum,
       CAST(ROUND(CAST(SUM(v * kept) AS DOUBLE)
                  / CAST(MAX(n) - 2 * MAX(g) AS DOUBLE) * 1e8) AS BIGINT)
         AS mean_e8
FROM k GROUP BY seg
"""


# ---------------------------------------------------------------------------
# Q: k_anonymity_audit — quasi-identifier release safety summary.


def q_k_anonymity_audit(sf_dir: str) -> Dataset:
    """k-anonymity audit of the (nationkey, mktsegment, balance-sign)
    quasi-identifier release: group sizes, how many equivalence
    classes fall below k=10, and how many ROWS those classes expose.
    The privacy complement of pseudonymize_users: that op rewrites
    identifiers, this one PROVES the rewritten release is safe to
    publish. Distributed: per-batch QI counts → ONE merge whose key
    space is QI-domain-bounded (25 nations × 5 segments × 2 signs);
    the summary folds on the pulled class table."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_mktsegment", "c_acctbal"],
    )

    def partials(t: pa.Table) -> pa.Table:
        neg = pc.cast(
            pc.less(t.column("c_acctbal"), pa.scalar(0.0)), pa.int64()
        )
        g = pa.table(
            {
                "nat": pc.cast(t.column("c_nationkey"), pa.int64()),
                "seg": t.column("c_mktsegment"),
                "neg": neg,
                "c": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        ).group_by(["nat", "seg", "neg"]).aggregate([("c", "sum")])
        return g.rename_columns(["nat", "seg", "neg", "c"])

    classes = _pull_merged(
        merge_group_sums(
            cust.map_batches(partials, batch_format="pyarrow"),
            ["nat", "seg", "neg"], ["c"],
        ),
        ["nat", "seg", "neg", "c"],
    )
    c = classes.column("c").to_numpy(zero_copy_only=False)
    below = c < ANON_K
    return rd.from_arrow(
        pa.table(
            {
                "k": pa.array([ANON_K], type=pa.int64()),
                "n_classes": pa.array([len(c)], type=pa.int64()),
                "classes_below_k": pa.array(
                    [int(below.sum())], type=pa.int64()
                ),
                "rows_at_risk": pa.array(
                    [int(c[below].sum())], type=pa.int64()
                ),
                "min_class_size": pa.array(
                    [int(c.min())], type=pa.int64()
                ),
                "max_class_size": pa.array(
                    [int(c.max())], type=pa.int64()
                ),
            }
        )
    )


SQL_K_ANONYMITY_AUDIT = f"""
WITH cls AS (
  SELECT c_nationkey, c_mktsegment,
         CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS neg,
         COUNT(*) AS c
  FROM customer GROUP BY 1, 2, 3
)
SELECT CAST({ANON_K} AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN c < {ANON_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS classes_below_k,
       CAST(COALESCE(SUM(CASE WHEN c < {ANON_K} THEN c ELSE 0 END), 0)
            AS BIGINT) AS rows_at_risk,
       CAST(MIN(c) AS BIGINT) AS min_class_size,
       CAST(MAX(c) AS BIGINT) AS max_class_size
FROM cls
"""


# ---------------------------------------------------------------------------
# Q: geary_c_stats — Geary's C spatial autocorrelation (the
# difference-based sibling of Moran's I; sensitive to local structure).


def q_geary_c_stats(sf_dir: str) -> Dataset:
    """Geary's C over z12 tile counts with rook adjacency. Same
    scatter machinery as morans_i_stats (queries.py:560): each
    occupied tile posts its scaled deviation d = c·n − s to itself and
    to its west/north neighbors' keys; a pair exists where a probe
    lands on an occupied base. The squared-difference numerator needs
    one EXTRA scattered column (Σd²ⱼ per key) because
    Σⱼ(dᵢ−dⱼ)² = occ·dᵢ² − 2·dᵢ·Σdⱼ + Σdⱼ² — still pure int64 partials
    on one range sort, no pair materialization. Publishes the exact
    integer pieces (n² scale cancels in C) + c_e10."""
    from ..ops.runs import sorted_group_apply
    from .queries import _geotagged

    ds = _geotagged(sf_dir)
    geo = ds.map_batches(
        lambda t: t.filter(pc.is_valid(t["tile_x"])).select(
            ["tile_x", "tile_y"]
        ),
        batch_format="pyarrow",
    )
    counts = partial_count(geo, ["tile_x", "tile_y"], out="c").materialize()
    n_tiles = counts.count()
    s_total = int(counts.sum("c"))

    def scatter(t: pa.Table) -> pa.Table:
        tx = t.column("tile_x").to_numpy(zero_copy_only=False).astype(np.int64)
        ty = t.column("tile_y").to_numpy(zero_copy_only=False).astype(np.int64)
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        d = c * n_tiles - s_total
        zero = np.zeros(len(tx), dtype=np.int64)
        one = np.ones(len(tx), dtype=np.int64)
        key = np.concatenate(
            [tx * 8192 + ty, (tx + 1) * 8192 + ty, tx * 8192 + ty + 1]
        )
        return pa.table(
            {
                "key": pa.array(key),
                "base_d": pa.array(np.concatenate([d, zero, zero])),
                "base_occ": pa.array(np.concatenate([one, zero, zero])),
                "probe_d": pa.array(np.concatenate([zero, d, d])),
                "probe_d2": pa.array(np.concatenate([zero, d * d, d * d])),
                "probe_occ": pa.array(np.concatenate([zero, one, one])),
            }
        )

    def pair_block(t: pa.Table) -> pa.Table:
        one = pa.table(
            {
                "k": pa.array([0], type=pa.int64()),
                "n_pairs": pa.array([0], type=pa.int64()),
                "num_fwd": pa.array([0], type=pa.int64()),
                "den": pa.array([0], type=pa.int64()),
            }
        )
        if len(t) == 0:
            return one
        key = t.column("key").to_numpy(zero_copy_only=False)
        bd = t.column("base_d").to_numpy(zero_copy_only=False)
        bo = t.column("base_occ").to_numpy(zero_copy_only=False)
        pd_ = t.column("probe_d").to_numpy(zero_copy_only=False)
        pd2 = t.column("probe_d2").to_numpy(zero_copy_only=False)
        po = t.column("probe_occ").to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        key = key[order]
        bd, bo, pd_, pd2, po = (
            bd[order], bo[order], pd_[order], pd2[order], po[order]
        )
        new = np.empty(len(key), dtype=bool)
        new[0] = True
        new[1:] = key[1:] != key[:-1]
        starts = np.flatnonzero(new)
        base_d = np.add.reduceat(bd, starts)
        base_occ = np.add.reduceat(bo, starts)
        probe_d = np.add.reduceat(pd_, starts)
        probe_d2 = np.add.reduceat(pd2, starts)
        probe_occ = np.add.reduceat(po, starts)
        hit = base_occ > 0
        num_sq = (
            probe_occ[hit] * base_d[hit] * base_d[hit]
            - 2 * base_d[hit] * probe_d[hit]
            + probe_d2[hit]
        )
        return pa.table(
            {
                "k": pa.array([0], type=pa.int64()),
                "n_pairs": pa.array(
                    [int(probe_occ[hit].sum())], type=pa.int64()
                ),
                "num_fwd": pa.array([int(num_sq.sum())], type=pa.int64()),
                "den": pa.array(
                    [int((base_d[hit] * base_d[hit] * base_occ[hit]).sum())],
                    type=pa.int64(),
                ),
            }
        )

    scattered = counts.map_batches(scatter, batch_format="pyarrow")
    partials = sorted_group_apply(scattered, ["key"], pair_block)
    merged = merge_group_sums(partials, ["k"], ["n_pairs", "num_fwd", "den"])
    tbl = _pull_merged(merged, ["n_pairs", "num_fwd", "den"])
    n_pairs = int(tbl.column("n_pairs")[0].as_py())
    num = 2 * int(tbl.column("num_fwd")[0].as_py())
    den = int(tbl.column("den")[0].as_py())
    c_val = (float(n_tiles - 1) * float(num)) / (
        2.0 * float(2 * n_pairs) * float(den)
    )
    return rd.from_arrow(
        pa.table(
            {
                "n_tiles": pa.array([n_tiles], type=pa.int64()),
                "s_total": pa.array([s_total], type=pa.int64()),
                "n_pairs": pa.array([n_pairs], type=pa.int64()),
                "num_scaled": pa.array([num], type=pa.int64()),
                "den_scaled": pa.array([den], type=pa.int64()),
                "c_e10": pa.array(
                    [int(np.round(c_val * 1e10))], type=pa.int64()
                ),
            }
        )
    )


def _geary_sql() -> str:
    from .queries import SQL_GEO_CTE

    return f"""
WITH {SQL_GEO_CTE},
tl AS (
  SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 4096) AS INTEGER) AS tile_x,
         CAST(FLOOR((1.0 - LN(TAN(RADIANS(lat)) + 1.0 / COS(RADIANS(lat))) / PI())
                    / 2.0 * 4096) AS INTEGER) AS tile_y,
         COUNT(*) AS c
  FROM geo
  GROUP BY 1, 2
),
sc AS (SELECT COUNT(*) AS n, SUM(c) AS s FROM tl),
d AS (
  SELECT tile_x, tile_y,
         CAST(c * (SELECT n FROM sc) - (SELECT s FROM sc) AS BIGINT) AS d
  FROM tl
),
fwd AS (
  SELECT a.d AS da, b.d AS db FROM d a JOIN d b
    ON (b.tile_x = a.tile_x + 1 AND b.tile_y = a.tile_y)
    OR (b.tile_x = a.tile_x AND b.tile_y = a.tile_y + 1)
),
agg AS (
  SELECT CAST((SELECT n FROM sc) AS BIGINT) AS n_tiles,
         CAST((SELECT s FROM sc) AS BIGINT) AS s_total,
         CAST((SELECT COUNT(*) FROM fwd) AS BIGINT) AS n_pairs,
         CAST(2 * COALESCE(
           (SELECT SUM((da - db) * (da - db)) FROM fwd), 0) AS BIGINT)
           AS num_scaled,
         CAST((SELECT SUM(d * d) FROM d) AS BIGINT) AS den_scaled
)
SELECT n_tiles, s_total, n_pairs, num_scaled, den_scaled,
       CAST(ROUND((CAST(n_tiles - 1 AS DOUBLE) * CAST(num_scaled AS DOUBLE))
                  / (2.0 * CAST(2 * n_pairs AS DOUBLE)
                     * CAST(den_scaled AS DOUBLE)) * 1e10) AS BIGINT)
         AS c_e10
FROM agg
"""


# ---------------------------------------------------------------------------
# Q: gini_best_split — exact decision-stump learning: the acctbal
# threshold that best separates the BUILDING segment.


def q_gini_best_split(sf_dir: str) -> Dataset:
    """Best binary split (x ≤ v) of acctbal cents predicting
    mktsegment = BUILDING, by weighted Gini impurity — the inner loop
    of distributed decision-tree learning, run exactly.

    Distributed stage: per-(cent-value → n, pos) count merge (money-
    domain-bounded movement, the trimmed-mean profile); every split
    candidate then falls out of ONE cumulative pass over the pulled
    table. Candidate ranking follows the round-5 integer-ranking rule:
    each candidate's weighted impurity is rounded to e10 int64 FIRST,
    then argmin on (gini_e10, v) — identical in numpy (first-min of
    the v-ascending scan) and SQL (ORDER BY gini_e10, v LIMIT 1)."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_mktsegment", "c_acctbal"]
    )

    def partials(t: pa.Table) -> pa.Table:
        pos = pc.cast(
            pc.equal(t.column("c_mktsegment"), pa.scalar(SEG_A)), pa.int64()
        )
        g = pa.table(
            {
                "v": _cents_col(t.column("c_acctbal")),
                "n": pa.array(np.ones(len(t), dtype=np.int64)),
                "pos": pos,
            }
        ).group_by(["v"]).aggregate([("n", "sum"), ("pos", "sum")])
        return g.rename_columns(["v", "n", "pos"])

    cells = _pull_merged(
        merge_group_sums(
            cust.map_batches(partials, batch_format="pyarrow"),
            ["v"], ["n", "pos"],
        ),
        ["v", "n", "pos"],
    ).sort_by("v")
    v = cells.column("v").to_numpy(zero_copy_only=False)
    cn = cells.column("n").to_numpy(zero_copy_only=False)
    cp = cells.column("pos").to_numpy(zero_copy_only=False)
    n = int(cn.sum())
    p = int(cp.sum())
    nl = np.cumsum(cn)[:-1].astype(np.float64)  # split after each value but last
    pl = np.cumsum(cp)[:-1].astype(np.float64)
    nr = float(n) - nl
    pr = float(p) - pl
    fl = pl / nl
    ql = (nl - pl) / nl
    gl = 1.0 - fl * fl - ql * ql
    fr = pr / nr
    qr = (nr - pr) / nr
    gr = 1.0 - fr * fr - qr * qr
    w = (nl / float(n)) * gl + (nr / float(n)) * gr
    g_e10 = np.round(w * 1e10).astype(np.int64)
    i = int(np.argmin(g_e10))  # first min = smallest v (v ascending)
    fp = float(p) / float(n)
    fq = float(n - p) / float(n)
    parent = 1.0 - fp * fp - fq * fq
    return rd.from_arrow(
        pa.table(
            {
                "split_v": pa.array([int(v[i])], type=pa.int64()),
                "n": pa.array([n], type=pa.int64()),
                "pos": pa.array([p], type=pa.int64()),
                "nl": pa.array([int(nl[i])], type=pa.int64()),
                "pl": pa.array([int(pl[i])], type=pa.int64()),
                "gini_e10": pa.array([int(g_e10[i])], type=pa.int64()),
                "parent_gini_e10": pa.array(
                    [int(np.round(parent * 1e10))], type=pa.int64()
                ),
            }
        )
    )


SQL_GINI_BEST_SPLIT = f"""
WITH c AS (
  SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) AS v, COUNT(*) AS n,
         SUM(CASE WHEN c_mktsegment = '{SEG_A}' THEN 1 ELSE 0 END) AS pos
  FROM customer GROUP BY 1
),
tot AS (SELECT SUM(n) AS n, SUM(pos) AS p FROM c),
w AS (
  SELECT v,
         SUM(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS nl,
         SUM(pos) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS pl
  FROM c
),
cand AS (
  SELECT w.v, w.nl, w.pl, tot.n, tot.p,
         CAST(w.nl AS DOUBLE) AS nld, CAST(w.pl AS DOUBLE) AS pld,
         CAST(tot.n - w.nl AS DOUBLE) AS nrd,
         CAST(tot.p - w.pl AS DOUBLE) AS prd
  FROM w, tot WHERE w.nl < tot.n
),
sc AS (
  SELECT v, nl, pl, n, p,
         CAST(ROUND((
           (nld / CAST(n AS DOUBLE))
             * (1.0 - (pld / nld) * (pld / nld)
                - ((nld - pld) / nld) * ((nld - pld) / nld))
           + (nrd / CAST(n AS DOUBLE))
             * (1.0 - (prd / nrd) * (prd / nrd)
                - ((nrd - prd) / nrd) * ((nrd - prd) / nrd))
           ) * 1e10) AS BIGINT) AS gini_e10
  FROM cand
)
SELECT v AS split_v, CAST(n AS BIGINT) AS n, CAST(p AS BIGINT) AS pos,
       CAST(nl AS BIGINT) AS nl, CAST(pl AS BIGINT) AS pl,
       gini_e10,
       (SELECT CAST(ROUND((1.0
          - (CAST(p AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(p AS DOUBLE) / CAST(n AS DOUBLE))
          - (CAST(n - p AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(n - p AS DOUBLE) / CAST(n AS DOUBLE))) * 1e10) AS BIGINT)
        FROM tot) AS parent_gini_e10
FROM sc
ORDER BY gini_e10 ASC, split_v ASC
LIMIT 1
"""


# ---------------------------------------------------------------------------
# Q: poisson_bootstrap_means — deterministic Poisson(1) bootstrap of
# the mean order total (the distributed-bootstrap standard: each row
# draws its replicate multiplicity independently, so no resampling
# shuffle is ever needed).

BOOT_R = 8
# integer thresholds floor(CDF_Poisson(1)(k) * 1000003), k = 0..5 —
# weights are assigned by PURE INTEGER comparison (no float RNG at all)
_POIS_T = (367880, 735761, 919701, 981014, 996343, 999408)


def q_poisson_bootstrap_means(sf_dir: str) -> Dataset:
    """Poisson bootstrap (R=8 replicates) of mean(o_totalprice):
    row i's multiplicity in replicate r is the Poisson(1) inverse-CDF
    bucket of the house integer hash ((key+1)·(r+1)·2654435761 mod
    1000003) against pre-computed INTEGER thresholds — deterministic,
    seedable, and embarrassingly parallel (a 100-TB corpus bootstraps
    in one pass with zero data movement beyond R partial-sum rows per
    block). Publishes per-replicate exact integer (Σw, Σw·cents) and
    the e8 mean."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    thr = np.asarray(_POIS_T, dtype=np.int64)

    def partials(t: pa.Table) -> pa.Table:
        key = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        cents = _cents_col(t.column("o_totalprice")).to_numpy(
            zero_copy_only=False
        )
        rs, ws, xs = [], [], []
        for r in range(1, BOOT_R + 1):
            u = ((key + 1) * (r + 1) * 2654435761) % 1000003
            w = np.searchsorted(thr, u, side="right")  # count of t_k <= u
            rs.append(r)
            ws.append(int(w.sum()))
            xs.append(int((w * cents).sum()))
        return pa.table(
            {
                "r": pa.array(rs, type=pa.int64()),
                "wsum": pa.array(ws, type=pa.int64()),
                "wxsum": pa.array(xs, type=pa.int64()),
            }
        )

    merged = _pull_merged(
        merge_group_sums(
            orders.map_batches(partials, batch_format="pyarrow"),
            ["r"], ["wsum", "wxsum"],
        ),
        ["r", "wsum", "wxsum"],
    ).sort_by("r")
    r = merged.column("r").to_numpy(zero_copy_only=False)
    wsum = merged.column("wsum").to_numpy(zero_copy_only=False)
    wxsum = merged.column("wxsum").to_numpy(zero_copy_only=False)
    # exact integer round-half-up of (x·1e8)/w — floor((2a+b)/(2b)).
    # The float path (x/w·1e8 then round) lands in [2^51, 2^52) where
    # .5 is exactly representable and numpy/DuckDB disagree on ties;
    # Python bigints sidestep rounding modes entirely (HUGEINT in SQL).
    mean_e8 = np.array(
        [
            (2 * int(x) * 10**8 + int(w)) // (2 * int(w))
            for x, w in zip(wxsum, wsum)
        ],
        dtype=np.int64,
    )
    return rd.from_arrow(
        pa.table(
            {
                "r": pa.array(r, type=pa.int64()),
                "wsum": pa.array(wsum, type=pa.int64()),
                "wxsum": pa.array(wxsum, type=pa.int64()),
                "mean_e8": pa.array(mean_e8, type=pa.int64()),
            }
        )
    )


def _poisson_boot_sql() -> str:
    checks = " + ".join(
        f"(CASE WHEN u >= {t} THEN 1 ELSE 0 END)" for t in _POIS_T
    )
    return f"""
WITH reps(r) AS (
  SELECT UNNEST(generate_series(1, {BOOT_R}))
),
u AS (
  SELECT reps.r,
         ((o_orderkey + 1) * (reps.r + 1) * 2654435761) % 1000003 AS u,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders, reps
),
w AS (SELECT r, {checks} AS w, cents FROM u)
SELECT CAST(r AS BIGINT) AS r,
       CAST(SUM(w) AS BIGINT) AS wsum,
       CAST(SUM(w * cents) AS BIGINT) AS wxsum,
       -- exact HUGEINT round-half-up: floor((2a+b)/(2b)); // truncates
       -- but truncate == floor on non-negative operands (CLAUDE.md)
       CAST((2 * SUM(w * cents) * 100000000 + SUM(w))
            // (2 * SUM(w)) AS BIGINT) AS mean_e8
FROM w GROUP BY r
"""


SQL_POISSON_BOOTSTRAP_MEANS = _poisson_boot_sql()


# ---------------------------------------------------------------------------
# Q: ols_normal_equations — exact distributed multiple linear
# regression: price ~ quantity + discount via integer normal equations.


def q_ols_normal_equations(sf_dir: str) -> Dataset:
    """OLS fit of l_extendedprice (cents) on [1, l_quantity,
    l_discount·100] via the normal equations — the canonical
    distributed-ML primitive: X'X and X'y are 9 EXACT int64 sums
    (quantity ≤ 50, discount e2 ≤ 10, price cents ≤ 1e7 → the largest
    product Σ(x₁·y) stays < 2⁶³ to ~10⁹ rows; past that, shard the
    partials and widen — documented fallback), one constant-key merge,
    zero data movement beyond one partial row per block.

    The 3×3 solve is Cramer's rule on INTEGER determinants — exact in
    Python bigints and DuckDB HUGEINT (the Gram determinant of
    full-rank data is positive; asserted). Betas publish at e8 via the
    sign-safe exact floored half-up identity floor((2·detᵢ·1e8 +
    det)/(2·det)) — numpy/Python floor `//` directly; the SQL twin
    uses the branch-free mod-subtraction floor (CLAUDE.md r5: DuckDB
    `//` truncates, but truncate == floor once the numerator divides
    exactly). No float arithmetic appears ANYWHERE in this operator."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_discount", "l_extendedprice"],
    )

    def partials(t: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(t["l_quantity"]), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        d = _cents_col(t.column("l_discount")).to_numpy(zero_copy_only=False)
        y = _cents_col(t.column("l_extendedprice")).to_numpy(
            zero_copy_only=False
        )
        vals = (
            len(t), int(q.sum()), int(d.sum()),
            int((q * q).sum()), int((q * d).sum()), int((d * d).sum()),
            int(y.sum()), int((q * y).sum()), int((d * y).sum()),
        )
        names = ("n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y")
        cols = {"k": pa.array([0], type=pa.int64())}
        cols.update(
            {nm: pa.array([v], type=pa.int64()) for nm, v in zip(names, vals)}
        )
        return pa.table(cols)

    names = ["n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y"]
    merged = _pull_merged(
        merge_group_sums(
            li.map_batches(partials, batch_format="pyarrow"), ["k"], names
        ),
        ["k"] + names,
    )
    n, s1, s2, s11, s12, s22, sy, s1y, s2y = (
        int(merged.column(nm)[0].as_py()) for nm in names
    )
    det = (n * (s11 * s22 - s12 * s12)
           - s1 * (s1 * s22 - s12 * s2)
           + s2 * (s1 * s12 - s11 * s2))
    assert det > 0, "Gram matrix must be PD for full-rank features"
    det0 = (sy * (s11 * s22 - s12 * s12)
            - s1 * (s1y * s22 - s12 * s2y)
            + s2 * (s1y * s12 - s11 * s2y))
    det1 = (n * (s1y * s22 - s12 * s2y)
            - sy * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s2y - s1y * s2))
    det2 = (n * (s11 * s2y - s1y * s12)
            - s1 * (s1 * s2y - s1y * s2)
            + sy * (s1 * s12 - s11 * s2))
    betas = [(2 * dv * 10**8 + det) // (2 * det) for dv in (det0, det1, det2)]
    out = {nm: pa.array([v], type=pa.int64())
           for nm, v in zip(names, (n, s1, s2, s11, s12, s22, sy, s1y, s2y))}
    out.update(
        {
            "beta0_e8": pa.array([betas[0]], type=pa.int64()),
            "beta1_e8": pa.array([betas[1]], type=pa.int64()),
            "beta2_e8": pa.array([betas[2]], type=pa.int64()),
        }
    )
    return rd.from_arrow(pa.table(out))


def _ols_beta_sql(det_expr: str) -> str:
    # exact floored half-up at e8: floor((2·det_i·1e8 + det)/(2·det)),
    # branch-free in DuckDB (mod-subtract, then exact HUGEINT //)
    num = f"(2 * ({det_expr}) * 100000000 + det)"
    return (f"CAST(({num} - ((({num}) % (2 * det) + (2 * det)) % (2 * det)))"
            f" // (2 * det) AS BIGINT)")


SQL_OLS_NORMAL_EQUATIONS = f"""
WITH s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(q) AS s1, SUM(d) AS s2,
         SUM(q * q) AS s11, SUM(q * d) AS s12, SUM(d * d) AS s22,
         SUM(y) AS sy, SUM(q * y) AS s1y, SUM(d * y) AS s2y
  FROM (
    SELECT CAST(ROUND(l_quantity) AS BIGINT) AS q,
           CAST(ROUND(l_discount * 100) AS BIGINT) AS d,
           CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
    FROM lineitem
  )
),
dets AS (
  SELECT *,
         (n  * (s11 * s22 - s12 * s12)
        - s1 * (s1  * s22 - s12 * s2)
        + s2 * (s1  * s12 - s11 * s2)) AS det
  FROM s
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2,
       CAST(s11 AS BIGINT) AS s11, CAST(s12 AS BIGINT) AS s12,
       CAST(s22 AS BIGINT) AS s22, CAST(sy AS BIGINT) AS sy,
       CAST(s1y AS BIGINT) AS s1y, CAST(s2y AS BIGINT) AS s2y,
       {_ols_beta_sql('''sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)''')} AS beta0_e8,
       {_ols_beta_sql('''n  * (s1y * s22 - s12 * s2y)
        - sy * (s1  * s22 - s12 * s2)
        + s2 * (s1  * s2y - s1y * s2)''')} AS beta1_e8,
       {_ols_beta_sql('''n  * (s11 * s2y - s1y * s12)
        - s1 * (s1  * s2y - s1y * s2)
        + sy * (s1  * s12 - s11 * s2)''')} AS beta2_e8
FROM dets
"""


# ---------------------------------------------------------------------------
# Q: seasonal_residual_outliers — hour-of-day seasonal decomposition of
# the hourly event-volume series, with a 2σ residual outlier flag.


def q_seasonal_residual_outliers(sf_dir: str) -> Dataset:
    """Seasonal-naive anomaly detection on the hourly volume series:
    the seasonal component is the mean count of each hour-of-day slot,
    the residual is the hour's count minus its slot mean, and a row is
    an outlier when residual² exceeds 4× the mean squared residual —
    evaluated as the PURE INTEGER comparison resid_e8²·H > 4·Σresid_e8²
    (|r| > 2σ squared through; no float appears anywhere, extending the
    ols_normal_equations discipline to thresholding). Residuals
    publish at e8 via the sign-safe floored half-up identity
    floor((2·(n·dₕ−Sₕ)·1e8 + dₕ)/(2·dₕ)).

    Distributed stage: per-batch (epoch-hour → count) partials → ONE
    calendar-bounded merge (≤ stream-hours rows); the driver finish is
    over that bounded spine. Defined over OBSERVED hours (an absent
    hour contributes no row — the hourly_acf convention)."""
    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def partials(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        g = pa.table(
            {
                "hr": pa.array(us // US_PER_HOUR, type=pa.int64()),
                "n": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        ).group_by(["hr"]).aggregate([("n", "sum")])
        return g.rename_columns(["hr", "n"])

    spine = _pull_merged(
        merge_group_sums(
            events.map_batches(partials, batch_format="pyarrow"),
            ["hr"], ["n"],
        ),
        ["hr", "n"],
    ).sort_by("hr")
    hr = spine.column("hr").to_numpy(zero_copy_only=False)
    n = spine.column("n").to_numpy(zero_copy_only=False)
    hod = hr % 24
    sh = np.zeros(24, dtype=np.int64)
    dh = np.zeros(24, dtype=np.int64)
    np.add.at(sh, hod, n)
    np.add.at(dh, hod, 1)
    resid_e8 = np.array(
        [
            (2 * (int(nv) * int(dh[h]) - int(sh[h])) * 10**8 + int(dh[h]))
            // (2 * int(dh[h]))
            for nv, h in zip(n, hod)
        ],
        dtype=np.int64,
    )
    ss = int((resid_e8.astype(object) ** 2).sum())  # exact bigint sum
    hcnt = len(hr)
    outlier = np.array(
        [int(int(r) * int(r) * hcnt > 4 * ss) for r in resid_e8],
        dtype=np.int64,
    )
    return rd.from_arrow(
        pa.table(
            {
                "hr": pa.array(hr, type=pa.int64()),
                "hod": pa.array(hod, type=pa.int64()),
                "n": pa.array(n, type=pa.int64()),
                "sh": pa.array(sh[hod], type=pa.int64()),
                "dh": pa.array(dh[hod], type=pa.int64()),
                "resid_e8": pa.array(resid_e8, type=pa.int64()),
                "is_outlier": pa.array(outlier, type=pa.int64()),
            }
        )
    )


# sign-safe exact floor((2·r·1e8 + dh)/(2·dh)) in HUGEINT (CLAUDE.md
# branch-free floored-division idiom; numerator may be negative)
_RESID_NUM = "(2 * (n * dh - sh) * 100000000 + dh)"
_RESID_E8 = (f"CAST(({_RESID_NUM} - ((({_RESID_NUM}) % (2 * dh) + (2 * dh))"
             f" % (2 * dh))) // (2 * dh) AS BIGINT)")

SQL_SEASONAL_RESIDUAL_OUTLIERS = f"""
WITH h AS (
  SELECT epoch_us(ts) // 3600000000 AS hr, COUNT(*) AS n
  FROM events GROUP BY 1
),
s AS (
  SELECT hr % 24 AS hd, SUM(n) AS sh, COUNT(*) AS dh
  FROM h GROUP BY 1
),
r AS (
  SELECT h.hr, h.hr % 24 AS hod, h.n, s.sh, s.dh,
         {_RESID_E8} AS resid_e8
  FROM h JOIN s ON h.hr % 24 = s.hd
),
t AS (
  SELECT SUM(resid_e8 * resid_e8) AS ss, COUNT(*) AS hcnt FROM r
)
SELECT r.hr, CAST(r.hod AS BIGINT) AS hod, CAST(r.n AS BIGINT) AS n,
       CAST(r.sh AS BIGINT) AS sh, CAST(r.dh AS BIGINT) AS dh,
       r.resid_e8,
       -- HUGEINT hop: BIGINT·BIGINT·BIGINT raises on overflow in DuckDB
       CAST(CASE WHEN CAST(r.resid_e8 AS HUGEINT) * r.resid_e8 * t.hcnt
                      > 4 * t.ss
            THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
FROM r, t
"""


# ---------------------------------------------------------------------------
# Q: event_type_fano — burstiness (Fano factor / index of dispersion)
# of each event type's hourly arrival series.


def q_event_type_fano(sf_dir: str) -> Dataset:
    """Fano factor var/mean of hourly counts per event type over the
    DENSE calendar span (zero hours count): with H = span hours,
    N = Σn and SS = Σn², the population-variance/mean ratio reduces to
    the ALL-INTEGER rational (H·SS − N²)/(H·N) — published at e8 via
    the exact floored half-up identity; no float op exists anywhere in
    this operator (the ols_normal_equations discipline). Fano ≈ 1 is
    Poisson; > 1 is bursty.

    Distributed stage: (type, hour) count partials → ONE merge bounded
    by |types|·span-hours; zero hours contribute nothing to the sums
    and enter only through H (max−min+1 of the pulled spine)."""
    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partials(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        g = pa.table(
            {
                "event_type": t["event_type"],
                "hr": pa.array(us // US_PER_HOUR, type=pa.int64()),
                "n": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        ).group_by(["event_type", "hr"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "hr", "n"])

    cells = _pull_merged(
        merge_group_sums(
            events.map_batches(partials, batch_format="pyarrow"),
            ["event_type", "hr"], ["n"],
        ),
        ["event_type", "hr", "n"],
    )
    hr = cells.column("hr").to_numpy(zero_copy_only=False)
    h_span = int(hr.max()) - int(hr.min()) + 1
    et = cells.column("event_type").to_pylist()
    n = cells.column("n").to_numpy(zero_copy_only=False)
    agg: dict[str, list[int]] = {}
    for e, v in zip(et, n):
        a = agg.setdefault(e, [0, 0])
        a[0] += int(v)
        a[1] += int(v) * int(v)
    types = sorted(agg)
    fano = [
        (2 * (h_span * agg[e][1] - agg[e][0] ** 2) * 10**8
         + h_span * agg[e][0]) // (2 * h_span * agg[e][0])
        for e in types
    ]
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(types, type=pa.string()),
                "n_hours": pa.array([h_span] * len(types), type=pa.int64()),
                "n_events": pa.array(
                    [agg[e][0] for e in types], type=pa.int64()
                ),
                "sum_sq": pa.array([agg[e][1] for e in types], type=pa.int64()),
                "fano_e8": pa.array(fano, type=pa.int64()),
            }
        )
    )


SQL_EVENT_TYPE_FANO = """
WITH h AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hr, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
b AS (SELECT MAX(hr) - MIN(hr) + 1 AS hh FROM h),
s AS (
  SELECT event_type, SUM(n) AS nn, SUM(n * n) AS ss
  FROM h GROUP BY 1
)
SELECT event_type,
       CAST(b.hh AS BIGINT) AS n_hours,
       CAST(s.nn AS BIGINT) AS n_events,
       CAST(s.ss AS BIGINT) AS sum_sq,
       CAST((2 * (b.hh * s.ss - s.nn * s.nn) * 100000000 + b.hh * s.nn)
            // (2 * b.hh * s.nn) AS BIGINT) AS fano_e8
FROM s, b
"""


# ---------------------------------------------------------------------------
# Q: dp_noisy_counts — the Laplace mechanism for differentially-private
# count release, with SEEDED deterministic noise (testable: real
# deployments draw fresh randomness; the mechanism shape — sensitivity-
# scaled two-sided exponential via inverse-CDF — is exactly this).

DP_B = 20.0  # Laplace scale b = Δf/ε (sensitivity 1, ε = 0.05)
DP_SEGMENTS = (
    "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY",
)


def q_dp_noisy_counts(sf_dir: str) -> Dataset:
    """Per-segment customer counts released through a seeded Laplace
    mechanism: u = (k·2654435761 mod 1000003)/1000003 for the
    segment's fixed index k, noise = −b·sign(u−½)·ln(1−2|u−½|)
    (inverse CDF). LN is in the bitwise parity family and the whole
    noise expression is ONE fixed float sequence over an exact
    integer, mirrored in SQL; the true count ships beside the noisy
    release (the estimator-quality convention).

    Distributed: one 5-row count merge; everything else is driver
    arithmetic."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_mktsegment"]
    )

    def partials(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "c_mktsegment": t["c_mktsegment"],
                "n": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        ).group_by(["c_mktsegment"]).aggregate([("n", "sum")])
        return g.rename_columns(["c_mktsegment", "n"])

    merged = _pull_merged(
        merge_group_sums(
            cust.map_batches(partials, batch_format="pyarrow"),
            ["c_mktsegment"], ["n"],
        ),
        ["c_mktsegment", "n"],
    )
    counts = dict(
        zip(
            merged.column("c_mktsegment").to_pylist(),
            merged.column("n").to_numpy(zero_copy_only=False),
        )
    )
    segs, true_n, noisy = [], [], []
    for k, seg in enumerate(DP_SEGMENTS, start=1):
        n = int(counts.get(seg, 0))
        u = float((k * 2654435761) % 1000003) / 1000003.0
        d = u - 0.5
        mag = -DP_B * math.log(1.0 - 2.0 * abs(d))
        noise = -mag if d < 0 else mag
        segs.append(seg)
        true_n.append(n)
        noisy.append(int(np.round((n + noise) * 1e8)))
    return rd.from_arrow(
        pa.table(
            {
                "c_mktsegment": pa.array(segs, type=pa.string()),
                "true_n": pa.array(true_n, type=pa.int64()),
                "noisy_e8": pa.array(noisy, type=pa.int64()),
            }
        )
    )


def _dp_sql() -> str:
    seeds = ", ".join(
        f"('{s}', {k})" for k, s in enumerate(DP_SEGMENTS, start=1)
    )
    return f"""
WITH c AS (
  SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY 1
),
k(seg, kk) AS (VALUES {seeds}),
u AS (
  SELECT k.seg, COALESCE(c.n, 0) AS n,
         CAST((k.kk * 2654435761) % 1000003 AS DOUBLE) / 1000003.0 AS u
  FROM k LEFT JOIN c ON c.c_mktsegment = k.seg
)
SELECT seg AS c_mktsegment, CAST(n AS BIGINT) AS true_n,
       CAST(ROUND((n
            + (CASE WHEN u - 0.5 < 0 THEN -1.0 ELSE 1.0 END)
              * (-{DP_B!r} * LN(1.0 - 2.0 * ABS(u - 0.5)))
            ) * 1e8) AS BIGINT) AS noisy_e8
FROM u
"""


SQL_DP_NOISY_COUNTS = _dp_sql()


# ---------------------------------------------------------------------------
# Q: forecast_baseline_eval — one-step-ahead backtest of the two
# canonical baselines on the hourly volume series: naive (ŷₜ = yₜ₋₁)
# vs seasonal-naive (ŷₜ = yₜ₋₂₄). Any real forecasting deployment must
# beat these; this op computes their exact MAE numerators.


def q_forecast_baseline_eval(sf_dir: str) -> Dataset:
    """Over the dense zero-filled hourly spine, for t ≥ 24: Σ|yₜ−yₜ₋₁|
    and Σ|yₜ−yₜ₋₂₄| as exact integers, the eval count, and the e8
    MAEs via the exact floored half-up identity. seasonal_wins = 1
    when the seasonal-naive absolute-error sum is strictly smaller
    (pure integer comparison). Movement: the hourly count merge only
    (the ACF/CUSUM profile)."""
    spine, full = _hourly_spine(sf_dir)
    y = full.astype(np.int64)
    n_eval = len(y) - 24
    e_naive = int(np.abs(y[24:] - y[23:-1]).sum())
    e_seas = int(np.abs(y[24:] - y[:-24]).sum())
    mae = [
        (2 * e * 10**8 + n_eval) // (2 * n_eval) for e in (e_naive, e_seas)
    ]
    return rd.from_arrow(
        pa.table(
            {
                "n_evals": pa.array([n_eval], type=pa.int64()),
                "abs_err_naive": pa.array([e_naive], type=pa.int64()),
                "abs_err_seasonal": pa.array([e_seas], type=pa.int64()),
                "mae_naive_e8": pa.array([mae[0]], type=pa.int64()),
                "mae_seasonal_e8": pa.array([mae[1]], type=pa.int64()),
                "seasonal_wins": pa.array(
                    [int(e_seas < e_naive)], type=pa.int64()
                ),
            }
        )
    )


SQL_FORECAST_BASELINE_EVAL = f"""
WITH {SQL_SPINE_CTE.strip()},
l AS (
  SELECT hour, n,
         LAG(n, 1) OVER (ORDER BY hour) AS p1,
         LAG(n, 24) OVER (ORDER BY hour) AS p24,
         ROW_NUMBER() OVER (ORDER BY hour) AS rn
  FROM x
),
e AS (
  SELECT COUNT(*) AS n_evals,
         SUM(ABS(n - p1)) AS e1,
         SUM(ABS(n - p24)) AS e24
  FROM l WHERE rn > 24
)
SELECT CAST(n_evals AS BIGINT) AS n_evals,
       CAST(e1 AS BIGINT) AS abs_err_naive,
       CAST(e24 AS BIGINT) AS abs_err_seasonal,
       CAST((2 * e1 * 100000000 + n_evals) // (2 * n_evals) AS BIGINT)
         AS mae_naive_e8,
       CAST((2 * e24 * 100000000 + n_evals) // (2 * n_evals) AS BIGINT)
         AS mae_seasonal_e8,
       CAST(CASE WHEN e24 < e1 THEN 1 ELSE 0 END AS BIGINT)
         AS seasonal_wins
FROM e
"""


# ---------------------------------------------------------------------------
# Q: type_crosscorr — lead–lag cross-correlation between the 'click'
# and 'purchase' hourly series (does click volume LEAD purchase
# volume?): the CCF at lags −3..3, hourly_acf's two-series twin.

CCF_LAGS = (-3, -2, -1, 0, 1, 2, 3)
CCF_A, CCF_B = "click", "purchase"


def q_type_crosscorr(sf_dir: str) -> Dataset:
    """r(k) = Σ(aₜ−ā)(bₜ₊ₖ−b̄) / √(Σ(aₜ−ā)²·Σ(bₜ−b̄)²) over the dense
    zero-filled hourly spine, in the ACF's all-integer cross-multiplied
    form (deviations scaled by n; n⁴ cancels in the ratio — numerator
    and denominators publish as exact int64/bigint, one sqrt + one
    division at the end, e10). A positive-lag peak means {CCF_A!r}
    leads {CCF_B!r}.

    Movement: ONE (type, hour) count merge bounded by 2·span-hours."""
    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partials(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t["event_type"], value_set=pa.array([CCF_A, CCF_B])
        )
        t = t.filter(keep)
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        g = pa.table(
            {
                "event_type": t["event_type"],
                "hr": pa.array(us // US_PER_HOUR, type=pa.int64()),
                "n": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        ).group_by(["event_type", "hr"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "hr", "n"])

    cells = _pull_merged(
        merge_group_sums(
            events.map_batches(partials, batch_format="pyarrow"),
            ["event_type", "hr"], ["n"],
        ),
        ["event_type", "hr", "n"],
    )
    et = cells.column("event_type").to_pylist()
    hr = cells.column("hr").to_numpy(zero_copy_only=False)
    nn = cells.column("n").to_numpy(zero_copy_only=False)
    lo, hi = int(hr.min()), int(hr.max())
    span = hi - lo + 1
    a = np.zeros(span, dtype=np.int64)
    b = np.zeros(span, dtype=np.int64)
    for e, h, v in zip(et, hr, nn):
        (a if e == CCF_A else b)[int(h) - lo] += int(v)
    sa, sb = int(a.sum()), int(b.sum())
    da = a * span - sa  # exact scaled deviations
    db = b * span - sb
    dena = int((da * da).sum())
    denb = int((db * db).sum())
    den = float(dena) * float(denb)
    rows = {"lag": [], "num_scaled": [], "r_e10": []}
    for k in CCF_LAGS:
        if k >= 0:
            num = int((da[: span - k] * db[k:]).sum()) if k < span else 0
        else:
            num = int((da[-k:] * db[: span + k]).sum()) if -k < span else 0
        rows["lag"].append(k)
        rows["num_scaled"].append(num)
        rows["r_e10"].append(
            int(np.round(float(num) / math.sqrt(den) * 1e10))
        )
    return rd.from_arrow(
        pa.table(
            {
                "lag": pa.array(rows["lag"], type=pa.int64()),
                "n_hours": pa.array([span] * len(CCF_LAGS), type=pa.int64()),
                "num_scaled": pa.array(rows["num_scaled"], type=pa.int64()),
                "dena": pa.array([dena] * len(CCF_LAGS), type=pa.int64()),
                "denb": pa.array([denb] * len(CCF_LAGS), type=pa.int64()),
                "r_e10": pa.array(rows["r_e10"], type=pa.int64()),
            }
        )
    )


SQL_TYPE_CROSSCORR = f"""
WITH h AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hr, COUNT(*) AS n
  FROM events WHERE event_type IN ('{CCF_A}', '{CCF_B}')
  GROUP BY 1, 2
),
b AS (SELECT MIN(hr) AS lo, MAX(hr) AS hi, MAX(hr) - MIN(hr) + 1 AS span
      FROM h),
spine AS (
  SELECT UNNEST(generate_series((SELECT lo FROM b), (SELECT hi FROM b)))
    AS hr
),
x AS (
  SELECT s.hr,
         CAST(COALESCE(ha.n, 0) AS BIGINT) AS a,
         CAST(COALESCE(hb.n, 0) AS BIGINT) AS bb
  FROM spine s
  LEFT JOIN h ha ON ha.hr = s.hr AND ha.event_type = '{CCF_A}'
  LEFT JOIN h hb ON hb.hr = s.hr AND hb.event_type = '{CCF_B}'
),
tot AS (SELECT SUM(a) AS sa, SUM(bb) AS sb, COUNT(*) AS n FROM x),
d AS (
  SELECT hr, CAST(a * tot.n - tot.sa AS BIGINT) AS da,
         CAST(bb * tot.n - tot.sb AS BIGINT) AS db
  FROM x, tot
),
dens AS (SELECT SUM(da * da) AS dena, SUM(db * db) AS denb FROM d),
lags(k) AS (VALUES (-3), (-2), (-1), (0), (1), (2), (3)),
num AS (
  SELECT lags.k, COALESCE(SUM(p.da * q.db), 0) AS num
  FROM lags
  LEFT JOIN d p ON TRUE
  LEFT JOIN d q ON q.hr = p.hr + lags.k
  GROUP BY 1
)
SELECT CAST(num.k AS BIGINT) AS lag,
       CAST(tot.n AS BIGINT) AS n_hours,
       CAST(num.num AS BIGINT) AS num_scaled,
       CAST(dens.dena AS BIGINT) AS dena,
       CAST(dens.denb AS BIGINT) AS denb,
       CAST(ROUND(CAST(num.num AS DOUBLE)
            / SQRT(CAST(dens.dena AS DOUBLE) * CAST(dens.denb AS DOUBLE))
            * 1e10) AS BIGINT) AS r_e10
FROM num, dens, tot
"""


# ---------------------------------------------------------------------------
# Q: bootstrap_mean_diff — Poisson-bootstrap distribution of the
# difference in mean document length between source groups A
# (src0–src9) and B (src10–src19): the uncertainty quantification for
# an observed corpus-slice difference, one pass, zero resampling
# movement (poisson_bootstrap_means' two-sample extension).


def q_bootstrap_mean_diff(sf_dir: str) -> Dataset:
    """Per replicate r ∈ 1..{BOOT_R}: exact integer (Σw, Σw·n_chars)
    per group from the deterministic Poisson(1) inverse-CDF weights
    (the integer-threshold hash of poisson_bootstrap_means, keyed by
    doc_id), and the mean difference at e8 via the SIGN-SAFE exact
    floored half-up of the cross-multiplied rational
    (xa·wb − xb·wa)/(wa·wb) — no float division anywhere."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    thr = np.asarray(_POIS_T, dtype=np.int64)

    def partials(t: pa.Table) -> pa.Table:
        did = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        src = t.column("source").to_pylist()
        grp = np.array([0 if int(x[3:]) < 10 else 1 for x in src],
                       dtype=np.int64)
        nc = t.column("n_chars").to_numpy(zero_copy_only=False)
        rows = {"r": [], "wa": [], "xa": [], "wb": [], "xb": []}
        for r in range(1, BOOT_R + 1):
            u = ((did + 1) * (r + 1) * 2654435761) % 1000003
            w = np.searchsorted(thr, u, side="right")
            a = grp == 0
            rows["r"].append(r)
            rows["wa"].append(int(w[a].sum()))
            rows["xa"].append(int((w[a] * nc[a]).sum()))
            rows["wb"].append(int(w[~a].sum()))
            rows["xb"].append(int((w[~a] * nc[~a]).sum()))
        return pa.table(
            {k: pa.array(v, type=pa.int64()) for k, v in rows.items()}
        )

    merged = _pull_merged(
        merge_group_sums(
            docs.map_batches(partials, batch_format="pyarrow"),
            ["r"], ["wa", "xa", "wb", "xb"],
        ),
        ["r", "wa", "xa", "wb", "xb"],
    ).sort_by("r")
    out = {k: merged.column(k).to_numpy(zero_copy_only=False)
           for k in ("r", "wa", "xa", "wb", "xb")}
    diff = []
    for wa, xa, wb, xb in zip(out["wa"], out["xa"], out["wb"], out["xb"]):
        num = int(xa) * int(wb) - int(xb) * int(wa)
        den = int(wa) * int(wb)
        diff.append((2 * num * 10**8 + den) // (2 * den))  # floor = half-up
    return rd.from_arrow(
        pa.table(
            {
                "r": pa.array(out["r"], type=pa.int64()),
                "wa": pa.array(out["wa"], type=pa.int64()),
                "xa": pa.array(out["xa"], type=pa.int64()),
                "wb": pa.array(out["wb"], type=pa.int64()),
                "xb": pa.array(out["xb"], type=pa.int64()),
                "diff_e8": pa.array(diff, type=pa.int64()),
            }
        )
    )


def _boot_diff_sql() -> str:
    checks = " + ".join(
        f"(CASE WHEN u >= {t} THEN 1 ELSE 0 END)" for t in _POIS_T
    )
    num = "(SUM(CASE WHEN grp = 0 THEN w * nc ELSE 0 END)" \
          " * SUM(CASE WHEN grp = 1 THEN w ELSE 0 END)" \
          " - SUM(CASE WHEN grp = 1 THEN w * nc ELSE 0 END)" \
          " * SUM(CASE WHEN grp = 0 THEN w ELSE 0 END))"
    den = "(SUM(CASE WHEN grp = 0 THEN w ELSE 0 END)" \
          " * SUM(CASE WHEN grp = 1 THEN w ELSE 0 END))"
    fnum = f"(2 * {num} * 100000000 + {den})"
    return f"""
WITH reps(r) AS (SELECT UNNEST(generate_series(1, {BOOT_R}))),
u AS (
  SELECT reps.r,
         CASE WHEN CAST(substr(source, 4) AS INT) < 10 THEN 0 ELSE 1 END
           AS grp,
         n_chars AS nc,
         ((doc_id + 1) * (reps.r + 1) * 2654435761) % 1000003 AS u
  FROM documents, reps
),
w AS (SELECT r, grp, nc, {checks} AS w FROM u)
SELECT CAST(r AS BIGINT) AS r,
       CAST(SUM(CASE WHEN grp = 0 THEN w ELSE 0 END) AS BIGINT) AS wa,
       CAST(SUM(CASE WHEN grp = 0 THEN w * nc ELSE 0 END) AS BIGINT) AS xa,
       CAST(SUM(CASE WHEN grp = 1 THEN w ELSE 0 END) AS BIGINT) AS wb,
       CAST(SUM(CASE WHEN grp = 1 THEN w * nc ELSE 0 END) AS BIGINT) AS xb,
       -- sign-safe exact floored half-up (numerator may be negative)
       CAST(({fnum} - ((({fnum}) % (2 * {den}) + (2 * {den}))
             % (2 * {den}))) // (2 * {den}) AS BIGINT) AS diff_e8
FROM w GROUP BY r
"""


SQL_BOOTSTRAP_MEAN_DIFF = _boot_diff_sql()


STATOPS_QUERIES = {
    "type_crosscorr": q_type_crosscorr,
    "bootstrap_mean_diff": q_bootstrap_mean_diff,
    "ols_normal_equations": q_ols_normal_equations,
    "seasonal_residual_outliers": q_seasonal_residual_outliers,
    "event_type_fano": q_event_type_fano,
    "dp_noisy_counts": q_dp_noisy_counts,
    "forecast_baseline_eval": q_forecast_baseline_eval,
    "gini_best_split": q_gini_best_split,
    "poisson_bootstrap_means": q_poisson_bootstrap_means,
    "welch_ttest_segments": q_welch_ttest_segments,
    "mannwhitney_u_segments": q_mannwhitney_u_segments,
    "benford_chisq": q_benford_chisq,
    "hourly_acf": q_hourly_acf,
    "cusum_changepoint": q_cusum_changepoint,
    "trimmed_mean_segments": q_trimmed_mean_segments,
    "k_anonymity_audit": q_k_anonymity_audit,
    "geary_c_stats": q_geary_c_stats,
}

STATOPS_ORACLES = {
    "type_crosscorr": SQL_TYPE_CROSSCORR,
    "bootstrap_mean_diff": SQL_BOOTSTRAP_MEAN_DIFF,
    "ols_normal_equations": SQL_OLS_NORMAL_EQUATIONS,
    "seasonal_residual_outliers": SQL_SEASONAL_RESIDUAL_OUTLIERS,
    "event_type_fano": SQL_EVENT_TYPE_FANO,
    "dp_noisy_counts": SQL_DP_NOISY_COUNTS,
    "forecast_baseline_eval": SQL_FORECAST_BASELINE_EVAL,
    "gini_best_split": SQL_GINI_BEST_SPLIT,
    "poisson_bootstrap_means": SQL_POISSON_BOOTSTRAP_MEANS,
    "welch_ttest_segments": SQL_WELCH_TTEST_SEGMENTS,
    "mannwhitney_u_segments": SQL_MANNWHITNEY_U_SEGMENTS,
    "benford_chisq": SQL_BENFORD_CHISQ,
    "hourly_acf": SQL_HOURLY_ACF,
    "cusum_changepoint": SQL_CUSUM_CHANGEPOINT,
    "trimmed_mean_segments": SQL_TRIMMED_MEAN_SEGMENTS,
    "k_anonymity_audit": SQL_K_ANONYMITY_AUDIT,
    # geary_c_stats' oracle is registered by queries.py via _geary_sql()
    # (needs SQL_GEO_CTE — importing queries at module init would be
    # circular, the same pattern as tile_semivariogram)
}
