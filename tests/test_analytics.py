"""Semantic (not-just-parity) tests for pipelines/analytics.py — the
prefix-aggregation family (running totals, sweep-line concurrency).

Brute-force twins are computed in pandas/numpy at sf0.001 so a bug shared
with the SQL oracle (the weighted_sample lesson) cannot hide.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_running_revenue_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import q_running_revenue

    out = q_running_revenue(SF).to_pandas()
    orders = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_totalprice"],
    ).to_pandas()
    orders["cents"] = np.round(orders.o_totalprice * 100).astype(np.int64)
    orders = orders.sort_values(
        ["o_orderdate", "o_orderkey"], ignore_index=True
    )
    want = orders.cents.cumsum().to_numpy()

    got = out.set_index("o_orderkey").running_cents
    got = got.loc[orders.o_orderkey].to_numpy()
    assert len(out) == len(orders)
    assert (got == want).all()
    # semantics: strictly increasing in the order position (prices > 0)
    assert (np.diff(got) > 0).all()


def _sessions(events: pd.DataFrame) -> pd.DataFrame:
    events = events.sort_values(["user_id", "ts"], ignore_index=True)
    gap = pd.Timedelta(minutes=30)
    new = (events.user_id != events.user_id.shift()) | (
        events.ts - events.ts.shift() > gap
    )
    events["sess"] = new.cumsum()
    g = events.groupby("sess").agg(start=("ts", "min"), end=("ts", "max"))
    return g.reset_index(drop=True)


def test_session_concurrency_bruteforce(ray_session):
    from wikipedia_wikidata_ray.pipelines.analytics import (
        US_PER_HOUR,
        q_session_concurrency,
    )

    out = (
        q_session_concurrency(SF)
        .to_pandas()
        .sort_values("hour", ignore_index=True)
    )
    events = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts"]
    ).to_pandas()
    sess = _sessions(events)
    s_us = sess.start.astype("int64").to_numpy()
    e_us = sess.end.astype("int64").to_numpy() + 1

    hours = out.hour.to_numpy()
    # spine is contiguous and covers the stream span
    assert (np.diff(hours) == 1).all()
    assert hours[0] == s_us.min() // US_PER_HOUR
    assert hours[-1] == e_us.max() // US_PER_HOUR

    # brute force: concurrency is piecewise-constant between boundaries;
    # evaluate the running sum at every boundary instant per hour, plus
    # the carry into each hour
    bounds = np.concatenate([s_us, e_us])
    deltas = np.concatenate(
        [np.ones(len(s_us), np.int64), -np.ones(len(e_us), np.int64)]
    )
    order = np.lexsort((-deltas, bounds))
    bounds, deltas = bounds[order], deltas[order]
    run = np.cumsum(deltas)
    bh = bounds // US_PER_HOUR
    for h, want_max in zip(out.hour, out.max_concurrent):
        before = run[bh < h]
        carry = before[-1] if len(before) else 0
        inside = run[bh == h]
        expect = max([carry, *inside.tolist()])
        assert want_max == expect, h
    # global sanity: every session opened must close
    assert run[-1] == 0
    # semantics: the busiest hour must see at least ceil(#users-active)
    # 1 concurrent session
    assert out.max_concurrent.max() >= 1
