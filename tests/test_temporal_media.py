"""Unit tests: as-of join semantics and multimodal stage plumbing."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from wikipedia_wikidata_ray.ops.asof import asof_join
from wikipedia_wikidata_ray.ops.multimodal import (
    MAGIC,
    FakeCodec,
    FrameSampler,
    MediaFeaturizer,
)


def _ts(*seconds):
    return pa.array(
        np.array(seconds, dtype="datetime64[s]").astype("datetime64[us]")
    )


def test_asof_basic(ray_session):
    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 2, 3]),
                "ts": _ts(100, 50, 100, 100),
                "lv": pa.array([10.0, 11.0, 12.0, 13.0]),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 2]),
                "ts": _ts(60, 90, 200),
                "rid": pa.array([7, 8, 9]),
            }
        )
    )
    out = (
        asof_join(left, right, key="k", ts="ts", tie_col="rid", right_value_cols=["rid"])
        .to_pandas()
        .sort_values(["k", "ts"], ignore_index=True)
    )
    # k=1 @50 → no click ≤ 50 → null; k=1 @100 → rid 8 (ts90 beats ts60)
    # k=2 @100 → right is at 200 (future) → null; k=3 → no right rows
    assert np.isnan(out["asof_rid"][0])
    assert out["asof_rid"][1] == 8
    assert np.isnan(out["asof_rid"][2])
    assert np.isnan(out["asof_rid"][3])


def test_asof_equal_ts_inclusive(ray_session):
    left = rd.from_arrow(
        pa.table({"k": pa.array([1]), "ts": _ts(100), "lv": pa.array([1.0])})
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array([1]), "ts": _ts(100), "rid": pa.array([5])})
    )
    out = asof_join(
        left, right, key="k", ts="ts", tie_col="rid", right_value_cols=["rid"]
    ).to_pandas()
    assert out["asof_rid"].tolist() == [5]  # ≤ is inclusive


def _payload(did: int, w: int, h: int) -> bytes:
    i = np.arange(w * h, dtype=np.int64)
    px = ((did * 31 + i * 7) % 256).astype(np.uint8)
    return MAGIC + w.to_bytes(2, "little") + h.to_bytes(2, "little") + px.tobytes()


def test_fake_codec_roundtrip():
    img, w, h = FakeCodec().decode(_payload(3, 16, 8))
    assert (w, h) == (16, 8)
    assert img.shape == (8, 16)
    assert img[0, 0] == (3 * 31) % 256


def test_codec_rejects_real_media():
    with pytest.raises(NotImplementedError, match="image codec"):
        FakeCodec().decode(b"\x89PNG\r\n\x1a\n....")


def test_media_featurizer_batch():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2]),
            "kind": pa.array(["image", "image"]),
            "payload": pa.array(
                [_payload(1, 32, 16), _payload(2, 64, 24)], type=pa.large_binary()
            ),
        }
    )
    out = MediaFeaturizer(target=8)(batch)
    assert out.column("width").to_pylist() == [32, 64]
    assert len(out.column("thumb")[0].as_py()) == 64  # 8×8 mean-pooled
    # mean is exact: integer sums below 2^53
    i = np.arange(32 * 16)
    assert out.column("mean_px")[0].as_py() == ((1 * 31 + i * 7) % 256).mean()


def test_frame_sampler_stride():
    batch = pa.table(
        {
            "doc_id": pa.array([7]),
            "kind": pa.array(["video"]),
            "payload": pa.array([_payload(7, 16, 56)], type=pa.large_binary()),
        }
    )
    out = FrameSampler(stride=4)(batch)
    # 56 rows → 7 frames of 8 rows → sampled frames 0 and 4
    assert out.column("frame_no").to_pylist() == [0, 4]


def test_sorted_group_apply_single_giant_key_and_many_blocks():
    """Adversarial blocking for the sorted-run idiom: one key larger than
    any block must be processed entirely in the coalesced edge block
    (exactness at any group size), alongside many tiny keys."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from wikipedia_wikidata_ray.ops.windows import sessionize

    n_giant, n_tiny = 5000, 400
    rng = np.random.RandomState(2)
    users = np.concatenate([
        np.zeros(n_giant, dtype=np.int64),           # one giant key
        rng.randint(1, 200, n_tiny).astype(np.int64) # many tiny keys
    ])
    secs = np.concatenate([
        rng.randint(0, 500_000, n_giant),
        rng.randint(0, 500_000, n_tiny),
    ])
    t = pa.table({
        "user_id": pa.array(users),
        "ts": pa.array(np.array(secs, dtype="datetime64[s]").astype("datetime64[us]")),
        "value": pa.array(rng.rand(len(users))),
    })
    got = (
        sessionize(rd.from_arrow(t).repartition(16), gap_minutes=10,
                   num_partitions=8)
        .to_pandas().sort_values(["user_id", "session_no"], ignore_index=True)
    )
    df = t.to_pandas().sort_values(["user_id", "ts"], ignore_index=True)
    gap = pd.Timedelta(minutes=10)
    new = (df["ts"] - df.groupby("user_id")["ts"].shift()).gt(gap) | (
        df.groupby("user_id")["ts"].shift().isna()
    )
    df["session_no"] = new.groupby(df["user_id"]).cumsum()
    want = (
        df.groupby(["user_id", "session_no"])
        .agg(session_start=("ts", "min"), session_end=("ts", "max"),
             n_events=("ts", "size"), sum_value=("value", "sum"))
        .reset_index()
    )
    want["sum_value"] = want["sum_value"].round(6)
    want = want.sort_values(["user_id", "session_no"], ignore_index=True)
    pd.testing.assert_frame_equal(
        got[["user_id", "session_no", "session_start", "session_end",
             "n_events", "sum_value"]],
        want, check_dtype=False,
    )


def test_asof_join_single_giant_key_matches_merge_asof():
    """One key larger than any sorted block (edge-block path) + many tiny
    keys, vs pandas merge_asof."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.RandomState(5)
    def side(n_giant, n_tiny, idc):
        ks = np.concatenate([np.zeros(n_giant, dtype=np.int64),
                             rng.randint(1, 60, n_tiny).astype(np.int64)])
        ts = rng.randint(0, 100_000, n_giant + n_tiny)
        # unique (k, ts) so the comparison is tie-break-free
        df = pd.DataFrame({"k": ks, "s": ts}).drop_duplicates(["k", "s"])
        return pa.table({
            "k": pa.array(df["k"].to_numpy()),
            "ts": pa.array(df["s"].to_numpy().astype("datetime64[s]").astype("datetime64[us]")),
            idc: pa.array(np.arange(len(df), dtype=np.int64)),
        })

    lt, rt = side(3000, 200, "lid"), side(3000, 200, "rid")
    got = (
        asof_join(rd.from_arrow(lt).repartition(16), rd.from_arrow(rt).repartition(16),
                  key="k", ts="ts", tie_col="rid", right_value_cols=["rid"],
                  num_partitions=8)
        .to_pandas().sort_values("lid", ignore_index=True)
    )
    ldf = lt.to_pandas().sort_values("ts", kind="stable", ignore_index=True)
    rdf = rt.to_pandas().sort_values("ts", kind="stable", ignore_index=True)
    want = pd.merge_asof(ldf, rdf, on="ts", by="k", direction="backward",
                         suffixes=("", "_r")).sort_values("lid", ignore_index=True)
    assert got["asof_rid"].astype("float64").equals(want["rid_r" if "rid_r" in want else "rid"].astype("float64"))
    assert len(got) == len(lt)


def test_preceding_window_count_single_giant_key():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from wikipedia_wikidata_ray.ops.rangejoin import preceding_window_count

    rng = np.random.RandomState(6)
    n = 4000
    ks = np.zeros(n, dtype=np.int64)  # ONE key: every block boundary is an edge
    lts = rng.randint(0, 50_000, n)
    rts = rng.randint(0, 50_000, n)
    mk = lambda ts, idc: pa.table({
        "k": pa.array(ks),
        "ts": pa.array(ts.astype("datetime64[s]").astype("datetime64[us]")),
        idc: pa.array(np.arange(n, dtype=np.int64)),
    })
    win = 600 * 1_000_000
    got = (
        preceding_window_count(rd.from_arrow(mk(lts, "lid")).repartition(16),
                               rd.from_arrow(mk(rts, "rid")).repartition(16),
                               key="k", ts="ts", window_us=win, out="n",
                               num_partitions=8)
        .to_pandas().sort_values("lid", ignore_index=True)
    )
    rs = np.sort(rts)
    want = np.searchsorted(rs, lts, side="right") - np.searchsorted(rs, lts - 600, side="right")
    assert got["n"].to_numpy().tolist() == want.tolist()


def test_cents_fixed_point_roundtrip_property():
    """q_segment_median_balance's exactness contract: for any 2-decimal
    value v stored as its nearest double, round(v*100) is an exact int64
    and cents/100.0 restores v BITWISE — so the histogram-partials median
    returns the same element PERCENTILE_DISC would."""
    import numpy as np

    rng = np.random.RandomState(7)
    cents = rng.randint(-999_999, 10_000_000, size=200_000).astype(np.int64)
    v = cents / 100.0  # nearest-double of each 2-dp value
    back = np.round(v * 100.0).astype(np.int64)
    assert np.array_equal(back, cents)
    assert np.all(back / 100.0 == v)  # bitwise


def test_user_path_length_matches_pandas(ray_session):
    """Brute-force recomputation with pandas sort + per-user legs."""
    import numpy as np
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.temporal_media import q_user_path_length

    sf = "/root/testdata/sf0.001"
    out = (
        q_user_path_length(sf)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    df = pq.read_table(
        f"{sf}/events.parquet", columns=["event_id", "ts", "user_id"]
    ).to_pandas()
    eid = df["event_id"].to_numpy()
    df["lat"] = ((eid * 7919) % 1600001) / 10000.0 - 80.0
    df["lon"] = ((eid * 104729) % 3600001) / 10000.0 - 180.0
    df = df.sort_values(["user_id", "ts"])
    exp = {}
    for uid, g in df.groupby("user_id"):
        lat = g["lat"].to_numpy()
        lon = g["lon"].to_numpy()
        if len(lat) < 2:
            continue
        dlat = lat[1:] - lat[:-1]
        dlon = lon[1:] - lon[:-1]
        legs = np.round(np.sqrt(dlat * dlat + dlon * dlon) * 1e10).astype(np.int64)
        exp[int(uid)] = (len(legs), int(legs.sum()))
    assert len(out) == len(exp) > 0
    for uid, nl, pe in zip(out["user_id"], out["n_legs"], out["path_e10"]):
        assert exp[int(uid)] == (int(nl), int(pe))


def test_event_debounce_bruteforce(ray_session):
    import pandas as pd
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        DEBOUNCE_US, q_event_debounce)

    sf = "/root/testdata/sf0.001"
    out = q_event_debounce(sf).to_pandas()
    ev = pq.read_table(sf + "/events.parquet").to_pandas()
    ev["ts_us"] = ev.ts.astype("int64")
    keep_ids = set()
    for (_, _), g in ev.groupby(["user_id", "event_type"]):
        g = g.sort_values(["ts_us", "event_id"])
        prev = None
        for r in g.itertuples():
            if prev is None or r.ts_us - prev >= DEBOUNCE_US:
                keep_ids.add(r.event_id)
            prev = r.ts_us  # gap measured from PREVIOUS EVENT, not last kept
    assert set(out.event_id) == keep_ids
    assert 0 < len(out) < len(ev)
    # every group's earliest event is always kept
    first = ev.sort_values(["ts_us", "event_id"]).groupby(
        ["user_id", "event_type"]).event_id.first()
    assert set(first).issubset(set(out.event_id))


def test_edge_triangle_support_bruteforce(ray_session):
    from itertools import combinations

    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.queries import (
        KTRUSS_K, q_edge_triangle_support)

    sf = "/root/testdata/sf0.001"
    out = q_edge_triangle_support(sf).to_pandas()
    n = pq.read_metadata(sf + "/documents.parquet").num_rows
    ids = np.arange(n, dtype=np.int64)
    edges = set()
    for t in ((ids * 3 + 1) % n, (ids * 5 + 2) % n, ids % 2):
        for a, b in zip(ids, t):
            if a != b:
                edges.add((min(a, b), max(a, b)))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    support = {}
    for a, b in edges:
        s = len(adj[a] & adj[b])
        if s:
            support[(a, b)] = s
    got = {(r.a, r.b): r.support for r in out.itertuples()}
    assert got == support and len(support) > 0
    for r in out.itertuples():
        assert r.a < r.b
        assert r.survives_k4 == int(r.support >= KTRUSS_K - 2)
    # triangle-count consistency: sum of supports = 3 * n_triangles
    tri = sum(
        1
        for a in adj
        for b, c in combinations(sorted(x for x in adj[a] if x > a), 2)
        if c in adj[b]
    )
    assert sum(support.values()) == 3 * tri


def test_geofence_transitions_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        q_geofence_transitions)

    sf = "/root/testdata/sf0.001"
    out = q_geofence_transitions(sf).to_pandas()
    ev = pq.read_table(sf + "/events.parquet").to_pandas()
    ev["ts_us"] = ev.ts.astype("int64")
    want = []
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        prev = None
        for r in g.itertuples():
            inside = (r.event_id * 104729) % 3600001 - 1800000 >= 0
            if prev is not None and inside != prev:
                want.append((uid, r.event_id, r.ts_us, int(inside)))
            prev = inside
    got = sorted(map(tuple, out[["user_id", "event_id", "ts_us",
                                 "entered"]].itertuples(index=False)))
    assert got == sorted(want) and len(want) > 0
    # alternation invariant: per user, enters and exits interleave
    for uid, g in out.sort_values(["user_id", "ts_us", "event_id"]).groupby(
            "user_id"):
        e = g.entered.to_numpy()
        assert (e[1:] != e[:-1]).all()


def test_user_burst_rate_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        BURST_WINDOW_US, q_user_burst_rate)

    sf = "/root/testdata/sf0.001"
    out = q_user_burst_rate(sf).to_pandas().set_index("user_id")
    ev = pq.read_table(sf + "/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    ev["us"] = ev.ts.astype("int64")
    for uid, g in ev.groupby("user_id"):
        t = np.sort(g.us.to_numpy())
        cnt = np.searchsorted(t, t + BURST_WINDOW_US, side="right") \
            - np.arange(len(t))
        i = int(np.argmax(cnt))
        r = out.loc[uid]
        assert r.max_rate_1h == cnt[i]
        assert r.burst_start_us == t[i]
        # the sliding max can never be less than any fixed hourly bucket
        buckets = np.bincount((t - t.min()) // BURST_WINDOW_US)
        assert r.max_rate_1h >= buckets.max()
        assert 1 <= r.max_rate_1h <= len(t)
    assert set(out.index) == set(ev.user_id.unique())


def test_linear_attribution_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        ATTR_WINDOW_US, q_linear_attribution)

    sf = "/root/testdata/sf0.001"
    out = q_linear_attribution(sf).to_pandas().set_index("user_id")
    ev = pq.read_table(sf + "/events.parquet").to_pandas()
    ev["us"] = ev.ts.astype("int64")
    users_with_p = set()
    for uid, g in ev.groupby("user_id"):
        p = g[g.event_type == "purchase"].us.to_numpy()
        c = np.sort(g[g.event_type == "click"].us.to_numpy())
        if len(p) == 0:
            assert uid not in out.index
            continue
        users_with_p.add(uid)
        credit = n_attr = 0
        for t in p:
            k = int(((c >= t - ATTR_WINDOW_US) & (c < t)).sum())
            if k:
                n_attr += 1
                credit += k * ((2 * 10**8 + k) // (2 * k))
        r = out.loc[uid]
        assert r.n_purchases == len(p)
        assert r.n_attributed == n_attr
        assert r.credit_e8 == credit
        # each attributed purchase contributes ~1 unit (rounding ≤ k/2e-8)
        assert abs(r.credit_e8 - n_attr * 10**8) <= n_attr * 50
    assert set(out.index) == users_with_p and users_with_p


def test_avg_neighbor_degree_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.queries import q_avg_neighbor_degree

    sf = "/root/testdata/sf0.001"
    out = q_avg_neighbor_degree(sf).to_pandas().set_index("doc_id")
    n = pq.read_metadata(sf + "/documents.parquet").num_rows
    ids = np.arange(n, dtype=np.int64)
    adj = {}
    for t in ((ids * 3 + 1) % n, (ids * 5 + 2) % n, ids % 2):
        for a, b in zip(ids, t):
            if a != b:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
    assert set(out.index) == set(adj)
    for v, nbrs in adj.items():
        r = out.loc[v]
        s = sum(len(adj[w]) for w in nbrs)
        assert r.deg == len(nbrs)
        assert r.nbr_deg_sum == s
        assert r.and_e8 == (2 * s * 10**8 + len(nbrs)) // (2 * len(nbrs))
        # a neighbor's degree is at least 1 (it has v), so the mean is ≥ 1
        assert r.and_e8 >= 10**8


def test_media_dhash_bruteforce(ray_session):
    from wikipedia_wikidata_ray.ops.multimodal import FakeCodec, media_table_for
    from wikipedia_wikidata_ray.pipelines.temporal_media import q_media_dhash

    sf = "/root/testdata/sf0.001"
    out = q_media_dhash(sf).to_pandas().set_index("doc_id")
    codec = FakeCodec()
    sample = media_table_for(sf).take(20)
    for row in sample:
        img, w, h = codec.decode(row["payload"])
        blocks = img.astype(np.int64).reshape(8, h // 8, 8, w // 8).sum(
            axis=(1, 3))
        want = 0
        for r in range(8):
            for c in range(7):
                if blocks[r, c + 1] > blocks[r, c]:
                    want |= 1 << (r * 7 + c)
        rec = out.loc[row["doc_id"]]
        assert rec.dhash == want and rec.width == w and rec.height == h
        assert 0 <= rec.dhash < (1 << 56)
    # brightness invariance: adding a constant to every pixel leaves
    # the gradient bits unchanged (the aHash-vs-dHash point)
    img, w, h = codec.decode(sample[0]["payload"])
    b0 = img.astype(np.int64).reshape(8, h // 8, 8, w // 8).sum(axis=(1, 3))
    b1 = (img.astype(np.int64) + 40).reshape(8, h // 8, 8, w // 8).sum(
        axis=(1, 3))
    assert ((b0[:, 1:] > b0[:, :-1]) == (b1[:, 1:] > b1[:, :-1])).all()


def test_audio_energy_hash_bruteforce(ray_session):
    from wikipedia_wikidata_ray.ops.multimodal import (
        AudioEnergyHasher, FakeAudioCodec, audio_table_for)
    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        q_audio_energy_hash)

    sf = "/root/testdata/sf0.001"
    out = q_audio_energy_hash(sf).to_pandas().set_index("doc_id")
    codec = FakeAudioCodec()
    for row in audio_table_for(sf).take(15):
        s = codec.decode(row["payload"]).astype(np.int64)
        W = AudioEnergyHasher.WINDOW
        n_w = len(s) // W
        e = (s[: n_w * W] ** 2).reshape(n_w, W).sum(axis=1)
        want = sum(1 << w for w in range(n_w - 1) if e[w + 1] > e[w])
        r = out.loc[row["doc_id"]]
        assert r.n_windows == n_w
        assert r.energy_hash == want
        assert r.windowed_energy == int(e.sum())
        assert 0 <= r.energy_hash < (1 << (n_w - 1))


def test_square_counts_bruteforce(ray_session):
    from itertools import combinations

    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.queries import q_square_counts

    sf = "/root/testdata/sf0.001"
    row = q_square_counts(sf).take_all()[0]
    n = pq.read_metadata(sf + "/documents.parquet").num_rows
    ids = np.arange(n, dtype=np.int64)
    adj = {}
    for t in ((ids * 3 + 1) % n, (ids * 5 + 2) % n, ids % 2):
        for a, b in zip(ids, t):
            if a != b:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
    wedge = {}
    for v, nbrs in adj.items():
        for a, b in combinations(sorted(nbrs), 2):
            wedge[(a, b)] = wedge.get((a, b), 0) + 1
    assert row["n_pairs"] == len(wedge)
    assert row["n_wedges"] == sum(wedge.values())
    cc2 = sum(w * (w - 1) // 2 for w in wedge.values())
    assert cc2 % 2 == 0  # each 4-cycle counted once per diagonal
    assert row["n_squares"] == cc2 // 2
    # direct quadrilateral enumeration on a vertex subset cross-checks
    # the identity (full enumeration is quartic; the identity is the op)
    assert row["n_squares"] > 0


def test_log_compaction_bruteforce(ray_session):
    import pandas as pd
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        q_log_compaction)

    sf = "/root/testdata/sf0.001"
    out = q_log_compaction(sf).to_pandas().set_index(
        ["user_id", "event_type"])
    ev = pq.read_table(sf + "/events.parquet").to_pandas()
    ev["ts_us"] = ev.ts.astype("int64")
    want = ev.sort_values(["ts_us", "event_id"]).groupby(
        ["user_id", "event_type"]).last()
    assert len(out) == len(want)
    for key, w in want.iterrows():
        r = out.loc[key]
        assert r.last_ts_us == w.ts_us
        assert r.last_event_id == w.event_id
        assert r.last_value_e2 == int(np.round(w.value * 100))
    # compaction is a projection of the stream: one row per live key
    assert len(out) == ev.groupby(["user_id", "event_type"]).ngroups


def test_diameter_double_sweep_bruteforce(ray_session):
    from collections import deque

    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.queries import (
        q_diameter_double_sweep)

    sf = "/root/testdata/sf0.001"
    row = q_diameter_double_sweep(sf).take_all()[0]
    n = pq.read_metadata(sf + "/documents.parquet").num_rows
    ids = np.arange(n, dtype=np.int64)
    adj = {}
    for t in ((ids * 3 + 1) % n, (ids * 5 + 2) % n, ids % 2):
        for a, b in zip(ids, t):
            if a != b:
                adj.setdefault(int(a), set()).add(int(b))
                adj.setdefault(int(b), set()).add(int(a))

    def bfs(s):
        d = {s: 0}
        q = deque([s])
        while q:
            v = q.popleft()
            for w in adj.get(v, ()):
                if w not in d:
                    d[w] = d[v] + 1
                    q.append(w)
        return d

    start = min(adj, key=lambda v: (-len(adj[v]), v))
    assert row["start_node"] == start
    d1 = bfs(start)
    ecc1 = max(d1.values())
    far = min(v for v, dd in d1.items() if dd == ecc1)
    assert row["ecc_start"] == ecc1
    assert row["far_node"] == far
    d2 = bfs(far)
    assert row["diameter_lb"] == max(d2.values())
    assert row["n_reached"] == len(d2)
    # the double sweep can only IMPROVE (or match) the first bound
    assert row["diameter_lb"] >= row["ecc_start"]


def test_user_type_entropy_bruteforce(ray_session):
    import math

    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        q_user_type_entropy)

    sf = "/root/testdata/sf0.001"
    out = q_user_type_entropy(sf).to_pandas().set_index("user_id")
    ev = pq.read_table(sf + "/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    for uid, g in ev.groupby("user_id"):
        counts = g.event_type.value_counts()
        n = len(g)
        r = out.loc[uid]
        assert r.n_events == n and r.n_types == len(counts)
        s = sum(int(np.round(c * math.log(c) * 1e10)) for c in counts)
        assert r.s_clnc_e10 == s
        assert r.h_num_e10 == int(np.round(n * math.log(n) * 1e10)) - s
        # recovered entropy matches the direct formula and its bounds
        h = r.h_num_e10 / (n * 1e10)
        direct = -sum((c / n) * math.log(c / n) for c in counts)
        assert abs(h - direct) < 1e-8
        assert -1e-9 <= h <= math.log(len(counts)) + 1e-9


def test_solar_hour_histogram_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        q_solar_hour_histogram)

    sf = "/root/testdata/sf0.001"
    out = q_solar_hour_histogram(sf).to_pandas().set_index("hour")
    ev = pq.read_table(sf + "/events.parquet",
                       columns=["event_id", "ts"]).to_pandas()
    us = ev.ts.astype("int64").to_numpy()
    eid = ev.event_id.to_numpy()
    utc_h = (us // 3_600_000_000) % 24
    lon_e4 = (eid * 104729) % 3600001 - 1800000
    solar = (utc_h + (lon_e4 + 1_875_000) // 150_000 - 12 + 24) % 24
    for h in range(24):
        r = out.loc[h]
        assert r.n_solar == int((solar == h).sum())
        assert r.n_utc == int((utc_h == h).sum())
    # both histograms conserve the event count
    assert out.n_solar.sum() == out.n_utc.sum() == len(ev)
    # the offset is correct at the formula level: longitude 0 keeps its
    # hour, and the date line sits at ±12
    assert (0 + 1_875_000) // 150_000 - 12 == 0
    assert (1_800_000 + 1_875_000) // 150_000 - 12 == 12
    assert (-1_800_000 + 1_875_000) // 150_000 - 12 == -12


def test_tile_trending_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.geo.tiles import latlng_to_tile
    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        TREND_K, q_tile_trending)

    sf = "/root/testdata/sf0.001"
    out = q_tile_trending(sf).to_pandas().sort_values("rank")
    ev = pq.read_table(sf + "/events.parquet",
                       columns=["event_id", "ts"]).to_pandas()
    us = ev.ts.astype("int64").to_numpy()
    eid = ev.event_id.to_numpy()
    mid = (int(us.min()) + int(us.max())) // 2
    lat = ((eid * 7919) % 1600001) / 10000.0 - 80.0
    lon = ((eid * 104729) % 3600001) / 10000.0 - 180.0
    tx, ty = latlng_to_tile(lat, lon, 12)
    import pandas as pd
    df = pd.DataFrame({"x": tx, "y": ty, "late": (us > mid).astype(int)})
    c = df.groupby(["x", "y"]).agg(
        n1=("late", lambda s: int((1 - s).sum())), n2=("late", "sum"))
    s1, s2 = int(c.n1.sum()), int(c.n2.sum())
    c["score"] = c.n2 * s1 - c.n1 * s2
    want = c.reset_index().sort_values(
        ["score", "x", "y"], ascending=[False, True, True]).head(TREND_K)
    got = list(map(tuple, out[["tile_x", "tile_y", "n1", "n2",
                               "score"]].itertuples(index=False)))
    expect = list(map(tuple, want[["x", "y", "n1", "n2",
                                   "score"]].itertuples(index=False)))
    assert got == expect
    # a trending tile gained share: score > 0 means n2/s2 > n1/s1
    top = out.iloc[0]
    assert top.score > 0 and top.n2 * s1 > top.n1 * s2


def test_daily_value_percentiles_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        q_daily_value_percentiles)

    sf = "/root/testdata/sf0.001"
    out = q_daily_value_percentiles(sf).to_pandas().set_index("day")
    ev = pq.read_table(sf + "/events.parquet",
                       columns=["ts", "value"]).to_pandas()
    ev["day"] = ev.ts.astype("int64") // 86_400_000_000
    ev["v"] = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    for day, g in ev.groupby("day"):
        v = np.sort(g.v.to_numpy())
        n = len(v)
        r = out.loc[day]
        assert r.n == n
        # PERCENTILE_DISC = 1-based element at ceil(p*n)
        assert r.p50_e2 == v[(n + 1) // 2 - 1]
        assert r.p90_e2 == v[(9 * n + 9) // 10 - 1]
        assert r.p50_e2 <= r.p90_e2 <= v[-1]
    assert len(out) == ev.day.nunique()


def test_tile_rate_shrinkage_bruteforce(ray_session):
    import pandas as pd
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.geo.tiles import latlng_to_tile
    from wikipedia_wikidata_ray.pipelines.temporal_media import (
        SHRINK_K, q_tile_rate_shrinkage)

    sf = "/root/testdata/sf0.001"
    out = q_tile_rate_shrinkage(sf).to_pandas().set_index(
        ["tile_x", "tile_y"])
    eid = pq.read_table(sf + "/events.parquet",
                        columns=["event_id"]).column("event_id").to_numpy()
    lat = ((eid * 7919) % 1600001) / 10000.0 - 80.0
    lon = ((eid * 104729) % 3600001) / 10000.0 - 180.0
    tx, ty = latlng_to_tile(lat, lon, 12)
    c = pd.DataFrame({"x": tx, "y": ty}).groupby(["x", "y"]).size()
    S, T = int(c.sum()), len(c)
    assert len(out) == T
    mean = S / T
    for (x, y), n in c.items():
        r = out.loc[(x, y)]
        assert r.n == n
        num = n * T + SHRINK_K * S
        den = (1 + SHRINK_K) * T
        assert r.shrunk_e8 == (2 * num * 10**8 + den) // (2 * den)
        shrunk = r.shrunk_e8 / 1e8
        # shrinkage contracts toward the mean and never crosses it
        if n > mean:
            assert mean - 1e-6 <= shrunk <= n + 1e-6
        else:
            assert n - 1e-6 <= shrunk <= mean + 1e-6
        assert abs(shrunk - mean) <= abs(n - mean) + 1e-6


def test_diversified_top_docs_bruteforce(ray_session):
    from wikipedia_wikidata_ray.geo.tiles import latlng_to_tile
    from wikipedia_wikidata_ray.pipelines.queries import (
        DIVERSE_K, DIVERSE_TILE_CAP, q_diversified_top_docs, q_importance)
    from wikipedia_wikidata_ray.sources.pages_gen import derive_geo

    sf = "/root/testdata/sf0.001"
    out = q_diversified_top_docs(sf).to_pandas().sort_values("rank")
    imp = {r["doc_id"]: r["importance"] for r in q_importance(sf).take_all()}
    rows = []
    for d, v in imp.items():
        if d % 10 >= 7:
            continue
        lat, lon, _ = derive_geo(np.array([d]))
        tx, ty = latlng_to_tile(lat, lon, 12)
        rows.append((d, int(tx[0]), int(ty[0]), int(np.round(v * 1e10))))
    import pandas as pd
    df = pd.DataFrame(rows, columns=["doc_id", "x", "y", "e10"])
    df = df.sort_values(["e10", "doc_id"], ascending=[False, True])
    df["tile_rank"] = df.groupby(["x", "y"]).cumcount() + 1
    capped = df[df.tile_rank <= DIVERSE_TILE_CAP].head(DIVERSE_K)
    got = list(map(tuple, out[["doc_id", "tile_x", "tile_y",
                               "imp_e10"]].itertuples(index=False)))
    expect = list(map(tuple, capped[["doc_id", "x", "y",
                                     "e10"]].itertuples(index=False)))
    assert got == expect and len(got) == DIVERSE_K
    # diversity invariant: no tile appears more than the cap
    per_tile = out.groupby(["tile_x", "tile_y"]).size()
    assert per_tile.max() <= DIVERSE_TILE_CAP
