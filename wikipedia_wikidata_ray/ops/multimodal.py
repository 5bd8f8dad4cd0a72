"""Multimodal (image/audio/video-as-binary) processing stages.

Media payloads are opaque ``large_binary`` columns with typed metadata —
the engine treats decode/resize/feature-extract/frame-sample as
actor-pool ``map_batches`` stages over small batches (wide binary rows).
The container has no image/audio codecs, so the DECODE step is a
clearly-marked deterministic stand-in (``FakeCodec``) for a real decoder
(PIL/ffmpeg would drop in behind the same interface via ``codec=``);
the Ray-side plumbing — schema, batch sizing, actor signature, output
layout — is real and oracle-tested.

Synthetic media contract (closed-form from doc_id, SQL-replicable):
- width  = 32 + (doc_id % 5) * 16
- height = 24 + (doc_id % 3) * 16
- pixel[i] = (doc_id * 31 + i * 7) % 256   for i in [0, width*height)
- payload  = b"FAKEIMG!" + width:uint16le + height:uint16le + pixels
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

MAGIC = b"FAKEIMG!"
_HDR = len(MAGIC) + 4


def media_table_for(sf_dir: str) -> Dataset:
    """Deterministic media fixture derived from ``documents`` (schema:
    doc_id, kind, payload:large_binary)."""

    def gen(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        payloads = []
        for did in ids:
            w = 32 + (did % 5) * 16
            h = 24 + (did % 3) * 16
            i = np.arange(w * h, dtype=np.int64)
            px = ((did * 31 + i * 7) % 256).astype(np.uint8)
            payloads.append(
                MAGIC
                + int(w).to_bytes(2, "little")
                + int(h).to_bytes(2, "little")
                + px.tobytes()
            )
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "kind": pa.array(["image"] * len(ids), type=pa.string()),
                "payload": pa.array(payloads, type=pa.large_binary()),
            }
        )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return docs.map_batches(gen, batch_format="pyarrow")


class FakeCodec:
    """Deterministic stand-in decoder. A real deployment passes a codec
    object exposing ``decode(payload) -> (np.ndarray, w, h)`` built on
    PIL/ffmpeg — loaded once per actor in ``MediaFeaturizer.__init__``."""

    def decode(self, payload: bytes) -> tuple[np.ndarray, int, int]:
        if not payload.startswith(MAGIC):
            raise NotImplementedError(
                "real image decoding requires an image codec (PIL/ffmpeg) "
                "not present in this container; payload is not FAKEIMG"
            )
        w = int.from_bytes(payload[len(MAGIC) : len(MAGIC) + 2], "little")
        h = int.from_bytes(payload[len(MAGIC) + 2 : _HDR], "little")
        px = np.frombuffer(payload, dtype=np.uint8, offset=_HDR, count=w * h)
        return px.reshape(h, w), w, h


class MediaFeaturizer:
    """Actor-pool stage: decode → mean-pool resize → feature vector.

    State (the codec, potentially a model) is constructed once per actor;
    batches stay small because payload rows are wide (the same block-size
    discipline as the ``html`` column)."""

    def __init__(self, codec=None, target: int = 8):
        self.codec = codec or FakeCodec()
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.target
        widths = np.empty(len(batch), dtype=np.int32)
        heights = np.empty(len(batch), dtype=np.int32)
        means = np.empty(len(batch), dtype=np.float64)
        thumbs: list[np.ndarray] = []
        for j, payload in enumerate(batch["payload"].to_pylist()):
            img, w, h = self.codec.decode(payload)
            widths[j], heights[j] = w, h
            means[j] = img.mean()
            # mean-pool resize to t×t (crop to a multiple of t — the
            # deterministic-resize contract)
            ch, cw = (h // t) * t, (w // t) * t
            pooled = (
                img[:ch, :cw]
                .reshape(t, ch // t, t, cw // t)
                .mean(axis=(1, 3))
            )
            thumbs.append(pooled.reshape(-1).astype(np.float32))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "width": pa.array(widths),
                "height": pa.array(heights),
                "mean_px": pa.array(means),
                "thumb": pa.array(
                    [x.tolist() for x in thumbs], type=pa.list_(pa.float32())
                ),
            }
        )


def media_features(sf_dir: str, concurrency=(1, 8), batch_size: int = 256) -> Dataset:
    return media_table_for(sf_dir).map_batches(
        MediaFeaturizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class FrameSampler:
    """Video analog: payload = concatenation of fixed-size frames; emit
    every ``stride``-th frame as its own row (flat_map-style expansion
    inside map_batches). Plumbing-real; frame decode shares FakeCodec."""

    def __init__(self, stride: int = 4):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        codec = FakeCodec()
        ids, frame_no, frame_mean = [], [], []
        for j, payload in enumerate(batch["payload"].to_pylist()):
            img, w, h = codec.decode(payload)
            # treat each row-band of 8 lines as one "frame"
            n_frames = h // 8
            for k in range(0, n_frames, self.stride):
                ids.append(batch["doc_id"][j].as_py())
                frame_no.append(k)
                frame_mean.append(float(img[k * 8 : (k + 1) * 8].mean()))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "frame_no": pa.array(frame_no, type=pa.int32()),
                "frame_mean": pa.array(frame_mean, type=pa.float64()),
            }
        )


def frame_samples(sf_dir: str, stride: int = 4) -> Dataset:
    return media_table_for(sf_dir).map_batches(
        FrameSampler,
        fn_constructor_args=(stride,),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 8),
        num_cpus=1,
    )


class AHasher:
    """Actor-pool stage: decode → 8×8 average-hash perceptual fingerprint
    (the multimodal × dedup cross: aHash is the standard near-dup
    primitive for images; Hamming banding over these fingerprints rides
    the existing simhash machinery, ops/dedup.py). Bit rule is EXACT
    INTEGER — bit(r,c) = 64·block_sum > total_sum (the cross-multiplied
    block-mean > global-mean comparison; every fixture (w, h) divides
    8×8 evenly so blocks are equal-sized and the rule is this clean) —
    and the 64 bits publish as two int64 halves (hash_hi = rows 4-7,
    hash_lo = rows 0-3) so no bit ever lands in the int64 sign position
    on either side. Codec state per actor, same seam as MediaFeaturizer.
    """

    def __init__(self, codec=None):
        self.codec = codec or FakeCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, his, los = [], [], [], [], []
        for j, payload in enumerate(batch["payload"].to_pylist()):
            img, w, h = self.codec.decode(payload)
            bh, bw = h // 8, w // 8
            blocks = (
                img.astype(np.int64)
                .reshape(8, bh, 8, bw)
                .sum(axis=(1, 3))
            )  # (8, 8) integer block sums
            total = int(blocks.sum())
            bits = (64 * blocks > total).astype(np.int64)
            sh = np.arange(64, dtype=np.int64).reshape(8, 8)
            lo = int((bits[:4] << (sh[:4])).sum())
            hi = int((bits[4:] << (sh[4:] - 32)).sum())
            ids.append(batch["doc_id"][j].as_py())
            ws.append(w)
            hs.append(h)
            his.append(hi)
            los.append(lo)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "width": pa.array(ws, type=pa.int64()),
                "height": pa.array(hs, type=pa.int64()),
                "hash_hi": pa.array(his, type=pa.int64()),
                "hash_lo": pa.array(los, type=pa.int64()),
            }
        )


def media_ahash(sf_dir: str, concurrency=(1, 8), batch_size: int = 256) -> Dataset:
    return media_table_for(sf_dir).map_batches(
        AHasher,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class DHasher:
    """Actor-pool stage: decode → 56-bit difference-hash (dHash)
    fingerprint — aHash's gradient twin: bit(r,c) = block(r,c+1) >
    block(r,c) over the 8×8 integer block sums, so the hash tracks
    horizontal GRADIENTS and survives global brightness shifts that
    flip aHash bits. 8 rows × 7 comparisons = 56 bits, one int64, no
    sign-bit hazard. Comparisons are EXACT INTEGER (equal-sized blocks
    by the fixture's 8-divisibility contract). Same codec seam as
    AHasher."""

    def __init__(self, codec=None):
        self.codec = codec or FakeCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, hashes = [], [], [], []
        for j, payload in enumerate(batch["payload"].to_pylist()):
            img, w, h = self.codec.decode(payload)
            bh, bw = h // 8, w // 8
            blocks = (
                img.astype(np.int64)
                .reshape(8, bh, 8, bw)
                .sum(axis=(1, 3))
            )
            bits = (blocks[:, 1:] > blocks[:, :-1]).astype(np.int64)
            sh = np.arange(56, dtype=np.int64).reshape(8, 7)
            hashes.append(int((bits << sh).sum()))
            ids.append(batch["doc_id"][j].as_py())
            ws.append(w)
            hs.append(h)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "width": pa.array(ws, type=pa.int64()),
                "height": pa.array(hs, type=pa.int64()),
                "dhash": pa.array(hashes, type=pa.int64()),
            }
        )


def media_dhash(sf_dir: str, concurrency=(1, 8), batch_size: int = 256) -> Dataset:
    return media_table_for(sf_dir).map_batches(
        DHasher,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


AUDIO_MAGIC = b"FAKEAUD!"
_AHDR = len(AUDIO_MAGIC) + 4

# Synthetic audio contract (closed-form from doc_id, SQL-replicable):
# - n_samples = 8000 + (doc_id % 7) * 1000
# - sample[i] = ((doc_id * 17 + i * 11) % 4096) - 2048   (int16)
# - payload   = b"FAKEAUD!" + n_samples:uint32le + samples:int16le


def audio_table_for(sf_dir: str) -> Dataset:
    """Deterministic audio fixture derived from ``documents`` (schema:
    doc_id, kind, payload:large_binary)."""

    def gen(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        payloads = []
        for did in ids:
            n = 8000 + (did % 7) * 1000
            i = np.arange(n, dtype=np.int64)
            s = (((did * 17 + i * 11) % 4096) - 2048).astype(np.int16)
            payloads.append(
                AUDIO_MAGIC + int(n).to_bytes(4, "little") + s.tobytes()
            )
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "kind": pa.array(["audio"] * len(ids), type=pa.string()),
                "payload": pa.array(payloads, type=pa.large_binary()),
            }
        )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return docs.map_batches(gen, batch_format="pyarrow")


class FakeAudioCodec:
    """Deterministic stand-in decoder (real deployment: soundfile/ffmpeg
    behind the same seam)."""

    def decode(self, payload: bytes) -> np.ndarray:
        if not payload.startswith(AUDIO_MAGIC):
            raise NotImplementedError(
                "real audio decoding requires an audio codec "
                "(soundfile/ffmpeg) not present in this container"
            )
        n = int.from_bytes(payload[len(AUDIO_MAGIC):_AHDR], "little")
        return np.frombuffer(payload, dtype=np.int16, offset=_AHDR, count=n)


class AudioFeaturizer:
    """Actor-pool stage: decode → exact-integer waveform features
    (n_samples, energy = Σs², zero crossings by the nonneg-XOR rule,
    peak = max |s|) — every feature int64, SQL-replicable under the
    FAKEAUD contract. Codec per actor (J17 seam)."""

    def __init__(self, codec=None):
        self.codec = codec or FakeAudioCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ns, en, zc, pk = [], [], [], [], []
        for j, payload in enumerate(batch["payload"].to_pylist()):
            s = self.codec.decode(payload).astype(np.int64)
            ids.append(batch["doc_id"][j].as_py())
            ns.append(len(s))
            en.append(int((s * s).sum()))
            nn = s >= 0
            zc.append(int((nn[:-1] != nn[1:]).sum()))
            pk.append(int(np.abs(s).max()))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_samples": pa.array(ns, type=pa.int64()),
                "energy": pa.array(en, type=pa.int64()),
                "zero_crossings": pa.array(zc, type=pa.int64()),
                "peak": pa.array(pk, type=pa.int64()),
            }
        )


def audio_features(sf_dir: str, concurrency=(1, 8), batch_size: int = 256) -> Dataset:
    return audio_table_for(sf_dir).map_batches(
        AudioFeaturizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class AudioEnergyHasher:
    """Actor-pool stage: decode → windowed-energy difference hash (the
    audio analog of DHasher; Shazam-style landmark hashing reduced to
    its energy-contour core): per 1000-sample window the exact int64
    energy Σs², bit w = energy(w+1) > energy(w) — ≤ 13 bits at the
    FAKEAUD length contract, one int64, all comparisons exact integer.
    Codec per actor (J17 seam)."""

    WINDOW = 1000

    def __init__(self, codec=None):
        self.codec = codec or FakeAudioCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, nw, eh, te = [], [], [], []
        for j, payload in enumerate(batch["payload"].to_pylist()):
            s = self.codec.decode(payload).astype(np.int64)
            n_w = len(s) // self.WINDOW
            w = (s[: n_w * self.WINDOW] ** 2).reshape(n_w, self.WINDOW).sum(
                axis=1
            )
            bits = (w[1:] > w[:-1]).astype(np.int64)
            ids.append(batch["doc_id"][j].as_py())
            nw.append(n_w)
            eh.append(int((bits << np.arange(n_w - 1, dtype=np.int64)).sum()))
            te.append(int(w.sum()))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_windows": pa.array(nw, type=pa.int64()),
                "energy_hash": pa.array(eh, type=pa.int64()),
                "windowed_energy": pa.array(te, type=pa.int64()),
            }
        )


def audio_energy_hash(sf_dir: str, concurrency=(1, 8),
                      batch_size: int = 256) -> Dataset:
    return audio_table_for(sf_dir).map_batches(
        AudioEnergyHasher,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
