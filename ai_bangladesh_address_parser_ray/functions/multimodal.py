"""Multimodal (image/audio/video) column plumbing — stubbed codecs.

Design: media ride as opaque ``binary`` columns with typed metadata
(``media_type``, ``n_bytes``); decode / feature-extract / resize /
frame-sample are actor-pool ``map_batches`` stages whose *Ray-side shape*
(schema in/out, batch sizing for large payloads, per-actor init) is real and
tested, while the codec itself is stubbed: the image/audio libraries are not
in this container, so ``DecodeImage(fake=False)`` raises
``NotImplementedError`` and ``fake=True`` substitutes a deterministic
byte-derived decode. Swapping in PIL/ffmpeg later only changes ``_decode``.

Large payloads => small ``batch_size`` (keep batch x concurrency within the
worker heap) and ``num_cpus=1`` per actor; blocks of binary columns spill
naturally through the object store.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA_FIELDS = [
    ("media_id", pa.int64()),
    ("media_type", pa.string()),      # "image" | "audio" | "video"
    ("payload", pa.binary()),
    ("n_bytes", pa.int64()),
]


def attach_fake_media(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Derive a deterministic binary payload column from a text column —
    test/bench stand-in for real media ingestion."""
    def _f(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        payloads = [hashlib.sha256((t or "").encode()).digest() * 8
                    for t in texts]
        return pa.table({
            "media_id": pa.compute.cast(batch[id_col], pa.int64()),
            "media_type": pa.array(["image"] * len(texts), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        })
    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


class DecodeImage:
    """Actor stage: payload -> (width, height, mean_luma feature).

    ``fake=True``: deterministic decode derived from the payload bytes.
    ``fake=False``: requires a real codec — STUB, raises NotImplementedError
    (image libs are not available in this environment)."""

    def __init__(self, fake: bool = True):
        self.fake = fake

    def _decode(self, payload: bytes):
        if not self.fake:
            raise NotImplementedError(
                "real image decode needs PIL/cv2 — not in this container; "
                "run with fake=True or install a codec")
        h = hashlib.blake2b(payload, digest_size=6).digest()
        w = 64 + h[0]             # deterministic fake dimensions
        ht = 64 + h[1]
        luma = round(sum(h) / (255.0 * len(h)), 6)
        return w, ht, luma

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, lumas = [], [], []
        for p in batch["payload"].to_pylist():
            w, h, l = self._decode(p or b"")
            widths.append(w)
            heights.append(h)
            lumas.append(l)
        return (batch.drop_columns(["payload"])    # decoded: drop the blob
                .append_column("width", pa.array(widths, pa.int32()))
                .append_column("height", pa.array(heights, pa.int32()))
                .append_column("mean_luma", pa.array(lumas, pa.float64())))


def decode_stage(ds, fake: bool = True, concurrency: int = 2,
                 batch_size: int = 64):
    """batch_size deliberately small: payload batches are memory-heavy."""
    return ds.map_batches(
        DecodeImage, fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency, num_cpus=1)


class SampleFrames:
    """Actor stage: video payload -> N evenly-spaced frame-feature rows
    (explode). Stub decode: deterministic per-frame hash features."""

    def __init__(self, n_frames: int = 4, fake: bool = True):
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("real frame sampling needs ffmpeg")
        mids, fidx, feats = [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(),
                          batch["payload"].to_pylist()):
            for i in range(self.n_frames):
                d = hashlib.blake2b((p or b"") + bytes([i]),
                                    digest_size=8).digest()
                mids.append(mid)
                fidx.append(i)
                feats.append(round(int.from_bytes(d, "big") / 2**64, 6))
        return pa.table({
            "media_id": pa.array(mids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int32()),
            "frame_feature": pa.array(feats, pa.float64()),
        })


def frame_sample_stage(ds, n_frames: int = 4, fake: bool = True,
                       concurrency: int = 2, batch_size: int = 32):
    return ds.map_batches(
        SampleFrames, fn_constructor_kwargs={"n_frames": n_frames, "fake": fake},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency, num_cpus=1)
