"""Multimodal (image/audio/video) column plumbing.

Design: media ride as opaque ``binary`` columns with typed metadata
(``media_type``, ``n_bytes``); decode / feature-extract / resize /
frame-sample are actor-pool ``map_batches`` stages whose *Ray-side shape*
(schema in/out, batch sizing for large payloads, per-actor init) is real and
tested.

Codecs: netpbm (binary PGM ``P5`` grayscale / PPM ``P6`` RGB) is decoded
and encoded FOR REAL in pure numpy — no external image library — so
``DecodeImage(fake=False)`` and ``resize_stage`` operate on actual pixels.
Compressed formats (JPEG/PNG/video) need PIL/cv2/ffmpeg, which are not in
this container: those paths raise ``NotImplementedError`` and the
``fake=True`` stand-in substitutes a deterministic byte-derived decode.
Swapping in PIL later only changes ``_decode``.

Large payloads => small ``batch_size`` (keep batch x concurrency within the
worker heap) and ``num_cpus=1`` per actor; blocks of binary columns spill
naturally through the object store.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


# ------------------------------------------------- netpbm codec (real) ----

def encode_netpbm(img: np.ndarray) -> bytes:
    """(h, w) uint8 -> binary PGM ``P5``; (h, w, 3) uint8 -> PPM ``P6``."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        magic = b"P5"
    elif img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


def decode_netpbm(payload: bytes) -> np.ndarray:
    """Binary PGM/PPM -> uint8 ndarray ((h, w) or (h, w, 3)). Pure numpy;
    handles the standard whitespace/comment-tolerant header."""
    if payload[:2] not in (b"P5", b"P6"):
        raise NotImplementedError(
            f"codec for magic {payload[:2]!r} needs PIL/cv2 — only netpbm "
            "P5/P6 decodes natively here")
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":          # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1                                      # single ws after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only 8-bit netpbm supported")
    depth = 1 if payload[:2] == b"P5" else 3
    arr = np.frombuffer(payload, np.uint8, count=w * h * depth, offset=pos)
    return arr.reshape((h, w) if depth == 1 else (h, w, depth))


def nn_resize(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, fully vectorized (index gather)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[ys[:, None], xs[None, :]]

MEDIA_SCHEMA_FIELDS = [
    ("media_id", pa.int64()),
    ("media_type", pa.string()),      # "image" | "audio" | "video"
    ("payload", pa.binary()),
    ("n_bytes", pa.int64()),
]


def attach_fake_media(ds, text_col: str = "text", id_col: str = "doc_id",
                      real_images: bool = False):
    """Derive a deterministic binary payload column from a text column —
    test/bench stand-in for real media ingestion.

    ``real_images=True`` emits REAL binary PGM images (a deterministic
    gradient seeded by the text hash) so the non-fake decode/resize path
    runs end-to-end on actual pixels."""
    def _f(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        if real_images:
            payloads = []
            for t in texts:
                h = hashlib.sha256((t or "").encode()).digest()
                w, ht = 32 + h[0] % 32, 32 + h[1] % 32
                img = ((np.arange(ht)[:, None] * h[2]
                        + np.arange(w)[None, :] * h[3] + h[4])
                       % 256).astype(np.uint8)
                payloads.append(encode_netpbm(img))
        else:
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
            # REAL decode for netpbm payloads (pure numpy); other magics
            # (JPEG/PNG) still need PIL/cv2 and raise NotImplementedError
            img = decode_netpbm(payload)
            return (img.shape[1], img.shape[0],
                    round(float(img.mean()) / 255.0, 6))
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


class ResizeImage:
    """Actor stage: netpbm payload -> resized netpbm payload (real pixels,
    nearest-neighbor). The output stays a valid media table so stages
    compose: attach -> resize -> decode."""

    def __init__(self, out_w: int = 32, out_h: int = 32):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [encode_netpbm(nn_resize(decode_netpbm(p), self.out_w,
                                       self.out_h))
               for p in batch["payload"].to_pylist()]
        return pa.table({
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "payload": pa.array(out, pa.binary()),
            "n_bytes": pa.array([len(p) for p in out], pa.int64()),
        })


def resize_stage(ds, out_w: int = 32, out_h: int = 32,
                 concurrency: int = 2, batch_size: int = 64):
    return ds.map_batches(
        ResizeImage, fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
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
