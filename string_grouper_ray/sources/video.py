"""Minimal raw-video container (codec ``rawv1``) — pure numpy/stdlib.

No video libraries exist in this container, but frame *sampling* does not
need one: this module defines a deterministic uncompressed container
(little-endian header + concatenated RGB24 frames) so the Ray-side frame
pipeline (schema, actor signature, one-row-per-frame output layout,
wide-row batch sizing) is real and tested end-to-end. External codecs
(h264/vp9/...) remain behind a clearly-marked ``NotImplementedError`` seam
in :class:`~string_grouper_ray.pipelines.multimodal.FrameSampler` — plug
pyav/decord in there on a real cluster.

Layout of a ``rawv1`` payload::

    magic   4 bytes  b"RWV1"
    width   uint16 LE
    height  uint16 LE
    fps     uint16 LE
    nframes uint32 LE
    frames  nframes * width * height * 3 bytes (RGB24, frame-major)
"""

from __future__ import annotations

import struct

import numpy as np

RAWV1_MAGIC = b"RWV1"
_HEADER = struct.Struct("<4sHHHI")

SUPPORTED_VIDEO_CODEC = "rawv1"


def encode_rawv1(frames: np.ndarray, fps: int) -> bytes:
    """Pack ``frames`` (nframes, height, width, 3) uint8 into a rawv1 blob."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError(f"expected (n, h, w, 3) uint8 frames, got {frames.shape}")
    n, h, w, _ = frames.shape
    return _HEADER.pack(RAWV1_MAGIC, w, h, fps, n) + frames.tobytes()


def decode_rawv1_header(data: bytes) -> tuple[int, int, int, int]:
    """Return (width, height, fps, nframes) without touching frame bytes."""
    magic, w, h, fps, n = _HEADER.unpack_from(data, 0)
    if magic != RAWV1_MAGIC:
        raise ValueError("not a rawv1 payload")
    return w, h, fps, n


def decode_rawv1_frame(data: bytes, frame_idx: int) -> np.ndarray:
    """Random-access decode of ONE frame (h, w, 3) uint8 — the property that
    makes sampled decode O(sampled) instead of O(all frames)."""
    w, h, fps, n = decode_rawv1_header(data)
    if not 0 <= frame_idx < n:
        raise IndexError(f"frame {frame_idx} out of range [0, {n})")
    frame_size = w * h * 3
    off = _HEADER.size + frame_idx * frame_size
    buf = np.frombuffer(data, dtype=np.uint8, count=frame_size, offset=off)
    return buf.reshape(h, w, 3)


def synth_video(video_id: int, n_frames: int = 48, w: int = 32, h: int = 24, fps: int = 24) -> bytes:
    """Deterministic synthetic clip for tests/fixtures: a per-video seeded
    gradient animated over time (content depends only on video_id)."""
    rng = np.random.RandomState(video_id & 0x7FFFFFFF)
    base = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    t = np.arange(n_frames, dtype=np.uint16)[:, None, None, None]
    frames = ((base[None].astype(np.uint16) + 3 * t) % 256).astype(np.uint8)
    return encode_rawv1(frames, fps)


def linear_video(video_id: int, n_frames: int = 48, w: int = 32, h: int = 24, fps: int = 24) -> bytes:
    """SQL-expressible deterministic clip: pixel value is a pure integer
    function of (video_id, frame, y, x, channel),

        p = (7*video_id + 3*frame + 5*y + 11*x + 13*c) % 256

    so a DuckDB oracle reproduces frame sums / means bit-exactly (unlike
    :func:`synth_video`, whose RNG base image has no SQL equivalent)."""
    f = np.arange(n_frames, dtype=np.int64)[:, None, None, None]
    y = np.arange(h, dtype=np.int64)[None, :, None, None]
    x = np.arange(w, dtype=np.int64)[None, None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, None, :]
    frames = ((7 * video_id + 3 * f + 5 * y + 11 * x + 13 * c) % 256).astype(np.uint8)
    return encode_rawv1(frames, fps)


def resize_bilinear(frame: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize of an (h, w, 3) uint8 frame — pure numpy, fully
    vectorized (the image-library-free path; swap in cv2/PIL at the same
    seam on a real cluster for SIMD decode formats)."""
    h, w, _ = frame.shape
    if (h, w) == (out_h, out_w):
        return frame.copy()
    # sample positions using the half-pixel convention
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    f = frame.astype(np.float64)
    top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
    bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def frame_grid_features(frame: np.ndarray, grid: int = 4) -> np.ndarray:
    """Mean-RGB over a grid × grid cell partition → (grid*grid*3,) float64
    feature vector (a deterministic, library-free stand-in for a CNN
    embedding with the same output contract)."""
    h, w, _ = frame.shape
    ge_h = np.linspace(0, h, grid + 1).astype(np.int64)
    ge_w = np.linspace(0, w, grid + 1).astype(np.int64)
    out = np.empty((grid, grid, 3), dtype=np.float64)
    f = frame.astype(np.float64)
    for i in range(grid):
        for j in range(grid):
            cell = f[ge_h[i]:max(ge_h[i + 1], ge_h[i] + 1),
                     ge_w[j]:max(ge_w[j + 1], ge_w[j] + 1)]
            out[i, j] = cell.mean(axis=(0, 1))
    return out.reshape(-1)
