"""Multimodal (binary-payload) operators over the clip table.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata (``sr_hz``, ``dur_ms``, ``codec``). Each operator is an actor-pool
``map_batches`` stage sized for LARGE rows (small ``batch_size`` — a batch
× concurrency of multi-MB payloads must fit a worker heap).

Real in this environment: WAV/PCM16 decode, audio features, windowed-sinc
resampling (pure numpy, sources/audio.py), and rawv1 video frame sampling
(sources/video.py). Stubbed behind ``NotImplementedError``: external
codecs only (non-WAV audio, h264/vp9 video) — the Ray-side plumbing
(schema, batch sizing, actor signature, output layout) is identical and
tested via the WAV / rawv1 paths.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..config import EngineConfig
from ..functions.stagemap import stage_map_batches
from ..sources.audio import SUPPORTED_CODEC, decode_wav, decode_wav_iter, snr_db


class AudioFeatures:
    """Decode + per-clip features: true duration, RMS energy, peak, silence
    ratio, zero-crossing rate. One decode per row, vectorized features."""

    def __init__(self, silence_threshold: float = 0.01):
        self.silence_threshold = silence_threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["bytes"].to_pylist()
        codecs = t["codec"].to_pylist()
        n = len(t)
        dur = np.zeros(n, dtype=np.float64)
        rms = np.zeros(n, dtype=np.float64)
        peak = np.zeros(n, dtype=np.float64)
        silence = np.zeros(n, dtype=np.float64)
        zcr = np.zeros(n, dtype=np.float64)
        for i, (pcm, sr) in enumerate(decode_wav_iter(payloads, codecs)):
            dur[i] = len(pcm) / sr * 1000.0
            rms[i] = float(np.sqrt(np.mean(pcm**2))) if len(pcm) else 0.0
            peak[i] = float(np.abs(pcm).max()) if len(pcm) else 0.0
            silence[i] = float(np.mean(np.abs(pcm) < self.silence_threshold))
            if len(pcm) > 1:
                zcr[i] = float(np.mean(np.signbit(pcm[1:]) != np.signbit(pcm[:-1])))
        out = t.drop_columns(["bytes"])
        for name, col in [
            ("true_dur_ms", dur),
            ("rms", rms),
            ("peak", peak),
            ("silence_ratio", silence),
            ("zcr", zcr),
        ]:
            out = out.append_column(name, pa.array(col))
        return out


class AudioInvariantChecker:
    """Per-row payload invariant (BASELINE.json input_hint): decode both the
    row's payload and a reference payload column and assert SNR ≥ floor +
    transcript equality. Used in tests / validation passes."""

    def __init__(self, snr_floor_db: float = 30.0):
        self.snr_floor = snr_floor_db

    def __call__(self, t: pa.Table) -> pa.Table:
        ok = np.zeros(len(t), dtype=bool)
        snrs = np.zeros(len(t), dtype=np.float64)
        for i in range(len(t)):
            pcm, _ = decode_wav(t["bytes"][i].as_py(), t["codec"][i].as_py())
            ref, _ = decode_wav(t["ref_bytes"][i].as_py(), t["codec"][i].as_py())
            s = snr_db(ref, pcm)
            snrs[i] = s
            ok[i] = s >= self.snr_floor and (
                t["transcript"][i].as_py() == t["ref_transcript"][i].as_py()
            )
        return pa.table(
            {"clip_id": t["clip_id"], "snr_db": pa.array(snrs), "invariant_ok": pa.array(ok)}
        )


class Resampler:
    """Audio resample to a target rate: decode → windowed-sinc resample
    (sources/audio.py resample_pcm, pure numpy) → re-encode. Stage contract:
    input (bytes, sr_hz, codec) → output (bytes, sr_hz=target, codec), all
    other columns passed through; rows already at the target rate are
    re-encoded unchanged."""

    def __init__(self, target_sr: int):
        self.target_sr = target_sr

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..sources.audio import encode_wav, resample_pcm

        payloads = t["bytes"].to_pylist()
        codecs = t["codec"].to_pylist()
        out_bytes = []
        for pcm, sr in decode_wav_iter(payloads, codecs):
            out_bytes.append(encode_wav(resample_pcm(pcm, int(sr), self.target_sr), self.target_sr))
        cols = {name: t[name] for name in t.column_names}
        cols["bytes"] = pa.array(out_bytes, type=pa.binary())
        cols["sr_hz"] = pa.array(
            np.full(len(t), self.target_sr, dtype=np.int32), type=pa.int32()
        )
        return pa.table(cols)


class FrameSampler:
    """Video frame sampling: one output row per sampled frame
    (``frame_idx``, ``frame_bytes`` RGB24, ``width``, ``height``), id
    column passed through. Real for the ``rawv1`` container
    (sources/video.py — random-access decode, so cost is O(sampled
    frames) not O(all frames)); external codecs (h264/vp9/...) raise
    ``NotImplementedError`` at this seam — plug pyav/decord in on a real
    cluster."""

    def __init__(self, every_n_frames: int = 30, id_col: str = "clip_id"):
        self.every_n = every_n_frames
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..sources.video import (
            SUPPORTED_VIDEO_CODEC,
            decode_rawv1_frame,
            decode_rawv1_header,
        )

        ids, fidx, fbytes, ws, hs = [], [], [], [], []
        payloads = t["bytes"].to_pylist()
        codecs = t["codec"].to_pylist()
        id_vals = t[self.id_col].to_pylist()
        for rid, data, codec in zip(id_vals, payloads, codecs):
            if codec != SUPPORTED_VIDEO_CODEC:
                raise NotImplementedError(
                    f"codec {codec!r}: only {SUPPORTED_VIDEO_CODEC!r} decodes "
                    "in this container; plug pyav/decord into this seam."
                )
            w, h, _fps, n = decode_rawv1_header(data)
            for i in range(0, n, self.every_n):
                ids.append(rid)
                fidx.append(i)
                fbytes.append(decode_rawv1_frame(data, i).tobytes())
                ws.append(w)
                hs.append(h)
        return pa.table(
            {
                self.id_col: pa.array(ids, type=t[self.id_col].type),
                "frame_idx": pa.array(fidx, type=pa.int32()),
                "frame_bytes": pa.array(fbytes, type=pa.binary()),
                "width": pa.array(ws, type=pa.int32()),
                "height": pa.array(hs, type=pa.int32()),
            }
        )


def audio_features(
    ds: "ray.data.Dataset", config: Optional[EngineConfig] = None
) -> "ray.data.Dataset":
    config = config or EngineConfig()
    # binary rows are wide: small batches so batch × concurrency fits heap
    return stage_map_batches(
        ds, AudioFeatures, (), config, batch_format="pyarrow", batch_size=256
    )


def sample_frames(
    ds: "ray.data.Dataset",
    every_n_frames: int = 30,
    id_col: str = "clip_id",
    config: Optional[EngineConfig] = None,
) -> "ray.data.Dataset":
    """Sample every Nth frame from each video payload — one output row per
    frame. Very wide rows (raw RGB frames): tiny batches so batch ×
    concurrency × frame fan-out fits a worker heap."""
    config = config or EngineConfig()
    return stage_map_batches(
        ds,
        FrameSampler,
        (every_n_frames, id_col),
        config,
        batch_format="pyarrow",
        batch_size=32,
    )


class FrameResizer:
    """Resize sampled frames (``frame_bytes`` RGB24 + width/height) to a
    fixed (out_h, out_w) — pure-numpy bilinear (sources/video.py); swap a
    SIMD image lib in at the same seam on a real cluster."""

    def __init__(self, out_h: int, out_w: int):
        self.out_h = out_h
        self.out_w = out_w

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..sources.video import resize_bilinear

        ws = t["width"].to_numpy(zero_copy_only=False)
        hs = t["height"].to_numpy(zero_copy_only=False)
        out = []
        for fb, w, h in zip(t["frame_bytes"].to_pylist(), ws, hs):
            frame = np.frombuffer(fb, dtype=np.uint8).reshape(int(h), int(w), 3)
            out.append(resize_bilinear(frame, self.out_h, self.out_w).tobytes())
        cols = {name: t[name] for name in t.column_names}
        cols["frame_bytes"] = pa.array(out, type=pa.binary())
        cols["width"] = pa.array(np.full(len(t), self.out_w, dtype=np.int32))
        cols["height"] = pa.array(np.full(len(t), self.out_h, dtype=np.int32))
        return pa.table(cols)


class FrameFeatures:
    """Per-frame grid-mean-RGB feature vector (``list<float64>`` column) —
    the deterministic stand-in for batched CNN inference with the same
    actor-pool signature and output contract."""

    def __init__(self, grid: int = 4):
        self.grid = grid

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..sources.video import frame_grid_features

        ws = t["width"].to_numpy(zero_copy_only=False)
        hs = t["height"].to_numpy(zero_copy_only=False)
        feats = []
        for fb, w, h in zip(t["frame_bytes"].to_pylist(), ws, hs):
            frame = np.frombuffer(fb, dtype=np.uint8).reshape(int(h), int(w), 3)
            feats.append(frame_grid_features(frame, self.grid))
        out = t.drop_columns(["frame_bytes"])
        return out.append_column(
            "frame_feat", pa.array([f.tolist() for f in feats], type=pa.list_(pa.float64()))
        )


def resize_frames(
    ds: "ray.data.Dataset", out_h: int, out_w: int,
    config: Optional[EngineConfig] = None,
) -> "ray.data.Dataset":
    config = config or EngineConfig()
    return stage_map_batches(
        ds, FrameResizer, (out_h, out_w), config, batch_format="pyarrow", batch_size=64
    )


def frame_features(
    ds: "ray.data.Dataset", grid: int = 4, config: Optional[EngineConfig] = None
) -> "ray.data.Dataset":
    config = config or EngineConfig()
    return stage_map_batches(
        ds, FrameFeatures, (grid,), config, batch_format="pyarrow", batch_size=64
    )


def resample_audio(
    ds: "ray.data.Dataset", target_sr: int, config: Optional[EngineConfig] = None
) -> "ray.data.Dataset":
    """Resample every clip's payload to ``target_sr`` (actor-pool stage;
    same wide-row batch sizing as audio_features)."""
    config = config or EngineConfig()
    return stage_map_batches(
        ds, Resampler, (target_sr,), config, batch_format="pyarrow", batch_size=256
    )


# ---------------------------------------------------------------------------
# shared integer-audio kernels: every acoustic operator derives from these,
# so cross-operator compositions (e.g. crossmodal_dedup reusing the
# fingerprint, slice_segments matching vad_segments boundaries) agree by
# construction, not by parallel copies staying in sync
# ---------------------------------------------------------------------------


def _energy_window_sums(pcm: np.ndarray, n_windows: int, window: int) -> np.ndarray:
    """Per-window SUM of |int16 samples| over the first ``n_windows ×
    window`` samples, zero-padded if shorter. Exact int16 recovery: decode
    scales by 1/32767 and float64 is wide enough that the round-trip is
    lossless."""
    span = n_windows * window
    ints = np.abs(np.rint(pcm[:span] * 32767.0).astype(np.int64))
    if len(ints) < span:
        ints = np.pad(ints, (0, span - len(ints)))
    return ints.reshape(n_windows, window).sum(axis=1)


def _contour_fingerprint(
    pcm: np.ndarray, n_windows: int, window: int, bucket: int
) -> str:
    """Quantized energy-contour string: window sums floor-divided by
    ``window × bucket``, dash-joined — pure integer arithmetic."""
    q = _energy_window_sums(pcm, n_windows, window) // (window * bucket)
    return "-".join(str(int(v)) for v in q)


def _active_runs(pcm: np.ndarray, frame: int, threshold: int, min_frames: int):
    """VAD frame predicate + maximal-run extraction, shared by
    vad_segments / slice_segments / speech_rate: a frame of ``frame``
    samples is active iff ``sum(|int16|) >= threshold × frame``. Returns
    ``(starts, ends, ints)`` — frame-index runs of length ≥ ``min_frames``
    (``ends`` exclusive) plus the SIGNED int16-valued samples of the
    full-frame region (the slicer copies from them); trailing partial
    frame ignored. ``ints`` is None when no full frame exists."""
    n_frames = len(pcm) // frame
    empty = np.empty(0, dtype=np.int64)
    if n_frames == 0:
        return empty, empty, None
    ints = np.rint(pcm[: n_frames * frame] * 32767.0).astype(np.int64)
    active = np.abs(ints).reshape(n_frames, frame).sum(axis=1) >= threshold * frame
    flags = np.zeros(n_frames + 2, dtype=np.int8)
    flags[1:-1] = active
    d = np.diff(flags)
    starts = np.flatnonzero(d == 1).astype(np.int64)
    ends = np.flatnonzero(d == -1).astype(np.int64)
    keep = (ends - starts) >= min_frames
    return starts[keep], ends[keep], ints


class AcousticFingerprint:
    """Decode + integer windowed energy-contour fingerprint per clip.

    The signature is the per-window SUM of |int16 samples| over the first
    ``n_windows × window`` samples (zero-padded if shorter), floor-divided
    by ``window × bucket`` and joined as a string — pure integer
    arithmetic, so a SQL oracle over a formula-generated fixture
    reproduces it bit-exactly, and the bucket/boundary choice can never
    make pipeline and oracle diverge (both quantize the same integers).
    Payload-level analogue of the text md5 Fingerprinter
    (textstats.py): catches same-audio-different-metadata duplicates that
    transcript-level dedup cannot see."""

    def __init__(self, n_windows: int = 8, window: int = 400, bucket: int = 64):
        self.n_windows = n_windows
        self.window = window
        self.bucket = bucket

    def __call__(self, t: pa.Table) -> pa.Table:
        fps = []
        for pcm, _sr in decode_wav_iter(
            t["bytes"].to_pylist(), t["codec"].to_pylist()
        ):
            fps.append(
                _contour_fingerprint(pcm, self.n_windows, self.window, self.bucket)
            )
        return pa.table(
            {
                "clip_id": t["clip_id"],
                "fingerprint": pa.array(fps, type=pa.string()),
            }
        )


def audio_fingerprint_dedup(
    ds: "ray.data.Dataset",
    config: Optional[EngineConfig] = None,
    n_windows: int = 8,
    window: int = 400,
    bucket: int = 64,
) -> "ray.data.Dataset":
    """Acoustic exact-dedup: (clip_id, cluster_id, keep) by energy-contour
    fingerprint. Decode+fingerprint is an actor-pool map (wide binary
    rows, small batches); the dedup itself is a hash-partitioned group map
    over the narrow (clip_id, fingerprint) rows — no all-pairs path, no
    driver materialization; scale-safe like exact_dedup. Near-dup on the
    same contour is a composition: treat the un-quantized window sums as
    an 8-dim vector and run pipelines.ann.embedding_neardup over them."""
    import pandas as pd

    from ..functions.grouped import bucketed_group_map

    config = config or EngineConfig()
    fps = stage_map_batches(
        ds, AcousticFingerprint, (n_windows, window, bucket), config,
        batch_format="pyarrow", batch_size=256,
    )

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rep = g.groupby("fingerprint", sort=False)["clip_id"].transform("min")
        return pd.DataFrame(
            {
                "clip_id": g["clip_id"],
                "cluster_id": rep,
                "keep": g["clip_id"].to_numpy() == rep.to_numpy(),
            }
        )

    return bucketed_group_map(fps, ["fingerprint"], dedup_bucket)


class AcousticContour:
    """Decode + UN-quantized integer energy contour per clip: the
    per-window sums of |int16 samples| packed as little-endian uint64 —
    the exact-integer feature :func:`audio_contour_neardup` bands and
    verifies on."""

    def __init__(self, id_col: str, n_windows: int = 8, window: int = 400):
        self.id_col = id_col
        self.n_windows = n_windows
        self.window = window

    def __call__(self, t: pa.Table) -> pa.Table:
        packed = []
        for pcm, _sr in decode_wav_iter(
            t["bytes"].to_pylist(), t["codec"].to_pylist()
        ):
            sums = _energy_window_sums(pcm, self.n_windows, self.window)
            packed.append(sums.astype(np.uint64).tobytes())
        return pa.table(
            {
                "row_idx": t[self.id_col].cast(pa.int64()),
                "sums": pa.array(packed, type=pa.binary()),
            }
        )


def audio_contour_neardup(
    ds: "ray.data.Dataset",
    tol: int = 5000,
    id_col: str = "clip_idx",
    config: Optional[EngineConfig] = None,
    n_windows: int = 8,
    window: int = 400,
) -> "ray.data.Dataset":
    """Acoustic NEAR-dup: clips whose energy contours are within integer
    Chebyshev distance ``tol`` (max per-window |Δ sum-of-|samples||) form
    clusters; output is ``(id_col, cluster_id, keep)`` over the transitive
    closure — exactly the semantics a pairwise SQL closure reproduces,
    with NO float arithmetic anywhere.

    Provable recall 1.0 via shifted grids: per window, two 1-D grids of
    cell size ``2·tol`` offset by ``tol`` guarantee any pair within
    ``tol`` shares at least one (window, grid, cell) bucket — candidates
    come from ONE bucketed exchange over those keys, the exact Chebyshev
    verify runs INSIDE the bucket task (contours ride along at
    ``8 B × n_windows`` per row, so no join hydration), and only verified
    edges reach the global pair dedup + CC. Precision 1.0 by the in-bucket
    verify, so pipeline and oracle pair sets are identical by
    construction. Hot-bucket note for 100×-scale corpora: collapse exact
    payload dups FIRST (``audio_fingerprint_dedup``) and run this over the
    representatives — near-identical floods then bound bucket sizes the
    same way the text pipelines' exact-dup short-circuit does."""
    import pandas as pd

    from ..functions.grouped import bucketed_group_map, dedup_pairs
    from .dedup import _cluster_and_keep

    config = config or EngineConfig()
    tol = int(tol)
    if tol <= 0:
        raise ValueError("audio_contour_neardup: tol must be a positive integer")
    contours = stage_map_batches(
        ds, AcousticContour, (id_col, n_windows, window), config,
        batch_format="pyarrow", batch_size=256,
    ).materialize()

    cell = 2 * tol
    W = n_windows

    def band(t: pa.Table) -> pa.Table:
        n = len(t)
        rows = t["row_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        sums_bin = t["sums"].to_pylist()
        S = (
            np.frombuffer(b"".join(sums_bin), dtype=np.uint64)
            .reshape(n, W).astype(np.int64)
            if n else np.empty((0, W), dtype=np.int64)
        )
        keys = np.empty((n, 2 * W), dtype=np.int64)
        for w in range(W):
            for g in range(2):
                # (window, grid) in the top bits, grid cell below — window
                # sums < window × 32767 ≪ 2^40
                keys[:, 2 * w + g] = (
                    ((2 * w + g) << 40) | ((S[:, w] + g * tol) // cell)
                )
        return pa.table(
            {
                "band_key": pa.array(keys.reshape(-1)),
                "row_idx": pa.array(np.repeat(rows, 2 * W)),
                "sums": pa.array(
                    [b for b in sums_bin for _ in range(2 * W)], type=pa.binary()
                ),
            }
        )

    banded = contours.map_batches(band, batch_format="pyarrow")

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"left_idx": np.empty(0, np.int64),
                              "right_idx": np.empty(0, np.int64)})
        k = len(g)
        if k < 2:
            return empty
        rows = g["row_idx"].to_numpy(dtype=np.int64)
        S = (np.frombuffer(b"".join(g["sums"]), dtype=np.uint64)
             .reshape(k, W).astype(np.int64))
        out_l, out_r = [], []
        # chunked k×k Chebyshev verify: bounded memory at any bucket size
        for s0 in range(0, k, 512):
            blk = S[s0:s0 + 512]
            d = np.abs(blk[:, None, :] - S[None, :, :]).max(axis=2)
            li, ri = np.nonzero(d <= tol)
            li = li + s0
            keep = li < ri  # each unordered pair once, no diagonal
            a, b = rows[li[keep]], rows[ri[keep]]
            out_l.append(np.minimum(a, b))
            out_r.append(np.maximum(a, b))
        if not out_l:
            return empty
        return pd.DataFrame(
            {"left_idx": np.concatenate(out_l), "right_idx": np.concatenate(out_r)}
        )

    pairs = bucketed_group_map(banded, ["band_key"], pairs_in_bucket)
    edges = dedup_pairs(pairs, ["left_idx", "right_idx"])
    return _cluster_and_keep(edges, contours, id_col, config)


class CrossModalKeys:
    """Decode + per-row dedup keys for BOTH modalities in one pass over
    the wide rows: the quantized acoustic energy-contour fingerprint
    (:class:`AcousticFingerprint`'s integer feature) and the normalized
    transcript (lower + whitespace-collapse + trim). One actor-pool stage
    touches the binary payload; everything downstream is narrow."""

    def __init__(self, id_col: str, n_windows: int = 8, window: int = 400,
                 bucket: int = 64):
        self.id_col = id_col
        self.n_windows = n_windows
        self.window = window
        self.bucket = bucket

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        fps = []
        for pcm, _sr in decode_wav_iter(
            t["bytes"].to_pylist(), t["codec"].to_pylist()
        ):
            fps.append(
                _contour_fingerprint(pcm, self.n_windows, self.window, self.bucket)
            )
        tkey = pc.utf8_lower(
            pc.replace_substring_regex(
                pc.utf8_trim_whitespace(t["transcript"]), r"\s+", " "
            )
        )
        return pa.table(
            {
                "row_idx": t[self.id_col].cast(pa.int64()),
                "text_key": tkey,
                "audio_key": pa.array(fps, type=pa.string()),
            }
        )


def crossmodal_dedup(
    ds: "ray.data.Dataset",
    config: Optional[EngineConfig] = None,
    id_col: str = "clip_idx",
    n_windows: int = 8,
    window: int = 400,
    bucket: int = 64,
) -> "ray.data.Dataset":
    """Cross-modal entity resolution over (audio, transcript) pairs: two
    clips are duplicates if their NORMALIZED transcripts are equal OR
    their acoustic energy-contour fingerprints are equal; clusters are
    the transitive closure (connected components) of the UNION of both
    edge sets, output as ``(id_col, cluster_id, keep=min-of-cluster)``.

    This is the dedup policy transcript-only pipelines cannot express:
    the same recording re-posted under a rewritten transcript AND the
    same transcript re-recorded by another speaker both collapse, and
    chains across modalities (A~B by audio, B~C by text) merge
    transitively — classic cross-source entity resolution.

    Scale shape: ONE actor-pool pass decodes payloads into narrow
    ``(row_idx, text_key, audio_key)`` rows; each modality contributes
    star edges (rep=min per key, k-1 edges per k-row key group — linear,
    never quadratic) from a hash-bucketed group map; the edge union feeds
    the same distributed CC as every other dedup. Empty-after-normalize
    transcripts match nothing (an absent modality carries no evidence).
    Exact-key star emission makes recall/precision structural, so a SQL
    oracle recomputing both keys reproduces the partition exactly."""
    import pandas as pd

    from ..functions.grouped import bucketed_group_map, dedup_pairs
    from .dedup import _cluster_and_keep

    config = config or EngineConfig()
    keys = stage_map_batches(
        ds, CrossModalKeys, (id_col, n_windows, window, bucket), config,
        batch_format="pyarrow", batch_size=256,
    ).materialize()  # read once: both edge passes and the CC node list use it

    def _star_edges(key_col: str, drop_empty: bool) -> "ray.data.Dataset":
        def stars(g: pd.DataFrame) -> pd.DataFrame:
            if drop_empty:
                g = g[g[key_col].str.len() > 0]
            if not len(g):
                return pd.DataFrame(
                    {"left_idx": np.empty(0, np.int64),
                     "right_idx": np.empty(0, np.int64)}
                )
            idx = g["row_idx"].to_numpy(dtype=np.int64)
            reps = g.groupby(key_col, sort=False)["row_idx"].transform("min")
            reps = reps.to_numpy(dtype=np.int64)
            m = idx != reps
            return pd.DataFrame({"left_idx": reps[m], "right_idx": idx[m]})

        return bucketed_group_map(
            keys.select_columns([key_col, "row_idx"]), [key_col], stars
        )

    pairs = _star_edges("text_key", drop_empty=True).union(
        _star_edges("audio_key", drop_empty=False)
    )
    edges = dedup_pairs(pairs, ["left_idx", "right_idx"])
    return _cluster_and_keep(edges, keys, id_col, config)


class AudioVAD:
    """Decode + energy-gated voice-activity segmentation: one OUTPUT ROW
    PER ACTIVE SEGMENT (a row-expanding map — clips with no activity emit
    nothing). A frame of ``frame`` samples is active when its mean
    |int16| amplitude is ≥ ``threshold`` (pure integer compare:
    ``sum(|s|) ≥ threshold × frame``, so a SQL oracle reproduces the
    frame flags bit-exactly); maximal runs of ≥ ``min_frames`` active
    frames become segments. The trailing partial frame is ignored.

    The training-data use: silence-trim / segment speech before feature
    extraction — the segment boundaries are what a downstream slicer
    consumes. Vectorized run detection (np.diff on the padded flag
    vector); the only per-row Python is the WAV decode."""

    def __init__(self, frame: int = 400, threshold: int = 64,
                 min_frames: int = 1):
        self.frame = frame
        self.threshold = threshold
        self.min_frames = min_frames

    def __call__(self, t: pa.Table) -> pa.Table:
        frame = self.frame
        out_id, out_seg, out_s, out_e, out_n = [], [], [], [], []
        for cid, (pcm, sr) in zip(
            t["clip_id"].to_pylist(),
            decode_wav_iter(t["bytes"].to_pylist(), t["codec"].to_pylist()),
        ):
            starts, ends, _ints = _active_runs(
                pcm, frame, self.threshold, self.min_frames
            )
            for s_i, (s, e) in enumerate(zip(starts.tolist(), ends.tolist())):
                out_id.append(cid)
                out_seg.append(s_i)
                # ms from the DECODED per-clip rate (per-sample precision,
                # floor) — mixed-rate corpora are first-class here
                out_s.append(s * frame * 1000 // sr)
                out_e.append(e * frame * 1000 // sr)
                out_n.append(e - s)
        return pa.table(
            {
                "clip_id": pa.array(out_id, type=pa.string()),
                "seg_idx": pa.array(np.asarray(out_seg, dtype=np.int64)),
                "start_ms": pa.array(np.asarray(out_s, dtype=np.int64)),
                "end_ms": pa.array(np.asarray(out_e, dtype=np.int64)),
                "n_frames": pa.array(np.asarray(out_n, dtype=np.int64)),
            }
        )


def vad_segments(
    ds: "ray.data.Dataset",
    config: Optional[EngineConfig] = None,
    frame: int = 400,
    threshold: int = 64,
    min_frames: int = 1,
) -> "ray.data.Dataset":
    """Voice-activity segments per clip: ``(clip_id, seg_idx, start_ms,
    end_ms, n_frames)``, one row per maximal active run (see
    :class:`AudioVAD`). Actor-pool map over the wide binary rows, small
    batches; output rows are narrow — downstream slicing/joins never see
    the payload again until they choose to hydrate it."""
    config = config or EngineConfig()
    return stage_map_batches(
        ds, AudioVAD, (frame, threshold, min_frames), config,
        batch_format="pyarrow", batch_size=256,
    )


class AudioSegmentSlicer:
    """VAD + slice in ONE decode pass: each active segment becomes an
    output row with a re-encoded WAV payload of exactly its samples
    (``[start_frame*frame, end_frame*frame)`` of the original PCM — the
    int16 samples are copied bit-for-bit, no resynthesis), plus segment
    metadata and the parent's transcript carried through. The
    silence-trim / utterance-split stage of a speech-data pipeline.

    Doing VAD and slicing in one stage avoids re-hydrating the payload
    through a join: the only wide data movement is the already-decoded
    batch in this actor."""

    def __init__(self, frame: int = 400, threshold: int = 64,
                 min_frames: int = 1):
        self.frame = frame
        self.threshold = threshold
        self.min_frames = min_frames

    def __call__(self, t: pa.Table) -> pa.Table:
        import io
        import wave

        frame = self.frame
        out = {
            "clip_id": [], "seg_idx": [], "bytes": [], "sr_hz": [],
            "dur_ms": [], "codec": [], "transcript": [],
        }
        has_txt = "transcript" in t.column_names
        for row, (pcm, sr) in enumerate(
            decode_wav_iter(t["bytes"].to_pylist(), t["codec"].to_pylist())
        ):
            sr = int(sr)
            starts, ends, ints = _active_runs(
                pcm, frame, self.threshold, self.min_frames
            )
            if ints is None:
                continue
            for s_i, (s, e) in enumerate(zip(starts.tolist(), ends.tolist())):
                seg = ints[s * frame : e * frame].astype(np.int16)
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sr)
                    w.writeframes(seg.tobytes())
                out["clip_id"].append(t["clip_id"][row].as_py())
                out["seg_idx"].append(s_i)
                out["bytes"].append(buf.getvalue())
                out["sr_hz"].append(sr)
                out["dur_ms"].append((e - s) * frame * 1000 // sr)
                out["codec"].append("pcm_s16le")
                out["transcript"].append(
                    t["transcript"][row].as_py() if has_txt else ""
                )
        return pa.table(
            {
                "clip_id": pa.array(out["clip_id"], type=pa.string()),
                "seg_idx": pa.array(np.asarray(out["seg_idx"], dtype=np.int64)),
                "bytes": pa.array(out["bytes"], type=pa.binary()),
                "sr_hz": pa.array(np.asarray(out["sr_hz"], dtype=np.int32)),
                "dur_ms": pa.array(np.asarray(out["dur_ms"], dtype=np.int32)),
                "codec": pa.array(out["codec"], type=pa.string()),
                "transcript": pa.array(out["transcript"], type=pa.string()),
            }
        )


def slice_segments(
    ds: "ray.data.Dataset",
    config: Optional[EngineConfig] = None,
    frame: int = 400,
    threshold: int = 64,
    min_frames: int = 1,
) -> "ray.data.Dataset":
    """Silence-trim / utterance-split: one output CLIP per VAD-active
    segment (schema matches the input clip table plus ``seg_idx``; see
    :class:`AudioSegmentSlicer`). Wide rows in AND out — tiny batches so
    batch × fan-out × concurrency fits the worker heap."""
    config = config or EngineConfig()
    return stage_map_batches(
        ds, AudioSegmentSlicer, (frame, threshold, min_frames), config,
        batch_format="pyarrow", batch_size=64,
    )


class SpeechRate:
    """Cross-modal quality signal: characters per ACTIVE second — the
    transcript length (normalized: lower + whitespace-collapse + trim)
    divided by the VAD-active duration, the standard filter for
    mis-paired or hallucinated transcripts in speech corpora (a 40-char
    transcript over 0.2 s of speech, or 2 chars over 10 s, is a broken
    pair either way). Emits ``(clip_id, active_ms, n_chars,
    chars_per_sec)``; ``chars_per_sec`` is NULL when no frame is active."""

    def __init__(self, frame: int = 400, threshold: int = 64):
        self.frame = frame
        self.threshold = threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        import re

        frame = self.frame
        n = len(t)
        active_ms = np.zeros(n, dtype=np.int64)
        n_chars = np.zeros(n, dtype=np.int64)
        for i, ((pcm, sr), txt) in enumerate(
            zip(
                decode_wav_iter(t["bytes"].to_pylist(), t["codec"].to_pylist()),
                t["transcript"].to_pylist(),
            )
        ):
            # runs with min_frames=1: active_ms = total active frames,
            # ms from the DECODED per-clip rate like AudioVAD
            starts, ends, _ints = _active_runs(pcm, frame, self.threshold, 1)
            active_ms[i] = int((ends - starts).sum()) * frame * 1000 // sr
            n_chars[i] = len(re.sub(r"\s+", " ", txt.strip()).lower())
        rate = np.where(active_ms > 0, n_chars * 1000.0 / np.maximum(active_ms, 1), np.nan)
        return pa.table(
            {
                "clip_id": t["clip_id"],
                "active_ms": pa.array(active_ms),
                "n_chars": pa.array(n_chars),
                "chars_per_sec": pa.array(rate, type=pa.float64(), from_pandas=True),
            }
        )


def speech_rate(
    ds: "ray.data.Dataset",
    config: Optional[EngineConfig] = None,
    frame: int = 400,
    threshold: int = 64,
) -> "ray.data.Dataset":
    """Per-clip chars-per-active-second (see :class:`SpeechRate`)."""
    config = config or EngineConfig()
    return stage_map_batches(
        ds, SpeechRate, (frame, threshold), config,
        batch_format="pyarrow", batch_size=256,
    )
