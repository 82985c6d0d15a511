"""Multimodal (binary-payload) operators over the clip table.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata (``sr_hz``, ``dur_ms``, ``codec``). Each operator is an actor-pool
``map_batches`` stage sized for LARGE rows (small ``batch_size`` — a batch
× concurrency of multi-MB payloads must fit a worker heap).

Real in this environment: WAV/PCM16 decode, audio features, and
windowed-sinc resampling (pure numpy, sources/audio.py). Stubbed behind
``NotImplementedError``: non-WAV codecs and video frame-sampling — the
Ray-side plumbing (schema, batch sizing, actor signature, output layout)
is identical and tested via the WAV path.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..config import EngineConfig
from ..functions.stagemap import stage_map_batches
from ..sources.audio import SUPPORTED_CODEC, decode_wav, snr_db


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
        for i in range(n):
            pcm, sr = decode_wav(payloads[i], codecs[i])
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
        for data, codec in zip(payloads, codecs):
            pcm, sr = decode_wav(data, codec)
            out_bytes.append(encode_wav(resample_pcm(pcm, sr, self.target_sr), self.target_sr))
        cols = {name: t[name] for name in t.column_names}
        cols["bytes"] = pa.array(out_bytes, type=pa.binary())
        cols["sr_hz"] = pa.array(
            np.full(len(t), self.target_sr, dtype=np.int32), type=pa.int32()
        )
        return pa.table(cols)


class FrameSampler:
    """STUB: video frame sampling (no video libs in this container). The
    actor signature and output layout (one row per sampled frame with
    ``frame_idx``/``frame_bytes``) are the real contract."""

    def __init__(self, every_n_frames: int = 30):
        self.every_n = every_n_frames

    def __call__(self, t: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "FrameSampler is a stub: plug pyav/decord into this seam."
        )


def audio_features(
    ds: "ray.data.Dataset", config: Optional[EngineConfig] = None
) -> "ray.data.Dataset":
    config = config or EngineConfig()
    # binary rows are wide: small batches so batch × concurrency fits heap
    return stage_map_batches(
        ds, AudioFeatures, (), config, batch_format="pyarrow", batch_size=256
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
