"""Audio payload handling (operator M8 in SURVEY.md §2.2).

The clip table carries encoded audio as an opaque ``binary`` column
(``BASELINE.json.input_hint``). The pipeline itself never decodes it — the
payload is projected away before the shuffles and joined back by ``clip_id``
at the end. These helpers exist for:

* deterministic synthetic WAV generation (pure numpy + stdlib ``wave`` —
  no audio libraries exist in this environment, SURVEY.md §4.3),
* the per-row invariant check: decoded PCM allclose at SNR ≥ 30 dB plus
  exact transcript equality.

Real codecs (mp3/opus/...) would be actor-pool decode stages; here only
``pcm_s16le`` in a WAV container is implemented and anything else raises
``NotImplementedError`` (clearly-marked stub; the Ray-side plumbing is the
same for any codec).
"""

from __future__ import annotations

import io
import wave
import zlib

import numpy as np

SUPPORTED_CODEC = "pcm_s16le"


def encode_wav(pcm: np.ndarray, sr_hz: int) -> bytes:
    """float [-1, 1] mono waveform → WAV (PCM16) bytes."""
    ints = np.clip(pcm, -1.0, 1.0)
    ints = (ints * 32767.0).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr_hz)
        w.writeframes(ints.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes, codec: str = SUPPORTED_CODEC) -> tuple[np.ndarray, int]:
    """WAV bytes → (float waveform in [-1, 1], sample rate).

    Non-PCM codecs are a stub: the decode plumbing (signature, batch shape)
    is what the pipeline relies on; the codecs themselves need external
    libraries that are absent here.
    """
    if codec != SUPPORTED_CODEC:
        raise NotImplementedError(
            f"codec {codec!r}: only {SUPPORTED_CODEC} (WAV) is implemented in this "
            "environment; plug a real decoder into this seam for other codecs"
        )
    with wave.open(io.BytesIO(data), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
    ints = np.frombuffer(raw, dtype=np.int16)
    return ints.astype(np.float64) / 32767.0, sr


def _canonical_wav_header(data: bytes):
    """Parse the fixed 44-byte canonical RIFF/WAVE header (the shape
    ``encode_wav`` and every common PCM16 writer emit): returns
    (sr, data_offset, data_nbytes) or None when the layout doesn't match
    (extra chunks, non-PCM, stereo, 24-bit, ...) and the stdlib path must
    take over."""
    if (
        len(data) < 44
        or data[:4] != b"RIFF"
        or data[8:16] != b"WAVEfmt "
        # fmt chunk size 16, PCM format tag 1, mono, 16-bit
        or int.from_bytes(data[16:20], "little") != 16
        or int.from_bytes(data[20:22], "little") != 1
        or int.from_bytes(data[22:24], "little") != 1
        or int.from_bytes(data[34:36], "little") != 16
        or data[36:40] != b"data"
    ):
        return None
    sr = int.from_bytes(data[24:28], "little")
    nbytes = int.from_bytes(data[40:44], "little")
    nbytes = min(nbytes, len(data) - 44) & ~1  # clamp + even
    return sr, 44, nbytes


def decode_wav_iter(datas, codecs=None):
    """Streaming WAV decode: yields (float64 waveform, sample rate) per
    payload.

    Hot multimodal stages decode every payload of a batch; going through
    ``wave.open``/``BytesIO`` per row pays Python chunk-parsing machinery
    per clip. Canonical headers are parsed with direct byte math and the
    samples read as a zero-copy ``np.frombuffer`` int16 view (the float
    conversion is the only copy); anything non-canonical falls back to
    :func:`decode_wav` row-wise — bit-identical output either way (pinned
    by test).

    A GENERATOR on purpose: consumers that extract features and discard
    each waveform keep peak memory at one clip AND let the allocator
    reuse the just-freed conversion buffer — measured 1.5× faster than
    the per-row ``wave.open`` path, while a list-returning variant was
    SLOWER than it (holding a whole batch of float64 waveforms alive
    defeats malloc reuse; the conversion, not the header parse,
    dominates)."""
    for i, data in enumerate(datas):
        codec = codecs[i] if codecs is not None else SUPPORTED_CODEC
        hdr = _canonical_wav_header(data) if codec == SUPPORTED_CODEC else None
        if hdr is None:
            yield decode_wav(data, codec)  # also raises the codec stub
            continue
        sr, off, nbytes = hdr
        ints = np.frombuffer(data, dtype=np.int16, count=nbytes // 2, offset=off)
        yield ints.astype(np.float64) / 32767.0, sr


def decode_wav_batch(datas, codecs=None):
    """List-materializing wrapper over :func:`decode_wav_iter`:
    (list of float64 waveforms, int64 sample rates). Prefer the iterator
    in streaming consumers (see its docstring for why)."""
    out = []
    srs = np.empty(len(datas), dtype=np.int64)
    for i, (pcm, sr) in enumerate(decode_wav_iter(datas, codecs)):
        out.append(pcm)
        srs[i] = sr
    return out, srs


def resample_pcm(pcm: np.ndarray, sr_in: int, sr_out: int, half_taps: int = 16) -> np.ndarray:
    """Windowed-sinc resample of a mono float waveform (pure numpy).

    Classic polyphase interpolation: each output sample is a dot product of
    the input against a Hann-windowed sinc centered at its fractional input
    position, with the cutoff lowered to ``sr_out/sr_in`` when downsampling
    (anti-aliasing). Vectorized as one (n_out × taps) gather + weighted sum.
    """
    if sr_in == sr_out or len(pcm) == 0:
        return pcm.copy()
    ratio = sr_in / sr_out
    n_out = max(1, int(round(len(pcm) / ratio)))
    cutoff = min(1.0, 1.0 / ratio)
    # widen the kernel when downsampling so the lowered cutoff keeps taps
    width = int(np.ceil(half_taps / cutoff))
    pos = np.arange(n_out, dtype=np.float64) * ratio
    base = np.floor(pos).astype(np.int64)
    frac = pos - base
    offsets = np.arange(-width + 1, width + 1, dtype=np.int64)
    # (n_out, taps) tap positions, zero-padded at the edges via clipping+mask
    tap_idx = base[:, None] + offsets[None, :]
    valid = (tap_idx >= 0) & (tap_idx < len(pcm))
    samples = pcm[np.clip(tap_idx, 0, len(pcm) - 1)]
    samples = np.where(valid, samples, 0.0)
    x = offsets[None, :] - frac[:, None]
    kernel = cutoff * np.sinc(cutoff * x)
    window = 0.5 + 0.5 * np.cos(np.pi * np.clip(x / width, -1.0, 1.0))
    kernel *= window
    out = np.einsum("ij,ij->i", samples, kernel)
    return np.clip(out, -1.0, 1.0)


def clip_waveform(clip_id: str, sr_hz: int, dur_ms: int) -> np.ndarray:
    """Deterministic per-clip waveform: 2-3 sine tones + light noise,
    seeded by crc32(clip_id) (FIXTURES.md F0)."""
    seed = zlib.crc32(clip_id.encode("utf-8")) & 0xFFFFFFFF
    rng = np.random.RandomState(seed)
    n = max(1, int(sr_hz * dur_ms / 1000))
    t = np.arange(n, dtype=np.float64) / sr_hz
    wave_sum = np.zeros(n)
    for _ in range(rng.randint(2, 4)):
        freq = rng.uniform(80.0, 3500.0)
        phase = rng.uniform(0, 2 * np.pi)
        amp = rng.uniform(0.15, 0.35)
        wave_sum += amp * np.sin(2 * np.pi * freq * t + phase)
    wave_sum += rng.normal(0, 0.01, size=n)
    peak = np.abs(wave_sum).max()
    if peak > 0.99:
        wave_sum = wave_sum * (0.99 / peak)
    return wave_sum


def add_noise_at_snr(pcm: np.ndarray, snr_db: float, seed: int) -> np.ndarray:
    """Additive white noise at the given SNR (used for near-dup payloads,
    SNR 35-40 dB per FIXTURES.md — above the 30 dB invariant floor)."""
    rng = np.random.RandomState(seed)
    sig_power = float(np.mean(pcm**2)) or 1e-12
    noise_power = sig_power / (10.0 ** (snr_db / 10.0))
    noisy = pcm + rng.normal(0, np.sqrt(noise_power), size=len(pcm))
    return np.clip(noisy, -1.0, 1.0)


def snr_db(reference: np.ndarray, test: np.ndarray) -> float:
    """SNR of ``test`` against ``reference`` in dB (the invariant metric)."""
    n = min(len(reference), len(test))
    ref = reference[:n]
    noise = test[:n] - ref
    sig_power = float(np.mean(ref**2)) or 1e-12
    noise_power = float(np.mean(noise**2))
    if noise_power <= 0:
        return float("inf")
    return 10.0 * np.log10(sig_power / noise_power)
