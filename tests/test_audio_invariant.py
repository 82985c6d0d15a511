"""Clip-table fixtures + the per-row payload invariant
(BASELINE.json input_hint: decoded-PCM allclose at SNR ≥ 30 dB + exact
transcript equality; FIXTURES.md F0/F6)."""

import numpy as np
import pyarrow as pa
import pytest

from string_grouper_ray.sources.audio import (
    add_noise_at_snr,
    clip_waveform,
    decode_wav,
    encode_wav,
    snr_db,
)
from string_grouper_ray.sources.synth import generate_clip_table


def test_wav_roundtrip():
    pcm = clip_waveform("clip-00000001", 16000, 500)
    data = encode_wav(pcm, 16000)
    decoded, sr = decode_wav(data)
    assert sr == 16000
    assert len(decoded) == len(pcm)
    # PCM16 quantization: ~1e-4 absolute error
    np.testing.assert_allclose(decoded, np.clip(pcm, -1, 1), atol=2e-4)
    assert snr_db(pcm, decoded) > 60


def test_unsupported_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_wav(b"xxx", codec="opus")


def test_noise_at_snr_hits_target():
    pcm = clip_waveform("clip-00000002", 16000, 400)
    noisy = add_noise_at_snr(pcm, snr_db=35.0, seed=7)
    measured = snr_db(pcm, noisy)
    assert 33.0 < measured < 37.0


def test_generate_clip_table_schema_and_determinism():
    t1 = generate_clip_table(200, seed=42)
    t2 = generate_clip_table(200, seed=42)
    assert t1.schema.names == [
        "clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript", "true_group",
    ]
    assert t1.num_rows == 200
    assert t1.equals(t2)
    assert len(set(t1["clip_id"].to_pylist())) == 200
    # clusters exist (some group has >1 member)
    groups = t1["true_group"].to_numpy()
    assert (np.bincount(groups - groups.min()) > 1).any()


def test_clip_table_payload_invariant():
    """Every near-dup row's decoded PCM is within SNR ≥ 30 dB of its
    cluster base clip; transcripts of exact dups match exactly."""
    t = generate_clip_table(150, seed=7)
    groups = t["true_group"].to_numpy()
    payloads = t["bytes"].to_pylist()
    base_pcm = {}
    for i in range(t.num_rows):
        g = groups[i]
        pcm, sr = decode_wav(payloads[i])
        assert sr == 16000
        if g not in base_pcm:
            base_pcm[g] = pcm
        else:
            assert snr_db(base_pcm[g], pcm) >= 30.0, f"row {i} violates SNR floor"


def test_clip_table_no_audio_mode():
    t = generate_clip_table(50, seed=1, with_audio=False)
    assert "bytes" not in t.schema.names


def test_audio_features_stage():
    import ray.data

    from string_grouper_ray.config import EngineConfig
    from string_grouper_ray.pipelines.multimodal import audio_features
    from string_grouper_ray.sources.synth import generate_clip_table

    t = generate_clip_table(60, seed=5)
    out = audio_features(
        ray.data.from_arrow(t), EngineConfig(use_actor_pools=False)
    ).to_pandas()
    assert len(out) == 60
    assert "bytes" not in out.columns  # payload dropped after decode
    # duration from decode matches the metadata column
    assert np.allclose(out["true_dur_ms"], out["dur_ms"], rtol=0.01)
    assert (out["rms"] > 0).all()
    assert out["silence_ratio"].between(0, 1).all()


def test_invariant_checker_stage():
    import ray.data
    import pyarrow as pa

    from string_grouper_ray.pipelines.multimodal import AudioInvariantChecker
    from string_grouper_ray.sources.synth import generate_clip_table

    t = generate_clip_table(40, seed=6)
    groups = t["true_group"].to_numpy()
    payloads = t["bytes"].to_pylist()
    base_payload = {}
    refs = []
    for i in range(t.num_rows):
        g = groups[i]
        if g not in base_payload:
            base_payload[g] = payloads[i]
        refs.append(base_payload[g])
    table = t.append_column("ref_bytes", pa.array(refs, type=pa.binary()))
    table = table.append_column("ref_transcript", table["transcript"])
    out = AudioInvariantChecker(30.0)(table)
    assert out.to_pandas()["invariant_ok"].all()


def test_resample_pcm_preserves_tone():
    # 440 Hz sine at 16 kHz -> 8 kHz: must match the directly generated
    # 8 kHz sine (interior samples; windowed-sinc has edge transients)
    from string_grouper_ray.sources.audio import resample_pcm, snr_db

    sr_in, sr_out, f = 16000, 8000, 440.0
    n = sr_in  # 1 s
    t_in = np.arange(n) / sr_in
    x = 0.5 * np.sin(2 * np.pi * f * t_in)
    y = resample_pcm(x, sr_in, sr_out)
    assert len(y) == sr_out
    t_out = np.arange(len(y)) / sr_out
    ref = 0.5 * np.sin(2 * np.pi * f * t_out)
    core = slice(200, len(y) - 200)
    assert snr_db(ref[core], y[core]) >= 40.0


def test_resample_pcm_upsample_and_identity():
    from string_grouper_ray.sources.audio import resample_pcm, snr_db

    sr_in, f = 8000, 300.0
    x = 0.4 * np.sin(2 * np.pi * f * np.arange(sr_in) / sr_in)
    same = resample_pcm(x, sr_in, sr_in)
    assert np.array_equal(same, x)
    up = resample_pcm(x, sr_in, 16000)
    assert len(up) == 16000
    ref = 0.4 * np.sin(2 * np.pi * f * np.arange(16000) / 16000.0)
    core = slice(400, 16000 - 400)
    assert snr_db(ref[core], up[core]) >= 40.0
    assert len(resample_pcm(np.empty(0), 8000, 16000)) == 0


def test_resampler_stage_end_to_end():
    # full actor-pool stage over a synthetic clip table: payload re-encoded
    # at the target rate, metadata updated, transcript untouched
    import ray.data

    from string_grouper_ray.config import EngineConfig
    from string_grouper_ray.pipelines.multimodal import resample_audio
    from string_grouper_ray.sources.audio import decode_wav
    from string_grouper_ray.sources.synth import generate_clip_table

    t = generate_clip_table(20, seed=11)
    ds = ray.data.from_arrow(t)
    out = resample_audio(
        ds, 8000, EngineConfig(use_actor_pools=False, concurrency=2)
    ).to_pandas()
    assert (out["sr_hz"] == 8000).all()
    assert out["transcript"].tolist() == t["transcript"].to_pylist()
    src = t.to_pandas().set_index("clip_id")
    for _, row in out.head(5).iterrows():
        pcm, sr = decode_wav(row["bytes"], row["codec"])
        assert sr == 8000
        orig_pcm, orig_sr = decode_wav(
            src.loc[row["clip_id"], "bytes"], row["codec"]
        )
        expect = len(orig_pcm) * 8000 / orig_sr
        assert abs(len(pcm) - expect) <= 2


def test_rawv1_codec_roundtrip():
    from string_grouper_ray.sources.video import (
        decode_rawv1_frame,
        decode_rawv1_header,
        encode_rawv1,
        synth_video,
    )

    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, size=(7, 12, 10, 3), dtype=np.uint8)
    blob = encode_rawv1(frames, fps=24)
    assert decode_rawv1_header(blob) == (10, 12, 24, 7)
    for i in (0, 3, 6):
        assert np.array_equal(decode_rawv1_frame(blob, i), frames[i])
    # deterministic synth: same id -> identical bytes
    assert synth_video(5) == synth_video(5)
    assert synth_video(5) != synth_video(6)


def test_frame_sampler_stage_end_to_end():
    import pyarrow as pa

    import ray.data

    from string_grouper_ray.config import EngineConfig
    from string_grouper_ray.pipelines.multimodal import sample_frames
    from string_grouper_ray.sources.video import decode_rawv1_frame, synth_video

    vids = [synth_video(i, n_frames=10 + i) for i in range(6)]
    t = pa.table(
        {
            "clip_id": pa.array(list(range(6)), type=pa.int64()),
            "bytes": pa.array(vids, type=pa.binary()),
            "codec": pa.array(["rawv1"] * 6),
        }
    )
    out = sample_frames(
        ray.data.from_arrow(t), every_n_frames=4,
        config=EngineConfig(use_actor_pools=False, concurrency=2),
    ).to_pandas()
    # one row per sampled frame: ceil(n_frames / 4) per clip
    expect_rows = sum(-(-(10 + i) // 4) for i in range(6))
    assert len(out) == expect_rows
    assert set(out.columns) == {"clip_id", "frame_idx", "frame_bytes", "width", "height"}
    # sampled frame bytes match random-access decode of the source payload
    row = out[(out["clip_id"] == 3) & (out["frame_idx"] == 8)].iloc[0]
    assert row["frame_bytes"] == decode_rawv1_frame(vids[3], 8).tobytes()
    assert (row["width"], row["height"]) == (32, 24)


def test_frame_sampler_unknown_codec_raises():
    import pyarrow as pa

    import ray.data

    from string_grouper_ray.config import EngineConfig
    from string_grouper_ray.pipelines.multimodal import sample_frames

    t = pa.table(
        {
            "clip_id": pa.array([0], type=pa.int64()),
            "bytes": pa.array([b"xxxx"], type=pa.binary()),
            "codec": pa.array(["h264"]),
        }
    )
    with pytest.raises(Exception, match="h264"):
        sample_frames(
            ray.data.from_arrow(t),
            config=EngineConfig(use_actor_pools=False, concurrency=1),
        ).to_pandas()


def test_resize_bilinear_properties():
    from string_grouper_ray.sources.video import frame_grid_features, resize_bilinear

    rng = np.random.RandomState(7)
    frame = rng.randint(0, 256, size=(24, 32, 3), dtype=np.uint8)
    # identity at same size
    assert np.array_equal(resize_bilinear(frame, 24, 32), frame)
    # constant image stays constant under any resize
    flat = np.full((24, 32, 3), 77, dtype=np.uint8)
    assert (resize_bilinear(flat, 9, 13) == 77).all()
    # 2x down of a 2x-block-upsampled image recovers the original exactly
    up = np.kron(frame, np.ones((2, 2, 1), dtype=np.uint8).astype(np.uint8))
    down = resize_bilinear(up.astype(np.uint8), 24, 32)
    assert np.array_equal(down, frame)
    # grid features of a constant image are that constant
    v = frame_grid_features(flat, grid=4)
    assert np.allclose(v, 77.0)


def test_frame_resize_and_features_stages():
    import pyarrow as pa

    import ray.data

    from string_grouper_ray.config import EngineConfig
    from string_grouper_ray.pipelines.multimodal import (
        frame_features, resize_frames, sample_frames)
    from string_grouper_ray.sources.video import synth_video

    t = pa.table(
        {
            "clip_id": pa.array(list(range(4)), type=pa.int64()),
            "bytes": pa.array([synth_video(i, n_frames=12) for i in range(4)], type=pa.binary()),
            "codec": pa.array(["rawv1"] * 4),
        }
    )
    cfg = EngineConfig(use_actor_pools=False, concurrency=2)
    frames = sample_frames(ray.data.from_arrow(t), every_n_frames=6, config=cfg)
    out = frame_features(resize_frames(frames, 16, 16, cfg), grid=4, config=cfg).to_pandas()
    assert len(out) == 4 * 2  # frames 0 and 6 per clip
    assert (out["width"] == 16).all() and (out["height"] == 16).all()
    assert all(len(f) == 48 for f in out["frame_feat"])


def test_audio_fingerprint_dedup_payload_dups():
    """Clips i and i+param_mod are bit-identical waveforms under distinct
    ids (empty transcripts — transcript dedup can't see them); the acoustic
    fingerprint must cluster them together, rep = min clip_id, and the
    zero-pad path must not alias distinct short clips."""
    import numpy as np

    from string_grouper_ray.pipelines.multimodal import (
        AcousticFingerprint,
        audio_fingerprint_dedup,
    )
    from string_grouper_ray.sources.synth import tone_clip_table

    import ray
    import ray.data

    from string_grouper_ray.config import EngineConfig

    t = tone_clip_table(60, param_mod=40)
    cfg = EngineConfig(use_actor_pools=False, concurrency=2)
    out = (
        audio_fingerprint_dedup(ray.data.from_arrow(t), cfg)
        .to_pandas().sort_values("clip_id").reset_index(drop=True)
    )
    assert len(out) == 60
    # every true payload dup shares a cluster, rep is the min id
    for i in range(20):
        a, b = f"tone-{i:06d}", f"tone-{i + 40:06d}"
        ca = out.loc[out["clip_id"] == a, "cluster_id"].item()
        cb = out.loc[out["clip_id"] == b, "cluster_id"].item()
        assert ca == cb == a
        assert bool(out.loc[out["clip_id"] == a, "keep"].item())
        assert not bool(out.loc[out["clip_id"] == b, "keep"].item())
    assert out["keep"].sum() == out["cluster_id"].nunique()

    # zero-pad path: a clip shorter than the 3200-sample span fingerprints
    # deterministically and distinctly from silence-only
    fp = AcousticFingerprint()
    import io
    import wave

    def wav(ints):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
            w.writeframes(np.asarray(ints, dtype=np.int16).tobytes())
        return buf.getvalue()

    short = pa.table(
        {
            "clip_id": pa.array(["s1", "s2"]),
            "bytes": pa.array(
                [wav([12000] * 800), wav([0] * 800)], type=pa.binary()
            ),
            "codec": pa.array(["pcm_s16le"] * 2),
        }
    )
    got = fp(short)["fingerprint"].to_pylist()
    assert got[0] != got[1]
    assert got[0].endswith("-0-0-0-0-0-0")  # padded windows quantize to 0


def test_audio_contour_neardup_matches_bruteforce():
    """Shifted-grid banding recall is provably 1.0 and the in-bucket verify
    makes precision 1.0 — so the pipeline's clusters must equal the
    brute-force pairwise-Chebyshev closure on an arbitrary fixture."""
    import ray
    import ray.data

    from string_grouper_ray.config import EngineConfig
    from string_grouper_ray.pipelines.multimodal import audio_contour_neardup
    from string_grouper_ray.sources.synth import tone_clip_table
    from string_grouper_ray.sources.audio import decode_wav

    n, tol = 80, 20000
    t = tone_clip_table(n)
    t = t.append_column("clip_idx", pa.array(np.arange(n, dtype=np.int64)))
    cfg = EngineConfig(use_actor_pools=False, concurrency=2)
    out = (
        audio_contour_neardup(ray.data.from_arrow(t), tol=tol, config=cfg)
        .to_pandas().sort_values("clip_idx").reset_index(drop=True)
    )
    # brute force: contours + Chebyshev closure via python union-find
    S = []
    for data, codec in zip(t["bytes"].to_pylist(), t["codec"].to_pylist()):
        pcm, _ = decode_wav(data, codec)
        ints = np.abs(np.rint(pcm[:3200] * 32767.0).astype(np.int64))
        S.append(ints.reshape(8, 400).sum(axis=1))
    S = np.array(S)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        for j in range(i + 1, n):
            if np.abs(S[i] - S[j]).max() <= tol:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    expect = np.array([find(i) for i in range(n)])
    # canonicalize: min member per component
    for i in range(n):
        expect[i] = find(i)
    got = out["cluster_id"].to_numpy()
    assert np.array_equal(got, expect)
    assert bool((out["keep"].to_numpy() == (got == out["clip_idx"].to_numpy())).all())


def test_crossmodal_dedup_union_closure():
    """Cross-modal dedup = CC over (same normalized transcript) OR (same
    acoustic fingerprint): must equal a brute-force union-find over the
    two key columns, merge chains ACROSS modalities, and treat
    empty-after-normalize transcripts as matching nothing."""
    import ray
    import ray.data

    from string_grouper_ray.config import EngineConfig
    from string_grouper_ray.pipelines.multimodal import (
        CrossModalKeys,
        crossmodal_dedup,
    )
    from string_grouper_ray.sources.synth import tone_clip_table

    n = 120
    t = tone_clip_table(n, param_mod=48, text_mod=36)
    # blank out a band of transcripts: rows 100.. have audio-only evidence
    texts = t["transcript"].to_pylist()
    for i in range(100, n):
        texts[i] = "   "  # whitespace-only -> empty after normalize
    t = t.set_column(
        t.schema.get_field_index("transcript"),
        "transcript",
        pa.array(texts, type=pa.string()),
    )
    t = t.append_column("clip_idx", pa.array(np.arange(n, dtype=np.int64)))

    cfg = EngineConfig(use_actor_pools=False, concurrency=2)
    out = (
        crossmodal_dedup(ray.data.from_arrow(t), cfg)
        .to_pandas().sort_values("clip_idx").reset_index(drop=True)
    )
    assert len(out) == n

    # brute-force union-find over the same keys
    keys = CrossModalKeys("clip_idx")(t)
    tkey = keys["text_key"].to_pylist()
    akey = keys["audio_key"].to_pylist()
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for km, drop_empty in ((tkey, True), (akey, False)):
        first = {}
        for i, k in enumerate(km):
            if drop_empty and not k:
                continue
            if k in first:
                union(first[k], i)
            else:
                first[k] = i
    expect = np.array([find(i) for i in range(n)], dtype=np.int64)
    # min-label canonical form on both sides
    got = out["cluster_id"].to_numpy()
    assert (got == expect).all()
    assert (out["keep"].to_numpy() == (got == np.arange(n))).all()

    # cross-modal transitivity really occurred: some cluster spans rows
    # that share NO single-modality key directly
    merged_ct = len(np.unique(expect))
    text_only = len({k for k in tkey if k}) + sum(1 for k in tkey if not k)
    audio_only = len(set(akey))
    assert merged_ct < min(text_only, audio_only)

    # direct unit check of the empty-transcript rule: a 2-row table,
    # blank texts, different audio -> two singleton clusters
    t2 = tone_clip_table(2, text_mod=None)
    t2 = t2.append_column("clip_idx", pa.array(np.arange(2, dtype=np.int64)))
    out2 = crossmodal_dedup(ray.data.from_arrow(t2), cfg).to_pandas()
    assert out2["cluster_id"].nunique() == 2
    assert out2["keep"].all()


def test_vad_segments_matches_bruteforce():
    """AudioVAD's vectorized run detection must equal a per-clip brute
    force, emit nothing for silent or sub-frame clips, and honor
    min_frames."""
    import io
    import wave

    import ray
    import ray.data

    from string_grouper_ray.config import EngineConfig
    from string_grouper_ray.pipelines.multimodal import AudioVAD, vad_segments
    from string_grouper_ray.sources.synth import tone_clip_table

    t = tone_clip_table(40, gate_samples=800)
    vad = AudioVAD(frame=400, threshold=64, min_frames=1)
    got = vad(t).to_pandas()

    # brute force from the generating formula
    import numpy as np

    rows = []
    for i in range(40):
        dur = 200 + 40 * (i % 30)
        k = np.arange(16 * dur, dtype=np.int64)
        a, b = 97 + 2 * (i % 50), (i * 997) % 24576
        ints = np.abs((a * k + b) % 24576 - 12288)
        ints[(k // 800) % 3 == 2] = 0
        nf = len(ints) // 400
        act = ints[: nf * 400].reshape(nf, 400).sum(axis=1) >= 64 * 400
        seg, s = 0, None
        for f in range(nf + 1):
            on = f < nf and act[f]
            if on and s is None:
                s = f
            elif not on and s is not None:
                rows.append((f"tone-{i:06d}", seg, s * 25, f * 25, f - s))
                seg += 1
                s = None
    import pandas as pd

    exp = pd.DataFrame(
        rows, columns=["clip_id", "seg_idx", "start_ms", "end_ms", "n_frames"]
    )
    got = got.sort_values(["clip_id", "seg_idx"]).reset_index(drop=True)
    exp = exp.sort_values(["clip_id", "seg_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    # min_frames filters short runs (the 2-frame trailing runs vanish at 3)
    got3 = AudioVAD(frame=400, threshold=64, min_frames=3)(t).to_pandas()
    assert (got3["n_frames"] >= 3).all()
    assert len(got3) < len(got)

    def wav(ints):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
            w.writeframes(np.asarray(ints, dtype=np.int16).tobytes())
        return buf.getvalue()

    # silent clip and sub-frame clip emit no rows; dataset path agrees
    edge = pa.table(
        {
            "clip_id": pa.array(["silent", "short", "loud"]),
            "bytes": pa.array(
                [wav([0] * 4000), wav([30000] * 100), wav([30000] * 1200)],
                type=pa.binary(),
            ),
            "codec": pa.array(["pcm_s16le"] * 3),
        }
    )
    out = vad(edge).to_pandas()
    assert set(out["clip_id"]) == {"loud"}
    assert out.iloc[0]["n_frames"] == 3  # 1200 samples = 3 full frames

    cfg = EngineConfig(use_actor_pools=False, concurrency=2)
    ds_out = vad_segments(ray.data.from_arrow(edge), cfg).to_pandas()
    pd.testing.assert_frame_equal(
        ds_out.sort_values(["clip_id", "seg_idx"]).reset_index(drop=True),
        out.sort_values(["clip_id", "seg_idx"]).reset_index(drop=True),
        check_dtype=False,
    )


def test_slice_segments_bit_exact():
    """Sliced segment payloads carry EXACTLY the original int16 samples of
    their [start,end) frame range (bit-for-bit), transcripts pass through,
    silent clips emit nothing, and the dataset path agrees with AudioVAD
    boundaries."""
    import ray
    import ray.data

    from string_grouper_ray.config import EngineConfig
    from string_grouper_ray.pipelines.multimodal import (
        AudioVAD,
        slice_segments,
    )
    from string_grouper_ray.sources.synth import tone_clip_table

    t = tone_clip_table(30, gate_samples=800, text_mod=10)
    cfg = EngineConfig(use_actor_pools=False, concurrency=2)
    out = slice_segments(ray.data.from_arrow(t), cfg).to_pandas()
    segs = AudioVAD()(t).to_pandas()
    assert len(out) == len(segs)
    assert list(out.columns) == [
        "clip_id", "seg_idx", "bytes", "sr_hz", "dur_ms", "codec", "transcript",
    ]

    src = t.to_pandas().set_index("clip_id")
    seg_key = segs.set_index(["clip_id", "seg_idx"])
    import io
    import wave

    for _, row in out.iterrows():
        meta = seg_key.loc[(row["clip_id"], row["seg_idx"])]
        with wave.open(io.BytesIO(row["bytes"])) as w:
            sliced = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
        with wave.open(io.BytesIO(src.loc[row["clip_id"], "bytes"])) as w:
            orig = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
        s = int(meta["start_ms"]) * 16  # 16 samples/ms at 16 kHz
        e = int(meta["end_ms"]) * 16
        assert np.array_equal(sliced, orig[s:e])
        assert row["transcript"] == src.loc[row["clip_id"], "transcript"]
        assert row["dur_ms"] == int(meta["end_ms"]) - int(meta["start_ms"])

    # every clip alternates activity, so every clip produced >= 1 segment
    assert set(out["clip_id"]) == set(t["clip_id"].to_pylist())


def test_speech_rate_stage():
    """SpeechRate: active_ms from the VAD predicate, n_chars normalized,
    NULL rate for fully-silent audio, and consistency with AudioVAD."""
    import io
    import wave

    import ray
    import ray.data

    from string_grouper_ray.config import EngineConfig
    from string_grouper_ray.pipelines.multimodal import AudioVAD, speech_rate
    from string_grouper_ray.sources.synth import tone_clip_table

    t = tone_clip_table(30, gate_samples=800, text_mod=10)
    cfg = EngineConfig(use_actor_pools=False, concurrency=2)
    out = (
        speech_rate(ray.data.from_arrow(t), cfg)
        .to_pandas().set_index("clip_id")
    )
    segs = AudioVAD()(t).to_pandas()
    per_clip = segs.groupby("clip_id")["n_frames"].sum() * 25
    for cid, ms in per_clip.items():
        assert out.loc[cid, "active_ms"] == ms
    assert (out["n_chars"] == 19).all()  # every variant normalizes to 19
    exp = 19 * 1000.0 / out["active_ms"]
    assert np.allclose(out["chars_per_sec"], exp, rtol=1e-12)

    def wav(ints):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
            w.writeframes(np.asarray(ints, dtype=np.int16).tobytes())
        return buf.getvalue()

    silent = pa.table(
        {
            "clip_id": pa.array(["s"]),
            "bytes": pa.array([wav([0] * 4000)], type=pa.binary()),
            "codec": pa.array(["pcm_s16le"]),
            "transcript": pa.array(["ghost transcript"]),
        }
    )
    row = speech_rate(ray.data.from_arrow(silent), cfg).to_pandas().iloc[0]
    assert row["active_ms"] == 0 and row["n_chars"] == 16
    assert np.isnan(row["chars_per_sec"])
