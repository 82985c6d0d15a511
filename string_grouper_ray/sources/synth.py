"""Deterministic synthetic clip-table generator (FIXTURES.md F0/F6).

Produces the canonical input table of the north rule
(``BASELINE.json.input_hint``):

    clip_id:string, bytes:binary, sr_hz:int32, dur_ms:int32,
    codec:string, transcript:string

plus a hidden ground-truth ``true_group`` column for recall measurement.

Cluster structure: ``n_groups`` base transcripts (company-like token
sequences), each expanded into a Zipf-ish-sized cluster with typo /
token-drop / punctuation / case / accent perturbations, exact duplicates,
and prefix-truncation containments (exercising the suffix/containment
pass). A few deliberately hot clusters exercise the salted-key skew split.
Near-duplicate audio payloads copy the base clip's waveform with noise at
SNR 35-40 dB (the per-row invariant floor is 30 dB).

Everything derives from ``seed`` — no wall clock, no global RNG.
"""

from __future__ import annotations

import os
import zlib
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .audio import add_noise_at_snr, clip_waveform, encode_wav

_WORDS = (
    "mega hyper global acme united advanced pacific northern southern central "
    "digital quantum stellar apex summit pioneer vertex nova prime alpha "
    "enterprises startup corporation incorporated holdings industries systems "
    "solutions technologies logistics dynamics ventures partners group labs "
    "works media networks services "
    # a wide tail of distinct tokens so independent clusters rarely collide
    # (with a small vocabulary, distinct base transcripts birthday-collide and
    # the corpus develops accidental cross-cluster near-dups that swamp the
    # candidate stage with real-but-unintended matches)
    + " ".join(f"{a}{b}{c}" for a in "brastelkomvendur" for b in "aeiou" for c in "xrmntlks")
).split()

_SUFFIXES = ["Inc.", "Corp.", "Corporation", "Incorporated", "LLC", "Ltd.", "Co."]

_ACCENTS = str.maketrans({"a": "à", "e": "é", "i": "î", "o": "ô", "u": "ü", "c": "ç"})


def _base_transcript(rng: np.random.RandomState) -> str:
    k = rng.randint(3, 6)
    words = [str(_WORDS[i]) for i in rng.randint(0, len(_WORDS), size=k)]
    name = " ".join(w.capitalize() for w in words)
    return f"{name} {_SUFFIXES[rng.randint(0, len(_SUFFIXES))]}"


def _perturb(text: str, rng: np.random.RandomState) -> str:
    mode = rng.randint(0, 7)
    if mode == 0:  # exact duplicate
        return text
    if mode == 1:  # char typo
        chars = list(text)
        i = rng.randint(0, len(chars))
        chars[i] = chr(ord("a") + rng.randint(0, 26))
        return "".join(chars)
    if mode == 2:  # token drop / swap
        toks = text.split()
        if len(toks) > 2:
            if rng.rand() < 0.5:
                toks.pop(rng.randint(0, len(toks)))
            else:
                i = rng.randint(0, len(toks) - 1)
                toks[i], toks[i + 1] = toks[i + 1], toks[i]
        return " ".join(toks)
    if mode == 3:  # punctuation / hyphen noise
        return text.replace(" ", "-", 1).replace(".", "")
    if mode == 4:  # case noise
        return text.upper() if rng.rand() < 0.5 else text.lower()
    if mode == 5:  # unicode accents (NFKD-strippable)
        return text.lower().translate(_ACCENTS)
    # mode == 6: prefix-truncation containment (suffix pass fodder)
    cut = max(6, int(len(text) * rng.uniform(0.55, 0.85)))
    return text[:cut]


def generate_clip_table(
    n: int,
    seed: int = 42,
    sr_hz: int = 16000,
    with_audio: bool = True,
    hot_cluster_fraction: float = 0.02,
) -> pa.Table:
    """Generate ``n`` clip rows with ground-truth cluster ids."""
    rng = np.random.RandomState(seed)
    # Zipf-ish cluster sizes incl. a few hot clusters
    rows_made = 0
    bases = []
    sizes = []
    gid = 0
    n_hot = max(1, int(n * hot_cluster_fraction / 50)) if n >= 1000 else 0
    while rows_made < n:
        if gid < n_hot:
            size = max(50, min(600, int(n * hot_cluster_fraction)))
        else:
            size = 1 + min(int(rng.zipf(2.0)), 12)
        size = min(size, n - rows_made)
        bases.append(_base_transcript(rng))
        sizes.append(size)
        rows_made += size
        gid += 1

    clip_ids = []
    transcripts = []
    true_groups = []
    dur_ms_col = []
    payloads = []
    row = 0
    for g, (base, size) in enumerate(zip(bases, sizes)):
        base_dur = int(rng.randint(200, 2000))
        base_id = f"clip-{row:08d}"
        base_wave = clip_waveform(base_id, sr_hz, base_dur) if with_audio else None
        for j in range(size):
            cid = f"clip-{row:08d}"
            clip_ids.append(cid)
            true_groups.append(g)
            dur_ms_col.append(base_dur)
            if j == 0:
                transcripts.append(base)
                if with_audio:
                    payloads.append(encode_wav(base_wave, sr_hz))
            else:
                transcripts.append(_perturb(base, rng))
                if with_audio:
                    noisy = add_noise_at_snr(
                        base_wave, snr_db=rng.uniform(35.0, 40.0),
                        seed=zlib.crc32(cid.encode()) & 0xFFFFFFFF,
                    )
                    payloads.append(encode_wav(noisy, sr_hz))
            row += 1

    cols = {
        "clip_id": pa.array(clip_ids, type=pa.string()),
        "sr_hz": pa.array(np.full(n, sr_hz, dtype=np.int32)),
        "dur_ms": pa.array(np.asarray(dur_ms_col, dtype=np.int32)),
        "codec": pa.array(["pcm_s16le"] * n, type=pa.string()),
        "transcript": pa.array(transcripts, type=pa.string()),
        "true_group": pa.array(np.asarray(true_groups, dtype=np.int64)),
    }
    if with_audio:
        cols["bytes"] = pa.array(payloads, type=pa.binary())
    order = ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript", "true_group"]
    return pa.table({k: cols[k] for k in order if k in cols})


def tone_clip_table(
    n: int,
    sr_hz: int = 16000,
    param_mod: "int | None" = None,
    text_mod: "int | None" = None,
    gate_samples: "int | None" = None,
) -> pa.Table:
    """SQL-expressible deterministic audio fixture: clip ``i`` is an integer
    sawtooth directly in PCM16 space,

        ints[k] = ((a_j * k + b_j) % 24576) - 12288,   j = i % param_mod
        a_j = 97 + 2*(j % 50),  b_j = (j * 997) % 24576
        dur_ms_j = 200 + 40*(j % 30)   (n_samples = 16 * dur_ms at 16 kHz)

    Pure integer arithmetic — a DuckDB oracle reproduces every sample
    bit-exactly (no RNG, no trig, no float rounding ambiguity), so decode /
    feature / resample stages get hash-checkable oracles. The WAV container
    is written from the int16 samples directly (no float round-trip).

    ``param_mod``: waveform parameters derive from ``i % param_mod`` while
    the clip id stays ``i`` — clips ``i`` and ``i + param_mod`` become
    bit-identical ACOUSTIC duplicates under distinct ids (the fixture for
    payload-level dedup; transcripts are all empty, so transcript-level
    dedup cannot distinguish them).

    ``text_mod``: transcripts derive from ``t = i % text_mod`` as the
    template ``"session %04d take %d" % (t, t % 7)`` under one of three
    surface variants chosen by ``i % 3`` (as-is / UPPER / double-spaced
    Title Case). All three normalize to the same key under
    lower+whitespace-collapse, so the normalized transcript key is the
    pure function of ``t`` a SQL oracle recomputes directly — the
    cross-modal dedup fixture, where text classes (mod ``text_mod``) and
    acoustic classes (mod ``param_mod``) interleave into nontrivial
    transitive closures.

    ``gate_samples``: when set, every third gate window is silenced —
    sample ``k`` is zeroed iff ``(k // gate_samples) % 3 == 2`` — giving
    each clip a deterministic speech/silence alternation (the VAD /
    segmentation fixture; the gate is a pure integer predicate a SQL
    oracle applies to the same formula samples)."""
    import io
    import wave

    ids, payloads, durs, texts = [], [], [], []
    for i in range(n):
        j = i % param_mod if param_mod else i
        if text_mod:
            tj = i % text_mod
            base = f"session {tj:04d} take {tj % 7}"
            v = i % 3
            if v == 1:
                texts.append(base.upper())
            elif v == 2:
                texts.append(base.title().replace(" ", "  "))
            else:
                texts.append(base)
        else:
            texts.append("")
        dur_ms = 200 + 40 * (j % 30)
        k = np.arange(sr_hz * dur_ms // 1000, dtype=np.int64)
        a = 97 + 2 * (j % 50)
        b = (j * 997) % 24576
        ints = ((a * k + b) % 24576 - 12288).astype(np.int16)
        if gate_samples:
            ints = np.where((k // gate_samples) % 3 == 2, 0, ints).astype(np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr_hz)
            w.writeframes(ints.tobytes())
        ids.append(f"tone-{i:06d}")
        payloads.append(buf.getvalue())
        durs.append(dur_ms)
    return pa.table(
        {
            "clip_id": pa.array(ids, type=pa.string()),
            "bytes": pa.array(payloads, type=pa.binary()),
            "sr_hz": pa.array(np.full(n, sr_hz, dtype=np.int32)),
            "dur_ms": pa.array(np.asarray(durs, dtype=np.int32)),
            "codec": pa.array(["pcm_s16le"] * n, type=pa.string()),
            "transcript": pa.array(texts, type=pa.string()),
        }
    )


def write_clip_table(
    n: int,
    out_dir: str,
    seed: int = 42,
    shard_rows: int = 50_000,
    with_audio: bool = True,
) -> str:
    """Write the synthetic table as sharded parquet (resumable layout:
    one file per shard; existing shards are skipped on rerun). Missing
    shards are generated in a process pool — each shard is seeded
    independently (seed + shard), so parallel generation is bit-identical
    to the old serial loop."""
    os.makedirs(out_dir, exist_ok=True)
    todo = []
    start = 0
    shard = 0
    while start < n:
        stop = min(start + shard_rows, n)
        path = os.path.join(out_dir, f"part-{shard:05d}.parquet")
        if not os.path.exists(path):
            todo.append((shard, start, stop, path))
        start = stop
        shard += 1
    if todo:
        from concurrent.futures import ProcessPoolExecutor

        workers = min(16, os.cpu_count() or 4, len(todo))
        args = [(s, a, b, p, seed, with_audio) for s, a, b, p in todo]
        if workers <= 1:
            for a in args:
                _write_clip_shard(a)
        else:
            with ProcessPoolExecutor(max_workers=workers) as pool:
                list(pool.map(_write_clip_shard, args))
    return out_dir


def _write_clip_shard(args) -> None:
    shard, start, stop, path, seed, with_audio = args
    table = generate_clip_table(stop - start, seed=seed + shard, with_audio=with_audio)
    # re-key clip ids / groups into the global namespace
    ids = [f"clip-{start + i:08d}" for i in range(stop - start)]
    groups = table["true_group"].to_numpy() + (start << 20)
    table = table.set_column(0, "clip_id", pa.array(ids, type=pa.string()))
    table = table.set_column(
        table.schema.get_field_index("true_group"),
        "true_group",
        pa.array(groups, type=pa.int64()),
    )
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
