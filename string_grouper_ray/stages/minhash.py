"""MinHash signatures + LSH band keys (operator F3 in SURVEY.md §2.3).

A stateful ``map_batches`` actor stage: the ``num_perm`` permutation
coefficients are derived ONCE per actor from ``config.minhash_seed``
(deterministic — same config → same signatures on any cluster layout), then
each batch's transcripts are shingled, hashed, min-hashed and banded, fully
in numpy.

Output: ``num_perm``-perm signatures folded into ``lsh_bands`` band hashes,
one int64 key per (band, band-hash) — the shuffle key of the LSH bucketize
stage (SURVEY.md §4.2).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa

from ..config import EngineConfig
from ..text import NGramTokenizer

_MERSENNE_61 = np.uint64((1 << 61) - 1)
_FNV_PRIME = np.uint64(1099511628211)
_FNV_OFFSET = np.uint64(14695981039346656037)


def make_permutations(num_perm: int, seed: int):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """128-perm MinHash of one shingle-hash set; empty set → all-max sentinel."""
    if len(shingles) == 0:
        return np.full(len(a), _MERSENNE_61, dtype=np.uint64)
    with np.errstate(over="ignore"):
        # products wrap mod 2^64 before the Mersenne reduction — still a
        # deterministic, well-mixed family (documented divergence from a
        # strict universal hash; recall is guarded by tests).
        x = (shingles & _MERSENNE_61)[:, None]
        hashed = (x * a[None, :] + b[None, :]) % _MERSENNE_61
    return hashed.min(axis=0)


def band_keys_matrix(sigs: np.ndarray, bands: int) -> np.ndarray:
    """Fold an (n, num_perm) signature matrix into (n, bands) int64 keys:
    FNV-combine each band's rows (vectorized over all rows and bands), then
    mix in the band id so different bands never collide."""
    n, num_perm = sigs.shape
    r = num_perm // bands
    banded = sigs.reshape(n, bands, r)
    with np.errstate(over="ignore"):
        h = np.full((n, bands), _FNV_OFFSET, dtype=np.uint64)
        for t in range(r):
            h = (h ^ banded[:, :, t]) * _FNV_PRIME
        band_ids = (np.arange(bands, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))[None, :]
        h = (h ^ band_ids) & np.uint64(0x7FFFFFFFFFFFFFFF)
    return h.astype(np.int64)


def band_keys(sig: np.ndarray, bands: int) -> np.ndarray:
    return band_keys_matrix(sig[None, :], bands)[0]


class MinHashBander:
    """map_batches stage: (row_idx, text) → exploded (band_key, row_idx) rows.

    Also emits ``exact_key`` (hash of the normalized transcript) for the
    exact-duplicate short-circuit (SURVEY.md §4.1 skew row).
    """

    def __init__(self, config: Optional[EngineConfig] = None, text_col: str = "text"):
        self.config = config or EngineConfig()
        self.tokenizer = NGramTokenizer(self.config)
        self.a, self.b = make_permutations(self.config.num_perm, self.config.minhash_seed)
        self.text_col = text_col

    def signatures(self, texts: List[str]) -> np.ndarray:
        """(n, num_perm) uint64 signature matrix.

        Batched: all rows' shingles hash through ONE (shingles × perms)
        product per ~1M-element chunk, with per-row minima via
        ``np.minimum.reduceat`` — min is order-independent, so this is
        bit-identical to the per-row :func:`minhash_signature` (pinned by
        ``test_batched_signatures_match_per_row``). Chunking caps the
        intermediate at chunk × num_perm × 8 B (~1 GB unchunked at a
        130k-text batch)."""
        shl = self.tokenizer.shingle_hashes_batch(texts)
        n = len(texts)
        num_perm = self.config.num_perm
        out = np.full((n, num_perm), _MERSENNE_61, dtype=np.uint64)
        lens = np.fromiter((len(s) for s in shl), dtype=np.int64, count=n)
        nzr = np.flatnonzero(lens > 0)
        if not len(nzr):
            return out
        flat = np.concatenate([shl[i] for i in nzr]) & _MERSENNE_61
        lens_nz = lens[nzr]
        starts = np.zeros(len(nzr), dtype=np.int64)
        np.cumsum(lens_nz[:-1], out=starts[1:])
        chunk = max(1, 1_000_000 // max(1, num_perm) * 8)
        with np.errstate(over="ignore"):
            r0 = 0
            while r0 < len(nzr):
                r1 = r0 + 1
                while (
                    r1 < len(nzr)
                    and starts[r1] + lens_nz[r1] - starts[r0] <= chunk
                ):
                    r1 += 1
                s0, s1 = starts[r0], starts[r1 - 1] + lens_nz[r1 - 1]
                hashed = (flat[s0:s1, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE_61
                out[nzr[r0:r1]] = np.minimum.reduceat(
                    hashed, starts[r0:r1] - s0, axis=0
                )
                r0 = r1
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        rows = batch["row_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        bands = self.config.lsh_bands
        sigs = self.signatures(texts)
        keys = band_keys_matrix(sigs, bands)
        return pa.table(
            {
                "band_key": pa.array(keys.reshape(-1)),
                "row_idx": pa.array(np.repeat(rows, bands)),
            }
        )
