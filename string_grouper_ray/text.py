"""Character n-gram tokenizer / normalizer (operator M1 in SURVEY.md §2.2).

Reproduces the reference analyzer exactly
(``/root/reference/string_grouper/string_grouper.py:365-378``):

1. optionally lowercase (``ignore_case``)
2. optionally NFKD-normalize and strip to ASCII (``normalize_to_ascii``)
3. delete every regex match (default ``r'[,-./]|\\s'``)
4. slide a character window of ``ngram_size``

Golden cases (reference tests ``test_string_grouper.py:495-517`` and
``docs/references/sg_class.md``):

>>> ngrams_of("McDonalds", EngineConfig(ignore_case=False))
['McD', 'cDo', 'Don', 'ona', 'nal', 'ald', 'lds']
>>> ngrams_of('ÀbracâDABRÀ', EngineConfig())
['abr', 'bra', 'rac', 'aca', 'cad', 'ada', 'dab', 'abr', 'bra']

The batch-level entry points are what the Ray pipeline uses: one compiled
regex per stage (actor) instance, a Python loop over the strings of a batch
(character windowing has no Arrow kernel) emitting Arrow list columns.
"""

from __future__ import annotations

import re
from typing import Iterable, List, Optional, Sequence
from unicodedata import normalize as _unicode_normalize

import numpy as np

from .config import EngineConfig


class NGramTokenizer:
    """Stateful tokenizer: compile once (per actor), call per batch."""

    def __init__(self, config: Optional[EngineConfig] = None):
        self.config = config or EngineConfig()
        self._pattern = re.compile(self.config.regex)

    def normalize(self, string: str) -> str:
        cfg = self.config
        if cfg.ignore_case and string is not None:
            string = string.lower()
        if cfg.normalize_to_ascii:
            string = _unicode_normalize("NFKD", string).encode("ASCII", "ignore").decode()
        return self._pattern.sub("", string)

    def ngrams(self, string: str) -> List[str]:
        """All char n-grams of one string (with duplicates, in order)."""
        s = self.normalize(string)
        n = self.config.ngram_size
        return [s[i : i + n] for i in range(len(s) - n + 1)]

    def normalized_batch(self, strings: Sequence[str]) -> List[str]:
        """Normalization only (lower / NFKD→ASCII / regex strip), no gram
        slicing — the vectorized encoder extracts grams from the packed
        bytes of these strings instead of materializing Python slices."""
        sub = self._pattern.sub
        lower = self.config.ignore_case
        ascii_ = self.config.normalize_to_ascii
        out: List[str] = []
        for s in strings:
            if lower and s is not None:
                s = s.lower()
            if ascii_:
                s = _unicode_normalize("NFKD", s).encode("ASCII", "ignore").decode()
            out.append(sub("", s))
        return out

    def ngrams_batch(self, strings: Sequence[str]) -> List[List[str]]:
        """Per-batch tokenization; one compiled-regex pass per string."""
        n = self.config.ngram_size
        return [
            [s[i : i + n] for i in range(len(s) - n + 1)]
            for s in self.normalized_batch(strings)
        ]

    def shingle_hashes_batch(self, strings: Sequence[str]) -> List[np.ndarray]:
        """Distinct shingle hashes per string, as uint64 arrays (sorted
        ascending — every consumer is order-insensitive: MinHash takes the
        min, SimHash votes per bit, the Jaccard verify sorts before packing).

        Used by the MinHash path where the literal n-gram text is not needed —
        only a stable 64-bit identity per distinct shingle. The ASCII fast
        path FNV-hashes every length-n byte window of the batch's
        concatenated normalized bytes in n vectorized xor-multiply passes —
        bit-identical to ``_fnv1a_64`` over each gram's utf-8 bytes (pinned
        by ``test_shingle_fast_path_matches_scalar_fnv``).
        """
        n = self.config.ngram_size
        normed = self.normalized_batch(strings)
        if self.config.normalize_to_ascii or all(s.isascii() for s in normed):
            return self._shingle_hashes_ascii(normed, n)
        out: List[np.ndarray] = []
        for s in normed:
            grams = {s[i : i + n] for i in range(len(s) - n + 1)}
            if not grams:
                out.append(np.empty(0, dtype=np.uint64))
                continue
            hashes = {_fnv1a_64(g) for g in grams}
            out.append(
                np.sort(np.fromiter(hashes, dtype=np.uint64, count=len(hashes)))
            )
        return out

    @staticmethod
    def _shingle_hashes_ascii(normed: Sequence[str], n: int) -> List[np.ndarray]:
        nrows = len(normed)
        blob = "".join(normed).encode("ascii")
        arr = np.frombuffer(blob, dtype=np.uint8)
        lens = np.fromiter((len(s) for s in normed), dtype=np.int64, count=nrows)
        gl = np.maximum(lens - n + 1, 0)
        total = len(arr) - n + 1
        if nrows == 0 or total <= 0 or not gl.any():
            return [np.empty(0, dtype=np.uint64)] * nrows
        offs = np.zeros(nrows + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        # FNV-1a over every length-n window: h = (h ^ byte) * prime per
        # byte, wrapping mod 2^64 — exactly _fnv1a_64's recurrence
        h = np.full(total, 0xCBF29CE484222325, dtype=np.uint64)
        prime = np.uint64(0x100000001B3)
        with np.errstate(over="ignore"):
            for j in range(n):
                h ^= arr[j : total + j].astype(np.uint64)
                h *= prime
        nz = gl > 0
        starts = offs[:-1][nz]
        gl_nz = gl[nz]
        # window positions per row (offset arithmetic, no Python loop)
        base = np.zeros(len(gl_nz), dtype=np.int64)
        np.cumsum(gl_nz[:-1], out=base[1:])
        pos = (
            np.arange(int(gl_nz.sum()), dtype=np.int64)
            - np.repeat(base, gl_nz)
            + np.repeat(starts, gl_nz)
        )
        rows = np.repeat(np.flatnonzero(nz), gl_nz)
        hv = h[pos]
        order = np.lexsort((hv, rows))
        rows, hv = rows[order], hv[order]
        keep = np.ones(len(rows), dtype=bool)
        keep[1:] = (rows[1:] != rows[:-1]) | (hv[1:] != hv[:-1])
        rows, hv = rows[keep], hv[keep]
        counts = np.bincount(rows, minlength=nrows)
        return np.split(hv, np.cumsum(counts)[:-1])


def _fnv1a_64(s: str) -> int:
    """Deterministic 64-bit FNV-1a string hash (process-independent, unlike
    Python's seeded ``hash``)."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def fnv1a_64_batch(strings: "Sequence[str]") -> np.ndarray:
    """Vectorized FNV-1a over whole strings: one xor-multiply pass per BYTE
    POSITION (≤ max length passes over the batch, masked to live rows)
    instead of a Python byte loop per string. Bit-identical to
    ``_fnv1a_64`` for any input (operates on the utf-8 bytes, so no ASCII
    precondition); falls back to the scalar loop only for tiny batches
    where the vector setup outweighs it."""
    strings = list(strings)
    n = len(strings)
    if n < 32:
        return np.fromiter((_fnv1a_64(s) for s in strings), dtype=np.uint64, count=n)
    bufs = [s.encode("utf-8") for s in strings]
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
    arr = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    # process rows in descending-length order so each positional pass
    # touches a contiguous prefix of live rows (no per-pass masking)
    order = np.argsort(-lens, kind="stable")
    starts = offs[:-1][order]
    lens_o = lens[order]
    h_o = h.copy()
    with np.errstate(over="ignore"):
        live = int((lens_o > 0).sum())
        j = 0
        maxlen = int(lens_o[0]) if n else 0
        while j < maxlen:
            # shrink the live prefix to rows longer than j
            while live > 0 and lens_o[live - 1] <= j:
                live -= 1
            if live == 0:
                break
            idx = starts[:live] + j
            h_o[:live] ^= arr[idx].astype(np.uint64)
            h_o[:live] *= prime
            j += 1
    h[order] = h_o
    return h


def ngrams_of(string: str, config: Optional[EngineConfig] = None) -> List[str]:
    """Convenience single-string tokenizer (reference ``n_grams``)."""
    return NGramTokenizer(config).ngrams(string)
