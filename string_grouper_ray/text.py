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
        """Distinct shingle hashes per string, as uint64 arrays.

        Used by the MinHash path where the literal n-gram text is not needed —
        only a stable 64-bit identity per distinct shingle.
        """
        out: List[np.ndarray] = []
        for grams in self.ngrams_batch(strings):
            if not grams:
                out.append(np.empty(0, dtype=np.uint64))
                continue
            hashes = {_fnv1a_64(g) for g in set(grams)}
            out.append(np.fromiter(hashes, dtype=np.uint64, count=len(hashes)))
        return out


def _fnv1a_64(s: str) -> int:
    """Deterministic 64-bit FNV-1a string hash (process-independent, unlike
    Python's seeded ``hash``)."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def fnv1a_64_batch(strings: Iterable[str]) -> np.ndarray:
    return np.fromiter((_fnv1a_64(s) for s in strings), dtype=np.uint64)


def ngrams_of(string: str, config: Optional[EngineConfig] = None) -> List[str]:
    """Convenience single-string tokenizer (reference ``n_grams``)."""
    return NGramTokenizer(config).ngrams(string)
