"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All are stateless vectorized ``map_batches`` transforms over a ``text``
column (the ``documents`` table). Every computed column is named so the
DuckDB oracle SQL in ``__ray_entry__.py`` can reproduce it exactly.
"""

from __future__ import annotations

import hashlib
import re
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

# language marker words, matched with \b boundaries on the lowercased text.
# Deterministic argmax with ties broken by this ordering (en first).
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|in|is|that|for|with|was)\b",
    "de": r"\b(der|die|das|und|ist|nicht|von|mit|den|ein)\b",
    "fr": r"\b(le|la|les|et|est|une|dans|pour|que|des)\b",
    "es": r"\b(el|los|las|es|una|para|por|con|del|se)\b",
}
LANG_ORDER = ["en", "de", "fr", "es"]

# GPT-2-ish token pattern: contractions, letter runs, digit runs, other
# non-space runs, whitespace runs collapse
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


class TokenCounter:
    """token_count (whitespace) + bpe_ish_count (regex token) per row."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.bpe = re.compile(BPE_ISH_PATTERN)

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col]
        # whitespace tokens = count of \S+ runs, vectorized in Arrow
        # (matches len(regexp_extract_all(trim(text), '\S+')) incl. empty text)
        n_tokens = pc.count_substring_regex(texts, pattern=r"\S+").cast(pa.int64())
        bpe_counts = np.fromiter(
            (len(self.bpe.findall(s)) for s in texts.to_pylist()),
            dtype=np.int64,
            count=len(t),
        )
        return t.append_column("n_tokens", n_tokens).append_column(
            "n_bpe_tokens", pa.array(bpe_counts)
        )


class QualityScorer:
    """Length / punctuation / digit / stopword ratios + composite score.

    Columns: n_chars_q, punct_ratio, digit_ratio, stopword_ratio,
    mean_word_len, quality_score (all float64, names mirrored in oracle SQL).
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col]
        n_chars = pc.utf8_length(texts).cast(pa.float64())
        denom = pc.max_element_wise(n_chars, pa.scalar(1.0))
        punct = pc.count_substring_regex(texts, pattern=r"[^\w\s]").cast(pa.float64())
        digits = pc.count_substring_regex(texts, pattern=r"[0-9]").cast(pa.float64())
        stops = pc.count_substring_regex(
            pc.utf8_lower(texts), pattern=LANG_MARKERS["en"]
        ).cast(pa.float64())
        words = pc.count_substring_regex(texts, pattern=r"\S+").cast(pa.float64())
        words_denom = pc.max_element_wise(words, pa.scalar(1.0))
        punct_ratio = pc.divide(punct, denom)
        digit_ratio = pc.divide(digits, denom)
        stopword_ratio = pc.divide(stops, words_denom)
        mean_word_len = pc.divide(
            pc.subtract(n_chars, pc.count_substring_regex(texts, pattern=r"\s").cast(pa.float64())),
            words_denom,
        )
        # composite: long-enough, low punct/digit noise, some stopwords
        score = pc.multiply(
            pc.min_element_wise(pc.divide(n_chars, pa.scalar(200.0)), pa.scalar(1.0)),
            pc.multiply(
                pc.subtract(pa.scalar(1.0), pc.min_element_wise(punct_ratio, pa.scalar(1.0))),
                pc.subtract(pa.scalar(1.0), pc.min_element_wise(digit_ratio, pa.scalar(1.0))),
            ),
        )
        out = t
        for name, col in [
            ("n_chars_q", n_chars),
            ("punct_ratio", punct_ratio),
            ("digit_ratio", digit_ratio),
            ("stopword_ratio", stopword_ratio),
            ("mean_word_len", mean_word_len),
            ("quality_score", score),
        ]:
            out = out.append_column(name, col)
        return out


class LangId:
    """n-gram/stopword-heuristic language ID → ``lang_pred`` column.

    Deterministic: count marker-word hits per language on the lowercased
    text; argmax with ties broken by LANG_ORDER; zero hits → 'und'.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(t[self.text_col])
        counts = [
            pc.count_substring_regex(lower, pattern=LANG_MARKERS[lang])
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            for lang in LANG_ORDER
        ]
        mat = np.stack(counts, axis=1)
        best = mat.argmax(axis=1)  # first max wins = LANG_ORDER tie-break
        langs = np.array(LANG_ORDER, dtype=object)[best]
        langs[mat.max(axis=1) == 0] = "und"
        return t.append_column("lang_pred", pa.array(langs.tolist(), type=pa.string()))


class Fingerprinter:
    """Document fingerprint: md5 of the whitespace-collapsed lowercased text
    (``fingerprint`` column). Exactly
    ``md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))`` in DuckDB."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.ws = re.compile(r"\s+")

    def __call__(self, t: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(self.ws.sub(" ", s.lower()).encode("utf-8")).hexdigest()
            for s in t[self.text_col].to_pylist()
        ]
        return t.append_column("fingerprint", pa.array(fps, type=pa.string()))


# These four stages have MICROSECOND setup (a compiled regex, a few
# dicts) — actor pools buy nothing here and cost a full pool spin-up per
# query (~3-4 s for 31 actors; the per-query wall at sf0.1 was 5 s for
# ~1.5 s of work). The DEFAULT is therefore stateless tasks, which
# construct the (pickled) instance per task at negligible cost and reuse
# warm worker processes at any scale; a config with use_actor_pools=True
# is still honored as an explicit opt-in (pools stay the right call for
# expensive-setup stages — vocabulary fetch, permutation tables, codec
# state — just not these).


def _stat_stage(ds, cls, text_col: str, config):
    if config is not None and config.use_actor_pools:
        from ..functions.stagemap import stage_map_batches

        return stage_map_batches(ds, cls, (text_col,), config,
                                 batch_format="pyarrow")
    return ds.map_batches(cls(text_col), batch_format="pyarrow")


def token_counts(ds, text_col: str = "text", config=None):
    return _stat_stage(ds, TokenCounter, text_col, config)


def quality_scores(ds, text_col: str = "text", config=None):
    return _stat_stage(ds, QualityScorer, text_col, config)


def lang_id(ds, text_col: str = "text", config=None):
    return _stat_stage(ds, LangId, text_col, config)


def fingerprints(ds, text_col: str = "text", config=None):
    return _stat_stage(ds, Fingerprinter, text_col, config)
