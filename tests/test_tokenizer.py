"""Golden tests for the n-gram tokenizer (reference
test_string_grouper.py:495-517 and docs/references/sg_class.md)."""

import numpy as np

from string_grouper_ray.config import EngineConfig
from string_grouper_ray.text import NGramTokenizer, ngrams_of


def test_ngrams_case_unchanged():
    assert ngrams_of("McDonalds", EngineConfig(ignore_case=False)) == [
        "McD", "cDo", "Don", "ona", "nal", "ald", "lds",
    ]


def test_ngrams_ignore_case_to_lower():
    assert ngrams_of("McDonalds", EngineConfig(ignore_case=True)) == [
        "mcd", "cdo", "don", "ona", "nal", "ald", "lds",
    ]


def test_ngrams_default_ignores_case():
    assert ngrams_of("McDonalds") == ["mcd", "cdo", "don", "ona", "nal", "ald", "lds"]


def test_ngrams_unicode_nfkd_ascii():
    # docs/references/sg_class.md golden
    assert ngrams_of("ÀbracâDABRÀ") == [
        "abr", "bra", "rac", "aca", "cad", "ada", "dab", "abr", "bra",
    ]


def test_ngrams_regex_removes_punct_and_space():
    assert ngrams_of("a,b-c.d/e f") == ["abc", "bcd", "cde", "def"]


def test_ngram_size_option():
    assert ngrams_of("abcd", EngineConfig(ngram_size=2)) == ["ab", "bc", "cd"]


def test_short_string_yields_nothing():
    assert ngrams_of("ab") == []


def test_batch_matches_single():
    tok = NGramTokenizer(EngineConfig())
    strings = ["McDonalds", "ÀbracâDABRÀ", "", "a b"]
    batch = tok.ngrams_batch(strings)
    assert batch == [tok.ngrams(s) for s in strings]


def test_shingle_hashes_distinct_and_deterministic():
    tok = NGramTokenizer(EngineConfig())
    h1 = tok.shingle_hashes_batch(["abcabcabc"])[0]
    h2 = tok.shingle_hashes_batch(["abcabcabc"])[0]
    assert sorted(h1.tolist()) == sorted(h2.tolist())
    # distinct shingles only: 'abcabcabc' has shingles abc,bca,cab repeated
    assert len(h1) == 3


def test_shingle_fast_path_matches_scalar_fnv():
    """The vectorized ASCII shingle path must be bit-identical to the
    scalar FNV-1a over each normalized gram, sorted ascending — including
    empty/short rows and the non-ASCII fallback."""
    from string_grouper_ray.text import _fnv1a_64

    cfg = EngineConfig()
    tok = NGramTokenizer(cfg)
    texts = ["hello world", "", "ab", "abc", "aaaaaa", "ACME Corp., Ltd.",
             "café naïve", "ümlaut Straße", "abcabcabc"]
    got = tok.shingle_hashes_batch(texts)
    n = cfg.ngram_size
    for s, h in zip(tok.normalized_batch(texts), got):
        want = sorted({_fnv1a_64(s[i : i + n]) for i in range(len(s) - n + 1)})
        assert h.tolist() == want

    cfg2 = EngineConfig(normalize_to_ascii=False)
    tok2 = NGramTokenizer(cfg2)
    got2 = tok2.shingle_hashes_batch(texts)  # non-ascii rows force fallback
    for s, h in zip(tok2.normalized_batch(texts), got2):
        want = sorted({_fnv1a_64(s[i : i + n]) for i in range(len(s) - n + 1)})
        assert h.tolist() == want


def test_batched_signatures_match_per_row():
    from string_grouper_ray.stages.minhash import (
        MinHashBander, minhash_signature)

    cfg = EngineConfig()
    b = MinHashBander(cfg)
    texts = ["the quick brown fox", "", "ab", "jumps over the lazy dog",
             "the quick brown fox", "x" * 300]
    sigs = b.signatures(texts)
    for i, sh in enumerate(b.tokenizer.shingle_hashes_batch(texts)):
        assert np.array_equal(sigs[i], minhash_signature(sh, b.a, b.b))
