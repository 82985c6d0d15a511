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
