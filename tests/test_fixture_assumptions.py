"""Loud guards for assumptions the DuckDB oracles bake in.

The minhash/simhash oracle SQL in __ray_entry__.py normalizes with
lower+regexp_replace and hashes per-character ``ascii()`` codepoints; the
pipeline applies NFKD→ASCII-ignore and FNV-hashes UTF-8 bytes. The two are
equivalent iff the fixture text is pure ASCII — assert that here so a
fixture-generator change fails this test instead of silently diverging the
correctness gate.
"""

import os

import pytest

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    if os.path.isdir(os.path.join(d, "documents.parquet"))
    or os.path.exists(os.path.join(d, "documents.parquet"))
]


@pytest.mark.skipif(not SF_DIRS, reason="driver testdata not present")
@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_documents_text_is_pure_ascii(sf_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
    for chunk in t["text"].chunks:
        for s in chunk.to_pylist():
            assert s is not None and s.isascii(), (
                "documents.text contains non-ASCII text — the minhash/simhash "
                "DuckDB oracles (see __ray_entry__.py) assume pure ASCII and "
                "will diverge from a correct pipeline"
            )
