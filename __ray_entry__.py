"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship near-dup clustering pipeline on the sf0.001
``documents`` table. ``queries()``/``oracle_sql()`` expose one entry per
implemented operator from SURVEY.md §2 (+ the training-data operators);
DuckDB-checkable ones carry an oracle, the rest get the rows-only check.

Ray is initialised by the driver BEFORE this module is imported — nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

# the reference's default normalizer (M1) as a DuckDB expression on ASCII
# input: lower + delete [,-./]|\s  (NFKD is a no-op on these tables)
_NORM_SQL = r"regexp_replace(lower({col}), '[,-./\s]', '', 'g')"

# char-3gram tf-idf with sklearn semantics (raw tf, smooth idf, L2 norm) —
# the numeric core of the engine, expressed in SQL for the oracle
_TFIDF_CTE = r"""
WITH docs AS (
    SELECT {id} AS id, {norm} AS s FROM {table}
),
grams AS (
    SELECT id, substring(s, CAST(u AS INTEGER), 3) AS g
    FROM (SELECT id, s, unnest(generate_series(1, length(s) - 2)) AS u
          FROM docs WHERE length(s) >= 3)
),
tf AS (SELECT id, g, CAST(count(*) AS DOUBLE) AS tf FROM grams GROUP BY id, g),
df AS (SELECT g, CAST(count(DISTINCT id) AS DOUBLE) AS df FROM grams GROUP BY g),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM docs),
w AS (
    SELECT tf.id, tf.g, tf.tf * (ln((1 + n.n) / (1 + df.df)) + 1) AS w
    FROM tf JOIN df ON tf.g = df.g CROSS JOIN n
),
norms AS (SELECT id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY id),
wn AS (SELECT w.id, w.g, w.w / norms.nrm AS w FROM w JOIN norms ON w.id = norms.id),
sims AS (
    SELECT a.id AS left_id, b.id AS right_id, sum(a.w * b.w) AS sim
    FROM wn a JOIN wn b ON a.g = b.g
    GROUP BY a.id, b.id
)
"""


def _round(arr, ndigits: int):
    """DuckDB-compatible round: ties away from zero (Arrow defaults to
    half-to-even, which diverges from the SQL oracle on .xxx5 boundaries)."""
    import pyarrow.compute as pc

    return pc.round(arr, ndigits=ndigits, round_mode="half_towards_infinity")


def _docs_ds(sf_dir: str, table: str, id_col: str, text_col: str):
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=[id_col, text_col])
    return ds.map_batches(
        lambda t: pa.table(
            {"row_idx": t[id_col].cast(pa.int64()), "text": t[text_col]}
        ),
        batch_format="pyarrow",
    )


def _cfg(**kw):
    from string_grouper_ray.config import EngineConfig

    # sf-scale correctness runs: stateless tasks (no actor-pool spin-up per
    # stage). The bench/scale paths construct their own configs.
    kw.setdefault("use_actor_pools", False)
    return EngineConfig(**kw)


# --------------------------------------------------------------------------
# query implementations
# --------------------------------------------------------------------------


def _q_match_strings_part(sf_dir: str, strategy: str = "exact"):
    from string_grouper_ray.pipelines.match import match_edges

    ds = _docs_ds(sf_dir, "part", "p_partkey", "p_name")
    cfg = _cfg(strategy=strategy, min_similarity=0.8, max_n_matches=None,
               force_symmetries=False)
    edges, _ = match_edges(ds, None, cfg)

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "left_id": t["left_idx"],
                "right_id": t["right_idx"],
                "similarity": _round(t["similarity"], 4),
            }
        )

    return edges.map_batches(finish, batch_format="pyarrow")


def _q_group_part(sf_dir: str):
    """group_similar_strings semantics on p_name: (id, rep_id)."""
    from string_grouper_ray.pipelines.cluster import group_assignments

    ds = _docs_ds(sf_dir, "part", "p_partkey", "p_name")
    cfg = _cfg(min_similarity=0.8, max_n_matches=None)
    out = group_assignments(ds, cfg)
    return out.map_batches(
        lambda t: pa.table({"id": t["row_idx"], "rep_id": t["group_rep_idx"]}),
        batch_format="pyarrow",
    )


def _q_nearest_part(sf_dir: str):
    """match_most_similar semantics (J4, reference string_grouper.py:783-849):
    master = even p_partkeys, duplicates = odd; per dupe the max-sim master
    above threshold (ties -> min master id), unmatched dupes keep themselves."""
    import pyarrow.compute as pc

    from string_grouper_ray.pipelines.match import match_edges
    from string_grouper_ray.pipelines.nearest import nearest_join

    ds = _docs_ds(sf_dir, "part", "p_partkey", "p_name")
    master = ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["row_idx"], 1), 0)),
        batch_format="pyarrow",
    )
    dupes = ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["row_idx"], 1), 1)),
        batch_format="pyarrow",
    )
    cfg = _cfg(min_similarity=0.8, max_n_matches=None, force_symmetries=False)
    edges, _ = match_edges(master, dupes, cfg)
    out = nearest_join(dupes, master, edges, cfg)

    def finish(t: pa.Table) -> pa.Table:
        sim = pc.coalesce(_round(t["similarity"], 4), pa.scalar(-1.0, pa.float64()))
        return pa.table(
            {
                "id": t["row_idx"],
                "most_similar_id": t["most_similar_idx"],
                "similarity": sim,
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def _q_pairwise_part(sf_dir: str):
    """compute_pairwise_similarities(p_name, p_type) row-aligned."""
    import ray.data

    from string_grouper_ray.pipelines.pairwise import pairwise_similarities

    raw = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                                columns=["p_partkey", "p_name", "p_type"])
    left = raw.map_batches(
        lambda t: pa.table({"row_idx": t["p_partkey"].cast(pa.int64()), "text": t["p_name"]}),
        batch_format="pyarrow",
    )
    right = raw.map_batches(
        lambda t: pa.table({"row_idx": t["p_partkey"].cast(pa.int64()), "text": t["p_type"]}),
        batch_format="pyarrow",
    )
    out = pairwise_similarities(left, right, _cfg())

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {"id": t["row_idx"], "similarity": _round(t["similarity"], 4)}
        )

    return out.map_batches(finish, batch_format="pyarrow")


def _q_containment_part(sf_dir: str):
    """Prefix-containment pass over part names UNION deterministic
    truncations (every 10th part, first ceil(0.7·len) chars) — the base
    table has no prefix dupes, so the truncations make the oracle assert
    real containment edges instead of 0 == 0."""
    from string_grouper_ray.stages.suffixstage import containment_edges

    ds = _docs_ds(sf_dir, "part", "p_partkey", "p_name")

    def with_truncations(t: pa.Table) -> pa.Table:
        ids = t["row_idx"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        add_ids, add_txt = [], []
        for i, s in zip(ids.tolist(), texts):
            if i % 10 == 0:
                add_ids.append(i + 1_000_000)
                add_txt.append(s[: (7 * len(s) + 9) // 10])
        return pa.table(
            {
                "row_idx": pa.array(list(ids) + add_ids, type=pa.int64()),
                "text": pa.array(texts + add_txt, type=pa.string()),
            }
        )

    ds = ds.map_batches(with_truncations, batch_format="pyarrow")
    out = containment_edges(ds, _cfg(), "text", min_len=6)
    df = out.to_pandas()
    # stable schema even when no containment pairs exist
    return pa.table(
        {
            "left_id": pa.array(df.get("left_idx", []), type=pa.int64()),
            "right_id": pa.array(df.get("right_idx", []), type=pa.int64()),
        }
    )


def _q_substring_part(sf_dir: str):
    """MID-STRING substring containment (the full suffix-array pass of the
    north rule) over part names UNION deterministic interior extractions
    (every 10th part: raw chars [3, 3+ceil(0.75·len)) — NOT a prefix, so
    the prefix pass alone would miss these). The oracle is the brute
    ``strpos`` closure with the identical length/ratio predicates over the
    same normalized strings."""
    from string_grouper_ray.stages.suffixstage import substring_containment_edges

    ds = _docs_ds(sf_dir, "part", "p_partkey", "p_name")

    def with_extractions(t: pa.Table) -> pa.Table:
        ids = t["row_idx"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        add_ids, add_txt = [], []
        for i, s in zip(ids.tolist(), texts):
            if i % 10 == 0:
                # SQL substring(t, 3, ceil(0.75*len)) is 1-based: chars [2, 2+k)
                k = -(-3 * len(s) // 4)
                add_ids.append(i + 1_000_000)
                add_txt.append(s[2 : 2 + k])
        return pa.table(
            {
                "row_idx": pa.array(list(ids) + add_ids, type=pa.int64()),
                "text": pa.array(texts + add_txt, type=pa.string()),
            }
        )

    ds = ds.map_batches(with_extractions, batch_format="pyarrow")
    out = substring_containment_edges(ds, _cfg(), "text", min_len=6)
    df = out.to_pandas()
    return pa.table(
        {
            "left_id": pa.array(df.get("left_idx", []), type=pa.int64()),
            "right_id": pa.array(df.get("right_idx", []), type=pa.int64()),
        }
    )


def _q_dedup_exact_docs(sf_dir: str):
    import ray.data

    from string_grouper_ray.pipelines.dedup import exact_dedup

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return exact_dedup(ds, "doc_id", "text")


def _q_dedup_minhash_docs(sf_dir: str):
    """MinHash+LSH near-dedup, run in its exact configuration so the DuckDB
    oracle can hash-check the whole sketch pipeline: ``lsh_bands=num_perm``
    (rows_per_band=1) makes any pair sharing ONE of 128 minhashes a
    candidate — P(miss | J >= 0.7) = (1-J)^128 <= 1e-67, zero in practice —
    and the true-Jaccard verify then makes the surviving edge set exactly
    {pairs: J(distinct normalized 3-grams) >= 0.7}, which SQL computes
    directly (clusters = connected components, min-id labels). Caveat: docs
    whose normalized text is shorter than 3 chars share the sentinel
    signature and would cluster in the pipeline but not the oracle; the sf
    fixtures contain none (checked at sf 0.001/0.01/0.1)."""
    import ray.data

    from string_grouper_ray.pipelines.dedup import minhash_dedup

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # prefilter at 52/128 matching minhashes (est J >= 0.41): keeps the
    # provable recall (P[drop | J>=0.7] ~ 7e-14 per pair) while the verify
    # joins skip the sub-threshold noise the 1-row bands admit
    return minhash_dedup(
        ds, "doc_id", "text", jaccard_threshold=0.7,
        config=_cfg(lsh_bands=128), prefilter_min_band_matches=52,
    )


def _q_dedup_minhash_docs_prod(sf_dir: str):
    """The production MinHash config (32 bands x 4 rows): sub-threshold
    pairs rarely become candidates (P = 1-(1-J^4)^32, ~0.3% at J=0.1), so
    candidate volume stays near-linear on vocabulary-sharing corpora where
    the exact-recall gate config above goes quadratic.

    Oracle: the SAME exact-Jaccard cluster closure as the exact-recall twin
    — valid because (a) precision is structural (every emitted edge passes
    the true-Jaccard >= 0.7 verify, so prod clusters always REFINE the exact
    closure), and (b) on the sf fixtures recall is deterministic-complete:
    every true pair has J >= 0.90 (measured; nothing in [0.6, 0.9)), where
    the 32x4 banding detects with P >= 1 - 1.4e-15 per pair, and the seeded
    signatures make the outcome a fixed fact of the fixture, hash-checked
    here. Gray-zone behavior (pairs near the S-curve midpoint) is
    quantitatively pytest-gated instead: recall >= 0.99 / precision == 1 vs
    the exact closure on a fixture WITH borderline pairs
    (tests/test_training_ops.py::test_minhash_prod_recall_precision_vs_exact)."""
    import ray.data

    from string_grouper_ray.pipelines.dedup import minhash_dedup

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return minhash_dedup(ds, "doc_id", "text", jaccard_threshold=0.7, config=_cfg())


def _q_dedup_simhash_docs(sf_dir: str):
    """SimHash near-dedup. Deterministically SQL-checkable with NO config
    tricks: hamming(sig_a, sig_b) <= 3 over a 4x16-bit banding has provable
    recall 1.0 (pigeonhole — 3 bit errors leave >= 1 band untouched), and the
    64-bit signature itself is pure arithmetic over the FNV-64 hashes of the
    distinct normalized 3-grams, which DuckDB reproduces bit-exactly
    (HUGEINT modular FNV + per-bit majority votes)."""
    import ray.data

    from string_grouper_ray.pipelines.dedup import simhash_dedup

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_dedup(ds, "doc_id", "text", max_hamming=3, config=_cfg())


def _q_jaccard_part(sf_dir: str):
    import ray.data

    from string_grouper_ray.pipelines.dedup import ngram_jaccard_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"])
    out = ngram_jaccard_pairs(ds, "p_partkey", "p_name", threshold=0.5)

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "left_id": t["left_id"],
                "right_id": t["right_id"],
                "jaccard": _round(t["jaccard"], 4),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def _q_ann_topk(sf_dir: str):
    import ray.data

    from string_grouper_ray.pipelines.ann import knn_brute_force

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    queries = ds.filter(lambda row: row["vec_id"] < 8)
    out = knn_brute_force(ds, queries, k=10, config=_cfg())

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "query_id": t["query_id"],
                "vec_id": t["vec_id"],
                "cosine": _round(t["cosine"], 4),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def _q_ann_topk_ivf(sf_dir: str):
    """IVF path in its exact configuration (n_probe == n_list probes every
    inverted list): identical results to brute force, so the same DuckDB
    oracle hash-checks the whole coarse-quantizer + probe machinery."""
    import ray.data

    from string_grouper_ray.pipelines.ann import knn_ivf

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    queries = ds.filter(lambda row: row["vec_id"] < 8)
    out = knn_ivf(ds, queries, k=10, n_list=16, n_probe=16, config=_cfg())

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "query_id": t["query_id"],
                "vec_id": t["vec_id"],
                "cosine": _round(t["cosine"], 4),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def _q_embedding_neardup(sf_dir: str):

    import ray.data

    from string_grouper_ray.pipelines.ann import embedding_near_dup_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    # the synthetic embeddings have no >0.99 pairs; 0.3 exercises the operator
    out = embedding_near_dup_pairs(ds, threshold=0.3, config=_cfg())
    df = out.to_pandas()
    return pa.table(
        {
            "left_id": pa.array(df.get("left_id", []), type=pa.int64()),
            "right_id": pa.array(df.get("right_id", []), type=pa.int64()),
        }
    )


def _q_token_counts(sf_dir: str):
    import ray.data

    from string_grouper_ray.pipelines.textstats import token_counts

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = token_counts(ds)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "n_tokens": t["n_tokens"]}),
        batch_format="pyarrow",
    )


def _q_token_counts_bpe(sf_dir: str):
    import ray.data

    from string_grouper_ray.pipelines.textstats import token_counts

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = token_counts(ds)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "n_bpe_tokens": t["n_bpe_tokens"]}),
        batch_format="pyarrow",
    )


def _q_quality(sf_dir: str):
    import ray.data

    from string_grouper_ray.pipelines.textstats import quality_scores

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = quality_scores(ds)

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars_q": t["n_chars_q"],
                "punct_ratio": _round(t["punct_ratio"], 4),
                "digit_ratio": _round(t["digit_ratio"], 4),
                "stopword_ratio": _round(t["stopword_ratio"], 4),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def _q_lang_id(sf_dir: str):
    import ray.data

    from string_grouper_ray.pipelines.textstats import lang_id

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = lang_id(ds)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "lang_pred": t["lang_pred"]}),
        batch_format="pyarrow",
    )


def _q_fingerprint(sf_dir: str):
    import ray.data

    from string_grouper_ray.pipelines.textstats import fingerprints

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = fingerprints(ds)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "fingerprint": t["fingerprint"]}),
        batch_format="pyarrow",
    )


def _q_regroup_events(sf_dir: str):
    """group-rep by earliest timestamp (U3) applied to events/user_id."""
    import ray.data

    from string_grouper_ray.regroup import group_rep_by_weight_ds

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])
    out = group_rep_by_weight_ds(
        ds, group_col="user_id", record_id_col="event_id", weight_col="ts",
        minimize=True, tie_col="event_id",
    )
    return out.map_batches(
        lambda t: pa.table(
            {"user_id": t["user_id"].cast(pa.int64()),
             "rep_event_id": t["rep_event_id"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )


def _q_audio_features(sf_dir: str):
    """Multimodal decode+feature stage over the SQL-expressible tone table
    (sources/synth.tone_clip_table — integer sawtooth PCM, no RNG): every
    WAV payload's samples are reproduced bit-exactly by the DuckDB oracle,
    which recomputes duration/RMS/peak/silence/ZCR from the same integer
    formula. The decode path (WAV container parse → float PCM) is thereby
    hash-gated end to end."""
    import ray.data

    from string_grouper_ray.pipelines.multimodal import audio_features
    from string_grouper_ray.sources.synth import tone_clip_table

    ds = ray.data.from_arrow(tone_clip_table(200))
    out = audio_features(ds, _cfg(use_actor_pools=False))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "clip_id": t["clip_id"],
                "true_dur_ms": _round(t["true_dur_ms"], 1),
                "rms": _round(t["rms"], 4),
                "peak": _round(t["peak"], 4),
                "silence_ratio": _round(t["silence_ratio"], 4),
                "zcr": _round(t["zcr"], 4),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def _q_audio_resample(sf_dir: str):
    """Windowed-sinc resample stage (pipelines/multimodal.py Resampler) over
    the tone table; the oracle hash-gates the per-clip decoded OUTPUT LENGTH
    at the target rate (exactly computable in SQL from the resampler's
    length contract). Numeric resample quality is pytest-gated instead
    (tests/test_audio_invariant.py sine-SNR test) — the float convolution
    itself has no bit-exact SQL equivalent."""
    import numpy as np

    import ray.data

    from string_grouper_ray.pipelines.multimodal import resample_audio
    from string_grouper_ray.sources.audio import decode_wav
    from string_grouper_ray.sources.synth import tone_clip_table

    ds = ray.data.from_arrow(tone_clip_table(200))
    out = resample_audio(ds, 8000, _cfg(use_actor_pools=False))

    def finish(t: pa.Table) -> pa.Table:
        ns = np.zeros(len(t), dtype=np.int64)
        for i, (b, c) in enumerate(zip(t["bytes"].to_pylist(), t["codec"].to_pylist())):
            pcm, _sr = decode_wav(b, c)
            ns[i] = len(pcm)
        return pa.table(
            {
                "clip_id": t["clip_id"],
                "sr_hz": t["sr_hz"],
                "n_samples": pa.array(ns),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def _q_frame_sample(sf_dir: str):
    """Video frame-sampling stage (pipelines/multimodal.py FrameSampler)
    over the SQL-expressible linear-pixel rawv1 table (sources/video.py
    linear_video) — one row per sampled frame with the frame's exact integer
    pixel sum, reproduced bit-identically by the DuckDB oracle (integer
    arithmetic only; no float rounding ambiguity)."""
    import numpy as np

    import ray.data

    from string_grouper_ray.pipelines.multimodal import sample_frames
    from string_grouper_ray.sources.video import linear_video

    n = 64
    table = pa.table(
        {
            "clip_id": pa.array(np.arange(n, dtype=np.int64)),
            "bytes": pa.array(
                [linear_video(i, n_frames=48 + (i % 5)) for i in range(n)],
                type=pa.binary(),
            ),
            "codec": pa.array(["rawv1"] * n),
        }
    )
    ds = ray.data.from_arrow(table)
    out = sample_frames(ds, every_n_frames=12, config=_cfg(use_actor_pools=False))

    def finish(t: pa.Table) -> pa.Table:
        sums = np.zeros(len(t), dtype=np.int64)
        for i, fb in enumerate(t["frame_bytes"].to_pylist()):
            sums[i] = int(np.frombuffer(fb, dtype=np.uint8).astype(np.int64).sum())
        return pa.table(
            {
                "clip_id": t["clip_id"],
                "frame_idx": t["frame_idx"].cast(pa.int64()),
                "width": t["width"].cast(pa.int64()),
                "height": t["height"].cast(pa.int64()),
                "pix_sum": pa.array(sums),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def _q_frame_pipeline(sf_dir: str):
    """Full video-frame chain: sample → bilinear resize 32×32→16×16 → grid
    mean-RGB features. The 2× downscale makes every bilinear weight exactly
    0.25, so each resized pixel is round-half-even(sum-of-4 / 4) — pure
    integer arithmetic the DuckDB oracle reproduces bit-exactly. Output:
    per frame, the integer pixel sum of the feature vector
    (feat_px_sum = Σ grid-cell-means × 16 = Σ resized pixels)."""
    import numpy as np

    import ray.data

    from string_grouper_ray.pipelines.multimodal import (
        frame_features,
        resize_frames,
        sample_frames,
    )
    from string_grouper_ray.sources.video import linear_video

    n = 48
    table = pa.table(
        {
            "clip_id": pa.array(np.arange(n, dtype=np.int64)),
            "bytes": pa.array(
                [linear_video(i, n_frames=36, w=32, h=32) for i in range(n)],
                type=pa.binary(),
            ),
            "codec": pa.array(["rawv1"] * n),
        }
    )
    cfg = _cfg(use_actor_pools=False)
    frames = sample_frames(ray.data.from_arrow(table), every_n_frames=12, config=cfg)
    feats = frame_features(resize_frames(frames, 16, 16, cfg), grid=4, config=cfg)

    def finish(t: pa.Table) -> pa.Table:
        # Σ(48-dim cell-mean vector) × 16 == Σ resized pixels — exact in
        # float64 (all cell means are dyadic rationals k/16 with k ≤ 4080)
        s = np.array(
            [int(round(float(np.sum(f)) * 16)) for f in t["frame_feat"].to_pylist()],
            dtype=np.int64,
        )
        return pa.table(
            {
                "clip_id": t["clip_id"],
                "frame_idx": t["frame_idx"].cast(pa.int64()),
                "feat_px_sum": pa.array(s),
            }
        )

    return feats.map_batches(finish, batch_format="pyarrow")


def _q_audio_fingerprint_dedup(sf_dir: str):
    """Acoustic (payload-level) exact-dedup over the tone table with
    ``param_mod=120``: clips i and i+120 are bit-identical waveforms under
    distinct ids and EMPTY transcripts, so transcript-level dedup cannot
    separate them — the energy-contour fingerprint does. The fingerprint
    is pure integer arithmetic over formula-generated samples, so the
    DuckDB oracle recomputes it bit-exactly from the same formula;
    quantization-boundary collisions (8 of 120 classes merge at
    bucket=64) reproduce identically on both sides."""
    import ray.data

    from string_grouper_ray.pipelines.multimodal import audio_fingerprint_dedup
    from string_grouper_ray.sources.synth import tone_clip_table

    ds = ray.data.from_arrow(tone_clip_table(200, param_mod=120))
    return audio_fingerprint_dedup(ds, _cfg(use_actor_pools=False))


def _q_audio_contour_neardup(sf_dir: str):
    """Acoustic NEAR-dup over the plain tone table: clips cluster when
    their integer energy contours sit within Chebyshev distance 5000
    (same-slope, near-phase sawtooths land inside it; measured fixture
    pair distances span 288..218k, 31 pairs ≤ 5000). No float arithmetic
    anywhere — the SQL oracle recomputes the window sums from the formula
    and takes the identical pairwise closure, so recall/precision are
    structural (shifted-grid banding + in-bucket exact verify), not
    statistical."""
    import ray.data

    from string_grouper_ray.pipelines.multimodal import audio_contour_neardup
    from string_grouper_ray.sources.synth import tone_clip_table

    t = tone_clip_table(200)
    t = t.append_column("clip_idx", pa.array(np.arange(200, dtype=np.int64)))
    out = audio_contour_neardup(
        ray.data.from_arrow(t), tol=5000, config=_cfg(use_actor_pools=False)
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "clip_idx": b["clip_idx"].cast(pa.int64()),
                "cluster_id": b["cluster_id"].cast(pa.int64()),
                "keep": b["keep"],
            }
        ),
        batch_format="pyarrow",
    )


def _q_clip_crossmodal_dedup(sf_dir: str):
    """Cross-modal entity resolution over audio+transcript pairs: the
    tone fixture with ``param_mod=120`` (acoustic classes ``i % 120``,
    plus the 8 quantization-boundary merges) and ``text_mod=90`` (text
    classes ``i % 90`` under three surface variants that all normalize
    equal). Edges = same-normalized-transcript OR same-acoustic-
    fingerprint; clusters = transitive closure of the union, so chains
    like ``0 ~ 90 ~ 180`` (text) crossing ``0 ~ 120`` (audio) merge —
    the policy neither single-modality dedup can express. Both keys are
    pure integer/string functions of ``i``, so the DuckDB oracle
    recomputes the identical closure."""
    import ray.data

    from string_grouper_ray.pipelines.multimodal import crossmodal_dedup
    from string_grouper_ray.sources.synth import tone_clip_table

    t = tone_clip_table(200, param_mod=120, text_mod=90)
    t = t.append_column("clip_idx", pa.array(np.arange(200, dtype=np.int64)))
    out = crossmodal_dedup(
        ray.data.from_arrow(t), _cfg(use_actor_pools=False)
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "clip_idx": b["clip_idx"].cast(pa.int64()),
                "cluster_id": b["cluster_id"].cast(pa.int64()),
                "keep": b["keep"],
            }
        ),
        batch_format="pyarrow",
    )


def _q_vad_segments(sf_dir: str):
    """Energy-gated VAD segmentation over the GATED tone fixture
    (``gate_samples=800``: every third 800-sample window silenced, so each
    clip alternates 100 ms speech / 50 ms silence). A frame (400 samples,
    25 ms) is active iff ``sum(|int16|) >= 64*400`` — a pure integer
    predicate over formula samples — and maximal active runs become
    segment rows, so the DuckDB oracle reproduces the exact row set with
    a gaps-and-islands closure (row_number difference grouping)."""
    import ray.data

    from string_grouper_ray.pipelines.multimodal import vad_segments
    from string_grouper_ray.sources.synth import tone_clip_table

    ds = ray.data.from_arrow(tone_clip_table(200, gate_samples=800))
    return vad_segments(ds, _cfg(use_actor_pools=False))


def _q_slice_segments(sf_dir: str):
    """Silence-trim slicing over the gated tone fixture: one output CLIP
    per VAD-active segment. The gate verifies the sliced PAYLOAD itself,
    not just boundaries — each output WAV is decoded back and projected
    to integers (sample count + sum of |int16|), which the SQL oracle
    recomputes from the formula over the same active frame ranges; any
    mis-slice (offset, length, sample corruption) breaks the sums."""
    import ray.data

    from string_grouper_ray.pipelines.multimodal import slice_segments
    from string_grouper_ray.sources.audio import decode_wav
    from string_grouper_ray.sources.synth import tone_clip_table

    ds = ray.data.from_arrow(tone_clip_table(200, gate_samples=800))
    out = slice_segments(ds, _cfg(use_actor_pools=False))

    def finish(t: pa.Table) -> pa.Table:
        n_samp, abs_sum = [], []
        for data, codec in zip(t["bytes"].to_pylist(), t["codec"].to_pylist()):
            pcm, _sr = decode_wav(data, codec)
            ints = np.abs(np.rint(pcm * 32767.0).astype(np.int64))
            n_samp.append(len(ints))
            abs_sum.append(int(ints.sum()))
        return pa.table(
            {
                "clip_id": t["clip_id"],
                "seg_idx": t["seg_idx"],
                "n_samples": pa.array(np.asarray(n_samp, dtype=np.int64)),
                "abs_sum": pa.array(np.asarray(abs_sum, dtype=np.int64)),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def _q_speech_rate(sf_dir: str):
    """Chars-per-active-second over the gated tone fixture with
    transcripts: active duration is the integer VAD frame count × 25 ms
    (recomputed in SQL from the formula), normalized transcript length is
    the pure function of the template (19 chars for every variant), and
    the division + 4-dp round is bit-identical IEEE double on both
    sides."""
    import ray.data

    from string_grouper_ray.pipelines.multimodal import speech_rate
    from string_grouper_ray.sources.synth import tone_clip_table

    ds = ray.data.from_arrow(
        tone_clip_table(200, gate_samples=800, text_mod=90)
    )
    out = speech_rate(ds, _cfg(use_actor_pools=False))
    return out.map_batches(
        lambda t: pa.table(
            {
                "clip_id": t["clip_id"],
                "active_ms": t["active_ms"],
                "n_chars": t["n_chars"],
                "chars_per_sec": _round(t["chars_per_sec"], 4),
            }
        ),
        batch_format="pyarrow",
    )


def entry() -> Any:
    """Flagship: near-dup clustering of the sf0.001 documents table."""
    from string_grouper_ray.pipelines.cluster import group_assignments

    sf_dir = "/root/testdata/sf0.001"
    ds = _docs_ds(sf_dir, "documents", "doc_id", "text")
    cfg = _cfg(strategy="lsh", min_similarity=0.8, max_n_matches=None)
    out = group_assignments(ds, cfg)
    return out.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["row_idx"],
                "group_id": t["group_id"],
                "group_rep_id": t["group_rep_idx"],
            }
        ),
        batch_format="pyarrow",
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "match_strings_part": lambda sf: _q_match_strings_part(sf, "exact"),
        "match_strings_part_lsh": lambda sf: _q_match_strings_part(sf, "lsh"),
        "group_part": _q_group_part,
        "nearest_part": _q_nearest_part,
        "pairwise_part": _q_pairwise_part,
        "containment_part": _q_containment_part,
        "dedup_exact_docs": _q_dedup_exact_docs,
        "dedup_minhash_docs": _q_dedup_minhash_docs,
        "dedup_minhash_docs_prod": _q_dedup_minhash_docs_prod,
        "dedup_simhash_docs": _q_dedup_simhash_docs,
        "jaccard_part": _q_jaccard_part,
        "ann_topk": _q_ann_topk,
        "ann_topk_ivf": _q_ann_topk_ivf,
        "embedding_neardup": _q_embedding_neardup,
        "token_counts_docs": _q_token_counts,
        "token_counts_bpe_docs": _q_token_counts_bpe,
        "quality_docs": _q_quality,
        "lang_id_docs": _q_lang_id,
        "fingerprint_docs": _q_fingerprint,
        "regroup_events": _q_regroup_events,
        "audio_features": _q_audio_features,
        "audio_resample": _q_audio_resample,
        "frame_sample": _q_frame_sample,
        "frame_pipeline": _q_frame_pipeline,
        "audio_fingerprint_dedup": _q_audio_fingerprint_dedup,
        "audio_contour_neardup": _q_audio_contour_neardup,
        "clip_crossmodal_dedup": _q_clip_crossmodal_dedup,
        "vad_segments": _q_vad_segments,
        "substring_part": _q_substring_part,
        "slice_segments": _q_slice_segments,
        "speech_rate": _q_speech_rate,
    }


def oracle_sql() -> dict[str, str]:
    part_tfidf = _TFIDF_CTE.format(
        id="p_partkey", table="part", norm=_NORM_SQL.format(col="p_name")
    )
    match_sql = (
        part_tfidf
        + """
SELECT left_id, right_id, round(sim, 4) AS similarity
FROM sims WHERE sim >= 0.8
"""
    )
    group_sql = (
        part_tfidf
        + """
, edges AS (
    SELECT left_id, right_id,
           CASE WHEN left_id = right_id THEN 1.0 ELSE sim END AS sim
    FROM sims WHERE sim >= 0.8
),
reach(id, r) AS (
    SELECT id, id FROM docs
    UNION
    SELECT e.right_id, reach.r FROM reach JOIN edges e ON e.left_id = reach.id
),
comp AS (SELECT id, min(r) AS comp_id FROM reach GROUP BY id),
wts AS (SELECT left_id AS id, sum(sim) AS wt FROM edges GROUP BY left_id),
members AS (
    SELECT comp.id, comp.comp_id, coalesce(wts.wt, 0.0) AS wt
    FROM comp LEFT JOIN wts ON comp.id = wts.id
),
reps AS (
    SELECT comp_id, id AS rep_id
    FROM members
    QUALIFY row_number() OVER (PARTITION BY comp_id ORDER BY round(wt, 9) DESC, id) = 1
)
SELECT m.id AS id, r.rep_id AS rep_id
FROM members m JOIN reps r ON m.comp_id = r.comp_id
"""
    )
    # recursive CTEs need the RECURSIVE keyword up front
    group_sql = group_sql.replace("WITH docs AS", "WITH RECURSIVE docs AS", 1)

    nearest_sql = r"""
WITH sides AS (
    SELECT p_partkey AS id, p_partkey % 2 AS side,
           regexp_replace(lower(p_name), '[,-./\s]', '', 'g') AS s FROM part
),
grams AS (
    SELECT id, side, substring(s, CAST(u AS INTEGER), 3) AS g
    FROM (SELECT id, side, s, unnest(generate_series(1, length(s) - 2)) AS u
          FROM sides WHERE length(s) >= 3)
),
tf AS (SELECT id, side, g, CAST(count(*) AS DOUBLE) AS tf FROM grams GROUP BY id, side, g),
df AS (SELECT g, CAST(count(DISTINCT id) AS DOUBLE) AS df FROM grams GROUP BY g),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM sides),
w AS (
    SELECT tf.id, tf.side, tf.g, tf.tf * (ln((1 + n.n) / (1 + df.df)) + 1) AS w
    FROM tf JOIN df ON tf.g = df.g CROSS JOIN n
),
norms AS (SELECT id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY id),
wn AS (SELECT w.id, w.side, w.g, w.w / norms.nrm AS w FROM w JOIN norms ON w.id = norms.id),
sims AS (
    SELECT m.id AS m_id, d.id AS d_id, sum(m.w * d.w) AS sim
    FROM wn m JOIN wn d ON m.g = d.g
    WHERE m.side = 0 AND d.side = 1
    GROUP BY m.id, d.id
),
best AS (
    SELECT d_id, m_id, sim FROM sims WHERE sim >= 0.8
    QUALIFY row_number() OVER (PARTITION BY d_id ORDER BY round(sim, 9) DESC, m_id) = 1
)
SELECT s.id AS id,
       coalesce(b.m_id, s.id) AS most_similar_id,
       coalesce(round(b.sim, 4), -1.0) AS similarity
FROM sides s LEFT JOIN best b ON s.id = b.d_id
WHERE s.side = 1
"""

    pairwise_sql = r"""
WITH sides AS (
    SELECT p_partkey AS id, 0 AS side,
           regexp_replace(lower(p_name), '[,-./\s]', '', 'g') AS s FROM part
    UNION ALL
    SELECT p_partkey AS id, 1 AS side,
           regexp_replace(lower(p_type), '[,-./\s]', '', 'g') AS s FROM part
),
grams AS (
    SELECT id, side, substring(s, CAST(u AS INTEGER), 3) AS g
    FROM (SELECT id, side, s, unnest(generate_series(1, length(s) - 2)) AS u
          FROM sides WHERE length(s) >= 3)
),
tf AS (SELECT id, side, g, CAST(count(*) AS DOUBLE) AS tf FROM grams GROUP BY id, side, g),
df AS (SELECT g, CAST(count(DISTINCT (id, side)) AS DOUBLE) AS df FROM grams GROUP BY g),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM sides),
w AS (
    SELECT tf.id, tf.side, tf.g, tf.tf * (ln((1 + n.n) / (1 + df.df)) + 1) AS w
    FROM tf JOIN df ON tf.g = df.g CROSS JOIN n
),
norms AS (SELECT id, side, sqrt(sum(w * w)) AS nrm FROM w GROUP BY id, side),
wn AS (
    SELECT w.id, w.side, w.g, w.w / norms.nrm AS w
    FROM w JOIN norms ON w.id = norms.id AND w.side = norms.side
),
dots AS (
    SELECT a.id, sum(a.w * b.w) AS sim
    FROM wn a JOIN wn b ON a.g = b.g AND a.id = b.id
    WHERE a.side = 0 AND b.side = 1
    GROUP BY a.id
)
SELECT p.p_partkey AS id, round(coalesce(d.sim, 0.0), 4) AS similarity
FROM part p LEFT JOIN dots d ON p.p_partkey = d.id
"""

    substring_sql = r"""
WITH docs0 AS (
    SELECT p_partkey AS id, p_name AS t FROM part
    UNION ALL
    SELECT p_partkey + 1000000 AS id,
           substring(p_name, 3, CAST(ceil(0.75 * length(p_name)) AS INTEGER)) AS t
    FROM part WHERE p_partkey % 10 = 0
),
docs AS (
    SELECT id, regexp_replace(lower(t), '[,-./\s]', '', 'g') AS s FROM docs0
)
SELECT DISTINCT least(a.id, b.id) AS left_id, greatest(a.id, b.id) AS right_id
FROM docs a JOIN docs b
  ON a.id <> b.id
 AND length(a.s) >= 6 AND length(b.s) > length(a.s)
 AND length(a.s) >= 0.6 * length(b.s)
 AND strpos(b.s, a.s) > 0
"""

    containment_sql = r"""
WITH docs0 AS (
    SELECT p_partkey AS id, p_name AS t FROM part
    UNION ALL
    SELECT p_partkey + 1000000 AS id,
           substring(p_name, 1, CAST(ceil(0.7 * length(p_name)) AS INTEGER)) AS t
    FROM part WHERE p_partkey % 10 = 0
),
docs AS (
    SELECT id, regexp_replace(lower(t), '[,-./\s]', '', 'g') AS s FROM docs0
)
SELECT DISTINCT least(a.id, b.id) AS left_id, greatest(a.id, b.id) AS right_id
FROM docs a JOIN docs b
  ON a.id <> b.id
 AND starts_with(b.s, a.s) AND length(b.s) > length(a.s) AND length(a.s) >= 6
 AND length(a.s) >= 0.6 * length(b.s)
"""

    jaccard_sql = r"""
WITH grams AS (
    SELECT DISTINCT id, substring(s, CAST(u AS INTEGER), 3) AS g
    FROM (SELECT p_partkey AS id, p_name AS s,
                 unnest(generate_series(1, length(p_name) - 2)) AS u
          FROM part WHERE length(p_name) >= 3)
),
sizes AS (SELECT id, count(*) AS sz FROM grams GROUP BY id),
inter AS (
    SELECT a.id AS l, b.id AS r, count(*) AS shared
    FROM grams a JOIN grams b ON a.g = b.g AND a.id < b.id
    GROUP BY a.id, b.id
),
jac AS (
    SELECT l, r, CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) AS j
    FROM inter JOIN sizes sa ON inter.l = sa.id JOIN sizes sb ON inter.r = sb.id
)
SELECT l AS left_id, r AS right_id, round(j, 4) AS jaccard FROM jac WHERE j >= 0.5
"""

    # clusters = CC over {pairs: true Jaccard of distinct normalized 3-grams
    # >= 0.7}; equals the pipeline's output because the rows_per_band=1 LSH
    # has recall 1.0 at this threshold (see _q_dedup_minhash_docs docstring)
    # ASCII-ONLY ASSUMPTION (this SQL and simhash_sql below, like the <3-char
    # sentinel caveat): the pipeline normalizes NFKD→ASCII-ignore
    # (normalize_to_ascii=True) and FNV-hashes UTF-8 BYTES, while these
    # oracles normalize with lower+regexp_replace only and hash per-character
    # ascii() codepoints — equivalent iff documents.text is pure ASCII.
    # tests/test_fixture_assumptions.py asserts that on the fixture so the
    # gate fails loudly if the generator ever emits non-ASCII text.
    minhash_sql = r"""
WITH RECURSIVE docs AS (
    SELECT doc_id AS id, regexp_replace(lower(text), '[,-./\s]', '', 'g') AS s
    FROM documents
),
grams AS (
    SELECT DISTINCT id, substring(s, CAST(u AS INTEGER), 3) AS g
    FROM (SELECT id, s, unnest(generate_series(1, length(s) - 2)) AS u
          FROM docs WHERE length(s) >= 3)
),
sizes AS (SELECT id, count(*) AS sz FROM grams GROUP BY id),
inter AS (
    SELECT a.id AS l, b.id AS r, count(*) AS shared
    FROM grams a JOIN grams b ON a.g = b.g AND a.id < b.id
    GROUP BY a.id, b.id
),
edges0 AS (
    SELECT l, r
    FROM inter JOIN sizes sa ON inter.l = sa.id JOIN sizes sb ON inter.r = sb.id
    WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.7
),
edges AS (SELECT l, r FROM edges0 UNION ALL SELECT r AS l, l AS r FROM edges0),
reach(id, rr) AS (
    SELECT id, id FROM docs
    UNION
    SELECT e.r, reach.rr FROM reach JOIN edges e ON e.l = reach.id
),
comp AS (SELECT id, min(rr) AS comp_id FROM reach GROUP BY id)
SELECT CAST(id AS BIGINT) AS doc_id, CAST(comp_id AS BIGINT) AS cluster_id,
       (id = comp_id) AS keep
FROM comp
"""

    # bit-exact 64-bit SimHash in SQL: FNV-64 of each distinct normalized
    # 3-gram via HUGEINT modular arithmetic, per-bit majority votes, then CC
    # over all pairs at hamming <= 3 (pipeline banding recall 1.0 by
    # pigeonhole; star-collapsed edges have the same transitive closure)
    simhash_sql = r"""
WITH RECURSIVE docs AS (
    SELECT doc_id AS id, regexp_replace(lower(text), '[,-./\s]', '', 'g') AS s
    FROM documents
),
grams AS (
    SELECT DISTINCT id, substring(s, CAST(u AS INTEGER), 3) AS g
    FROM (SELECT id, s, unnest(generate_series(1, length(s) - 2)) AS u
          FROM docs WHERE length(s) >= 3)
),
fnv AS (
    SELECT DISTINCT id, CAST(
      ((xor(((xor(((xor(14695981039346656037::HUGEINT,
          ascii(substring(g,1,1))::HUGEINT)) * 1099511628211::HUGEINT)
          % 18446744073709551616::HUGEINT,
          ascii(substring(g,2,1))::HUGEINT)) * 1099511628211::HUGEINT)
          % 18446744073709551616::HUGEINT,
          ascii(substring(g,3,1))::HUGEINT)) * 1099511628211::HUGEINT)
          % 18446744073709551616::HUGEINT
      AS UBIGINT) AS h
    FROM grams
),
votes AS (
    SELECT id, b, sum(CASE WHEN (h >> b) % 2 = 1 THEN 1 ELSE -1 END) AS v
    FROM fnv CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b)
    GROUP BY id, b
),
sigs AS (
    SELECT id, CAST(sum(CASE WHEN v > 0 THEN (1::HUGEINT << b) ELSE 0 END)
                    % 18446744073709551616::HUGEINT AS UBIGINT) AS sig
    FROM votes GROUP BY id
),
edges0 AS (
    SELECT a.id AS l, b.id AS r
    FROM sigs a JOIN sigs b ON a.id < b.id
    WHERE bit_count(xor(a.sig, b.sig)) <= 3
),
edges AS (SELECT l, r FROM edges0 UNION ALL SELECT r AS l, l AS r FROM edges0),
reach(id, rr) AS (
    SELECT id, id FROM docs
    UNION
    SELECT e.r, reach.rr FROM reach JOIN edges e ON e.l = reach.id
),
comp AS (SELECT id, min(rr) AS comp_id FROM reach GROUP BY id)
SELECT CAST(id AS BIGINT) AS doc_id, CAST(comp_id AS BIGINT) AS cluster_id,
       (id = comp_id) AS keep
FROM comp
"""

    ann_sql = r"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 8)
SELECT q.query_id, e.vec_id,
       round(list_cosine_similarity(q.embedding, e.embedding), 4) AS cosine
FROM q CROSS JOIN embeddings e
QUALIFY row_number() OVER (
    PARTITION BY q.query_id
    ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id
) <= 10
"""

    neardup_sql = r"""
SELECT a.vec_id AS left_id, b.vec_id AS right_id
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
"""

    # --- multimodal oracles: the fixtures are SQL-expressible by design ---
    # tone_clip_table: ints[k] = ((a*k + b) % 24576) - 12288 per clip i with
    # a = 97+2*(i%50), b = (i*997)%24576, n = 3200+640*(i%30) @16 kHz. The
    # WAV decode divides by 32767; every aggregate below recomputes the same
    # doubles (float-sum ORDER differs at ~1e-16 relative — far inside the
    # 4-decimal rounding and the gate's 2e-4 tolerance).
    audio_features_sql = r"""
WITH clips AS (
    SELECT i, 3200 + 640*(i % 30) AS n, 97 + 2*(i % 50) AS a, (i*997) % 24576 AS b
    FROM (SELECT unnest(generate_series(0, 199)) AS i)
),
samples AS (
    SELECT i, n, k,
           CAST(((a * k + b) % 24576) - 12288 AS DOUBLE) / 32767 AS p,
           CAST(((a * greatest(k - 1, 0) + b) % 24576) - 12288 AS DOUBLE) / 32767 AS prev
    FROM (SELECT i, n, a, b, unnest(generate_series(0, n - 1)) AS k FROM clips)
)
SELECT printf('tone-%06d', i) AS clip_id,
       round(n / 16.0, 1) AS true_dur_ms,
       round(sqrt(avg(p * p)), 4) AS rms,
       round(max(abs(p)), 4) AS peak,
       round(avg(CASE WHEN abs(p) < 0.01 THEN 1.0 ELSE 0.0 END), 4) AS silence_ratio,
       round(sum(CASE WHEN k > 0 AND ((p < 0) <> (prev < 0)) THEN 1 ELSE 0 END)
             / CAST(n - 1 AS DOUBLE), 4) AS zcr
FROM samples GROUP BY i, n
"""

    # resampler length contract: n_out = max(1, round(n_in / (sr_in/sr_out)))
    # — at 16k→8k that is exactly n//2 (n is always even here)
    audio_resample_sql = r"""
WITH clips AS (
    SELECT i, 3200 + 640*(i % 30) AS n
    FROM (SELECT unnest(generate_series(0, 199)) AS i)
)
SELECT printf('tone-%06d', i) AS clip_id, 8000 AS sr_hz, n // 2 AS n_samples
FROM clips
"""

    # linear_video pixel: (7i + 3f + 5y + 11x + 13c) % 256 over 32×24 RGB;
    # sampled every 12 frames of n_frames = 48 + (i % 5)
    frame_sample_sql = r"""
WITH clips AS (
    SELECT i, 48 + (i % 5) AS nf FROM (SELECT unnest(generate_series(0, 63)) AS i)
),
frames AS (SELECT i, unnest(generate_series(0, nf - 1, 12)) AS f FROM clips),
px AS (
    SELECT i, f, y, x, unnest([0, 1, 2]) AS c
    FROM (
        SELECT i, f, y, unnest(generate_series(0, 31)) AS x
        FROM (SELECT i, f, unnest(generate_series(0, 23)) AS y FROM frames)
    )
)
SELECT i AS clip_id, CAST(f AS BIGINT) AS frame_idx,
       CAST(32 AS BIGINT) AS width, CAST(24 AS BIGINT) AS height,
       CAST(sum((7*i + 3*f + 5*y + 11*x + 13*c) % 256) AS BIGINT) AS pix_sum
FROM px GROUP BY i, f
"""

    # frame pipeline: 32×32 input, exact 2× bilinear downscale — every
    # output pixel is round-half-even(s/4) of the 4 covered input pixels
    # (integer arithmetic below: q + [r=3] + [r=2 and q odd]); the feature
    # pixel sum is the sum of those resized pixels
    frame_pipeline_sql = r"""
WITH clips AS (SELECT unnest(generate_series(0, 47)) AS i),
frames AS (SELECT i, unnest([0, 12, 24]) AS f FROM clips),
opx AS (
    SELECT i, f, yo, xo, unnest([0, 1, 2]) AS c
    FROM (
        SELECT i, f, yo, unnest(generate_series(0, 15)) AS xo
        FROM (SELECT i, f, unnest(generate_series(0, 15)) AS yo FROM frames)
    )
),
cells AS (
    SELECT i, f,
           ((7*i + 3*f + 5*(2*yo) + 11*(2*xo) + 13*c) % 256
          + (7*i + 3*f + 5*(2*yo) + 11*(2*xo + 1) + 13*c) % 256
          + (7*i + 3*f + 5*(2*yo + 1) + 11*(2*xo) + 13*c) % 256
          + (7*i + 3*f + 5*(2*yo + 1) + 11*(2*xo + 1) + 13*c) % 256) AS s
    FROM opx
),
resized AS (
    SELECT i, f,
           (s // 4) + (CASE WHEN s % 4 = 3 THEN 1
                            WHEN s % 4 = 2 AND (s // 4) % 2 = 1 THEN 1
                            ELSE 0 END) AS v
    FROM cells
)
SELECT i AS clip_id, CAST(f AS BIGINT) AS frame_idx,
       CAST(sum(v) AS BIGINT) AS feat_px_sum
FROM resized GROUP BY i, f
"""

    en = r"\b(the|and|of|to|in|is|that|for|with|was)\b"
    de = r"\b(der|die|das|und|ist|nicht|von|mit|den|ein)\b"
    fr = r"\b(le|la|les|et|est|une|dans|pour|que|des)\b"
    es = r"\b(el|los|las|es|una|para|por|con|del|se)\b"
    lang_sql = f"""
WITH counts AS (
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '{en}')) AS c_en,
           len(regexp_extract_all(lower(text), '{de}')) AS c_de,
           len(regexp_extract_all(lower(text), '{fr}')) AS c_fr,
           len(regexp_extract_all(lower(text), '{es}')) AS c_es
    FROM documents
)
SELECT doc_id,
       CASE
           WHEN c_en = 0 AND c_de = 0 AND c_fr = 0 AND c_es = 0 THEN 'und'
           WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
           WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
           WHEN c_fr >= c_es THEN 'fr'
           ELSE 'es'
       END AS lang_pred
FROM counts
"""

    quality_sql = f"""
SELECT doc_id,
       CAST(length(text) AS DOUBLE) AS n_chars_q,
       round(len(regexp_extract_all(text, '[^\\w\\s]')) /
             greatest(CAST(length(text) AS DOUBLE), 1.0), 4) AS punct_ratio,
       round(len(regexp_extract_all(text, '[0-9]')) /
             greatest(CAST(length(text) AS DOUBLE), 1.0), 4) AS digit_ratio,
       round(len(regexp_extract_all(lower(text), '{en}')) /
             greatest(CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE), 1.0), 4)
           AS stopword_ratio
FROM documents
"""

    return {
        "match_strings_part": match_sql,
        "match_strings_part_lsh": match_sql,
        "group_part": group_sql,
        "nearest_part": nearest_sql,
        "pairwise_part": pairwise_sql,
        "containment_part": containment_sql,
        "substring_part": substring_sql,
        "dedup_exact_docs": "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text",
        "dedup_minhash_docs": minhash_sql,
        # prod config: same closure — precision is structural (true-Jaccard
        # verify) and fixture recall is deterministic-complete (see the
        # _q_dedup_minhash_docs_prod docstring for the argument)
        "dedup_minhash_docs_prod": minhash_sql,
        "dedup_simhash_docs": simhash_sql,
        "jaccard_part": jaccard_sql,
        "ann_topk": ann_sql,
        "ann_topk_ivf": ann_sql,
        "embedding_neardup": neardup_sql,
        "token_counts_docs": (
            "SELECT doc_id, CAST(len(regexp_extract_all(trim(text), '\\S+')) AS BIGINT)"
            " AS n_tokens FROM documents"
        ),
        # the GPT-2-ish token regex evaluates identically under Python re and
        # DuckDB's RE2 (leftmost-first alternation; verified incl.
        # contraction/punctuation torture cases)
        "token_counts_bpe_docs": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, "
            "'''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+'"
            ")) AS BIGINT) AS n_bpe_tokens FROM documents"
        ),
        "quality_docs": quality_sql,
        "lang_id_docs": lang_sql,
        "fingerprint_docs": (
            "SELECT doc_id, md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
            " AS fingerprint FROM documents"
        ),
        "regroup_events": (
            "SELECT user_id, event_id AS rep_event_id FROM events "
            "QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1"
        ),
        "audio_features": audio_features_sql,
        "audio_resample": audio_resample_sql,
        "frame_sample": frame_sample_sql,
        "frame_pipeline": frame_pipeline_sql,
        # acoustic fingerprint dedup: the tone fixture's sawtooth is pure
        # integer arithmetic, so the window |sample| sums — and therefore
        # the quantized fingerprint and its cluster partition — are
        # recomputed bit-exactly from the formula (no table reads)
        "audio_fingerprint_dedup": (
            "WITH clips AS ("
            "  SELECT i, printf('tone-%06d', i) AS clip_id,"
            "         97 + 2*((i % 120) % 50) AS a,"
            "         ((i % 120) * 997) % 24576 AS b"
            "  FROM range(200) t(i)),"
            " sums AS ("
            "  SELECT c.i, r.range // 400 AS w,"
            "         SUM(ABS((c.a * r.range + c.b) % 24576 - 12288)) AS s"
            "  FROM clips c CROSS JOIN range(3200) r"
            "  GROUP BY c.i, r.range // 400),"
            " fp AS ("
            "  SELECT i, string_agg(CAST(s // (400*64) AS VARCHAR), '-'"
            "                       ORDER BY w) AS fpr"
            "  FROM sums GROUP BY i)"
            " SELECT c.clip_id,"
            "        min(c.clip_id) OVER (PARTITION BY f.fpr) AS cluster_id,"
            "        c.clip_id = min(c.clip_id) OVER (PARTITION BY f.fpr) AS keep"
            " FROM fp f JOIN clips c USING (i)"
        ),
        # acoustic contour near-dup: pure integer window sums from the
        # formula, pairwise Chebyshev <= tol, recursive min-label closure
        # (same CC shape as the minhash oracle) — no float anywhere
        "audio_contour_neardup": (
            "WITH RECURSIVE clips AS ("
            "  SELECT i, 97 + 2*(i % 50) AS a, (i * 997) % 24576 AS b"
            "  FROM range(200) t(i)),"
            " sums AS ("
            "  SELECT c.i, r.range // 400 AS w,"
            "         SUM(ABS((c.a * r.range + c.b) % 24576 - 12288)) AS s"
            "  FROM clips c CROSS JOIN range(3200) r"
            "  GROUP BY c.i, r.range // 400),"
            " edges0 AS ("
            "  SELECT x.i AS l, y.i AS r"
            "  FROM sums x JOIN sums y ON x.w = y.w AND x.i < y.i"
            "  GROUP BY x.i, y.i HAVING max(abs(x.s - y.s)) <= 5000),"
            " edges AS (SELECT l, r FROM edges0"
            "           UNION ALL SELECT r AS l, l AS r FROM edges0),"
            " reach(id, rr) AS ("
            "  SELECT i, i FROM clips"
            "  UNION"
            "  SELECT e.r, reach.rr FROM reach JOIN edges e ON e.l = reach.id),"
            " comp AS (SELECT id, min(rr) AS comp_id FROM reach GROUP BY id)"
            " SELECT CAST(id AS BIGINT) AS clip_idx,"
            "        CAST(comp_id AS BIGINT) AS cluster_id,"
            "        (id = comp_id) AS keep"
            " FROM comp"
        ),
        # cross-modal union dedup: both keys are pure functions of i —
        # acoustic fingerprint recomputed from the sawtooth formula (same
        # CTE as audio_fingerprint_dedup, classes i % 120), normalized
        # transcript recomputed as the template of i % 90 (the fixture's
        # three surface variants all normalize to exactly this) — then
        # star edges per key, union, recursive min-label closure
        "clip_crossmodal_dedup": (
            "WITH RECURSIVE clips AS ("
            "  SELECT i, 97 + 2*((i % 120) % 50) AS a,"
            "         ((i % 120) * 997) % 24576 AS b"
            "  FROM range(200) t(i)),"
            " sums AS ("
            "  SELECT c.i, r.range // 400 AS w,"
            "         SUM(ABS((c.a * r.range + c.b) % 24576 - 12288)) AS s"
            "  FROM clips c CROSS JOIN range(3200) r"
            "  GROUP BY c.i, r.range // 400),"
            " keys AS ("
            "  SELECT i,"
            "         printf('session %04d take %d', i % 90, (i % 90) % 7)"
            "           AS tkey,"
            "         (SELECT string_agg(CAST(s // (400*64) AS VARCHAR), '-'"
            "                            ORDER BY w)"
            "          FROM sums WHERE sums.i = clips.i) AS akey"
            "  FROM clips),"
            " e0 AS ("
            "  SELECT x.i AS l, y.i AS r FROM keys x JOIN keys y"
            "    ON x.tkey = y.tkey AND x.i < y.i"
            "  UNION"
            "  SELECT x.i AS l, y.i AS r FROM keys x JOIN keys y"
            "    ON x.akey = y.akey AND x.i < y.i),"
            " edges AS (SELECT l, r FROM e0"
            "           UNION ALL SELECT r AS l, l AS r FROM e0),"
            " reach(id, rr) AS ("
            "  SELECT i, i FROM keys"
            "  UNION"
            "  SELECT e.r, reach.rr FROM reach JOIN edges e ON e.l = reach.id),"
            " comp AS (SELECT id, min(rr) AS comp_id FROM reach GROUP BY id)"
            " SELECT CAST(id AS BIGINT) AS clip_idx,"
            "        CAST(comp_id AS BIGINT) AS cluster_id,"
            "        (id = comp_id) AS keep"
            " FROM comp"
        ),
        # VAD segmentation: frame activity is an integer predicate over the
        # gated sawtooth formula; segments = gaps-and-islands over active
        # frames (row_number difference grouping), trailing partial frame
        # dropped by the n_frames*400 bound, ms = frame * 25
        "vad_segments": (
            "WITH clips AS ("
            "  SELECT i, printf('tone-%06d', i) AS clip_id,"
            "         97 + 2*(i % 50) AS a, (i * 997) % 24576 AS b,"
            "         200 + 40*(i % 30) AS dur"
            "  FROM range(200) t(i)),"
            " frames AS ("
            "  SELECT c.i, c.clip_id, r.range // 400 AS f,"
            "         SUM(CASE WHEN ((r.range // 800) % 3) = 2 THEN 0"
            "             ELSE ABS((c.a * r.range + c.b) % 24576 - 12288)"
            "             END) AS s"
            "  FROM clips c JOIN range(32000) r"
            "    ON r.range < ((16 * c.dur) // 400) * 400"
            "  GROUP BY c.i, c.clip_id, r.range // 400),"
            " isl AS ("
            "  SELECT i, clip_id, f, (s >= 64*400) AS act,"
            "         f - row_number() OVER ("
            "               PARTITION BY i, (s >= 64*400) ORDER BY f) AS grp"
            "  FROM frames),"
            " segs AS ("
            "  SELECT i, clip_id, min(f) AS fs, max(f) + 1 AS fe"
            "  FROM isl WHERE act GROUP BY i, clip_id, grp)"
            " SELECT clip_id,"
            "        CAST(row_number() OVER (PARTITION BY i ORDER BY fs) - 1"
            "             AS BIGINT) AS seg_idx,"
            "        CAST(fs * 25 AS BIGINT) AS start_ms,"
            "        CAST(fe * 25 AS BIGINT) AS end_ms,"
            "        CAST(fe - fs AS BIGINT) AS n_frames"
            " FROM segs"
        ),
        # slice_segments: same frame/gaps-and-islands closure as
        # vad_segments, plus the per-segment integer payload projection —
        # n_samples = frames*400 and abs_sum = sum of per-frame |int16|
        # sums over the active run (the WAV round-trip is lossless for
        # int16, so the decoded slice reproduces these exactly)
        "slice_segments": (
            "WITH clips AS ("
            "  SELECT i, printf('tone-%06d', i) AS clip_id,"
            "         97 + 2*(i % 50) AS a, (i * 997) % 24576 AS b,"
            "         200 + 40*(i % 30) AS dur"
            "  FROM range(200) t(i)),"
            " frames AS ("
            "  SELECT c.i, c.clip_id, r.range // 400 AS f,"
            "         SUM(CASE WHEN ((r.range // 800) % 3) = 2 THEN 0"
            "             ELSE ABS((c.a * r.range + c.b) % 24576 - 12288)"
            "             END) AS s"
            "  FROM clips c JOIN range(32000) r"
            "    ON r.range < ((16 * c.dur) // 400) * 400"
            "  GROUP BY c.i, c.clip_id, r.range // 400),"
            " isl AS ("
            "  SELECT i, clip_id, f, s, (s >= 64*400) AS act,"
            "         f - row_number() OVER ("
            "               PARTITION BY i, (s >= 64*400) ORDER BY f) AS grp"
            "  FROM frames),"
            " segs AS ("
            "  SELECT i, clip_id, min(f) AS fs, max(f) + 1 AS fe,"
            "         SUM(s) AS abs_sum"
            "  FROM isl WHERE act GROUP BY i, clip_id, grp)"
            " SELECT clip_id,"
            "        CAST(row_number() OVER (PARTITION BY i ORDER BY fs) - 1"
            "             AS BIGINT) AS seg_idx,"
            "        CAST((fe - fs) * 400 AS BIGINT) AS n_samples,"
            "        CAST(abs_sum AS BIGINT) AS abs_sum"
            " FROM segs"
        ),
        # speech_rate: active frame count from the gated formula x 25 ms;
        # normalized transcript length is 19 for every fixture variant;
        # double division + half-away round match the pipeline bit-exactly
        "speech_rate": (
            "WITH clips AS ("
            "  SELECT i, printf('tone-%06d', i) AS clip_id,"
            "         97 + 2*(i % 50) AS a, (i * 997) % 24576 AS b,"
            "         200 + 40*(i % 30) AS dur"
            "  FROM range(200) t(i)),"
            " frames AS ("
            "  SELECT c.i, r.range // 400 AS f,"
            "         SUM(CASE WHEN ((r.range // 800) % 3) = 2 THEN 0"
            "             ELSE ABS((c.a * r.range + c.b) % 24576 - 12288)"
            "             END) AS s"
            "  FROM clips c JOIN range(32000) r"
            "    ON r.range < ((16 * c.dur) // 400) * 400"
            "  GROUP BY c.i, r.range // 400),"
            " act AS ("
            "  SELECT i, 25 * COUNT(*) FILTER (s >= 64*400) AS active_ms"
            "  FROM frames GROUP BY i),"
            " nch AS ("
            "  SELECT i, CAST(length(printf('session %04d take %d',"
            "         i % 90, (i % 90) % 7)) AS BIGINT) AS n_chars"
            "  FROM clips)"
            " SELECT c.clip_id,"
            "        CAST(a.active_ms AS BIGINT) AS active_ms,"
            "        n.n_chars,"
            "        CASE WHEN a.active_ms > 0 THEN"
            "          round(n.n_chars * 1000.0 / a.active_ms, 4)"
            "        ELSE NULL END AS chars_per_sec"
            " FROM clips c JOIN act a USING (i) JOIN nch n USING (i)"
        ),
    }
