"""Engine configuration.

Mirrors the option surface of the reference ``StringGrouperConfig``
(``/root/reference/string_grouper/string_grouper.py:156-202``) and adds the
distributed-execution knobs (MinHash/LSH candidate generation, skew salting,
checkpointing) that the Ray-Data-native engine needs.

Unlike the reference NamedTuple, this is a frozen dataclass whose
``__post_init__`` performs the option validation the reference spreads over
``_validate_group_rep_specs`` / ``_validate_tfidf_matrix_dtype`` /
``_validate_n_blocks`` (``string_grouper.py:916-952``).
"""

from __future__ import annotations

from dataclasses import dataclass, replace, field
from typing import Optional, Tuple

import numpy as np

DEFAULT_NGRAM_SIZE: int = 3
DEFAULT_TFIDF_MATRIX_DTYPE: type = np.float64
DEFAULT_REGEX: str = r"[,-./]|\s"
DEFAULT_MAX_N_MATCHES: int = 20
DEFAULT_MIN_SIMILARITY: float = 0.8
DEFAULT_IGNORE_CASE: bool = True
DEFAULT_DROP_INDEX: bool = False
DEFAULT_REPLACE_NA: bool = False
DEFAULT_INCLUDE_ZEROES: bool = True
GROUP_REP_CENTROID: str = "centroid"
GROUP_REP_FIRST: str = "first"
DEFAULT_GROUP_REP: str = GROUP_REP_CENTROID
DEFAULT_FORCE_SYMMETRIES: bool = True
DEFAULT_NORMALIZE_TO_ASCII: bool = True

# Output column naming contract (string_grouper.py:40-49).
DEFAULT_COLUMN_NAME: str = "side"
DEFAULT_ID_NAME: str = "id"
LEFT_PREFIX: str = "left_"
RIGHT_PREFIX: str = "right_"
MOST_SIMILAR_PREFIX: str = "most_similar_"
DEFAULT_MASTER_NAME: str = "master"
DEFAULT_MASTER_ID_NAME: str = f"{DEFAULT_MASTER_NAME}_{DEFAULT_ID_NAME}"
GROUP_REP_PREFIX: str = "group_rep_"


@dataclass(frozen=True)
class EngineConfig:
    """All options for the Ray-Data near-dup engine.

    The first block mirrors the reference options one-to-one; the second block
    is ours (distributed execution).
    """

    # --- reference-compatible options -------------------------------------
    ngram_size: int = DEFAULT_NGRAM_SIZE
    tfidf_matrix_dtype: type = DEFAULT_TFIDF_MATRIX_DTYPE
    regex: str = DEFAULT_REGEX
    max_n_matches: Optional[int] = DEFAULT_MAX_N_MATCHES
    min_similarity: float = DEFAULT_MIN_SIMILARITY
    ignore_case: bool = DEFAULT_IGNORE_CASE
    ignore_index: bool = DEFAULT_DROP_INDEX
    include_zeroes: bool = DEFAULT_INCLUDE_ZEROES
    replace_na: bool = DEFAULT_REPLACE_NA
    group_rep: str = DEFAULT_GROUP_REP
    force_symmetries: bool = DEFAULT_FORCE_SYMMETRIES
    n_blocks: Optional[Tuple[int, int]] = None
    normalize_to_ascii: bool = DEFAULT_NORMALIZE_TO_ASCII
    # accepted for reference-API compatibility; maps to actor-pool sizing
    number_of_processes: Optional[int] = None

    # --- distributed-execution options (ours) -----------------------------
    # candidate generation strategy: "exact" (blocked top-N cosine matmul,
    # the reference's own algorithm, distributed) or "lsh"
    # (MinHash+LSH candidates, exact cosine verify — the 10^12-row path).
    strategy: str = "exact"
    # MinHash / LSH parameters (strategy="lsh")
    num_perm: int = 128
    lsh_bands: int = 32  # bands * rows_per_band must == num_perm
    minhash_seed: int = 42
    # any LSH band-bucket with more than this many members is salted into
    # sub-bucket chunk pairs so no single verify task goes quadratic.
    max_bucket_size: int = 500
    # hot-bucket census sampling: None = auto (exact census below 500k input
    # rows; 1/8 row sample above), 1.0 = always exact, (0, 1) = explicit
    # sample rate. A sampled census bands only the sampled rows (small,
    # finishes fast) and lets the FULL banding stream straight into the
    # salted shuffle with no materialize barrier — salting never changes the
    # pair set (equivalence-tested), so a mis-estimated hot bucket costs
    # balance, not correctness. Detection odds at 1/8: a just-hot 800-row
    # bucket is flagged with P ≈ 1 - 1e-6; a missed 600-row bucket costs one
    # ~180k-pair task — bounded.
    census_sample_rate: Optional[float] = None
    # exact top-k matmul: rows per broadcast right-side chunk. Worker memory
    # math: each live Postings chunk is ~nnz×13 B (≈30 trigrams/row → ~31 MB
    # at the default), plus up to 256 MB transient/cached float64 when the
    # tiny-vocabulary dense-gemm path engages repeatedly (sparse.Postings
    # .dense caches from the 2nd call; bounded by its 32M-cell gate).
    right_chunk_rows: int = 80_000
    # per-batch size for the vectorize / matmul stages
    batch_size: int = 4096
    # connected components: below this many edges the driver runs a local
    # (numpy-vectorized) union-find; above, iterative distributed label
    # propagation. 50M edges ≈ 800MB driver-side — cheap next to the round
    # cost of the distributed path; raise further on a big-memory driver.
    cc_driver_max_edges: int = 50_000_000
    # above this many edges the driver paths first run the map-parallel
    # spanning-forest contraction (state/unionfind.py) so the serial
    # driver-side collect + union-find sees O(nodes) rows, not O(edges).
    # The contraction is one extra shuffle — it only pays when the edge
    # list is several times the node count, so the floor is high.
    cc_contract_min_edges: int = 20_000_000
    # guard for zero-similarity completion (reference O(n*m) cartesian)
    max_zero_pairs: int = 10_000_000
    # self-join LSH only: collapse exact duplicates (identical normalized
    # text) to one representative before banding; members attach to their
    # rep with similarity 1.0. Preserves cluster assignments exactly while
    # removing the k² blowup of mega-groups of identical rows. Changes
    # match_strings' edge list shape (star instead of clique within exact-dup
    # groups), so it is OFF by default and enabled by the dedup pipelines.
    exact_dup_shortcircuit: bool = False
    # LSH verify: when the vectorized side fits comfortably in the object
    # store (≤ this many rows), broadcast the packed vectors once and verify
    # candidate pairs in a single map stage (no join shuffles). Above it,
    # fall back to the two bucketed shuffle_joins (the any-scale path).
    # Memory math for the broadcast CSR: ~30 char-trigrams/row × 12 B
    # (int32 col + float64 val) ≈ 360 MB per 1M rows, stored once per NODE
    # in the plasma store (workers map it zero-copy) — 8M rows ≈ 2.9 GB
    # resident. The DRIVER additionally pays ~3× that transiently while
    # assembling (concat parts + gathered CSR + the ray.put copy,
    # collect_row_csr) ≈ 9 GB peak at the cutoff — sized for a ≥32 GiB
    # driver; lower this on smaller drivers. The join path remains the route
    # above (it moves vectors through two bucketed shuffles but never holds
    # a full side anywhere).
    verify_broadcast_max_rows: int = 8_000_000
    # exact-dup rep filter: reps are a plain int64 id array (8 B/row — 400 MB
    # even at 50M rows), so the broadcast searchsorted filter stays viable
    # far beyond the vector-broadcast cutover; above this the filter becomes
    # a shuffle_join.
    rep_broadcast_max_rows: int = 50_000_000
    # self-join symmetrize normally ends in a pair-key dedup exchange
    # (dedup_pairs). Pipelines whose downstream max-merges duplicate
    # (left, right) edge rows anyway — group_assignments(dedup_edges=True)
    # on both its driver and distributed routes — set this True to get the
    # raw mirror union and skip that exchange (~1 s parallelism-independent
    # at 1M rows). NEVER set it when the edge list itself is the product
    # (match_strings): mirror duplicates would surface to the user.
    defer_edge_dedup: bool = False
    # group_assignments(id_col=...): the driver fast path may carry the id
    # STRINGS (~40-64 B/row, two Arrow copies transiently) to the driver —
    # memory the 16 B/edge cc_driver_max_edges budget does not model. Above
    # this row count the id carry is skipped and callers fall back to the
    # join-based rep hydration.
    ids_driver_max_rows: int = 20_000_000
    # exact-dup collapse: below this row count the (row_idx, nhash) pairs are
    # collected to the driver (16 B/row — 128 MB at the cutoff) and grouped
    # with one numpy lexsort instead of a bucketed sort exchange + rep_map
    # materialize + second collect. The exchange's latency is parallelism-
    # independent (~2 s at 1M rows whether 8 or 32 CPUs), so the driver route
    # directly buys small/mid-job scaling efficiency; above the cutoff the
    # distributed route is unchanged.
    exactdup_driver_max_rows: int = 8_000_000
    # minhash_dedup's true-Jaccard verify: below this row count the per-row
    # DISTINCT-shingle CSR (rank-encoded int32) is broadcast and pairs
    # verify in one map stage (no shingle-carrying shuffle_joins).
    # Resident ≈ rows × (avg distinct shingles × 4 B + 16 B) — ~1.3 GB at
    # 1M rows of ~300-char transcripts; LONG-document corpora (minhash's
    # other target) should lower this or rely on the join route, which
    # never holds a full side anywhere.
    jaccard_broadcast_max_rows: int = 1_000_000
    # LSH self-join pair emission:
    #   "clique" — every intra-bucket pair (exact reference-style matching;
    #              O(k²) per bucket, needed when the PAIR LIST is the product)
    #   "star"   — bucket-min → other members only (O(k) per bucket; enough
    #              to span each bucket for connected-components clustering —
    #              a member that fails one star verify still gets 32 more
    #              chances, one per band). Used by the dedup/cluster
    #              pipelines where only the clusters matter.
    lsh_pair_emission: str = "clique"
    # broadcast-verify pair emission order. True (default): membersets
    # co-locate by cluster anchor (pkey), pairs are emitted + deduped inside
    # the bucket task and stream straight into the verify — candidate pairs
    # never enter an exchange; the passing edges get a (small) cross-bucket
    # dedup after the verify. False: the pre-r4 order (emit → global pair
    # dedup → verify), which moves the pre-dedup pair volume through a full
    # sort exchange — kept for A/B comparison (SGR_PKEY_EMISSION=0/1 also
    # overrides at run time).
    lsh_pkey_pair_emission: bool = True
    # checkpointing (state/checkpoint.py); None disables
    checkpoint_dir: Optional[str] = None
    # actor-pool sizing for stateful stages; None → let Ray pick
    concurrency: Optional[int] = None
    # stateful stages run as actor pools (setup once per actor). For tiny
    # inputs the pool startup dominates, so the compat layer flips this off
    # and the same callables run as stateless tasks instead.
    use_actor_pools: bool = True

    def __post_init__(self) -> None:
        if self.group_rep not in (GROUP_REP_FIRST, GROUP_REP_CENTROID):
            raise ValueError(
                "Invalid option value for group_rep. The only permitted values are "
                f"{(GROUP_REP_FIRST, GROUP_REP_CENTROID)}"
            )
        if self.tfidf_matrix_dtype not in (np.float32, np.float64):
            raise ValueError(
                "Invalid option value for tfidf_matrix_dtype. The only permitted "
                f"values are {(np.float32, np.float64)}"
            )
        if self.ignore_index and self.replace_na:
            raise ValueError("replace_na can only be set to True when ignore_index=False.")
        self._validate_n_blocks(self.n_blocks)
        if self.strategy not in ("exact", "lsh"):
            raise ValueError("strategy must be 'exact' or 'lsh'")
        if self.num_perm % self.lsh_bands != 0:
            raise ValueError("num_perm must be divisible by lsh_bands")

    @staticmethod
    def _validate_n_blocks(n_blocks) -> None:
        errmsg = (
            "Invalid option value for parameter n_blocks: n_blocks must be None "
            "or a tuple of 2 integers greater than 0."
        )
        if n_blocks is None:
            return
        if not isinstance(n_blocks, tuple) or len(n_blocks) != 2:
            raise ValueError(errmsg)
        if not (isinstance(n_blocks[0], int) and isinstance(n_blocks[1], int)):
            raise ValueError(errmsg)
        if n_blocks[0] < 1 or n_blocks[1] < 1:
            raise ValueError(errmsg)

    @property
    def rows_per_band(self) -> int:
        return self.num_perm // self.lsh_bands

    def resolve_concurrency(self) -> int:
        """Actor-pool size for stateful map_batches stages.

        Explicit ``concurrency`` wins, then the reference-compat
        ``number_of_processes``, else all-but-one of the cluster's CPUs
        (leaving headroom for the read/write stages).
        """
        if self.concurrency:
            return self.concurrency
        if self.number_of_processes:
            return self.number_of_processes
        try:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        return max(2, cpus - 1)

    def with_options(self, **kwargs) -> "EngineConfig":
        return replace(self, **kwargs)

    @classmethod
    def for_cluster(cls, **overrides) -> "EngineConfig":
        """Derive the broadcast / driver-collect cutoffs from the CONNECTED
        cluster's actual resources instead of the single-node defaults.

        Assumptions made explicit (the defaults bake in one 128 GiB node):

        * ``verify_broadcast_max_rows`` — the broadcast CSR (~360 B/row:
          ~30 trigram postings × 12 B) is resident once PER NODE in its
          plasma store (workers map it zero-copy), so the binding constraint
          is the SMALLEST node's object store (min, not aggregate), capped
          at 25% of it. The DRIVER additionally pays ~3× transiently while
          assembling (collect_row_csr), so the driver node's total memory
          caps it too (30%/3×).
        * ``rep_broadcast_max_rows`` — plain int64 id array, 8 B/row, same
          per-node store constraint at 10%.
        * ``cc_driver_max_edges`` — edges are collected to the DRIVER HEAP
          (~16 B/edge numpy), so this scales with driver memory (20%), not
          with cluster size; a bigger cluster does not buy a bigger driver.

        On a heterogeneous cluster this keeps the same binary safe: a node
        with a small object store lowers the broadcast cutovers rather than
        OOMing plasma. Explicit ``overrides`` win over every derivation.
        """
        import ray

        if not ray.is_initialized():
            return cls(**overrides)
        try:
            nodes = [n for n in ray.nodes() if n.get("Alive")]
            min_store = min(
                int(n["Resources"].get("object_store_memory", 0)) for n in nodes
            )
            # the head node (where the driver runs) carries the
            # node:__internal_head__ resource marker — ray.nodes() entries
            # have no IsHeadNode field in this Ray version
            driver_mem = min(
                (
                    n["Resources"].get("memory", float("inf"))
                    for n in nodes
                    if "node:__internal_head__" in n["Resources"] or len(nodes) == 1
                ),
                default=float("inf"),
            )
            if driver_mem == float("inf"):
                driver_mem = min_store * 2  # conservative fallback
            driver_mem = int(driver_mem)
        except Exception:
            return cls(**overrides)
        derived = {
            "verify_broadcast_max_rows": int(
                min(0.25 * min_store / 360, 0.30 * driver_mem / (3 * 360))
            ),
            "rep_broadcast_max_rows": int(0.10 * min_store / 8),
            "cc_driver_max_edges": int(0.20 * driver_mem / 16),
            # (row_idx, nhash) collected to the DRIVER HEAP, 16 B/row
            "exactdup_driver_max_rows": int(0.05 * driver_mem / 16),
            # id strings on the driver heap: ~64 B/row × 2 transient copies
            "ids_driver_max_rows": int(0.04 * driver_mem / 128),
            # ~1.2 KB/row rank-encoded shingle CSR at ~300-char docs (see
            # field comment)
            "jaccard_broadcast_max_rows": int(0.10 * min_store / 1200),
        }
        derived.update(overrides)
        return cls(**derived)
