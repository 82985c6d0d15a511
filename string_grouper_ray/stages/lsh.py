"""LSH candidate generation + exact verification — the 10^12-row match path
(operator J1's scale strategy; SURVEY.md §3.1 "Ours" pipeline).

Stages (shuffle keys in parentheses — SURVEY.md §4.2):

1. ``MinHashBander`` map_batches → exploded (band_key, row_idx) rows.
2. **Hot-bucket census** (groupby band_key, count): buckets larger than
   ``config.max_bucket_size`` are collected to a small driver-side dict and
   broadcast. This is the explicit salted-key skew handling: a member of a
   hot bucket with C = ceil(k / max_bucket_size) chunks is re-emitted under
   C sub-keys (its own chunk paired with every other chunk), so every
   shuffled group is O(max_bucket_size²) work — no single task goes
   quadratic in the full bucket size, and no candidate pair is lost.
3. **Pair emission** (groupby salted band_key): all intra-bucket pairs as
   canonical (min_idx, max_idx) rows; within-task dedup.
4. **Pair dedup** (groupby pair key): multi-band repeats collapse to one.
5. **Verify**: exact cosine per candidate pair; pairs below
   ``min_similarity`` are dropped. Broadcast mode packs every row's tf-idf
   vector into one broadcast CSR and verifies in a single map stage; the
   any-scale band-local mode explodes membersets into member rows, joins
   texts once (linear, not pair-quadratic), and verifies each memberset
   bucket in-task so only VERIFIED edges shuffle. Both reproduce the
   reference's exact similarity values on surviving pairs.
6. Mirror + per-left top-N (groupby left_idx) → the same edge IR as the
   exact strategy.

Cross joins carry a side tag; only master×duplicates pairs are emitted.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..config import EngineConfig
from ..functions.joins import shuffle_join
from .minhash import MinHashBander
from .vectorize import TfidfEncoder


def _band_rows(ds, config: EngineConfig, text_col: str, side: int):
    def add_side(t: pa.Table) -> pa.Table:
        return t.append_column("side", pa.array(np.full(len(t), side, dtype=np.int8)))

    from ..functions.stagemap import stage_map_batches

    return stage_map_batches(
        ds.select_columns(["row_idx", text_col]),
        MinHashBander,
        (config, text_col),
        config,
        batch_format="pyarrow",
        batch_size=config.batch_size,
    ).map_batches(add_side, batch_format="pyarrow")


class _SaltHotBuckets:
    """Re-emit members of hot buckets under chunk-pair sub-keys.

    For a bucket with C chunks, a member in chunk c is emitted under keys
    (c, j) for all j — pair (c, j) tasks then see exactly the members of
    chunks c and j. Pairs are generated within a sub-bucket only between
    (chunk_lo members) × (chunk_hi members) plus chunk-internal pairs when
    c == j, so every pair of the original bucket appears in exactly one
    sub-bucket.
    """

    def __init__(self, hot_ref, max_bucket: int):
        self.hot: Dict[int, int] = ray.get(hot_ref) if isinstance(hot_ref, ray.ObjectRef) else hot_ref
        self.max_bucket = max_bucket
        items = sorted(self.hot.items())
        self.hot_keys = np.array([k for k, _ in items], dtype=np.int64)
        self.hot_chunks = np.array([v for _, v in items], dtype=np.int64)

    @staticmethod
    def _passthrough(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table(
            {
                "band_key": t["band_key"],
                "salt": pa.array(np.zeros(n, dtype=np.int64)),
                "row_idx": t["row_idx"],
                "side": t["side"],
                "chunk": pa.array(np.zeros(n, dtype=np.int32)),
                "diag_sub": pa.array(np.ones(n, dtype=np.bool_)),
            }
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        # fast path — no hot buckets at all (the common case): pass every
        # row through with constant salt/chunk/diag columns, zero per-row work
        if len(self.hot_keys) == 0 or len(t) == 0:
            return self._passthrough(t)
        keys = t["band_key"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(self.hot_keys, keys)
        np.minimum(pos, len(self.hot_keys) - 1, out=pos)
        is_hot = self.hot_keys[pos] == keys
        if not is_hot.any():
            return self._passthrough(t)

        rows = t["row_idx"].to_numpy(zero_copy_only=False)
        sides = t["side"].to_numpy(zero_copy_only=False)
        parts: List[pa.Table] = []
        cold = ~is_hot
        if cold.any():
            parts.append(self._passthrough(t.filter(pa.array(cold))))

        # hot rows: a member of chunk c is re-emitted under every chunk-pair
        # sub-key (lo, hi) with j = 0..n_chunks-1 — fully vectorized via
        # np.repeat expansion. Chunk assignment keeps the CPython tuple hash
        # of (row, key) used by the original per-row implementation so pair
        # routing is bit-identical (hot rows are few; this small Python loop
        # is the only remaining per-row work).
        hk = keys[is_hot]
        hr = rows[is_hot]
        hs = sides[is_hot]
        nch = self.hot_chunks[pos[is_hot]]
        c = np.fromiter(
            (hash((int(r), int(k))) for r, k in zip(hr, hk)),
            dtype=np.int64, count=len(hr),
        ) % nch
        total = int(nch.sum())
        idx = np.repeat(np.arange(len(hr), dtype=np.int64), nch)
        j = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(nch) - nch, nch)
        cc = c[idx]
        lo = np.minimum(cc, j)
        hi = np.maximum(cc, j)
        parts.append(
            pa.table(
                {
                    "band_key": pa.array(hk[idx], type=pa.int64()),
                    "salt": pa.array(lo * nch[idx] + hi + 1, type=pa.int64()),
                    "row_idx": pa.array(hr[idx], type=pa.int64()),
                    "side": pa.array(hs[idx], type=pa.int8()),
                    "chunk": pa.array(cc.astype(np.int32), type=pa.int32()),
                    "diag_sub": pa.array(lo == hi, type=pa.bool_()),
                }
            )
        )
        return pa.concat_tables(parts) if len(parts) > 1 else parts[0]


def _segment_pairs(offsets: np.ndarray, sizes: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """All (i < j) index pairs within each segment, fully vectorized.

    For a segment at offset o with size k, emits (o+a, o+b) for all
    0 <= a < b < k. Construction: every element e (local index a) gets
    (k-1-a) partners, namely the elements right after it.
    """
    if len(sizes) == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    n_total = int(sizes.sum())
    elem_global = np.arange(n_total, dtype=np.int64)
    seg_of_elem = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
    local = elem_global - np.repeat(offsets, sizes)
    partners = (sizes[seg_of_elem] - 1 - local).astype(np.int64)
    total = int(partners.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    left = np.repeat(elem_global, partners)
    csum = np.cumsum(partners) - partners
    within = np.arange(total, dtype=np.int64) - np.repeat(csum, partners)
    right = left + 1 + within
    return left, right


def emit_pairs_bucket(df: pd.DataFrame, cross: bool, dedup: bool = True) -> pd.DataFrame:
    """Vectorized pair emission for a whole shuffle bucket (all its
    (band_key, salt) groups at once — no per-group pandas dispatch).

    Unsalted groups go through the fully-vectorized segment-pair kernel;
    salted sub-buckets (few — only hot bands) use the per-group path that
    understands chunk-pair semantics.

    ``dedup=False`` keeps cross-band repeats (each band emits a pair at
    most once, so the global multiplicity of a pair == its number of
    matching bands — the signature-based Jaccard estimate used by
    ``minhash_dedup``'s candidate pre-filter).
    """
    keys = df["band_key"].to_numpy(dtype=np.int64)
    salts = df["salt"].to_numpy(dtype=np.int64)
    rows = df["row_idx"].to_numpy(dtype=np.int64)
    sides = df["side"].to_numpy()
    order = np.lexsort((rows, salts, keys))
    keys, salts, rows, sides = keys[order], salts[order], rows[order], sides[order]

    outs = []
    plain = salts == 0
    if plain.any():
        pk, pr, ps = keys[plain], rows[plain], sides[plain]
        boundaries = np.flatnonzero(np.diff(pk)) + 1
        offsets = np.concatenate([[0], boundaries]).astype(np.int64)
        sizes = np.diff(np.concatenate([offsets, [len(pk)]])).astype(np.int64)
        li, ri = _segment_pairs(offsets, sizes)
        a, b = pr[li], pr[ri]
        sa, sb = ps[li], ps[ri]
        if cross:
            keep = sa != sb
            a2 = np.where(sa == 0, a, b)
            b2 = np.where(sa == 0, b, a)
            a, b = a2[keep], b2[keep]
        else:
            keep = a != b
            a, b = np.minimum(a, b)[keep], np.maximum(a, b)[keep]
        outs.append(pd.DataFrame({"left_idx": a, "right_idx": b}))

    salted = ~plain
    if salted.any():
        sdf = pd.DataFrame(
            {
                "band_key": keys[salted],
                "salt": salts[salted],
                "row_idx": rows[salted],
                "side": sides[salted],
                "chunk": df["chunk"].to_numpy()[order][salted],
                "diag_sub": df["diag_sub"].to_numpy()[order][salted],
            }
        )
        outs.extend(
            _emit_pairs(g, cross) for _, g in sdf.groupby(["band_key", "salt"], sort=False)
        )

    if not outs:
        return pd.DataFrame(
            {"left_idx": np.empty(0, np.int64), "right_idx": np.empty(0, np.int64)}
        )
    out = pd.concat(outs, ignore_index=True)
    return out.drop_duplicates() if dedup else out


def _emit_pairs(g: pd.DataFrame, cross: bool) -> pd.DataFrame:
    """All candidate pairs within one (possibly salted) bucket."""
    salt = int(g["salt"].iloc[0])
    rows = g["row_idx"].to_numpy(dtype=np.int64)
    sides = g["side"].to_numpy()
    chunks = g["chunk"].to_numpy()
    empty = pd.DataFrame(
        {"left_idx": np.empty(0, np.int64), "right_idx": np.empty(0, np.int64)}
    )
    if salt > 0:
        # chunk-pair sub-bucket: diagonal sub-buckets (lo == hi) pair within
        # the chunk; off-diagonal pair strictly across the two chunks so no
        # pair is emitted twice across sub-buckets
        if bool(g["diag_sub"].iloc[0]):
            l_rows, r_rows, l_sides, r_sides = rows, rows, sides, sides
            same = True
        else:
            uniq = np.unique(chunks)
            if len(uniq) < 2:
                return empty
            lo_mask = chunks == uniq[0]
            hi_mask = chunks == uniq[1]
            l_rows, l_sides = rows[lo_mask], sides[lo_mask]
            r_rows, r_sides = rows[hi_mask], sides[hi_mask]
            same = False
    else:
        l_rows, r_rows, l_sides, r_sides = rows, rows, sides, sides
        same = True

    li, ri = np.meshgrid(np.arange(len(l_rows)), np.arange(len(r_rows)), indexing="ij")
    li, ri = li.reshape(-1), ri.reshape(-1)
    a, b = l_rows[li], r_rows[ri]
    sa, sb = l_sides[li], r_sides[ri]
    if cross:
        keep = sa != sb
        a2 = np.where(sa == 0, a, b)
        b2 = np.where(sa == 0, b, a)
        a, b = a2[keep], b2[keep]
    else:
        keep = a < b if same else a != b
        a, b = np.minimum(a, b)[keep], np.maximum(a, b)[keep]
    if len(a) == 0:
        return pd.DataFrame({"left_idx": np.empty(0, np.int64), "right_idx": np.empty(0, np.int64)})
    pairs = np.unique(np.stack([a, b], axis=1), axis=0)
    return pd.DataFrame({"left_idx": pairs[:, 0], "right_idx": pairs[:, 1]})


_SM_GOLD = np.uint64(0x9E3779B97F4A7C15)
_SM_SEP = np.uint64(0xD1B54A32D192ED03)  # salts rhs members apart from lhs
_MASK63 = np.uint64(0x7FFFFFFFFFFFFFFF)


def _sm64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized (uint64 in/out)."""
    with np.errstate(over="ignore"):
        x = x ^ (x >> np.uint64(30))
        x = x * np.uint64(0xBF58476D1CE4E5B9)
        x = x ^ (x >> np.uint64(27))
        x = x * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


def _mixed_members(vals: np.ndarray, local_pos: np.ndarray, sep: bool = False) -> np.ndarray:
    """Per-member position-salted splitmix64 mix; a memberset hash is the
    XOR-fold of these (positions make the sorted sequence order-sensitive,
    so [a,a,b] and [a,b,b] differ). Two distinct membersets colliding would
    drop one bucket's pairs; at B buckets the probability is ~B²/2^63
    (≈5e-5 at 32M buckets) — accepted and documented."""
    with np.errstate(over="ignore"):
        x = vals.astype(np.uint64) + _SM_GOLD * (local_pos.astype(np.uint64) + np.uint64(1))
        if sep:
            x = x + _SM_SEP
    return _sm64(x)


def _mset_hash(lhs: np.ndarray, rhs: np.ndarray, mode: int) -> int:
    """63-bit memberset hash (xor-fold of position-salted splitmix64 mixes
    + mode). Kept as the single-group form; `_memberset_bucket` computes the
    identical value for all mode-0 groups at once via ``xor.reduceat``."""
    h = np.uint64(0)
    if len(lhs):
        h ^= np.bitwise_xor.reduce(_mixed_members(lhs, np.arange(len(lhs))))
    if len(rhs):
        h ^= np.bitwise_xor.reduce(_mixed_members(rhs, np.arange(len(rhs)), sep=True))
    h = _sm64(np.array([h ^ np.uint64(0xABCD + mode)], dtype=np.uint64))[0]
    return int(h & _MASK63)


def _memberset_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """One row per (band_key, salt) group: packed sorted member ids (+sides).

    mode 0 = pair within the single member list; mode 1 = pair strictly
    across the two chunk lists (off-diagonal salted sub-bucket).
    """
    keys = df["band_key"].to_numpy(dtype=np.int64)
    salts = df["salt"].to_numpy(dtype=np.int64)
    rows = df["row_idx"].to_numpy(dtype=np.int64)
    sides = df["side"].to_numpy().astype(np.int8)
    chunks = df["chunk"].to_numpy()
    diags = df["diag_sub"].to_numpy()
    order = np.lexsort((rows, salts, keys))
    keys, salts, rows = keys[order], salts[order], rows[order]
    sides, chunks, diags = sides[order], chunks[order], diags[order]

    # group boundaries from BOTH columns directly — a folded scalar key
    # (key*C + salt) can collide for salts >= C, silently merging two
    # distinct (band_key, salt) groups
    if len(keys) > 1:
        boundaries = np.flatnonzero((np.diff(keys) != 0) | (np.diff(salts) != 0)) + 1
    else:
        boundaries = np.empty(0, dtype=np.int64)
    offsets = np.concatenate([[0], boundaries, [len(keys)]]).astype(np.int64)

    # mode-0 memberset hashes for ALL groups in one vectorized pass (xor-fold
    # of position-salted mixes, reduceat per group) — bit-identical to
    # _mset_hash(group_rows, [], 0); the per-group call below is only needed
    # for the rare salted off-diagonal groups whose members split in two.
    sizes = np.diff(offsets)
    if len(rows):
        local = np.arange(len(rows), dtype=np.int64) - np.repeat(offsets[:-1], sizes)
        gx = np.bitwise_xor.reduceat(_mixed_members(rows, local), offsets[:-1])
        mode0_hash = _sm64(gx ^ np.uint64(0xABCD)) & _MASK63
    else:
        mode0_hash = np.empty(0, dtype=np.uint64)

    out_hash: List[int] = []
    out_l: List[bytes] = []
    out_r: List[bytes] = []
    out_ls: List[bytes] = []
    out_rs: List[bytes] = []
    out_mode: List[int] = []
    for gi in range(len(offsets) - 1):
        lo, hi = offsets[gi], offsets[gi + 1]
        if hi - lo < 2:
            continue
        g_rows = rows[lo:hi]
        g_sides = sides[lo:hi]
        if salts[lo] > 0 and not diags[lo]:
            g_chunks = chunks[lo:hi]
            uniq = np.unique(g_chunks)
            if len(uniq) < 2:
                continue
            lm = g_chunks == uniq[0]
            lhs, rhs = g_rows[lm], g_rows[~lm]
            lss, rss = g_sides[lm], g_sides[~lm]
            mode = 1
            out_hash.append(_mset_hash(lhs, rhs, mode))
        else:
            lhs, rhs = g_rows, np.empty(0, dtype=np.int64)
            lss, rss = g_sides, np.empty(0, dtype=np.int8)
            mode = 0
            out_hash.append(int(mode0_hash[gi]))
        out_l.append(lhs.tobytes())
        out_r.append(rhs.tobytes())
        out_ls.append(lss.tobytes())
        out_rs.append(rss.tobytes())
        out_mode.append(mode)
    return pd.DataFrame(
        {
            "mset_hash": pd.array(out_hash, dtype="int64"),
            "l_members": out_l,
            "r_members": out_r,
            "l_sides": out_ls,
            "r_sides": out_rs,
            "mode": pd.array(out_mode, dtype="int8"),
        }
    )


def _finish_pairs(a, b, sa, sb, cross: bool) -> Tuple[np.ndarray, np.ndarray]:
    """Canonicalize emitted index pairs: cross joins orient (left, right) by
    side and drop same-side pairs; self joins drop the diagonal and order
    (min, max)."""
    if cross:
        keep = sa != sb
        a2 = np.where(sa == 0, a, b)
        b2 = np.where(sa == 0, b, a)
        a, b = a2[keep], b2[keep]
    else:
        keep = a != b
        a, b = np.minimum(a, b)[keep], np.maximum(a, b)[keep]
    return np.ascontiguousarray(a, dtype=np.int64), np.ascontiguousarray(b, dtype=np.int64)


def pairs_from_mset_buffers(
    lvals: np.ndarray,
    loff: np.ndarray,
    rvals: np.ndarray,
    roff: np.ndarray,
    lsv: np.ndarray,
    rsv: np.ndarray,
    modes: np.ndarray,
    cross: bool,
    star: bool,
) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized candidate-pair emission from packed memberset buffers.

    All mode-0 rows go through the segment-pair (clique) or anchor-spanning
    (star) kernel at once; mode-1 (chunk-pair) rows — rare, only salted hot
    buckets — keep a per-row path. Returns canonical, lexsort-deduped
    ``(a, b)`` int64 arrays. Shared by the map-stage emitter
    (:class:`_PairsFromMembersets`) and the band-local in-task verify
    (:func:`_make_mset_verify`) so both regimes emit identical pair sets.
    """
    from ..functions.packing import gather_ranges

    l_sizes = np.diff(loff)  # l_sides lengths == l_members lengths
    outs: List[Tuple[np.ndarray, np.ndarray]] = []
    same_mask = modes == 0

    def emit_group(starts: np.ndarray, g_sizes: np.ndarray, g_star: bool) -> None:
        if not len(starts):
            return
        gather = gather_ranges(starts, g_sizes)
        all_rows = lvals[gather]
        all_sides = lsv[gather]
        offsets = np.zeros(len(g_sizes), dtype=np.int64)
        np.cumsum(g_sizes[:-1], out=offsets[1:])
        if g_star:
            # members are sorted, so element 0 is the bucket min:
            # (min, other) spanning edges, PLUS a second spanning set
            # from the max member — one borderline anchor failing
            # verify must not disconnect the whole bucket in every
            # band at once (the anchors decorrelate the failures)
            csum = np.cumsum(g_sizes - 1) - (g_sizes - 1)
            within = np.arange(
                int((g_sizes - 1).sum()), dtype=np.int64
            ) - np.repeat(csum, g_sizes - 1)
            ri = np.repeat(offsets, g_sizes - 1) + 1 + within
            li = np.repeat(offsets, g_sizes - 1)
            li2 = np.repeat(offsets + g_sizes - 1, g_sizes - 1)
            ri2 = np.repeat(offsets, g_sizes - 1) + within
            li = np.concatenate([li, li2])
            ri = np.concatenate([ri, ri2])
        else:
            li, ri = _segment_pairs(offsets, g_sizes)
        outs.append(
            _finish_pairs(all_rows[li], all_rows[ri], all_sides[li], all_sides[ri], cross)
        )

    if same_mask.any():
        starts = loff[:-1][same_mask]
        sizes = l_sizes[same_mask]
        if star:
            # small membersets get the full clique: star's single-anchor
            # edges fail verify together when the anchor is a borderline
            # member, splitting stable clusters (clique cost at <=16
            # members is bounded: <=120 pairs)
            small = sizes <= 16
            emit_group(starts[small], sizes[small], g_star=False)
            emit_group(starts[~small], sizes[~small], g_star=True)
        else:
            emit_group(starts, sizes, g_star=False)
    for i in np.flatnonzero(modes == 1):
        lhs = lvals[loff[i] : loff[i + 1]]
        rhs = rvals[roff[i] : roff[i + 1]]
        lss = lsv[loff[i] : loff[i + 1]]
        rss = rsv[roff[i] : roff[i + 1]]
        if star:
            # span the chunk pair: union's min vs every other member,
            # plus a max-anchored second span (decorrelated failures)
            allm = np.concatenate([lhs, rhs])
            alls = np.concatenate([lss, rss])
            for anchor in {int(np.argmin(allm)), int(np.argmax(allm))}:
                sel = np.arange(len(allm)) != anchor
                outs.append(
                    _finish_pairs(
                        np.full(sel.sum(), allm[anchor], dtype=np.int64),
                        allm[sel],
                        np.full(sel.sum(), alls[anchor], dtype=np.int8),
                        alls[sel],
                        cross,
                    )
                )
        else:
            gi, gj = np.meshgrid(
                np.arange(len(lhs)), np.arange(len(rhs)), indexing="ij"
            )
            gi, gj = gi.reshape(-1), gj.reshape(-1)
            outs.append(_finish_pairs(lhs[gi], rhs[gj], lss[gi], rss[gj], cross))
    if not outs:
        e = np.empty(0, dtype=np.int64)
        return e, e
    a = np.concatenate([o[0] for o in outs])
    b = np.concatenate([o[1] for o in outs])
    # within-batch dedup (numpy lexsort — no pandas)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keep = np.ones(len(a), dtype=bool)
    keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return a[keep], b[keep]


class _PairsFromMembersets:
    """Emit candidate pairs from deduplicated membersets, vectorized: all
    mode-0 rows go through the segment-pair (clique) or first-vs-rest (star)
    kernel at once. Arrow-native — the packed member/side payloads are read
    straight off the binary column buffers (one ``.view`` per column, no
    per-row ``frombuffer``, no pandas block conversion in the widest stage).
    """

    def __init__(self, cross: bool, emission: str = "clique"):
        self.cross = cross
        self.star = emission == "star" and not cross

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.packing import unpack_binary_column

        lvals, loff = unpack_binary_column(batch["l_members"], np.int64)
        rvals, roff = unpack_binary_column(batch["r_members"], np.int64)
        lsv, _ = unpack_binary_column(batch["l_sides"], np.int8)
        rsv, _ = unpack_binary_column(batch["r_sides"], np.int8)
        modes = batch["mode"].to_numpy(zero_copy_only=False)
        a, b = pairs_from_mset_buffers(
            lvals, loff, rvals, roff, lsv, rsv, modes, self.cross, self.star
        )
        return pa.table({"left_idx": pa.array(a), "right_idx": pa.array(b)})


class _MsetPkey:
    """Append ``pkey`` = the memberset's MINIMUM member id (its cluster
    anchor) to memberset rows. A near-dup cluster's cross-band membersets
    almost always share their min member, so partitioning the verify by
    pkey co-locates them in ONE bucket — each member's text then ships once
    per (cluster, bucket), not once per memberset occurrence (observed 26M
    member occurrences for 2M input rows; distinct (pkey, member) refs are
    ~the rep count)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..functions.packing import unpack_binary_column

        lv, lo = unpack_binary_column(t["l_members"], np.int64)
        rv, ro = unpack_binary_column(t["r_members"], np.int64)
        n = len(t)
        big = np.iinfo(np.int64).max
        l_sizes = np.diff(lo)
        r_sizes = np.diff(ro)
        # members are packed sorted ascending → first element is the min
        l_first = np.full(n, big, dtype=np.int64)
        nz = l_sizes > 0
        l_first[nz] = lv[lo[:-1][nz]]
        r_first = np.full(n, big, dtype=np.int64)
        nz = r_sizes > 0
        r_first[nz] = rv[ro[:-1][nz]]
        return t.append_column("pkey", pa.array(np.minimum(l_first, r_first)))


class _ExplodeRefs:
    """(memberset row with pkey) → distinct (pkey, mkey) member references,
    deduped within the batch. mkey packs (row_idx, side) into one int64
    (cross joins may reuse row ids on both sides; assumes |row_idx| < 2^62,
    which every ingest path guarantees: footer offsets / arange / cast ids)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..functions.packing import unpack_binary_column

        lv, lo = unpack_binary_column(t["l_members"], np.int64)
        rv, ro = unpack_binary_column(t["r_members"], np.int64)
        ls, _ = unpack_binary_column(t["l_sides"], np.int8)
        rs, _ = unpack_binary_column(t["r_sides"], np.int8)
        pk = t["pkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        l_sizes = np.diff(lo)
        r_sizes = np.diff(ro)
        pkey = np.concatenate([np.repeat(pk, l_sizes), np.repeat(pk, r_sizes)])
        member = np.concatenate([lv, rv]).astype(np.int64, copy=False)
        side = np.concatenate([ls, rs]).astype(np.int64, copy=False)
        mkey = member * 2 + side
        order = np.lexsort((mkey, pkey))
        pkey, mkey = pkey[order], mkey[order]
        keep = np.ones(len(pkey), dtype=bool)
        keep[1:] = (pkey[1:] != pkey[:-1]) | (mkey[1:] != mkey[:-1])
        return pa.table({"pkey": pa.array(pkey[keep]), "mkey": pa.array(mkey[keep])})


# The verify exchange unions memberset rows (kind 0) and member-text rows
# (kind 1) into one dataset co-bucketed on (pkey, salt); see _tag_msets /
# _tag_refs in lsh_match_edges for the authoritative row shape.


def _make_mset_verify(vocab_ref, config: EngineConfig, cross: bool):
    """Bucket UDF for the any-scale verify: each bucket holds whole
    membersets (kind-0 rows, packed) plus the texts of every member they
    mention (kind-1 rows, one per distinct (pkey, member)). Pairs are
    emitted IN-TASK with the exact `_PairsFromMembersets` semantics
    (clique / star+small-clique / mode-1 chunk-pair), the bucket's texts
    are tf-idf-encoded ONCE, and only pairs at/above ``min_similarity``
    leave the task — candidate pairs never enter an exchange; verified
    edges (few) are what shuffles afterwards."""
    star = config.lsh_pair_emission == "star" and not cross
    threshold = config.min_similarity

    empty = pa.table(
        {
            "left_idx": pa.array([], type=pa.int64()),
            "right_idx": pa.array([], type=pa.int64()),
            "similarity": pa.array([], type=pa.float64()),
        }
    )

    import os as _osv

    _noop = bool(_osv.environ.get("SGR_VERIFY_NOOP"))  # diagnostic only
    _timing = bool(_osv.environ.get("SGR_VERIFY_TIMING"))  # diagnostic only

    def verify_bucket(t: pa.Table) -> pa.Table:
        # ARROW bucket (bucket_format="pyarrow"): the tagged union carries
        # text strings + packed-binary membersets, and a pandas bucket frame
        # boxes every one of those values into a Python object before the
        # UDF even starts (measured: the dominant cost of this exchange).
        # Arrow slices stay zero-copy; only the texts that feed the encoder
        # are materialized as Python strings (the encoder needs them anyway).
        import time as _t

        from ..functions.packing import unpack_binary_column
        from ..sparse import pair_dots

        if _noop:
            return empty
        t0 = _t.perf_counter()
        kind = t["kind"].to_numpy(zero_copy_only=False)
        txt_mask = kind == 1
        n_txt = int(txt_mask.sum())
        n_ms = len(t) - n_txt
        if not n_ms or not n_txt:
            return empty
        tr_idx = np.flatnonzero(txt_mask)
        mk = t["mkey"].to_numpy(zero_copy_only=False)[tr_idx]
        order = np.argsort(mk, kind="stable")
        mk_sorted = mk[order]
        txt_list = (
            t["m_txt"].take(pa.array(tr_idx[order], type=pa.int64())).to_pylist()
        )
        t1 = _t.perf_counter()

        # pair emission over the bucket's membersets: the packed buffers come
        # straight off the Arrow binary columns (zero-copy) and run the SAME
        # vectorized kernel as the broadcast path — canonical, deduped (a, b)
        # come back, so a pair re-found by many of this cluster's membersets
        # is verified once.
        # pair emission is per-mset and pairs_from_mset_buffers dedups the
        # whole frame; hot-anchor spreading happens UPSTREAM (msets of a hot
        # anchor are salted into different buckets), so cross-salt duplicate
        # pairs are collapsed by the global dedup_pairs after this stage
        ms = t.select(
            ["l_members", "r_members", "l_sides", "r_sides", "mode"]
        ).filter(pa.array(~txt_mask))
        lv, lo = unpack_binary_column(ms["l_members"], np.int64)
        rv, ro = unpack_binary_column(ms["r_members"], np.int64)
        ls, _ = unpack_binary_column(ms["l_sides"], np.int8)
        rs, _ = unpack_binary_column(ms["r_sides"], np.int8)
        a, b = pairs_from_mset_buffers(
            lv, lo, rv, ro, ls, rs,
            ms["mode"].to_numpy(zero_copy_only=False).astype(np.int8),
            cross, star,
        )
        t2 = _t.perf_counter()
        if not len(a):
            return empty
        if cross:
            ka, kb = a * 2, b * 2 + 1  # oriented: left side 0, right side 1
        else:
            ka, kb = a * 2, b * 2  # self-join: side always 0

        pi = _rows_to_positions(mk_sorted, ka)
        pj = _rows_to_positions(mk_sorted, kb)
        t3 = _t.perf_counter()
        encoder = TfidfEncoder(vocab_ref, config)  # zero-copy plasma read
        csr = encoder.encode_batch(txt_list)
        t4 = _t.perf_counter()
        # chunk the dots: one whole-bucket call allocates ~n_pairs × nnz × 8 B
        # per intermediate (~1 GB at 200k pairs) — numpy mmaps blocks that
        # size, so every call refaults fresh zero pages (measured ~25× the
        # warm-buffer rate). ≤64k-pair chunks stay under glibc's adaptive
        # mmap threshold and reuse heap memory across chunks — the same
        # reason the broadcast verify batches at 65536.
        if len(a) > 65536:
            sims = np.empty(len(a), dtype=np.float64)
            for s0 in range(0, len(a), 65536):
                s1 = min(s0 + 65536, len(a))
                sims[s0:s1] = pair_dots(csr, csr, pi[s0:s1], pj[s0:s1])
        else:
            sims = pair_dots(csr, csr, pi, pj)
        t5 = _t.perf_counter()
        if _timing:
            print(
                f"[vb] n_txt={len(txt_list)} n_pairs={len(a)} "
                f"prep={t1 - t0:.2f} emit={t2 - t1:.2f} pos={t3 - t2:.2f} "
                f"encode={t4 - t3:.2f} dots={t5 - t4:.2f}",
                flush=True,
            )
        keep2 = sims >= max(threshold, 1e-300)
        return pa.table(
            {
                "left_idx": pa.array(a[keep2]),
                "right_idx": pa.array(b[keep2]),
                "similarity": pa.array(sims[keep2]),
            }
        )

    return verify_bucket


def collect_row_csr(
    vec_ds: "ray.data.Dataset", vocab_size: int, batch_size: int = 8192
) -> Tuple[np.ndarray, "CSRBatch"]:
    """Stream a vectorized dataset into one driver-side CSR, rows sorted by
    ``row_idx``. Fully vectorized via Arrow list kernels — no per-row work.

    This is the broadcast verify state: ~nnz×12 bytes, put in the object
    store ONCE and read once per verifier actor.
    """
    import pyarrow.compute as pc

    from ..sparse import CSRBatch, _gather_positions

    # Flatten PARALLEL (map_batches), then assemble on the driver from the
    # materialized block refs — plasma reads are zero-copy on the local
    # node, so the driver pays only frombuffer + concat + argsort + gather.
    # The previous iter_batches stream flattened serially on the driver
    # (~8.5 s per 1M rows of parallelism-independent wall vs ~3 s here;
    # back-to-back A/B in one session). Each batch flattens to ONE output
    # row of four binary blobs (row ids, per-row lengths, flat term ids,
    # flat weights) — concatenation-safe however Ray bundles blocks.
    def flatten_block(t: pa.Table) -> pa.Table:
        tcol = t["term_ids"]
        rows = t["row_idx"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(tcol).cast(pa.int64()).to_numpy(zero_copy_only=False)
        terms = pc.list_flatten(tcol).cast(pa.int32()).to_numpy(zero_copy_only=False)
        ws = pc.list_flatten(t["term_weights"]).cast(pa.float64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "rows": pa.array([rows.tobytes()], type=pa.binary()),
                "lens": pa.array([lens.tobytes()], type=pa.binary()),
                "terms": pa.array([terms.tobytes()], type=pa.binary()),
                "ws": pa.array([ws.tobytes()], type=pa.binary()),
            }
        )

    refs = (
        vec_ds.select_columns(["row_idx", "term_ids", "term_weights"])
        .map_batches(flatten_block, batch_format="pyarrow", batch_size=65536)
        .materialize()
        .to_arrow_refs()
    )
    row_parts: List[np.ndarray] = []
    len_parts: List[np.ndarray] = []
    term_parts: List[np.ndarray] = []
    w_parts: List[np.ndarray] = []
    for tbl in ray.get(refs):
        for i in range(len(tbl)):
            row_parts.append(np.frombuffer(tbl["rows"][i].as_py(), dtype=np.int64))
            len_parts.append(np.frombuffer(tbl["lens"][i].as_py(), dtype=np.int64))
            term_parts.append(np.frombuffer(tbl["terms"][i].as_py(), dtype=np.int32))
            w_parts.append(np.frombuffer(tbl["ws"][i].as_py(), dtype=np.float64))
    # empty-batch members are harmless in np.concatenate; only guard the
    # nothing-at-all case (and all-empty term lists, legal for empty texts)
    term_parts = [p for p in term_parts if len(p)] or [np.empty(0, dtype=np.int32)]
    w_parts = [p for p in w_parts if len(p)] or [np.empty(0, dtype=np.float64)]
    row_parts = [p for p in row_parts if len(p)]
    len_parts = [p for p in len_parts if len(p)]
    if not row_parts:
        return np.empty(0, dtype=np.int64), CSRBatch(
            indptr=np.zeros(1, dtype=np.int64),
            indices=np.empty(0, dtype=np.int32),
            data=np.empty(0, dtype=np.float64),
            n_cols=vocab_size,
        )
    rows = np.concatenate(row_parts)
    lens = np.concatenate(len_parts)
    terms = np.concatenate(term_parts)
    ws = np.concatenate(w_parts)
    order = np.argsort(rows, kind="stable")
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    pos = _gather_positions(starts[order], lens[order])
    indptr = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(lens[order], out=indptr[1:])
    return rows[order], CSRBatch(
        indptr=indptr, indices=terms[pos], data=ws[pos], n_cols=vocab_size
    )


def _rows_to_positions(sorted_ids: np.ndarray, rows: np.ndarray) -> np.ndarray:
    pos = np.searchsorted(sorted_ids, rows)
    n = len(sorted_ids)
    ok = (pos < n) & (sorted_ids[np.minimum(pos, max(n - 1, 0))] == rows)
    if not bool(ok.all()):
        raise KeyError(
            f"verify: candidate pair references rows absent from the "
            f"vectorized side (e.g. {rows[~ok][:3].tolist()})"
        )
    return pos


class _VerifyCosineBroadcast:
    """Exact cosine verify against broadcast CSR state: row-id lookup is one
    searchsorted, the dots are one vectorized :func:`~..sparse.pair_dots`
    call per batch — no per-pair Python (this is the hottest stage of the
    flagship pipeline)."""

    def __init__(self, maps_ref, threshold: float):
        # hold the REF; resolve lazily on the worker. Constructed on the
        # driver (use_actor_pools=False) an eager ray.get here would embed
        # the full CSR arrays (~360 MB per 1M rows) in the pickled operator
        # spec — every worker then pays a deserializing copy instead of the
        # zero-copy plasma read the broadcast exists for.
        self._ref = maps_ref
        self.threshold = threshold
        self._state = None

    def _states(self):
        if self._state is None:
            l_state, r_state = (
                ray.get(self._ref) if isinstance(self._ref, ray.ObjectRef) else self._ref
            )
            self._state = (l_state, r_state if r_state is not None else l_state)
        return self._state

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..sparse import pair_dots

        (l_ids, l_csr), (r_ids, r_csr) = self._states()
        l_rows = t["left_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        r_rows = t["right_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = pair_dots(
            l_csr,
            r_csr,
            _rows_to_positions(l_ids, l_rows),
            _rows_to_positions(r_ids, r_rows),
        )
        keep = sims >= max(self.threshold, 1e-300)
        return pa.table(
            {
                "left_idx": pa.array(l_rows[keep]),
                "right_idx": pa.array(r_rows[keep]),
                "similarity": pa.array(sims[keep]),
            }
        )


class _NormHash:
    """(row_idx, text) → (row_idx, nhash) where nhash is the FNV-64 of the
    normalized transcript (the exact-dup identity)."""

    def __init__(self, config: EngineConfig, text_col: str):
        from ..text import NGramTokenizer, fnv1a_64_batch

        self.tokenizer = NGramTokenizer(config)
        self.text_col = text_col
        self._hash = fnv1a_64_batch

    def __call__(self, t: pa.Table) -> pa.Table:
        norms = [self.tokenizer.normalize(s) for s in t[self.text_col].to_pylist()]
        h = self._hash(norms).astype(np.int64)
        return pa.table({"row_idx": t["row_idx"], "nhash": pa.array(h)})


def _normhash_ds(
    left: "ray.data.Dataset", config: EngineConfig, text_col: str
) -> "ray.data.Dataset":
    """(row_idx, nhash) rows — the shared exact-dup identity stage for both
    the distributed collapse and the driver lexsort route (one definition,
    so the two routes cannot diverge on group identity).

    When the input already carries an ``nhash`` column (clipdedup fuses the
    hash into its narrow-read projection so it computes during the
    already-parallel read instead of as a separate stage on the critical
    path), it is used as-is — the producer MUST have used the same
    tokenizer normalization + FNV-64 (clipdedup reuses ``_NormHash``)."""
    sch = left.schema(fetch_if_missing=False)
    if sch is not None and "nhash" in sch.names:
        return left.select_columns(["row_idx", "nhash"])
    from ..functions.stagemap import stage_map_batches

    return stage_map_batches(
        left.select_columns(["row_idx", text_col]), _NormHash, (config, text_col),
        config, batch_format="pyarrow", batch_size=config.batch_size,
    )


def _exact_dup_collapse(
    left: "ray.data.Dataset", config: EngineConfig, text_col: str
):
    """Group identical normalized transcripts; return (rep_map, exact_edges).

    rep_map: (row_idx, rep_idx) for EVERY row (reps map to themselves);
    exact_edges: (left_idx=rep, right_idx=member, similarity=1.0).
    """
    from ..functions.grouped import bucketed_group_map

    hashed = _normhash_ds(left, config, text_col)

    def rep_of(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["nhash", "row_idx"], kind="stable")
        rep = df.groupby("nhash", sort=False)["row_idx"].transform("first")
        return pd.DataFrame(
            {
                "row_idx": df["row_idx"].to_numpy(dtype=np.int64),
                "rep_idx": rep.to_numpy(dtype=np.int64),
            }
        )

    rep_map = bucketed_group_map(hashed, ["nhash"], rep_of).materialize()

    def to_edges(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.not_equal(t["row_idx"], t["rep_idx"])
        sub = t.filter(mask)
        return pa.table(
            {
                "left_idx": sub["rep_idx"],
                "right_idx": sub["row_idx"],
                "similarity": pa.array(np.ones(len(sub), dtype=np.float64)),
            }
        )

    exact_edges = rep_map.map_batches(to_edges, batch_format="pyarrow")
    return rep_map, exact_edges




class StageTimer:
    """Env-gated stage timer (SGR_PROFILE=1): prints elapsed between marks.
    Instantiated once per pipeline call — concurrently-profiled pipelines
    each get their own instance instead of interleaving marks through a
    shared module global. Zero cost when the variable is unset."""

    def __init__(self, tag: str = "lsh"):
        import os

        self.enabled = bool(os.environ.get("SGR_PROFILE"))
        self.tag = tag
        self._t: Optional[float] = None

    def __call__(self, label: str) -> None:
        if not self.enabled:
            return
        import time

        now = time.time()
        if self._t is not None:
            print(f"    [{self.tag}] {label}: {now - self._t:.1f}s", flush=True)
        self._t = now


def lsh_match_edges(
    left: "ray.data.Dataset",
    right: Optional["ray.data.Dataset"],
    vocab_ref,
    config: EngineConfig,
    text_col: str = "text",
    tmark: Optional[StageTimer] = None,
) -> "ray.data.Dataset":
    """MinHash/LSH candidates → exact-cosine verify → top-N edge list.

    ``vocab_ref`` is either a ready ``ObjectRef`` or a callable supplier
    (``_VocabSupplier``): the vocabulary feeds only the TF-IDF verify, so
    a supplier lets the fit run CONCURRENTLY with the exact-dup collapse /
    banding / census stages (a prefetch thread resolves it immediately;
    consumers block on the lock only if they outrun it)."""
    cross = right is not None
    _tmark = tmark or StageTimer()
    _tmark("start")

    if callable(vocab_ref):
        import threading as _threading

        _supplier = vocab_ref

        def _vocab_ref():
            return _supplier()

        def _prefetch():
            try:
                _supplier()
            except BaseException:
                # leave the error for a consumer-thread call, which
                # re-attempts the (pure) fit and raises where it's handled
                pass

        _threading.Thread(
            target=_prefetch, name="vocab-fit-prefetch", daemon=True
        ).start()
    else:
        _ready_ref = vocab_ref

        def _vocab_ref():
            return _ready_ref

    exact_edges = None
    if config.exact_dup_shortcircuit and not cross:
        n_rows = left.count()
        rep_ids = None
        if n_rows <= min(
            config.rep_broadcast_max_rows, config.exactdup_driver_max_rows
        ):
            # driver route: one parallel NormHash map, then the whole
            # group-by-hash → rep-per-group chain is a single numpy lexsort
            # on the driver (16 B/row collected). Replaces a bucketed sort
            # exchange + rep_map materialize + a second full collect — all
            # parallelism-independent latency at small/mid scale. Same
            # semantics: groups keyed on the normalized-transcript FNV-64,
            # rep = min row_idx of the group.
            from ..functions.collect import collect_columns

            cols = collect_columns(
                _normhash_ds(left, config, text_col), ["row_idx", "nhash"]
            )
            rows_np = cols["row_idx"].astype(np.int64)
            nh = cols["nhash"].astype(np.int64)
            order = np.lexsort((rows_np, nh))
            rs, hs = rows_np[order], nh[order]
            first = np.empty(len(rs), dtype=bool)
            first[:1] = True
            first[1:] = hs[1:] != hs[:-1]
            # group's first (= min) row_idx propagated to every member
            start_pos = np.where(first, np.arange(len(rs)), 0)
            np.maximum.accumulate(start_pos, out=start_pos)
            rep_per_row = rs[start_pos] if len(rs) else rs
            rep_ids = np.sort(rs[first])
            member_mask = rep_per_row != rs
            from ..functions.blocks import from_arrow_sliced

            # sliced: at the 8M-row cutoff this can be millions of edge rows
            # — one monolithic block would serialize every downstream map
            exact_edges = from_arrow_sliced(
                pa.table(
                    {
                        "left_idx": pa.array(
                            rep_per_row[member_mask], type=pa.int64()
                        ),
                        "right_idx": pa.array(rs[member_mask], type=pa.int64()),
                        "similarity": pa.array(
                            np.ones(int(member_mask.sum()), dtype=np.float64)
                        ),
                    }
                )
            )
        else:
            rep_map, exact_edges = _exact_dup_collapse(left, config, text_col)
        if rep_ids is not None or n_rows <= config.rep_broadcast_max_rows:
            if rep_ids is None:
                # broadcast the rep id set; filter is a map, not a join barrier
                from ..functions.collect import collect_columns

                cols = collect_columns(rep_map, ["row_idx", "rep_idx"])
                rep_ids = np.sort(
                    cols["row_idx"][cols["row_idx"] == cols["rep_idx"]]
                )
            rep_ref = ray.put(rep_ids)

            class _RepFilter:
                def __init__(self, ref):
                    self._ref = ref  # resolved lazily: zero-copy per worker
                    self._reps = None

                def __call__(self, t: pa.Table) -> pa.Table:
                    if self._reps is None:
                        self._reps = (
                            ray.get(self._ref)
                            if isinstance(self._ref, ray.ObjectRef)
                            else self._ref
                        )
                    reps = self._reps
                    rows = t["row_idx"].to_numpy(zero_copy_only=False)
                    pos = np.searchsorted(reps, rows)
                    ok = pos < len(reps)
                    keep = np.zeros(len(rows), dtype=bool)
                    keep[ok] = reps[pos[ok]] == rows[ok]
                    return t.filter(pa.array(keep))

            from ..functions.stagemap import stage_map_batches as _smb

            left = _smb(
                left.select_columns(["row_idx", text_col]), _RepFilter, (rep_ref,),
                config, batch_format="pyarrow", batch_size=config.batch_size,
            ).materialize()
        else:
            reps_only = rep_map.map_batches(
                lambda t: t.filter(
                    __import_pc__().equal(t["row_idx"], t["rep_idx"])
                ).select(["row_idx"]),
                batch_format="pyarrow",
            ).map_batches(
                lambda t: t.rename_columns(["rep_row"]), batch_format="pyarrow"
            )
            left = shuffle_join(
                reps_only, left.select_columns(["row_idx", text_col]),
                on="rep_row", right_on="row_idx", how="inner",
                left_schema=pa.schema([("rep_row", pa.int64())]),
                right_schema=pa.schema([("row_idx", pa.int64()), (text_col, pa.string())]),
            ).map_batches(
                lambda t: pa.table({"row_idx": t["row_idx"], text_col: t[text_col]}),
                batch_format="pyarrow",
            ).materialize()

    _tmark("exact_dup_collapse+rep_filter")
    from ..functions.grouped import groupby_agg
    from ..functions.stagemap import stage_map_batches

    n_left = left.count()
    n_right = right.count() if cross else 0
    use_broadcast = (n_left + n_right) <= config.verify_broadcast_max_rows
    if _tmark.enabled:
        print(
            f"    [match] verify route: "
            f"{'broadcast' if use_broadcast else 'join'} "
            f"(rows={n_left + n_right}, cutoff={config.verify_broadcast_max_rows})",
            flush=True,
        )

    def _vec_ds(src):
        return stage_map_batches(
            src.select_columns(["row_idx", text_col]),
            TfidfEncoder,
            (_vocab_ref(), config, text_col),
            config,
            batch_format="pyarrow",
            batch_size=config.batch_size,
        )

    # Broadcast-verify CSR state depends only on (left, right, vocab) — not
    # on the candidate pairs — so build it CONCURRENTLY with the banding /
    # census / salting / pair-emission chain. Those stages are exchange-bound
    # (CPUs idle while blocks move through the object store); the TF-IDF
    # encode map soaks up the idle slots and the ~8 s/1M-row encode+assemble
    # tail disappears from the critical path. Ray Data executes each
    # driver-thread's dataset with its own streaming executor, so the two
    # pipelines interleave safely.
    csr_box: dict = {}
    csr_thread = None
    if use_broadcast:
        import threading

        def _build_csr():
            try:
                vocab_size = ray.get(_vocab_ref()).size
                l_state = collect_row_csr(_vec_ds(left), vocab_size)
                r_state = (
                    collect_row_csr(_vec_ds(right), vocab_size) if cross else None
                )
                csr_box["ref"] = ray.put((l_state, r_state))
            except BaseException as exc:  # re-raised on join
                csr_box["err"] = exc

        csr_thread = threading.Thread(
            target=_build_csr, name="broadcast-csr-build", daemon=True
        )
        csr_thread.start()

    import os as _os_env

    rate = config.census_sample_rate
    if _os_env.environ.get("SGR_CENSUS_RATE"):  # A/B override, like SGR_PROFILE
        rate = float(_os_env.environ["SGR_CENSUS_RATE"])
    if rate is None:
        rate = 1.0 if (n_left + n_right) <= 500_000 else 0.125

    def _census(src, scale: int, threshold: float) -> dict:
        """band_key → n_chunks for buckets whose (scaled) count clears the
        threshold."""
        counts = groupby_agg(src, "band_key", None, "count", num_buckets=64)
        hot_rows = counts.map_batches(
            lambda t: t.filter(
                __import_pc__().greater(t["count()"], threshold / scale)
            ),
            batch_format="pyarrow",
        ).take_all()
        return {
            int(r["band_key"]): int(
                -(-(r["count()"] * scale) // config.max_bucket_size)
            )
            for r in hot_rows
        }

    def _bands(l_src, r_src):
        b = _band_rows(l_src, config, text_col, side=0)
        if cross:
            b = b.union(_band_rows(r_src, config, text_col, side=1))
        return b

    if rate >= 1.0:
        # exact census: band rows once, materialized — the census and the
        # salted chain both consume it, and an A/B at 1M showed the lazy
        # re-execution costs ~49 s in the census alone vs ~3 s census + one
        # plasma round-trip when materialized (banding is the widest map).
        banded = _bands(left, right).materialize()
        _tmark("band_rows")
        hot = _census(banded, 1, float(config.max_bucket_size))
    else:
        # SAMPLED census: band only a 1/inv hash-sample of the rows for the
        # hot-bucket estimate (small, finishes fast), then let the FULL
        # banding STREAM straight into the salted shuffle — no materialize
        # barrier, no full-volume census exchange. Salting never changes the
        # pair set, so estimation error costs balance, not correctness; the
        # 0.75× threshold biases toward salting borderline-hot buckets.
        inv = max(2, int(round(1.0 / max(rate, 1e-9))))  # rate<=0 → full census would be wrong; clamp to a huge-but-finite inverse

        def _sample(src):
            def fn(t: pa.Table) -> pa.Table:
                rows = t["row_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
                keep = (_sm64(rows.view(np.uint64)) % np.uint64(inv)) == 0
                return t.filter(pa.array(keep))

            return src.select_columns(["row_idx", text_col]).map_batches(
                fn, batch_format="pyarrow"
            )

        hot = _census(
            _bands(_sample(left), _sample(right) if cross else None),
            inv, 0.75 * config.max_bucket_size,
        )
        banded = _bands(left, right)
        _tmark("band_rows(sampled census)")
    hot_ref = ray.put(hot)
    _tmark("hot_census")

    from ..functions.stagemap import stage_map_batches

    salted = stage_map_batches(
        banded,
        _SaltHotBuckets,
        (hot_ref, config.max_bucket_size),
        config,
        batch_format="pyarrow",
        batch_size=config.batch_size,
    )

    # 3-4. memberset extraction per salted bucket → GLOBAL memberset dedup →
    # pair emission → pair dedup.
    # The memberset dedup is the big shuffle saver: a stable near-dup cluster
    # lands in the same bucket in most of the 32 bands, and without it every
    # band re-emits the same O(k²) pairs (observed 924M pre-dedup pair rows
    # for 1M inputs). One row per bucket (packed member ids, ~k×8 bytes)
    # collapses band repeats BEFORE the quadratic emission.
    from ..functions.grouped import bucketed_group_map, dedup_pairs

    # bundle hint: the band-row exchange moves ~rows × (bands + exact-dup
    # collapse band) narrow rows; downstream mset/pair exchanges are the
    # same order or smaller (bundle_for floors small estimates)
    from ..functions.grouped import bundle_for

    _bundle = bundle_for((n_left + n_right) * (config.lsh_bands + 1))
    msets = bucketed_group_map(
        salted, ["band_key", "salt"], _memberset_bucket, bundle_rows=_bundle
    )
    msets = dedup_pairs(msets, ["mset_hash"], bundle_rows=_bundle)

    # 5. verify: exact cosine on candidate pairs.
    #    broadcast mode (vectors fit the object store): emit + dedup pairs,
    #    pack all vectors into one broadcast CSR, verify in a single map
    #    stage — no join shuffles.
    #    band-local mode (any scale): membersets explode into MEMBER rows
    #    (linear in bucket occupancy), ONE shuffle_join attaches texts, a
    #    bucketed regroup by memberset verifies each bucket's pairs in-task
    #    — candidate pairs never enter an exchange; only verified edges do.
    import gc

    if use_broadcast:
        pkey_emission = config.lsh_pkey_pair_emission
        if _os_env.environ.get("SGR_PKEY_EMISSION"):  # A/B override
            pkey_emission = _os_env.environ["SGR_PKEY_EMISSION"] == "1"
        if pkey_emission:
            # Cluster-anchored pair emission (mirrors the band-local verify
            # design): membersets co-locate by their cluster anchor (pkey),
            # pairs are emitted AND fully deduped inside the bucket task, and
            # the pair stream feeds the broadcast verify directly — candidate
            # pairs never enter an exchange. The previous order
            # (emit → global pair dedup → verify) moved the PRE-dedup pair
            # volume through a full sort exchange, and the within-batch
            # lexsort only caught same-batch repeats, so on dup-heavy data
            # the exchange volume grew with bands × cluster size (the
            # membersets+pairs stage measured 129 s of a 202 s 4M-row
            # flagship run). Cross-pkey duplicates (a cluster whose min
            # member differs across bands) survive to the verify and are
            # deduped on the PASSING edges below — far fewer rows.
            msets_pk = msets.map_batches(
                _MsetPkey(), batch_format="pyarrow", batch_size=8192
            )
            _emitter = _PairsFromMembersets(cross, config.lsh_pair_emission)

            def _emit_bucket(df: pd.DataFrame) -> pa.Table:
                t = pa.table(
                    {
                        "l_members": pa.array(df["l_members"], type=pa.binary()),
                        "r_members": pa.array(df["r_members"], type=pa.binary()),
                        "l_sides": pa.array(df["l_sides"], type=pa.binary()),
                        "r_sides": pa.array(df["r_sides"], type=pa.binary()),
                        "mode": pa.array(
                            df["mode"].to_numpy(dtype=np.int8), type=pa.int8()
                        ),
                    }
                )
                return _emitter(t)  # emits + lexsort-dedups the whole bucket

            # mset rows ≈ input rows in count (far fewer than pair rows);
            # size bundles to that so emission — which runs as the exchange's
            # reduce tasks — keeps full task fan-out
            pairs = bucketed_group_map(
                msets_pk,
                ["pkey"],
                _emit_bucket,
                bundle_rows=bundle_for(n_left + n_right),
            )
            pairs = (
                pairs.repartition(target_num_rows_per_block=65536).materialize()
            )
            del msets_pk
        else:
            # streaming (split-only, no shuffle) repartitions: the sort-based
            # bucketed exchanges emit few, large blocks — one per reduce
            # partition — and Ray sizes map-task fan-out by block count, so
            # the quadratic pair emission and the verify ran as ~4 tasks on
            # 32 CPUs. Splitting blocks restores full task fan-out for ~zero
            # cost.
            pairs = msets.repartition(target_num_rows_per_block=16384).map_batches(
                _PairsFromMembersets(cross, config.lsh_pair_emission),
                batch_format="pyarrow",
                batch_size=8192,
            )
            pairs = (
                dedup_pairs(pairs, ["left_idx", "right_idx"], bundle_rows=_bundle)
                .repartition(target_num_rows_per_block=65536)
                .materialize()
            )
        # Release the banded/salted/memberset lineage NOW: pairs owns its own
        # blocks after materialize, but the lazy datasets above keep the
        # banded blocks (rows × bands — the pipeline's widest intermediate)
        # pinned in the object store. Ray Data's streaming executor budgets
        # store memory per operator and throttles task launches when the
        # store is near its reservation — with these pinned, a downstream
        # sort ran with ~95% idle CPUs (measured 244 s for a 2M-row verify
        # that runs in ~60 s once freed).
        del banded, salted, msets
        gc.collect()
        _tmark("membersets+pairs")
        if _tmark.enabled:
            print(f"    [match] candidate pairs: {pairs.count()}", flush=True)

        csr_thread.join()
        if "err" in csr_box:
            raise csr_box["err"]
        maps_ref = csr_box["ref"]
        _tmark("csr_join")
        verified = stage_map_batches(
            pairs,
            _VerifyCosineBroadcast,
            (maps_ref, config.min_similarity),
            config,
            batch_format="pyarrow",
            batch_size=65536,
        )
        if pkey_emission:
            # cross-bucket pair dedup on the PASSING edges only: similarities
            # are bit-identical wherever a pair was verified (same packed
            # vectors, same kernel), so keep-first is safe — the same rule as
            # the band-local path below
            verified = dedup_pairs(verified, ["left_idx", "right_idx"])
    else:
        # cluster-anchored verify partitioning: msets keyed by their min
        # member (pkey) so a cluster's cross-band msets land in ONE bucket
        msets = msets.map_batches(
            _MsetPkey(), batch_format="pyarrow", batch_size=8192
        ).materialize()
        # Release the banded/salted lineage (see the broadcast branch note):
        # msets owns its blocks after materialize.
        del banded, salted
        gc.collect()
        _tmark("membersets+pkey")
        if _tmark.enabled:
            print(f"    [match] membersets: {msets.count()}", flush=True)
        pc_ = __import_pc__()

        # ---- anchor canonicalization --------------------------------------
        # pkey (the mset's min member) varies per band for borderline
        # clusters: measured at 2M rows, the same member's text shipped to
        # ~7 distinct pkeys (14.8M text-carrying rows for 2M texts) and the
        # same pair was re-verified in ~7 buckets (36.6M pair instances for
        # ~5M distinct pairs) — encode+dots, the verify's whole CPU bill,
        # scaled with the multiplicity. ONE label-propagation hop fixes the
        # key: a(m) = min pkey over the msets containing member m, and every
        # mset is re-keyed to K = a(pkey). A cluster's cross-band msets then
        # share one bucket, so each text ships ~once and the in-bucket pair
        # dedup collapses cross-band repeats BEFORE the expensive kernels.
        # Two exchanges (X_a anchors+mset relabel, then the mkey text
        # attach) replace the old single attach exchange — member refs are
        # re-derived from the RELABELED msets with a plain explode, so no
        # ref-relabel join/exchange is needed — and the verify exchange's
        # text volume drops ~6×. K is ONLY a placement key — pair emission
        # and similarity never read it, so the edge set is unchanged (the
        # broadcast-equality tests pin this).
        refs0 = msets.map_batches(
            _ExplodeRefs(), batch_format="pyarrow", batch_size=8192
        ).materialize()

        # X_a input: ref occurrences keyed by RAW member id (sides share an
        # anchor slot — harmless for a placement key) ∪ msets keyed by pkey
        def _xa_refs(t: pa.Table) -> pa.Table:
            mk = t["mkey"].to_numpy(zero_copy_only=False)
            n = len(t)
            return pa.table(
                {
                    "rkey": pa.array(mk >> 1),  # arithmetic shift == //2 for negatives
                    "xkind": pa.array(np.zeros(n, dtype=np.int8)),
                    "pkey": t["pkey"],
                    "mset_hash": pa.array(np.zeros(n, dtype=np.int64)),
                    "l_members": pa.nulls(n, pa.binary()),
                    "r_members": pa.nulls(n, pa.binary()),
                    "l_sides": pa.nulls(n, pa.binary()),
                    "r_sides": pa.nulls(n, pa.binary()),
                    "mode": pa.array(np.zeros(n, dtype=np.int8)),
                }
            )

        def _xa_msets(t: pa.Table) -> pa.Table:
            n = len(t)
            return pa.table(
                {
                    "rkey": t["pkey"],
                    "xkind": pa.array(np.ones(n, dtype=np.int8)),
                    "pkey": t["pkey"],
                    "mset_hash": t["mset_hash"],
                    "l_members": t["l_members"],
                    "r_members": t["r_members"],
                    "l_sides": t["l_sides"],
                    "r_sides": t["r_sides"],
                    "mode": t["mode"],
                }
            )

        _mset_schema = pa.schema(
            [
                ("pkey", pa.int64()),
                ("mset_hash", pa.int64()),
                ("l_members", pa.binary()),
                ("r_members", pa.binary()),
                ("l_sides", pa.binary()),
                ("r_sides", pa.binary()),
                ("mode", pa.int8()),
            ]
        )

        def _anchor_and_relabel(t: pa.Table) -> pa.Table:
            # output: relabeled mset rows only. The anchor map itself never
            # leaves the bucket — member refs re-derive from the relabeled
            # msets with a plain explode (no relabel join needed).
            # ARROW bucket: the mset rows carry packed-binary columns a
            # pandas frame would box per value; the relabel itself is a
            # per-rkey min (lexsort + reduceat) + searchsorted — int64-exact
            # throughout (no float64 map/fillna path for ids above 2^53).
            is_ref = t["xkind"].to_numpy(zero_copy_only=False) == 0
            n_ref = int(is_ref.sum())
            if n_ref == len(t):
                return _mset_schema.empty_table()
            pk_all = t["pkey"].to_numpy(zero_copy_only=False)
            ms_mask = ~is_ref
            ms_idx = np.flatnonzero(ms_mask)
            ms_pk = pk_all[ms_idx]
            new_pk = ms_pk
            if n_ref:
                rk = t["rkey"].to_numpy(zero_copy_only=False)[is_ref]
                rpk = pk_all[is_ref]
                ro_ = np.lexsort((rpk, rk))
                rk, rpk = rk[ro_], rpk[ro_]
                starts = np.ones(len(rk), dtype=bool)
                starts[1:] = rk[1:] != rk[:-1]
                a_keys = rk[starts]  # sorted distinct rkeys
                a_vals = rpk[starts]  # min pkey per rkey (lexsort order)
                pos = np.searchsorted(a_keys, ms_pk)
                ok = pos < len(a_keys)
                ok[ok] = a_keys[pos[ok]] == ms_pk[ok]
                new_pk = np.where(ok, a_vals[np.minimum(pos, len(a_keys) - 1)], ms_pk)
            sel = pa.array(ms_idx, type=pa.int64())
            return pa.table(
                {
                    "pkey": pa.array(new_pk.astype(np.int64)),
                    "mset_hash": t["mset_hash"].take(sel),
                    "l_members": t["l_members"].take(sel),
                    "r_members": t["r_members"].take(sel),
                    "l_sides": t["l_sides"].take(sel),
                    "r_sides": t["r_sides"].take(sel),
                    "mode": t["mode"].take(sel),
                }
            )

        msets = bucketed_group_map(
            refs0.map_batches(_xa_refs, batch_format="pyarrow").union(
                msets.map_batches(_xa_msets, batch_format="pyarrow")
            ),
            ["rkey"],
            _anchor_and_relabel,
            bundle_rows=_bundle,
            bucket_format="pyarrow",
        ).materialize()
        del refs0  # consumed by X_a only; the salted explode below re-derives refs
        gc.collect()
        _tmark("anchor_relabel")

        # ---- hot-anchor mset salting ---------------------------------------
        # anchoring co-locates a whole near-dup family under one key, so a
        # giant family serializes its entire verify in ONE task (measured at
        # 2M rows: one bucket held 10.8M of 22.3M pairs, 31 s serial — and
        # family pair counts grow quadratically with rows). Census the
        # estimated emission work per anchor (Σ size² over its msets — the
        # actual per-task emission bill) and SPREAD a hot anchor's msets
        # over s sub-buckets: salt = hash(mset_hash) % s. Pair emission is
        # per-mset, so spreading msets spreads the work exactly; nothing is
        # replicated (each mset, each member text ships to exactly the
        # sub-buckets that hold its msets). Cross-salt duplicate pairs —
        # near-identical msets of one family landing in different salts —
        # survive to the global dedup_pairs below, at a bounded extra
        # dot+dedup cost. (The previous design REPLICATED hot anchors' mset
        # binaries and member refs nsalt× with a per-replica pair-space
        # filter; at 2M rows the sum census × replication exploded the
        # relabel/attach exchanges from ~4 s to 84 s + a >6-min stall.)
        # The census is a partial aggregate + a driver collect of hot keys
        # only (bounded).
        # the census must estimate the EMISSION the verify task will actually
        # run, which depends on the emission mode: under star, msets larger
        # than the 16-member clique cutoff emit 2(s-1) spanning pairs, not
        # s(s-1)/2 — pricing them quadratically over-salts by orders of
        # magnitude, spreading a family's near-identical msets across salt
        # sub-buckets where the in-bucket pair dedup can no longer collapse
        # them (measured at 2M rows: 45.7M candidate dots vs ~22M co-located,
        # plus ~2x text shipping)
        _star_est = config.lsh_pair_emission == "star" and not cross

        def _heat_partial(t: pa.Table) -> pa.Table:
            from ..functions.packing import unpack_binary_column

            _, lo = unpack_binary_column(t["l_members"], np.int64)
            _, ro = unpack_binary_column(t["r_members"], np.int64)
            sz = (np.diff(lo) + np.diff(ro)).astype(np.float64)
            est = sz * (sz - 1.0) / 2.0
            if _star_est:
                est = np.where(sz <= 16.0, est, 2.0 * (sz - 1.0))
            pk = t["pkey"].to_numpy(zero_copy_only=False)
            uk, inv_ = np.unique(pk, return_inverse=True)
            return pa.table(
                {"pkey": pa.array(uk), "est": pa.array(np.bincount(inv_, weights=est))}
            )

        from ..functions.grouped import groupby_agg as _gba

        _salt_min = float(
            _os_env.environ.get("SGR_ANCHOR_SALT_MIN", "4000000")
        )  # emission work per task before spreading (env override for tests/A-B)
        heat = _gba(
            msets.map_batches(_heat_partial, batch_format="pyarrow"),
            "pkey", "est", "sum", out_col="est",
        )
        hot_rows = heat.filter(expr=f"est >= {_salt_min}").take(1024)
        if len(hot_rows) == 1024:
            # bounded collect: beyond the cap the biggest keys still split;
            # the remainder just stays unsplit (placement-only decision)
            print("    [match] anchor-salt census hit the 1024-key cap", flush=True)
        hot_salt = {
            int(r["pkey"]): int(min(64, max(2, round(r["est"] / _salt_min))))
            for r in hot_rows
        }
        hot_ref2 = ray.put(hot_salt)

        def _mset_salt(pk: np.ndarray, mh: np.ndarray) -> np.ndarray:
            """Deterministic per-mset sub-bucket: hash(mset_hash) % nsalt for
            hot anchors, 0 elsewhere. Identical band-copies of one memberset
            share an mset_hash, so they land in the same sub-bucket and the
            in-bucket pair dedup still collapses them before the dots."""
            hs = ray.get(hot_ref2) if isinstance(hot_ref2, ray.ObjectRef) else hot_ref2
            salt = np.zeros(len(pk), dtype=np.int64)
            if hs:
                hk = np.array(sorted(hs), dtype=np.int64)
                hv = np.array([hs[int(k)] for k in hk], dtype=np.int64)
                pos = np.searchsorted(hk, pk)
                ok = pos < len(hk)
                ok[ok] = hk[pos[ok]] == pk[ok]
                if ok.any():
                    ns = hv[pos[ok]]
                    salt[ok] = (
                        _sm64(mh[ok].astype(np.uint64)) % ns.astype(np.uint64)
                    ).astype(np.int64)
            return salt

        # member refs for the attach union: a plain explode of the ALREADY
        # relabeled msets (pkey = anchor K) — no relabel join/exchange. Each
        # ref carries its mset's salt, so a member's text flows to exactly
        # the sub-buckets that hold its msets.
        def _explode_salted(t: pa.Table) -> pa.Table:
            from ..functions.packing import unpack_binary_column

            lv, lo = unpack_binary_column(t["l_members"], np.int64)
            rv, ro = unpack_binary_column(t["r_members"], np.int64)
            ls, _ = unpack_binary_column(t["l_sides"], np.int8)
            rs, _ = unpack_binary_column(t["r_sides"], np.int8)
            pk = t["pkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            mh = t["mset_hash"].to_numpy(zero_copy_only=False).astype(np.int64)
            st = _mset_salt(pk, mh)
            l_sizes = np.diff(lo)
            r_sizes = np.diff(ro)
            pkey = np.concatenate([np.repeat(pk, l_sizes), np.repeat(pk, r_sizes)])
            salt = np.concatenate([np.repeat(st, l_sizes), np.repeat(st, r_sizes)])
            member = np.concatenate([lv, rv]).astype(np.int64, copy=False)
            side = np.concatenate([ls, rs]).astype(np.int64, copy=False)
            mkey = member * 2 + side
            order = np.lexsort((mkey, salt, pkey))
            pkey, salt, mkey = pkey[order], salt[order], mkey[order]
            keep = np.ones(len(pkey), dtype=bool)
            keep[1:] = (
                (pkey[1:] != pkey[:-1])
                | (salt[1:] != salt[:-1])
                | (mkey[1:] != mkey[:-1])
            )
            n = int(keep.sum())
            return pa.table(
                {
                    "mkey": pa.array(mkey[keep]),
                    "pkey": pa.array(pkey[keep]),
                    "m_txt": pa.nulls(n, pa.string()),
                    # int columns in this union carry NO nulls (kind
                    # discriminates instead): a nullable int64 through the
                    # pandas bucket frame degrades to float64 and silently
                    # rounds ids above 2^53 (user id_col values can be
                    # arbitrary int64 — see _ExplodeRefs' 2^62 contract)
                    "kind": pa.array(np.zeros(n, dtype=np.int8)),
                    "salt": pa.array(salt[keep]),
                }
            )

        refs = msets.map_batches(_explode_salted, batch_format="pyarrow")

        def _txt_keyed(src, side_tag: int):
            def fn(t: pa.Table) -> pa.Table:
                key = pc_.add(
                    pc_.multiply(t["row_idx"].cast(pa.int64()), pa.scalar(2, pa.int64())),
                    pa.scalar(side_tag, pa.int64()),
                )
                n = len(t)
                return pa.table(
                    {
                        "mkey": key,
                        "pkey": pa.array(np.zeros(n, dtype=np.int64)),
                        "m_txt": t[text_col],
                        "kind": pa.array(np.ones(n, dtype=np.int8)),
                        "salt": pa.array(np.zeros(n, dtype=np.int64)),
                    }
                )

            return src.select_columns(["row_idx", text_col]).map_batches(
                fn, batch_format="pyarrow"
            )

        txts = _txt_keyed(left, 0)
        if cross:
            txts = txts.union(_txt_keyed(right, 1))

        _attach_schema = pa.schema(
            [
                ("pkey", pa.int64()),
                ("salt", pa.int64()),
                ("mkey", pa.int64()),
                ("m_txt", pa.string()),
            ]
        )

        def _dedup_and_attach(t: pa.Table) -> pa.Table:
            # ARROW bucket: text values ride as Arrow strings end-to-end —
            # a pandas bucket frame would box every text into a Python
            # object before the UDF starts. Join = sort texts by mkey +
            # searchsorted from the deduped refs (inner semantics).
            is_txt = t["kind"].to_numpy(zero_copy_only=False) == 1
            tr_idx = np.flatnonzero(is_txt)
            if not len(tr_idx) or len(tr_idx) == len(t):
                return _attach_schema.empty_table()
            mk_all = t["mkey"].to_numpy(zero_copy_only=False)
            tmk = mk_all[tr_idx]
            torder = np.argsort(tmk, kind="stable")
            tmk_sorted = tmk[torder]
            rmask = ~is_txt
            pk = t["pkey"].to_numpy(zero_copy_only=False)[rmask]
            st = t["salt"].to_numpy(zero_copy_only=False)[rmask]
            rk = mk_all[rmask]
            order = np.lexsort((rk, st, pk))
            pk, st, rk = pk[order], st[order], rk[order]
            keep = np.ones(len(pk), dtype=bool)
            keep[1:] = (
                (pk[1:] != pk[:-1]) | (st[1:] != st[:-1]) | (rk[1:] != rk[:-1])
            )
            pk, st, rk = pk[keep], st[keep], rk[keep]
            pos = np.searchsorted(tmk_sorted, rk)
            ok = pos < len(tmk_sorted)
            ok[ok] = tmk_sorted[pos[ok]] == rk[ok]
            if not ok.all():  # inner-join semantics: drop text-less refs
                pk, st, rk, pos = pk[ok], st[ok], rk[ok], pos[ok]
            txt = t["m_txt"].take(
                pa.array(tr_idx[torder][pos], type=pa.int64())
            )
            return pa.table(
                {"pkey": pa.array(pk), "salt": pa.array(st),
                 "mkey": pa.array(rk), "m_txt": txt}
            )

        # exchange strategy, MEASURED: the band-local verify chains three
        # sort exchanges (mkey text-attach → (pkey,salt) co-bucket →
        # verified-edge dedup); at 1M rows the sort exchanges cost
        # ~60 s wall against <5 s of UDF compute — all barrier
        # mechanics. Ray 2.49's hash-shuffle alternative was tried and
        # REJECTED here: each hash exchange spawns its own persistent
        # aggregator ACTOR pool, and because these exchanges run chained
        # inside one streaming execution (and DataContext.shuffle_strategy
        # leaks to every downstream exchange in the lineage), ~100
        # aggregator processes end up live at once on a 32-CPU host — the
        # 1M dist leg accrued 38 s of CPU in 7+ min of wall before being
        # killed, vs ~2 min end-to-end for sort. Sort stays; the serial
        # floor is priced in BENCH/BASELINE.md.
        # STAGING, MEASURED: running all four sorts inside ONE streaming
        # execution livelocks at 2M rows — the executor splits its store
        # budget across ~20 operators, the upstream map ops sit
        # backpressured holding ~27 GB of queued blocks, and the map stage
        # between sorts is granted 0 CPU for 15+ min (all workers idle,
        # driver scheduling loop at 100%). A sort is a global barrier, so
        # chaining buys no pipelining anyway: materialize each exchange
        # (one sort per execution) and free the previous stage's blocks.
        # bundle sizing (58686c0's measured effect, applied to this chain):
        # the attach exchange moves ~member-occurrence volume (≈ rows ×
        # bands), so the default 524k bundles would leave only ~50 reduce
        # tasks at 2M rows — size to the row volume for ~8 blocks per CPU
        # slot instead
        refs_t = bucketed_group_map(
            refs.union(txts), ["mkey"], _dedup_and_attach, bundle_rows=_bundle,
            bucket_format="pyarrow",
        ).materialize()
        del refs
        gc.collect()
        _tmark("verify:attach_exchange")
        if _tmark.enabled:
            print(f"    [match] refs_t rows: {refs_t.count()}", flush=True)

        # 3. co-bucket membersets with their texts on (pkey, salt); verify
        # in-task. A hot anchor's msets spread over salt sub-buckets
        # (salt = hash(mset_hash) % nsalt); cold rows ride with salt=0.
        def _tag_msets(t: pa.Table) -> pa.Table:
            n = len(t)
            pk = t["pkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            mh = t["mset_hash"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "pkey": t["pkey"],
                    "kind": pa.array(np.zeros(n, dtype=np.int8)),
                    "mset_hash": t["mset_hash"],
                    "l_members": t["l_members"],
                    "r_members": t["r_members"],
                    "l_sides": t["l_sides"],
                    "r_sides": t["r_sides"],
                    "mode": t["mode"],
                    # 0-fill, not nulls: kind discriminates, and nullable
                    # int64 → pandas float64 rounds ids above 2^53
                    "mkey": pa.array(np.zeros(n, dtype=np.int64)),
                    "m_txt": pa.nulls(n, pa.string()),
                    "salt": pa.array(_mset_salt(pk, mh)),
                }
            )

        def _tag_refs(t: pa.Table) -> pa.Table:
            n = len(t)
            return pa.table(
                {
                    "pkey": t["pkey"].cast(pa.int64()),
                    "kind": pa.array(np.ones(n, dtype=np.int8)),
                    "mset_hash": pa.array(np.zeros(n, dtype=np.int64)),
                    "l_members": pa.nulls(n, pa.binary()),
                    "r_members": pa.nulls(n, pa.binary()),
                    "l_sides": pa.nulls(n, pa.binary()),
                    "r_sides": pa.nulls(n, pa.binary()),
                    "mode": pa.array(np.zeros(n, dtype=np.int8)),
                    "mkey": t["mkey"].cast(pa.int64()),
                    "m_txt": t["m_txt"],
                    "salt": t["salt"].cast(pa.int64()),
                }
            )

        tagged = msets.map_batches(_tag_msets, batch_format="pyarrow").union(
            refs_t.map_batches(_tag_refs, batch_format="pyarrow")
        )
        _bundle_n = bundle_for(n_left + n_right)
        verified = bucketed_group_map(
            tagged, ["pkey", "salt"], _make_mset_verify(_vocab_ref(), config, cross),
            bundle_rows=_bundle_n, bucket_format="pyarrow",
        ).materialize()
        # free the widest intermediates (packed msets + text-carrying refs)
        # before the dedup/top-N/CC stages
        del tagged, refs_t, msets
        gc.collect()
        _tmark("verify:inbucket_exchange")
        # cross-bucket pair dedup: similarities are bit-identical wherever a
        # pair was verified (same texts, same encoder), so keep-first is safe
        verified = dedup_pairs(
            verified, ["left_idx", "right_idx"], bundle_rows=_bundle_n
        ).materialize()
        _tmark("verify:dedup_exchange")

    # 6. mirror (self-join pairs were canonicalized) + per-left top-N
    if not cross:
        from ray.data.dataset import MaterializedDataset

        if not isinstance(verified, MaterializedDataset):
            verified = verified.materialize()  # consumed twice (self + mirror)
        _tmark("verify")
        if _os_env.environ.get("SGR_STATS"):
            print(verified.stats(), flush=True)
        mirrored = verified.map_batches(
            lambda t: pa.table(
                {
                    "left_idx": t["right_idx"],
                    "right_idx": t["left_idx"],
                    "similarity": t["similarity"],
                }
            ),
            batch_format="pyarrow",
        )
        diag = left.select_columns(["row_idx"]).map_batches(
            lambda t: pa.table(
                {
                    "left_idx": t["row_idx"],
                    "right_idx": t["row_idx"],
                    "similarity": pa.array(np.ones(len(t), dtype=np.float64)),
                }
            ),
            batch_format="pyarrow",
        )
        verified = verified.union(mirrored, diag)

    topn = config.max_n_matches
    if topn is not None:
        from ..functions.grouped import per_group_topk

        out = per_group_topk(
            verified, "left_idx", ["similarity", "right_idx"], [False, True], topn,
            bundle_rows=_bundle,
        ).select_columns(["left_idx", "right_idx", "similarity"])
    else:
        out = verified.select_columns(["left_idx", "right_idx", "similarity"])
    if exact_edges is not None:
        # exact-dup member edges bypass top-N: dropping one would disconnect
        # the member from its cluster
        out = out.union(exact_edges)
    return out


def __import_pc__():
    import pyarrow.compute as pc

    return pc
