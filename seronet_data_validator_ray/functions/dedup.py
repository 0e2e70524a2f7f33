"""Near-duplicate detection over the `documents` table.

Four strategies, all expressed Ray-Data-first:

- exact content dedup        -> op_queries.dedup_exact (groupby shuffle)
- n-gram Jaccard sim-join    -> prefix-filter blocking (AllPairs/PPJoin,
                                Bayardo et al., WWW'07): EXACT — no false
                                negatives — so it carries a DuckDB all-pairs
                                oracle.
- MinHash + LSH banding      -> Broder'97 / LSH: probabilistic candidate
                                gen, exact Jaccard verify; cross-checked
                                against the exact join in tests.
- SimHash hamming dedup      -> Charikar'02 + pigeonhole band blocking:
                                hamming<=HAM_T implies >=1 of HAM_T+1 bands
                                equal, so candidate gen is lossless given
                                the signatures.

Plan shape (identical for all three pair-producers, and the shape that
holds at 100 TB):
  map_batches(tokenize+key)  ->  flat emit (block_key, doc)  ->
  groupby(block_key).map_groups(pair+verify)  ->  groupby(pair).max  (dedupe)
Every stage is a batch transform; the only all-to-all exchanges are the two
groupbys, keyed on block keys (bounded groups) and pair ids. The token
document-frequency table used for prefix ordering is corpus-small and is
broadcast via ray.put, never re-shipped per batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

JACCARD_NUM, JACCARD_DEN = 9, 10  # tau = 0.9, compared in exact integers
MINHASH_PERMS = 64
LSH_BANDS, LSH_ROWS = 16, 4  # r*b = MINHASH_PERMS; s-curve threshold ~0.55
MERSENNE31 = (1 << 31) - 1
HAM_T = 3  # simhash: pairs at hamming distance <= 3 of 64 bits

_TOKEN_HASH_CACHE: dict[str, int] = {}


def _token_hash(tok: str) -> int:
    h = _TOKEN_HASH_CACHE.get(tok)
    if h is None:
        h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little")
        _TOKEN_HASH_CACHE[tok] = h
    return h


def _prefix_len(n: int) -> int:
    """AllPairs prefix size for Jaccard >= tau: n - ceil(tau*n) + 1."""
    return n - (JACCARD_NUM * n + JACCARD_DEN - 1) // JACCARD_DEN + 1


# ------------------------------------------------------------- token ordering

def df_partials_batch(batch: pa.Table) -> pa.Table:
    """Per-batch partial token document-frequencies (combiner before the
    small groupby — the pre-aggregation pattern of SURVEY §2.6)."""
    toks: list[str] = []
    cnts: list[int] = []
    seen: dict[str, int] = {}
    for txt in batch["text"].to_pylist():
        for t in set(txt.split()):
            seen[t] = seen.get(t, 0) + 1
    toks, cnts = list(seen.keys()), list(seen.values())
    return pa.table({"token": pa.array(toks, type=pa.string()), "cnt": pa.array(cnts, type=pa.int64())})


def token_order(docs_ds) -> dict[str, int]:
    """Global token rank by ascending document frequency (rarest first),
    token-lexicographic tie-break. The result is vocabulary-sized: broadcast
    it, never shuffle it."""
    from ray.data.aggregate import Sum

    df = docs_ds.map_batches(df_partials_batch, batch_format="pyarrow").groupby("token").aggregate(
        Sum("cnt")
    )
    from seronet_data_validator_ray.util import ds_to_table

    tbl = ds_to_table(df)
    pairs = sorted(zip(tbl["sum(cnt)"].to_pylist(), tbl["token"].to_pylist()))
    return {tok: rank for rank, (_, tok) in enumerate(pairs)}


# ------------------------------------------------------------- pair verification

# popcount lookup for uint8 — vectorized bitset intersection counts
_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1).astype(np.uint16)

_EMPTY_PAIRS = pa.table(
    {
        "doc_id_a": pa.array([], type=pa.int64()),
        "doc_id_b": pa.array([], type=pa.int64()),
        "jac_bp": pa.array([], type=pa.int64()),
    }
)


def _verify_pairs_group(group: pa.Table) -> pa.Table:
    """All pairs within one block, exact integer Jaccard >= tau filter.

    Fully vectorized: token ids are remapped to group-local dense ids, each
    doc becomes a bitset row, and pairwise intersection sizes come from one
    chunked AND + popcount — a Python loop with per-pair ``intersect1d`` was
    30 s for the same groups this does in ~1 s at sf0.1."""
    n = group.num_rows
    if n < 2:
        return _EMPTY_PAIRS
    ids = np.asarray(group["doc_id"].to_pylist(), dtype=np.int64)
    tok_col = group["toks"].combine_chunks()
    offs = tok_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = tok_col.values.to_numpy(zero_copy_only=False)
    window = vals[offs[0] : offs[-1]]
    lengths = np.diff(offs)
    uniq, inv = np.unique(window, return_inverse=True)
    n_uniq = len(uniq)
    n_words = (n_uniq + 63) // 64
    bitsets = np.zeros((n, n_words), dtype=np.uint64)
    row_of = np.repeat(np.arange(n), lengths)
    np.bitwise_or.at(
        bitsets,
        (row_of, inv >> 6),
        np.uint64(1) << (inv & 63).astype(np.uint64),
    )
    sizes = lengths.astype(np.int64)
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    out_bp: list[np.ndarray] = []
    chunk = max(1, 16_000_000 // (n * n_words * 8 + 1))
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        anded = bitsets[s:e, None, :] & bitsets[None, :, :]  # (c, n, W)
        inter = (
            _POP8[anded.view(np.uint8)].reshape(e - s, n, n_words * 8).sum(axis=2)
        ).astype(np.int64)
        union = sizes[s:e, None] + sizes[None, :] - inter
        ii, jj = np.nonzero(JACCARD_DEN * inter >= JACCARD_NUM * union)
        gi = ii + s
        keep = gi < jj  # each unordered pair once (positions are unique per doc)
        gi, jj = gi[keep], jj[keep]
        if gi.size:
            ia, ib = ids[gi], ids[jj]
            lo = np.minimum(ia, ib)
            hi = np.maximum(ia, ib)
            out_a.append(lo)
            out_b.append(hi)
            out_bp.append((10000 * inter[gi - s, jj]) // union[gi - s, jj])
    if not out_a:
        return _EMPTY_PAIRS
    return pa.table(
        {
            "doc_id_a": pa.array(np.concatenate(out_a), type=pa.int64()),
            "doc_id_b": pa.array(np.concatenate(out_b), type=pa.int64()),
            "jac_bp": pa.array(np.concatenate(out_bp), type=pa.int64()),
        }
    )


def _dedupe_pairs(pairs_ds) -> pa.Table:
    """A pair can surface under several block keys; keep one row per pair.

    The pair table IS the operator's (collected) result, so the dedupe runs
    as one driver-side Arrow ``group_by`` over the already-small pair rows —
    Ray Data's distributed aggregate costs ~70 s in fixed machinery for the
    same 2.8M-row job this does in ~1 s. At a scale where the pair set
    itself is too big to collect, swap this for the hash-bucketed raw-task
    exchange of stages/uniqueness.py keyed on (doc_id_a, doc_id_b)."""
    from seronet_data_validator_ray.util import ds_to_table

    tbl = ds_to_table(pairs_ds)
    if tbl.num_rows == 0:
        return _EMPTY_PAIRS
    g = tbl.group_by(["doc_id_a", "doc_id_b"]).aggregate([("jac_bp", "max")])
    return g.rename_columns(["doc_id_a", "doc_id_b", "jac_bp"])


# ------------------------------------------------------------- exact prefix-filter join

class PrefixEmitter:
    """Actor-pool stage: resolves the broadcast token-order once per actor,
    emits (anchor=prefix-token-rank, doc_id, toks) rows per document."""

    def __init__(self, order_ref):
        import ray

        self.order: dict[str, int] = ray.get(order_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        anchors, ids, toklists = [], [], []
        order = self.order
        for doc_id, txt in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            ranks = np.array(sorted({order[t] for t in txt.split()}), dtype=np.int64)
            p = _prefix_len(ranks.size)
            for anchor in ranks[:p]:
                anchors.append(int(anchor))
                ids.append(doc_id)
                toklists.append(ranks)
        return pa.table(
            {
                "anchor": pa.array(anchors, type=pa.int64()),
                "doc_id": pa.array(ids, type=pa.int64()),
                "toks": pa.array([t.tolist() for t in toklists], type=pa.list_(pa.int64())),
            }
        )


def jaccard_pairs_exact(sf_dir: str) -> pa.Table:
    import ray
    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    order_ref = ray.put(token_order(docs))
    emitted = docs.map_batches(
        PrefixEmitter,
        fn_constructor_kwargs={"order_ref": order_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=2,
    )
    pairs = emitted.groupby("anchor").map_groups(_verify_pairs_group, batch_format="pyarrow")
    return _dedupe_pairs(pairs)


# ------------------------------------------------------------- MinHash + LSH

def _minhash_params():
    rng = np.random.default_rng(1234)
    a = rng.integers(1, MERSENNE31, size=MINHASH_PERMS, dtype=np.int64)
    b = rng.integers(0, MERSENNE31, size=MINHASH_PERMS, dtype=np.int64)
    return a, b


def minhash_emit_batch(batch: pa.Table) -> pa.Table:
    """Per-doc 64-perm MinHash signature -> 16 banded (band, key) rows.
    Token hashes and signature mins are vectorized numpy; products stay in
    int64 because hashes and multipliers are both < 2^31."""
    a, b = _minhash_params()
    bands, keys, ids, toklists = [], [], [], []
    for doc_id, txt in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        toks = sorted(set(txt.split()))
        h = np.array([_token_hash(t) % MERSENNE31 for t in toks], dtype=np.int64)
        sig = ((a[:, None] * h[None, :] + b[:, None]) % MERSENNE31).min(axis=1)
        ranks = np.array([_token_hash(t) & ((1 << 63) - 1) for t in toks], dtype=np.int64)
        for bi in range(LSH_BANDS):
            key = 0
            for v in sig[bi * LSH_ROWS : (bi + 1) * LSH_ROWS]:
                key = (key * 1315423911 + int(v)) % ((1 << 61) - 1)
            bands.append(bi)
            keys.append(key)
            ids.append(doc_id)
            toklists.append(ranks)
    return pa.table(
        {
            "band": pa.array(bands, type=pa.int32()),
            "key": pa.array(keys, type=pa.int64()),
            "doc_id": pa.array(ids, type=pa.int64()),
            "toks": pa.array([np.sort(t).tolist() for t in toklists], type=pa.list_(pa.int64())),
        }
    )


def minhash_lsh_pairs(sf_dir: str) -> pa.Table:
    """Candidate pairs from LSH buckets, then EXACT Jaccard verify — so the
    only approximation is possible false negatives (P < 1e-7 at tau=0.9
    with 16 bands x 4 rows)."""
    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    emitted = docs.map_batches(minhash_emit_batch, batch_format="pyarrow", zero_copy_batch=True)
    pairs = emitted.groupby(["band", "key"]).map_groups(_verify_pairs_group, batch_format="pyarrow")
    return _dedupe_pairs(pairs)


# ------------------------------------------------------------- SimHash

def simhash_emit_batch(batch: pa.Table) -> pa.Table:
    """64-bit SimHash per doc (count-weighted word features), split into
    HAM_T+1 16-bit bands: hamming(x,y) <= HAM_T forces an equal band."""
    n_bands = HAM_T + 1
    bws = 64 // n_bands
    bands, keys, ids, sigs = [], [], [], []
    for doc_id, txt in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        counts: dict[str, int] = {}
        for t in txt.split():
            counts[t] = counts.get(t, 0) + 1
        feats = list(counts)
        hs = np.array([_token_hash(t) for t in feats], dtype=np.uint64)
        w = np.array([counts[t] for t in feats], dtype=np.int64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        v = ((2 * bits - 1) * w[:, None]).sum(axis=0)
        sig = 0
        for bit in np.nonzero(v > 0)[0]:
            sig |= 1 << int(bit)
        for bi in range(n_bands):
            bands.append(bi)
            keys.append((sig >> (bi * bws)) & ((1 << bws) - 1))
            ids.append(doc_id)
            sigs.append(sig - (1 << 63) if sig >= 1 << 63 else sig)  # store as int64
    return pa.table(
        {
            "band": pa.array(bands, type=pa.int32()),
            "key": pa.array(keys, type=pa.int64()),
            "doc_id": pa.array(ids, type=pa.int64()),
            "sig": pa.array(sigs, type=pa.int64()),
        }
    )


def _simhash_verify_group(group: pa.Table) -> pa.Table:
    ids = group["doc_id"].to_pylist()
    sigs = [s & ((1 << 64) - 1) for s in group["sig"].to_pylist()]
    out_a, out_b, out_h = [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if ids[i] == ids[j]:
                continue
            d = (sigs[i] ^ sigs[j]).bit_count()
            if d <= HAM_T:
                lo, hi = sorted((ids[i], ids[j]))
                out_a.append(lo)
                out_b.append(hi)
                out_h.append(d)
    return pa.table(
        {
            "doc_id_a": pa.array(out_a, type=pa.int64()),
            "doc_id_b": pa.array(out_b, type=pa.int64()),
            "hamming": pa.array(out_h, type=pa.int64()),
        }
    )


def simhash_pairs(sf_dir: str) -> pa.Table:
    import ray.data

    from seronet_data_validator_ray.util import ds_to_table

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    emitted = docs.map_batches(simhash_emit_batch, batch_format="pyarrow", zero_copy_batch=True)
    pairs = emitted.groupby(["band", "key"]).map_groups(
        _simhash_verify_group, batch_format="pyarrow"
    )
    tbl = ds_to_table(pairs)  # pair result is small; dedupe driver-side
    if tbl.num_rows == 0:
        return pa.table(
            {
                "doc_id_a": pa.array([], type=pa.int64()),
                "doc_id_b": pa.array([], type=pa.int64()),
                "hamming": pa.array([], type=pa.int64()),
            }
        )
    g = tbl.group_by(["doc_id_a", "doc_id_b"]).aggregate([("hamming", "min")])
    return g.rename_columns(["doc_id_a", "doc_id_b", "hamming"])


# ------------------------------------------------------------- cluster / keep-set

def connected_components(pairs: pa.Table, col_a: str = "doc_id_a", col_b: str = "doc_id_b"):
    """Union-find over the (small) near-dup pair table -> {doc_id: root}.

    The pair list is orders of magnitude smaller than the corpus (it IS the
    dedup output), so components run driver-side; at a scale where even the
    pair list is huge, this becomes iterative label propagation over the
    bucketed exchange. Roots are the MIN doc_id of each component, so the
    keep-set rule 'keep the smallest id' falls out of the structure."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs[col_a].to_pylist(), pairs[col_b].to_pylist()):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def dedup_clusters(sf_dir: str) -> pa.Table:
    """Near-dup clusters from the MinHash-LSH candidate path (the scale
    path): (doc_id, cluster_rep, cluster_size, keep) for every doc in a
    component of size >= 2; keep = (doc_id == cluster_rep = min id)."""
    import collections

    pairs = minhash_lsh_pairs(sf_dir)
    roots = connected_components(pairs)
    sizes = collections.Counter(roots.values())
    docs = sorted(roots)
    return pa.table(
        {
            "doc_id": pa.array(docs, type=pa.int64()),
            "cluster_rep": pa.array([roots[d] for d in docs], type=pa.int64()),
            "cluster_size": pa.array([sizes[roots[d]] for d in docs], type=pa.int64()),
            "keep": pa.array([d == roots[d] for d in docs], type=pa.bool_()),
        }
    )
