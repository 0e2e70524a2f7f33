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

def _verify_pairs_group(group: pa.Table) -> pa.Table:
    """All pairs within one block, exact integer Jaccard >= tau filter.
    Group sizes are bounded by the block key's selectivity; the quadratic
    loop never leaves one group."""
    ids = group["doc_id"].to_pylist()
    toksets = [np.asarray(t, dtype=np.int64) for t in group["toks"].to_pylist()]
    out_a, out_b, out_bp = [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = toksets[i], toksets[j]
            inter = np.intersect1d(a, b, assume_unique=True).size
            union = a.size + b.size - inter
            if JACCARD_DEN * inter >= JACCARD_NUM * union:
                lo, hi = sorted((ids[i], ids[j]))
                out_a.append(lo)
                out_b.append(hi)
                out_bp.append((10000 * inter) // union)
    return pa.table(
        {
            "doc_id_a": pa.array(out_a, type=pa.int64()),
            "doc_id_b": pa.array(out_b, type=pa.int64()),
            "jac_bp": pa.array(out_bp, type=pa.int64()),
        }
    )


def _dedupe_pairs(pairs_ds) -> pa.Table:
    """A pair can surface under several block keys; keep one row per pair."""
    from ray.data.aggregate import Max

    from seronet_data_validator_ray.util import ds_to_table

    agg = pairs_ds.groupby(["doc_id_a", "doc_id_b"]).aggregate(Max("jac_bp"))
    tbl = ds_to_table(agg)
    if tbl.num_rows == 0:
        return pa.table(
            {
                "doc_id_a": pa.array([], type=pa.int64()),
                "doc_id_b": pa.array([], type=pa.int64()),
                "jac_bp": pa.array([], type=pa.int64()),
            }
        )
    return tbl.rename_columns(["doc_id_a", "doc_id_b", "jac_bp"])


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
    from ray.data.aggregate import Min

    import ray.data

    from seronet_data_validator_ray.util import ds_to_table

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    emitted = docs.map_batches(simhash_emit_batch, batch_format="pyarrow", zero_copy_batch=True)
    pairs = emitted.groupby(["band", "key"]).map_groups(
        _simhash_verify_group, batch_format="pyarrow"
    )
    agg = pairs.groupby(["doc_id_a", "doc_id_b"]).aggregate(Min("hamming"))
    tbl = ds_to_table(agg)
    if tbl.num_rows == 0:
        return pa.table(
            {
                "doc_id_a": pa.array([], type=pa.int64()),
                "doc_id_b": pa.array([], type=pa.int64()),
                "hamming": pa.array([], type=pa.int64()),
            }
        )
    return tbl.rename_columns(["doc_id_a", "doc_id_b", "hamming"])
