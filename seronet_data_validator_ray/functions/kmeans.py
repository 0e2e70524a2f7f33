"""Distributed spherical k-means over the `embeddings` table — the
iterative-algorithm family (semantic clustering / semantic-dedup bucketing
for corpus curation).

This is also the fit behind the IVF index build (ann._fit_centroids runs it
with init='hash' on a bounded unbiased hash-sample). Over the FULL dataset:

- init: the K vectors with the globally smallest vec_id (deterministic under
  any partitioning; found with a per-batch partial min-K + tiny driver merge,
  never a full sort);
- per iteration: centroids ship to every task (K x D floats — small enough to
  ride the task closure; at large K x D you would ``ray.put`` once), each
  batch emits K partial rows (cluster, count, packed float64 sum), the driver
  reduces K rows per block and renormalizes. Nothing corpus-sized ever leaves
  the workers; driver state is K x D per iteration.
- determinism: centroids are rounded to 1e-6 after each update so the result
  is invariant to partial-sum ordering (block count / parallelism); an empty
  cluster keeps its previous centroid.

The final pass emits (vec_id, cluster) — rows-only (no SQL oracle; k-means
is not SQL-expressible); tests cross-check against a single-process numpy
reference with identical init + rounding, and that 1-block and many-block
runs agree exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

KM_K = 8
KM_ITERS = 5


def _stack(batch: pa.Table) -> np.ndarray:
    arr = batch["embedding"].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(batch), -1)


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _init_rank(ids: np.ndarray, init: str) -> np.ndarray:
    """Ranking key for the deterministic init. ``vec_id``: the K globally
    smallest ids (embedding_kmeans' published semantics). ``hash``:
    splitmix64(vec_id) — the K smallest hashes are a UNIFORM pseudo-random
    K-subset of the corpus, deterministic and partitioning-invariant, with
    no first-rows/sorted-input bias (the IVF build uses this)."""
    if init == "hash":
        from seronet_data_validator_ray.functions.dedup import _mix64

        return _mix64(ids.view(np.uint64))  # argsort on uint64 ranks correctly
    return ids


def _init_partial(batch: pa.Table, k: int, init: str = "vec_id") -> pa.Table:
    """Per-batch candidates for the deterministic init: the batch's k
    smallest-ranked rows with their packed normalized vectors."""
    ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    take = np.argsort(_init_rank(ids, init), kind="stable")[:k]
    vecs = _norm_rows(_stack(batch))[take]
    return pa.table(
        {
            "vec_id": pa.array(ids[take], type=pa.int64()),
            "v": pa.array([r.tobytes() for r in vecs], type=pa.large_binary()),
        }
    )


def _iter_partial(batch: pa.Table, cents: np.ndarray) -> pa.Table:
    """One Lloyd E+partial-M step for one batch: cosine argmax assignment,
    then per-cluster (count, float64 sum) — K rows out regardless of batch
    size."""
    k, d = cents.shape
    x = _norm_rows(_stack(batch))
    assign = np.argmax(x @ cents.T, axis=1)
    cnt = np.bincount(assign, minlength=k).astype(np.int64)
    sums = np.zeros((k, d), dtype=np.float64)
    np.add.at(sums, assign, x)
    return pa.table(
        {
            "c": pa.array(np.arange(k, dtype=np.int64)),
            "n": pa.array(cnt, type=pa.int64()),
            "s": pa.array([r.tobytes() for r in sums], type=pa.large_binary()),
        }
    )


def _assign_batch(batch: pa.Table, cents: np.ndarray) -> pa.Table:
    x = _norm_rows(_stack(batch))
    assign = np.argmax(x @ cents.T, axis=1)
    return pa.table(
        {
            "vec_id": batch["vec_id"],
            "cluster": pa.array(assign.astype(np.int64), type=pa.int64()),
        }
    )


def kmeans_fit(ds, k: int = KM_K, iters: int = KM_ITERS, init: str = "vec_id") -> np.ndarray:
    """Exact distributed Lloyd over the full Dataset; returns the final
    rounded centroid matrix (k x d). ``init='hash'`` seeds from the K
    smallest splitmix64(vec_id) rows (uniform, sorted-input-safe)."""
    from seronet_data_validator_ray.util import ds_to_table

    init_tbl = ds_to_table(
        ds.map_batches(
            _init_partial,
            fn_kwargs={"k": k, "init": init},
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    ids = init_tbl["vec_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(_init_rank(ids.astype(np.int64), init), kind="stable")[:k]
    cents = np.stack(
        [np.frombuffer(init_tbl["v"][int(i)].as_py(), dtype=np.float64) for i in order]
    )
    cents = np.round(cents, 6)

    for _ in range(iters):
        part = ds_to_table(
            ds.map_batches(
                _iter_partial,
                fn_kwargs={"cents": cents},
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        )
        c = part["c"].to_numpy(zero_copy_only=False)
        n = part["n"].to_numpy(zero_copy_only=False)
        d = cents.shape[1]
        sums = np.zeros((k, d), dtype=np.float64)
        cnts = np.zeros(k, dtype=np.int64)
        # reduce the K-rows-per-block partials in block order (tiny table)
        svals = part["s"].to_pylist()
        for ci, ni, si in zip(c, n, svals):
            sums[ci] += np.frombuffer(si, dtype=np.float64)
            cnts[ci] += ni
        upd = cents.copy()
        nz = cnts > 0
        upd[nz] = _norm_rows(sums[nz] / cnts[nz, None])
        cents = np.round(upd, 6)
    return cents


def kmeans_assignments(sf_dir: str, k: int = KM_K, iters: int = KM_ITERS) -> pa.Table:
    """(vec_id, cluster) for every embedding, sorted by vec_id."""
    import os

    import ray.data

    from seronet_data_validator_ray.util import ds_to_table

    from seronet_data_validator_ray.sources.parquet import read_fused

    ds = read_fused(
        [os.path.join(sf_dir, "embeddings.parquet")], columns=["vec_id", "embedding"]
    )
    cents = kmeans_fit(ds, k=k, iters=iters)
    out = ds_to_table(
        ds.map_batches(
            _assign_batch, fn_kwargs={"cents": cents}, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    return out.sort_by([("vec_id", "ascending")])


def kmeans_reference(vecs: np.ndarray, ids: np.ndarray, k: int = KM_K, iters: int = KM_ITERS):
    """Single-process numpy reference with IDENTICAL init + rounding, for
    tests: returns (centroids, assignments in vec_id order)."""
    order = np.argsort(ids, kind="stable")
    x = _norm_rows(vecs.astype(np.float64))[order]
    cents = np.round(x[:k].copy(), 6)
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        upd = cents.copy()
        for c in range(k):
            m = x[assign == c]
            if len(m):
                upd[c] = m.sum(axis=0) / len(m)
                upd[c] /= np.linalg.norm(upd[c]) or 1.0
        cents = np.round(upd, 6)
    assign = np.argmax(x @ cents.T, axis=1)
    return cents, assign
