"""Benchmark decontamination: flag corpus documents that share any K-word
shingle with a designated benchmark/eval split (the standard train-set
decontamination step of an LLM data pipeline; here the "benchmark" split is
carved deterministically from the corpus itself, ``doc_id % BENCH_MOD == 0``,
so tests need no external data).

Scale plan (100 TB): the benchmark side is tiny by construction (eval sets
are MBs, the corpus is TBs); its distinct shingles are reduced per batch,
collected once, and broadcast via ``ray.put``. The corpus pass is a single
actor-pool ``map_batches`` stage: shingle hashes are formed vectorized over
the dictionary-encoded token stream, candidate positions found by
``searchsorted`` into the broadcast sorted hash array, and ONLY candidate
positions are verified against the exact shingle strings — a hash collision
can cost a string compare, never a wrong answer. No shuffle anywhere; every
per-doc output row is final after one streaming pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from seronet_data_validator_ray.functions.dedup import (
    _hash_dictionary,
    _mix64,
    _offsets_of,
    _split_tokens,
)

K = 3  # shingle width (words)
BENCH_MOD = 97  # doc_id % BENCH_MOD == 0 -> benchmark split


def shingle_positions(lengths: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(row index, flat-token start offset) of every in-row k-shingle.

    Vectorized: a row of L tokens contributes max(L-k+1, 0) shingles; start
    offsets never cross row boundaries."""
    cnt = np.maximum(lengths - (k - 1), 0)
    rows = np.repeat(np.arange(len(lengths), dtype=np.int64), cnt)
    local = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(
        _offsets_of(cnt)[:-1], cnt
    )
    starts = np.repeat(_offsets_of(lengths)[:-1], cnt) + local
    return rows, starts


def shingle_hashes(
    tok_ids: np.ndarray, dict_strs: list, starts: np.ndarray, k: int
) -> np.ndarray:
    """uint64 hash per shingle: splitmix-chained blake2b token hashes (one
    blake2b per *distinct* token in the batch, everything else vectorized)."""
    h = _hash_dictionary(dict_strs)
    if len(starts) == 0:
        return np.zeros(0, dtype=np.uint64)
    # mix the head BEFORE the first chain step: a bare `h0 ^ h1` would be
    # symmetric in the first two tokens ('a row X' == 'row a X')
    out = _mix64(h[tok_ids[starts]])
    for j in range(1, k):
        out = _mix64(out ^ h[tok_ids[starts + j]])
    return out


def _shingle_strings(
    tok_ids: np.ndarray, dict_strs: list, starts: np.ndarray, k: int
) -> np.ndarray:
    """Exact shingle strings at the given start offsets (object ndarray)."""
    toks = np.asarray(dict_strs, dtype=object)
    if len(starts) == 0:
        return np.zeros(0, dtype=object)
    out = toks[tok_ids[starts]]
    for j in range(1, k):
        out = out + " "
        out = out + toks[tok_ids[starts + j]]
    return out


def _bench_partial(batch: pa.Table) -> pa.Table:
    """Per-batch DISTINCT (hash, shingle) of the benchmark split's shingles —
    the reduced small side that leaves each read task."""
    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
    mask = (doc_id % BENCH_MOD) == 0
    if not mask.any():
        return pa.table(
            {"h": pa.array([], type=pa.uint64()), "s": pa.array([], type=pa.string())}
        )
    texts = batch["text"].filter(pa.array(mask))
    lengths, tok_ids, dict_strs = _split_tokens(texts)
    rows, starts = shingle_positions(lengths, K)
    h = shingle_hashes(tok_ids, dict_strs, starts, K)
    _, first = np.unique(h, return_index=True)
    s = _shingle_strings(tok_ids, dict_strs, starts[first], K)
    return pa.table({"h": pa.array(h[first], type=pa.uint64()), "s": pa.array(s, type=pa.string())})


def collect_benchmark_shingles(docs_ds) -> tuple[np.ndarray, frozenset]:
    """One streaming pass over the corpus reducing to the benchmark split's
    distinct shingles: (sorted uint64 hashes, exact string set). Driver
    memory is bounded by the benchmark split, not the corpus."""
    from seronet_data_validator_ray.util import ds_to_table

    tbl = ds_to_table(
        docs_ds.map_batches(_bench_partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    h = tbl["h"].to_numpy(zero_copy_only=False)
    s = tbl["s"].to_pylist()
    order = np.argsort(h, kind="stable")
    h_sorted, uniq_first = np.unique(h[order], return_index=True)
    strings = frozenset(s)
    del uniq_first
    return h_sorted, strings


class ContaminationScanner:
    """Actor-pool stage: per-doc count of shingle positions that match the
    broadcast benchmark shingle set (exact; hashes only pre-filter)."""

    def __init__(self, bench_ref=None, bench=None, k: int = K, exclude_mod: int | None = BENCH_MOD):
        if bench_ref is not None:
            import ray

            bench = ray.get(bench_ref)
        self.hashes, self.strings = bench
        self.k = k
        self.exclude_mod = exclude_mod

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        if self.exclude_mod:
            keep = (doc_id % self.exclude_mod) != 0
            if not keep.all():
                batch = batch.filter(pa.array(keep))
                doc_id = doc_id[keep]
        lengths, tok_ids, dict_strs = _split_tokens(batch["text"])
        rows, starts = shingle_positions(lengths, self.k)
        sh = shingle_hashes(tok_ids, dict_strs, starts, self.k)
        hit = np.zeros(len(sh), dtype=bool)
        if len(self.hashes) and len(sh):
            pos = np.searchsorted(self.hashes, sh)
            inb = pos < len(self.hashes)
            hit[inb] = self.hashes[pos[inb]] == sh[inb]
        if hit.any():
            # exact verify ONLY at candidate positions (collision-proof);
            # bounded by the true contamination rate, not corpus size
            idx = np.flatnonzero(hit)
            cand = _shingle_strings(tok_ids, dict_strs, starts[idx], self.k)
            ok = np.fromiter((c in self.strings for c in cand), dtype=bool, count=len(idx))
            hit[idx] = ok
        n_hits = np.bincount(rows[hit], minlength=len(lengths)).astype(np.int64)
        sel = n_hits > 0
        return pa.table(
            {
                "doc_id": pa.array(doc_id[sel], type=pa.int64()),
                "n_hits": pa.array(n_hits[sel], type=pa.int64()),
            }
        )
