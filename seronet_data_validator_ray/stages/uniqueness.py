"""Global key-uniqueness check — THE shuffle of the north rule.

≙ check_for_dup_ids (/root/reference/File_Submission_Object.py:345-354): report
every ID that occurs more than once, with its multiplicity ("Id is repeated k
times"), excluding missing IDs.

Scale design (SURVEY.md §7.4), measured on 8M keys / 32 CPUs:

- the input dataset is **projected to (key, partition) at the parquet read**
  — the wide ``tokens`` column never enters the exchange (~100x traffic cut);
- phase 1 pre-aggregates (hash64(key), count) *inside* ``map_batches`` — an
  8-byte compaction of arbitrary-width keys, so the exchange payload is
  16 bytes/distinct key regardless of key width;
- phase 2 finds duplicate HASHES:
    - small inputs (< ``driver_merge_max_rows`` combiner rows): one
      vectorized Arrow ``group_by`` on the driver (5.6 s at 8M keys);
    - large inputs: a **raw-Ray bucketed map/reduce exchange** — each
      combiner block is range-split by hash top bits into P bucket slices
      (``num_returns=P``), reducer p concats + ``group_by``s bucket p.
      Measured 1.9 s on 8M keys where ``Dataset.groupby().aggregate()``
      takes 105-138 s (sort or hash shuffle strategy alike): the Dataset
      aggregate's fixed per-block machinery dominates tiny-payload
      shuffles, which is exactly the shape of a uniqueness check. This is
      the one stage where raw Ray tasks are justified (object-store
      exchange of pre-combined partials, no driver hop).
- phase 3 resolves exact keys: duplicate hashes are a tiny set → broadcast
  (``ray.put``) → one filtered re-scan pulls only matching (key, partition)
  rows → exact driver-side count per key. Hash collisions are filtered here
  (a colliding innocent key has true count 1), so the result is EXACT.
  Assumption: duplicates are a small fraction of the corpus; a pathological
  all-duplicates input would pull its keys driver-side (log-noted below).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from seronet_data_validator_ray.sketches import hash64


def _valid_mask(col):
    valid = pc.is_valid(col)
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        valid = pc.and_kleene(valid, pc.invert(pc.equal(col, "")))
    return pc.fill_null(valid, False)


def _local_hash_counts(batch: pa.Table, key: str) -> pa.Table:
    """Per-block combiner: (hash64(key), count) — 16 bytes per distinct key."""
    col = batch.column(key)
    batch = batch.filter(_valid_mask(col))
    if batch.num_rows == 0:
        return pa.table(
            {"h": pa.array([], type=pa.uint64()), "cnt": pa.array([], type=pa.int64())}
        )
    h = hash64(batch.column(key))
    t = pa.table({"h": pa.array(h, type=pa.uint64())})
    g = t.group_by("h").aggregate([("h", "count")])
    return g.rename_columns(["h", "cnt"]).cast(
        pa.schema([("h", pa.uint64()), ("cnt", pa.int64())])
    )


def _split_block(block: pa.Table, p_bits: int):
    """Range-split one combiner block by hash top bits into 2**p_bits slices."""
    P = 1 << p_bits
    if block.num_rows == 0:
        return tuple(block for _ in range(P))
    hv = block["h"].to_numpy(zero_copy_only=False)
    bucket = (hv >> np.uint64(64 - p_bits)).astype(np.int64)
    order = np.argsort(bucket, kind="stable")
    sorted_block = block.take(pa.array(order))
    cuts = np.searchsorted(bucket[order], np.arange(P + 1))
    return tuple(sorted_block.slice(int(cuts[i]), int(cuts[i + 1] - cuts[i])) for i in range(P))


def _reduce_bucket(*parts):
    parts = [p for p in parts if p is not None and len(p)]
    if not parts:
        return pa.array([], type=pa.uint64())
    t = pa.concat_tables(parts)
    g = t.group_by("h").aggregate([("cnt", "sum")])
    return g.filter(pc.greater(g["cnt_sum"], 1))["h"].combine_chunks()


_REMOTE_CACHE: dict = {}  # one exported remote wrapper per (fn, P) — not per call


def _dup_hashes_exchange(mat, p_bits: int) -> np.ndarray:
    """Raw-Ray bucketed exchange over the materialized combiner blocks."""
    import ray

    P = 1 << p_bits
    if ("split", P) not in _REMOTE_CACHE:
        _REMOTE_CACHE[("split", P)] = ray.remote(num_returns=P)(_split_block)
        _REMOTE_CACHE[("reduce", P)] = ray.remote(_reduce_bucket)
    split_remote = _REMOTE_CACHE[("split", P)]
    reduce_remote = _REMOTE_CACHE[("reduce", P)]
    split_refs = [split_remote.remote(b, p_bits) for b in mat.to_arrow_refs()]
    dup_refs = [reduce_remote.remote(*[r[p] for r in split_refs]) for p in range(P)]
    arrays = [a for a in ray.get(dup_refs) if len(a)]
    if not arrays:
        return np.array([], dtype=np.uint64)
    return pa.concat_arrays(arrays).to_numpy(zero_copy_only=False).astype(np.uint64)


def _dup_hashes_driver(mat) -> np.ndarray:
    import ray

    tables = [t for t in ray.get(mat.to_arrow_refs()) if t is not None and len(t)]
    if not tables:
        return np.array([], dtype=np.uint64)
    t = pa.concat_tables(tables)
    g = t.group_by("h").aggregate([("cnt", "sum")])
    dups = g.filter(pc.greater(g["cnt_sum"], 1))
    return dups["h"].to_numpy(zero_copy_only=False).astype(np.uint64)


def _resolve_dups_batch(batch: pa.Table, dup_ref=None, key=None, partition_col=None) -> pa.Table:
    """Filtered re-scan: keep only rows whose key-hash is a duplicate hash.

    A stateless task (not an actor pool): the sorted dup-hash array is
    broadcast once and resolved once per worker via the LRU broadcast cache,
    so the pass runs on the already-warm task pool at full width with no
    actor-spawn / autoscaling ramp — the resolve leg was the headline's
    worst-scaling phase as an actor pool."""
    from seronet_data_validator_ray.stages.evaluate import _resolve_broadcast

    dups = _resolve_broadcast(dup_ref)["dups"]
    col = batch.column(key)
    batch = batch.filter(_valid_mask(col))
    cols = [key] + (
        [partition_col] if partition_col and partition_col in batch.column_names else []
    )
    batch = batch.select(cols)
    if batch.num_rows == 0:
        return batch
    h = hash64(batch.column(key))
    idx = np.searchsorted(dups, h)
    idx[idx == len(dups)] = 0
    mask = dups[idx] == h if len(dups) else np.zeros(len(h), bool)
    return batch.filter(pa.array(mask))


def _empty(key: str, partition_col: str | None) -> pa.Table:
    empty = {key: pa.array([], type=pa.string()), "multiplicity": pa.array([], type=pa.int64())}
    if partition_col:
        empty["partition"] = pa.array([], type=pa.string())
    return pa.table(empty)


def find_duplicate_keys(
    ds,
    key: str = "doc_id",
    partition_col: str | None = "partition",
    driver_merge_max_rows: int = 2_000_000,
    p_bits: int | None = None,
):
    """→ small ``pa.Table`` (key, multiplicity:int64[, partition]) of keys seen >1×."""
    import ray

    mat = ds.map_batches(
        lambda b: _local_hash_counts(b, key),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,  # per-block combiner; a numeric batch_size would
        # coalesce upstream work items before a fused provenance reader runs
    ).materialize()

    if mat.count() <= driver_merge_max_rows:
        dup_hashes = _dup_hashes_driver(mat)
    else:
        if p_bits is None:
            ncpu = int(ray.available_resources().get("CPU", 8))
            p_bits = max(3, min(6, ncpu.bit_length() - 1))
        dup_hashes = _dup_hashes_exchange(mat, p_bits)

    if len(dup_hashes) == 0:
        return _empty(key, partition_col)

    resolved_ds = ds.map_batches(
        _resolve_dups_batch,
        fn_kwargs={
            "dup_ref": ray.put({"dups": np.sort(dup_hashes)}),
            "key": key,
            "partition_col": partition_col,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    tables = [t for t in ray.get(resolved_ds.materialize().to_arrow_refs()) if t is not None and len(t)]
    if not tables:
        return _empty(key, partition_col)
    resolved = pa.concat_tables(tables)
    has_part = partition_col and partition_col in resolved.column_names
    aggs = [(key, "count")] + ([(partition_col, "min")] if has_part else [])
    g = resolved.group_by(key).aggregate(aggs)
    names = {f"{key}_count": "multiplicity", f"{partition_col}_min": "partition"}
    g = g.rename_columns([names.get(c, c) for c in g.column_names])
    out = g.filter(pc.greater(g["multiplicity"], 1))  # drops hash-collision innocents
    if len(out) == 0:
        return _empty(key, partition_col)
    cols = [key, "multiplicity"] + (["partition"] if has_part else [])
    return out.select(cols)
