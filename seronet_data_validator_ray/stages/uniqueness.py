"""Global key-uniqueness check — THE shuffle of the north rule.

≙ check_for_dup_ids (/root/reference/File_Submission_Object.py:345-354): report
every ID that occurs more than once, with its multiplicity ("Id is repeated k
times"), excluding missing IDs.

Scale design (SURVEY.md §7.4):
- the input dataset is **projected to (key, partition) at the parquet read**
  — the wide ``tokens`` column never enters the shuffle (~100× traffic cut),
- phase 1 pre-aggregates counts *inside* ``map_batches`` (combiner), so the
  merge moves at most one row per distinct key per block,
- phase 2 is adaptive: below ``driver_merge_max_rows`` the (small) per-block
  count tables are merged with one vectorized Arrow ``group_by`` on the
  driver — Ray's all-to-all aggregate has a multi-second fixed cost that
  dwarfs toy inputs; above it, a hash ``groupby(key).aggregate(Sum, Min)``
  shuffle runs distributed (the only choice at 10^12 keys, where per-block
  counts are nearly as large as the input keys).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _local_counts(batch: pa.Table, key: str, partition_col: str | None) -> pa.Table:
    valid = pc.is_valid(batch.column(key))
    if pa.types.is_string(batch.column(key).type):
        valid = pc.and_kleene(valid, pc.invert(pc.equal(batch.column(key), "")))
    batch = batch.filter(pc.fill_null(valid, False))
    aggs = [(key, "count")]
    if partition_col and partition_col in batch.column_names:
        aggs.append((partition_col, "min"))
    g = batch.group_by(key).aggregate(aggs)
    names = {f"{key}_count": "cnt"}
    if partition_col:
        names[f"{partition_col}_min"] = "partition"
    return g.rename_columns([names.get(c, c) for c in g.column_names])


def _empty(key: str, partition_col: str | None) -> pa.Table:
    empty = {key: pa.array([], type=pa.string()), "multiplicity": pa.array([], type=pa.int64())}
    if partition_col:
        empty["partition"] = pa.array([], type=pa.string())
    return pa.table(empty)


def find_duplicate_keys(
    ds,
    key: str = "doc_id",
    partition_col: str | None = "partition",
    driver_merge_max_rows: int = 5_000_000,
):
    """→ small ``pa.Table`` (key, multiplicity:int64, partition) of keys seen >1×."""
    from seronet_data_validator_ray.util import ds_to_table

    local = ds.map_batches(
        lambda b: _local_counts(b, key, partition_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,  # per-block combiner; a numeric batch_size would
        # coalesce upstream work items before a fused provenance reader runs
    ).materialize()

    if local.count() <= driver_merge_max_rows:
        tbl = ds_to_table(local)
        if len(tbl) == 0:
            return _empty(key, partition_col)
        aggs = [("cnt", "sum")] + ([("partition", "min")] if partition_col else [])
        g = tbl.group_by(key).aggregate(aggs)
        names = {"cnt_sum": "multiplicity", "partition_min": "partition"}
        g = g.rename_columns([names.get(c, c) for c in g.column_names])
        out = g.filter(pc.greater(g["multiplicity"], 1))
    else:
        from ray.data.aggregate import Min, Sum

        aggs = [Sum("cnt", alias_name="multiplicity")]
        if partition_col:
            aggs.append(Min("partition", alias_name="partition"))
        merged = local.groupby(key).aggregate(*aggs)
        dups = merged.map_batches(
            lambda b: b.filter(pc.greater(b["multiplicity"], 1)),
            batch_format="pyarrow",
        )
        out = ds_to_table(dups)
    if len(out) == 0:
        return _empty(key, partition_col)
    cols = [key, "multiplicity"] + (["partition"] if partition_col else [])
    return out.select(cols)
