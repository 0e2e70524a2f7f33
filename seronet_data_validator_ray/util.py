"""Small shared helpers."""

from __future__ import annotations

import pyarrow as pa


def auto_join_partitions(*parquet_paths: str, rows_per_partition: int = 1_000_000) -> int:
    """Hash-join partition count from parquet footer row counts: each
    shuffle partition spawns an aggregator actor, so small inputs must not
    pay for CPUs-many of them; clamped to [2, CPUs]."""
    import pyarrow.parquet as pq
    import ray

    rows = sum(pq.ParquetFile(p).metadata.num_rows for p in parquet_paths)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(ncpu, rows // rows_per_partition + 1))


def ds_to_table(ds, schema: pa.Schema | None = None) -> pa.Table:
    """Collect a (small) Dataset to one driver-side Arrow table.

    Materializes first so the collection is a single execution — calling
    ``to_arrow_refs`` on a lazy Dataset triggers an extra limit-1 run for
    schema inference, doubling the cost of shuffle-bearing pipelines.
    """
    import ray

    mat = ds.materialize()
    tables = [t for t in ray.get(mat.to_arrow_refs()) if t is not None and len(t)]
    if not tables:
        if schema is not None:
            return schema.empty_table()
        ds_schema = mat.schema()
        if ds_schema is not None and hasattr(ds_schema, "base_schema") and isinstance(
            ds_schema.base_schema, pa.Schema
        ):
            return ds_schema.base_schema.empty_table()
        return pa.table({})
    if schema is not None:
        return pa.concat_tables([t.select(schema.names) for t in tables]).cast(schema)
    return pa.concat_tables(tables)


def read_sf_table(sf_dir: str, table: str, columns=None, fused: bool = False):
    """read_parquet of one sf table with a NAMED empty-corpus guard: Ray Data
    never invokes map_batches UDFs on zero-row inputs, so an all-empty table
    would otherwise surface as an opaque schema-less KeyError deep in the
    pipeline. Empty BATCHES mid-pipeline (filters, empty partitions among
    non-empty ones) are handled inside every kernel; this guards the
    all-empty corner only.

    ``fused=True`` pins ``override_num_blocks`` to the file's row-group count
    so the read FUSES with the first map stage (≈0.6 s of split machinery +
    an object-store round trip of the decoded table saved per scan — see
    sources/parquet.read_fused). Right for scans whose first map is a cheap
    vectorized kernel; WRONG for compute-bound first maps over a
    few-row-group file (a single-row-group documents file feeding MinHash
    emission would serialize the shingling on one core)."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    path = os.path.join(sf_dir, f"{table}.parquet")
    md = pq.read_metadata(path)
    if md.num_rows == 0:
        raise ValueError(
            f"input table {table!r} at {sf_dir} is empty — sf-table queries "
            "require a non-empty corpus"
        )
    if fused:
        return ray.data.read_parquet(
            path, columns=columns, override_num_blocks=max(1, md.num_row_groups)
        )
    return ray.data.read_parquet(path, columns=columns)
