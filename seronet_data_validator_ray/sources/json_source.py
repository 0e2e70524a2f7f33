"""JSONL ingestion (SURVEY §2.1 source-format completion).

The reference ingests CSV/XLSX sheets; a corpus pipeline also receives
line-delimited JSON exports (API dumps, event logs). `read_jsonl_typed`
gives JSONL the same contract as the CSV/XLSX paths: distributed read
(`ray.data.read_json` — pyarrow's JSON reader per block), optional
vectorized cleanup, and nothing clever driver-side. Nested fields stay
Arrow structs; `flatten_structs=True` promotes them to dotted top-level
columns so the rule engine can target them.
"""

from __future__ import annotations

import pyarrow as pa


def flatten_struct_batch(batch: pa.Table, sep: str = ".") -> pa.Table:
    """Promote one level of struct columns to dotted top-level columns —
    metadata-only (child arrays are zero-copy views)."""
    cols: dict[str, pa.ChunkedArray | pa.Array] = {}
    for name in batch.column_names:
        col = batch[name]
        if pa.types.is_struct(col.type):
            combined = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            for field in col.type:
                cols[f"{name}{sep}{field.name}"] = combined.field(field.name)
        else:
            cols[name] = col
    return pa.table(cols)


def read_jsonl_typed(paths, flatten_structs: bool = False):
    """Line-delimited JSON -> typed Ray Dataset (pyarrow infers column types
    per the JSON values; a type-conflicting field fails loudly rather than
    silently object-mixing, matching the engine's typed-Arrow contract)."""
    import ray.data

    ds = ray.data.read_json(paths)
    if flatten_structs:
        ds = ds.map_batches(flatten_struct_batch, batch_format="pyarrow", zero_copy_batch=True)
    return ds
