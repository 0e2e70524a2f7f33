"""Small shared helpers."""

from __future__ import annotations

import pyarrow as pa


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
