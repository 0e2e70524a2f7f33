"""Mini-driver: run every oracle-paired query against DuckDB on the same
parquet and compare row-count + schema + order-insensitive values — the same
comparison the external correctness gate performs."""

import duckdb
import pandas as pd
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def all_registries():
    from seronet_data_validator_ray.pipelines import seq_queries, table_queries

    regs = {}
    for name, (fn, sql) in table_queries.REGISTRY.items():
        regs[name] = (fn, lambda sf, s=sql: s)
    for name, (fn, sql) in seq_queries.REGISTRY.items():
        regs[name] = (fn, lambda sf, n=name: seq_queries.format_sql(n, sf))
    try:
        from seronet_data_validator_ray.functions import op_queries

        for name, (fn, sql) in op_queries.REGISTRY.items():
            regs[name] = (fn, lambda sf, s=sql: s)
    except ImportError:
        pass
    from seronet_data_validator_ray.pipelines import clinical_queries, submission

    for name, (fn, sql) in clinical_queries.REGISTRY.items():
        regs[name] = (fn, lambda sf, n=name: clinical_queries.format_sql(n, sf))
    for name, (fn, sql) in submission.REGISTRY.items():
        regs[name] = (fn, lambda sf, s=sql: s)
    return regs


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype("string")
    if len(df):
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df.reset_index(drop=True)


def to_pandas(result):
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


NAMES = sorted(all_registries())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, sf_dir):
    regs = all_registries()
    fn, sql_fn = regs[name]
    sql = sql_fn(sf_dir)
    if sql is None:
        pytest.skip("rows-only query (no SQL oracle)")
    ray_df = canon(to_pandas(fn(sf_dir)))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    sql_df = canon(con.sql(sql).df())
    con.close()
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: columns {list(ray_df.columns)} != {list(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: {len(ray_df)} rows != {len(sql_df)}"
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False, check_exact=True)
