"""CSV ingestion (S1/M2/M3 dynamic typing) and sketch-accuracy tests."""

import os

import duckdb
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("csvsrc")
    rows = [
        "id,price,day,name,code,maybe_int",
        "1,10.50,2024-01-01,alice,a_b,7",
        "2,3.25,2024-02-15,bob,c_d,",
        "3,99.00,2024-03-30,carol,e_f,42",
    ]
    (d / "part-0.csv").write_text("\n".join(rows) + "\n")
    rows2 = [
        "id,price,day,name,code,maybe_int",
        "4,1.00,2024-04-04,dave,g_h,0",
    ]
    (d / "part-1.csv").write_text("\n".join(rows2) + "\n")
    return str(d)


def test_csv_dynamic_typing(ray_session, csv_dir):
    from seronet_data_validator_ray.sources.csv_source import read_csv_typed
    from seronet_data_validator_ray.util import ds_to_table

    tbl = ds_to_table(read_csv_typed(csv_dir)).sort_by("id")
    assert tbl.num_rows == 4
    s = {f.name: f.type for f in tbl.schema}
    assert s["id"] == pa.int64()
    assert s["price"] == pa.float64()
    assert pa.types.is_timestamp(s["day"])
    assert s["name"] == pa.string()
    assert s["code"] == pa.string(), "underscore values pin the column to string"
    assert s["maybe_int"] == pa.int64(), "blanks become nulls, column still types"
    assert tbl["maybe_int"].to_pylist() == [7, None, 42, 0]
    assert tbl["price"].to_pylist() == [10.50, 3.25, 99.00, 1.00]


def test_csv_force_str(ray_session, csv_dir):
    from seronet_data_validator_ray.sources.csv_source import read_csv_typed
    from seronet_data_validator_ray.util import ds_to_table

    tbl = ds_to_table(read_csv_typed(csv_dir, force_str=("id",)))
    assert tbl.schema.field("id").type == pa.string()


def test_csv_matches_parquet_values(ray_session, tmp_path):
    """Round-trip: parquet table -> CSV -> typed read -> same values."""
    import pyarrow.csv as pacsv
    import pyarrow.parquet as pq

    from seronet_data_validator_ray.sources.csv_source import read_csv_typed
    from seronet_data_validator_ray.util import ds_to_table

    src = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice", "o_orderstatus"])
    csv_path = os.path.join(tmp_path, "orders.csv")
    pacsv.write_csv(src, csv_path)
    got = ds_to_table(read_csv_typed(csv_path)).sort_by("o_orderkey")
    src = src.sort_by("o_orderkey")
    assert got["o_orderkey"].to_pylist() == src["o_orderkey"].to_pylist()
    assert got["o_totalprice"].to_pylist() == pytest.approx(src["o_totalprice"].to_pylist())
    assert got["o_orderstatus"].to_pylist() == src["o_orderstatus"].to_pylist()


def test_approx_stats_accuracy(ray_session):
    from seronet_data_validator_ray.functions.op_queries import approx_stats_lineitem

    got = approx_stats_lineitem(SF).to_pandas().set_index("column")
    con = duckdb.connect()
    exact = con.sql(
        f"""SELECT count(DISTINCT l_orderkey) AS nd,
                  CAST(round(quantile_cont(l_extendedprice, 0.5) * 100) AS BIGINT) AS p50,
                  CAST(round(quantile_cont(l_extendedprice, 0.95) * 100) AS BIGINT) AS p95
           FROM read_parquet('{SF}/lineitem.parquet')"""
    ).fetchone()
    nd, p50, p95 = exact
    assert abs(got.loc["l_orderkey", "approx_distinct"] - nd) / nd < 0.05
    assert abs(got.loc["l_extendedprice", "p50_cents"] - p50) / p50 < 0.02
    assert abs(got.loc["l_extendedprice", "p95_cents"] - p95) / p95 < 0.02


def test_reconcile_keys_distributed_2m(ray_session):
    """reconcile_keys must stay exact with ~2M distinct keys per side and no
    driver-side key-set materialization (full-outer join path)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from seronet_data_validator_ray.functions.joins import reconcile_keys

    N = 2_000_000
    left = ray.data.range(N)  # id: 0..N-1

    def shift(b: pa.Table) -> pa.Table:
        return pa.table({"id2": pc.add(b["id"], 5)})

    right = ray.data.range(N).map_batches(shift, batch_format="pyarrow", zero_copy_batch=True)
    out = reconcile_keys(left, right, "id", "id2").to_pandas()
    lo = sorted(out[out.present_in == "left_only"].key_value.astype(int))
    ro = sorted(out[out.present_in == "right_only"].key_value.astype(int))
    assert lo == [0, 1, 2, 3, 4]
    assert ro == [N, N + 1, N + 2, N + 3, N + 4]
    assert len(out) == 10


def test_clean_column_names():
    import pyarrow as pa

    from seronet_data_validator_ray.sources.csv_source import clean_column_names_batch

    t = pa.table(
        {
            "Total_Cells (cells/mL)": [1],
            "Volume (mL)": [2],
            "Storage Temp °C": [3],
            "Freezer (-80)".replace("(-80)", "-80"): [4],
            "Visit-Date": [5],
        }
    )
    out = clean_column_names_batch(t)
    assert out.column_names == [
        "Total_Cells", "Volume", "Storage Temp", "Freezer 80", "Visit_Date",
    ]
