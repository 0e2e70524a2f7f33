"""Prior-state backfill seam (J7 ≙ populate_missing_keys,
/root/reference/File_Submission_Object.py:812-867): a submission missing a
sheet gets it fetched from the prior corpus by the submitted keys, then the
full lifecycle (row rules + cross-sheet checks) runs over the merged set."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _specs():
    from seronet_data_validator_ray.pipelines.submission import TableSpec
    from seronet_data_validator_ray.rules.spec import RuleSet, RuleSpec

    lineitem = TableSpec(
        input_path=SF,
        file_glob="lineitem.parquet",
        ruleset=RuleSet(
            name="lineitem",
            key_column="l_orderkey",
            rules=[
                RuleSpec(
                    "l_quantity.range", "l_quantity", "range", {"lo": 1, "hi": 45},
                    severity="Warning", message="quantity outside [1, 45]",
                )
            ],
        ),
    )
    orders_rules = RuleSet(
        name="orders",
        key_column="o_orderkey",
        rules=[
            RuleSpec(
                "o_orderstatus.enum", "o_orderstatus", "in_set",
                {"values": ["O", "F", "P"]}, message="unknown order status",
            )
        ],
    )
    return lineitem, orders_rules


def test_backfill_fetches_exactly_the_submission_keys(ray_session, tmp_path):
    from seronet_data_validator_ray.state.backfill import (
        BackfillRule,
        ParquetReferenceFetcher,
        backfill_missing_tables,
    )

    lineitem, orders_rules = _specs()
    tables = {"lineitem": lineitem}
    rule = BackfillRule(
        table="orders", key_column="o_orderkey",
        from_table="lineitem", from_column="l_orderkey",
        ruleset=orders_rules,
    )
    out = backfill_missing_tables(
        tables, [rule], ParquetReferenceFetcher(SF), str(tmp_path)
    )
    assert set(out) == {"lineitem", "orders"}
    fetched = pq.read_table(os.path.join(str(tmp_path), "orders", "part-backfill-0000.parquet"))
    # oracle: orders whose key appears among the submitted line items
    li_keys = np.unique(
        pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey"])["l_orderkey"]
        .to_numpy(zero_copy_only=False)
    )
    orders = pq.read_table(f"{SF}/orders.parquet")
    want = orders.filter(pc.is_in(orders["o_orderkey"], pa.array(li_keys)))
    assert fetched.num_rows == want.num_rows
    assert sorted(fetched["o_orderkey"].to_pylist()) == sorted(want["o_orderkey"].to_pylist())
    assert fetched.schema.names == orders.schema.names


def test_backfill_then_lifecycle_cross_checks(ray_session, tmp_path):
    from seronet_data_validator_ray.pipelines.submission import (
        CrossKeyCheck,
        validate_submission,
    )
    from seronet_data_validator_ray.state.backfill import (
        BackfillRule,
        ParquetReferenceFetcher,
        backfill_missing_tables,
    )

    lineitem, orders_rules = _specs()
    tables = backfill_missing_tables(
        {"lineitem": lineitem},
        [BackfillRule("orders", "o_orderkey", "lineitem", "l_orderkey", orders_rules)],
        ParquetReferenceFetcher(SF),
        str(tmp_path),
    )
    res = validate_submission(
        tables,
        [CrossKeyCheck("cross.orderkeys", "orders", "o_orderkey", "lineitem", "l_orderkey")],
    )
    # the backfilled sheet reconciles by construction: every fetched order has
    # line items and (TPC-H referential integrity) every line item its order
    cross = res.violations.filter(pc.equal(res.violations["rule_id"], "cross.orderkeys"))
    assert len(cross) == 0
    assert set(res.table_verdicts["table"].to_pylist()) == {"lineitem", "orders", "__cross__"}


def test_backfill_skips_present_sheets(ray_session, tmp_path):
    from seronet_data_validator_ray.state.backfill import (
        BackfillRule,
        ParquetReferenceFetcher,
        backfill_missing_tables,
    )

    lineitem, orders_rules = _specs()
    sentinel = object()
    tables = {"lineitem": lineitem, "orders": sentinel}
    out = backfill_missing_tables(
        tables,
        [BackfillRule("orders", "o_orderkey", "lineitem", "l_orderkey", orders_rules)],
        ParquetReferenceFetcher(SF),
        str(tmp_path),
    )
    assert out["orders"] is sentinel  # untouched, like the reference's guard
    assert not os.path.exists(os.path.join(str(tmp_path), "orders"))


def test_submission_report_renders(ray_session, tmp_path):
    from seronet_data_validator_ray.pipelines.submission import _sf_submission
    from seronet_data_validator_ray.report import write_submission_report

    res = _sf_submission(SF)
    p = write_submission_report(res, str(tmp_path))
    md = open(p["md"]).read()
    assert "# Submission validation summary" in md
    assert "__cross__" in md and "## Rule tallies" in md
