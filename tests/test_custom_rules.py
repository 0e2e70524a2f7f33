"""User-extension surface (SURVEY §2.10): custom rule kinds.

Two mechanisms:
- ``RuleSpec(kernel=fn)`` — the callable ships by value (cloudpickle) inside
  the spec, reaching every Ray worker without a registry import;
- ``register_kernel(kind, fn)`` — process-local registry hook for kernels
  defined in an importable module.
"""

import numpy as np
import pyarrow as pa
import pytest


def test_custom_kernel_via_spec_end_to_end(ray_session):
    from seronet_data_validator_ray.datagen import SEQUENCES_SCHEMA
    from seronet_data_validator_ray.pipelines.seq_queries import ensure_seq
    from seronet_data_validator_ray.pipelines.validate import validate
    from seronet_data_validator_ray.rules.spec import RuleSet, RuleSpec

    # defined INSIDE the test: a nested function cloudpickles BY VALUE, so
    # Ray workers never need to import this (non-importable) test module —
    # a module-level def here would pickle by reference and strand the
    # actor pool in a restart loop
    def _even_token_count_kernel(table, column, params, ctx):
        import numpy as np

        from seronet_data_validator_ray.rules.kernels import flat_list_view

        lengths, _ = flat_list_view(table, column, ctx)
        mask = (np.asarray(lengths) % 2) == 0
        return mask, None

    d = ensure_seq("/root/testdata/sf0.001")
    rules = RuleSet(
        name="custom",
        rules=[
            RuleSpec(
                rule_id="tokens.even_count",
                column="tokens",
                kind="custom",
                kernel=_even_token_count_kernel,
                severity="Warning",
                message="token count is even",
            )
        ],
        key_column="doc_id",
    )
    # uncapped: this oracle counts exact violation ROWS, not tallies
    res = validate(d, rules, expected_schema=SEQUENCES_SCHEMA, violation_row_cap=None)
    v = res.violations
    got = len(v.filter(pa.compute.equal(v["rule_id"], "tokens.even_count")))
    # oracle: count even-length token lists across the good files locally
    import glob

    import pyarrow.parquet as pq

    want = 0
    for f in sorted(glob.glob(f"{d}/part-*.parquet")):
        if "badschema" in f:
            continue  # gated off by schema conformance (n_tok/source columns)
        t = pq.read_table(f, columns=["tokens"])
        lens = pa.compute.list_value_length(t["tokens"]).to_numpy(zero_copy_only=False)
        want += int(((lens % 2) == 0).sum())
    assert got == want > 0


def test_register_kernel_and_unknown_kind_error(ray_session):
    from seronet_data_validator_ray.rules import kernels

    def k_always_fail(table, column, params, ctx):
        return np.ones(len(table), dtype=bool), None

    kernels.register_kernel("always_fail_test", k_always_fail)
    try:
        tbl = pa.table({"x": [1, 2, 3]})
        mask, obs = kernels.evaluate_kernel(tbl, "always_fail_test", "x", {}, {})
        assert mask.sum() == 3
        with pytest.raises(KeyError, match="no rule kernel registered"):
            kernels.evaluate_kernel(tbl, "no_such_kind", "x", {}, {})
        with pytest.raises(TypeError):
            kernels.register_kernel("bad", None)
    finally:
        kernels.KERNELS.pop("always_fail_test", None)


def test_violation_cap_multi_partition_batch_accounting():
    """Direct evaluator check for the overflow path on a batch spanning
    partitions (file-per-partition reads never produce one, so the
    per-partition extra accounting is otherwise untested): sample rows +
    rulecount extras must reconstruct the exact per-partition tallies."""
    import numpy as np
    import pyarrow as pa

    from seronet_data_validator_ray.rules.spec import RuleSpec
    from seronet_data_validator_ray.stages.evaluate import RuleEvaluator

    # 10 rows: partitions alternate a,b; every row violates not_null on col x
    n = 10
    batch = pa.table(
        {
            "partition": pa.array(["a", "b"] * (n // 2)),
            "row_index": pa.array(np.arange(n, dtype=np.int64)),
            "doc_id": pa.array([f"d{i}" for i in range(n)]),
            "x": pa.array([None] * n, type=pa.string()),
        }
    )
    rules = [RuleSpec(rule_id="x.not_null", column="x", kind="not_null")]
    cap = 3
    out = RuleEvaluator(rules, key_column="doc_id", violation_row_cap=cap)(batch)
    viol = out.filter(pa.compute.equal(out["kind"], "violation"))
    rc = out.filter(pa.compute.equal(out["kind"], "rulecount"))
    assert len(viol) == cap
    # exact reconstruction: sampled-per-partition + extra-per-partition == 5/5
    totals = {"a": 0, "b": 0}
    for p in viol["partition"].to_pylist():
        totals[p] += 1
    for p, extra in zip(rc["partition"].to_pylist(), rc["n_rows"].to_pylist()):
        totals[p] += extra
    assert totals == {"a": 5, "b": 5}
    # uncapped run emits all 10 and no rulecount rows
    out2 = RuleEvaluator(rules, key_column="doc_id")(batch)
    assert len(out2.filter(pa.compute.equal(out2["kind"], "violation"))) == n
    assert len(out2.filter(pa.compute.equal(out2["kind"], "rulecount"))) == 0


def test_in_dictionary_icd10_scale(ray_session, tmp_path):
    """The worker-state dictionary kernel at realistic ICD-10 size: ~70k
    string codes broadcast once, probed via searchsorted inside the fused
    evaluator — flagged rows must match a Python-set oracle exactly.
    (≙ check_icd10 over the 70k-entry code DB,
    /root/reference/File_Submission_Object.py:576-583.)"""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from seronet_data_validator_ray.pipelines.validate import validate
    from seronet_data_validator_ray.rules.spec import RuleSet, RuleSpec

    rng = np.random.default_rng(11)
    # ICD-10-shaped codes: letter + 2 digits + '.' + 1-2 digits → ~70k distinct
    letters = np.array(list("ABCDEFGHIJKLMNOPQRSTUVWXYZ"))
    n_codes = 70_000
    codes = np.unique(
        np.char.add(
            np.char.add(
                letters[rng.integers(0, 26, n_codes * 2)],
                np.char.zfill(rng.integers(0, 100, n_codes * 2).astype(str), 2),
            ),
            np.char.add(".", rng.integers(0, 100, n_codes * 2).astype(str)),
        )
    )[:n_codes]
    assert len(codes) == n_codes
    dictionary = np.sort(codes.astype(object))

    # 20k rows: ~95% valid codes, ~5% unknown codes (prefix 'Z99.99x' style)
    n_rows = 20_000
    vals = codes[rng.integers(0, n_codes, n_rows)].astype(object)
    bad_idx = rng.choice(n_rows, size=n_rows // 20, replace=False)
    for i in bad_idx:
        vals[i] = f"X__{int(i)}"  # never in the dictionary
    d = tmp_path / "icd"
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "row_id": pa.array([str(i) for i in range(n_rows)], type=pa.string()),
                "code": pa.array(vals.tolist(), type=pa.string()),
            }
        ),
        str(d / "part-codes-0000.parquet"),
    )
    rules = RuleSet(
        name="icd",
        key_column="row_id",
        rules=[
            RuleSpec(
                "code.in_dictionary", "code", "in_dictionary", {"ref": "icd10"},
                message="code not in the ICD-10 dictionary",
            )
        ],
    )
    res = validate(
        str(d), rules, broadcast={"icd10": dictionary}, violation_row_cap=None
    )
    v = res.violations
    flagged = set(v.filter(pa.compute.equal(v["rule_id"], "code.in_dictionary"))["doc_id"].to_pylist())
    valid_set = set(dictionary.tolist())
    want = {str(i) for i in range(n_rows) if vals[i] not in valid_set}
    assert flagged == want
    assert len(want) == n_rows // 20
