"""End-to-end golden-count tests over the planted bad fixture
(mirrors /root/reference/test_bad_submission.py's exact per-column error
counts — see FIXTURES.md §3)."""

import os

import pyarrow.compute as pc
import pytest

from seronet_data_validator_ray.datagen import (
    EXPECTED_BAD_COUNTS,
    SEQUENCES_SCHEMA,
    SOURCES,
    BAD_SCHEMA_FILE_ROWS,
)
from seronet_data_validator_ray.pipelines.validate import validate
from seronet_data_validator_ray.rules.builtin import sequences_rules
from seronet_data_validator_ray.stages.stats import sequences_stats_spec
from seronet_data_validator_ray.datagen import MAX_LEN, VOCAB


def run(input_dir, reference_hists=None, **kw):
    return validate(
        input_dir,
        sequences_rules(),
        expected_schema=SEQUENCES_SCHEMA,
        broadcast={"allowed_sources": SOURCES},
        reference_histograms=reference_hists,
        stats_spec=sequences_stats_spec(VOCAB, MAX_LEN),
        **kw,
    )


@pytest.fixture(scope="module")
def bad_result(bad_dir, reference_hists):
    return run(bad_dir, reference_hists)


@pytest.fixture(scope="module")
def clean_result(clean_dir, reference_hists):
    return run(clean_dir, reference_hists)


def error_counts(result):
    v = result.violations
    errs = v.filter(pc.equal(v["severity"], "Error"))
    out = {}
    g = errs.group_by("rule_id").aggregate([("rule_id", "count")])
    for rid, cnt in zip(g["rule_id"].to_pylist(), g["rule_id_count"].to_pylist()):
        out[rid] = cnt
    return out


def test_bad_golden_error_counts(bad_result):
    assert error_counts(bad_result) == EXPECTED_BAD_COUNTS


def test_bad_not_validated(bad_result):
    v = bad_result.violations
    nv = v.filter(pc.equal(v["severity"], "Not Validated"))
    by_rule = {}
    g = nv.group_by("rule_id").aggregate([("rule_id", "count")])
    for rid, cnt in zip(g["rule_id"].to_pylist(), g["rule_id_count"].to_pylist()):
        by_rule[rid] = cnt
    # all rows of the schema-gated file + the 4 rows whose n_tok.range dependency failed
    assert by_rule["tokens.not_validated"] == BAD_SCHEMA_FILE_ROWS
    assert by_rule["n_tok.eq_len"] == 4


def test_bad_drift_detected(bad_result):
    v = bad_result.violations
    drift = v.filter(pc.equal(v["rule_id"], "drift.source"))
    parts = set(drift["partition"].to_pylist())
    assert "__source__:forums" in parts
    # the unknown planted source has no reference histogram → warning
    assert "__source__:sp4m" in parts
    assert "__source__:web" not in parts


def test_bad_verdicts_fail_only_planted_partitions(bad_result):
    v, verd = bad_result.violations, bad_result.verdicts
    errs = v.filter(pc.equal(v["severity"], "Error"))
    expect_fail = {p for p in errs["partition"].to_pylist() if not p.startswith("__source__")}
    got_fail = {
        p for p, ok in zip(verd["partition"].to_pylist(), verd["pass"].to_pylist()) if not ok
    }
    assert got_fail == expect_fail
    assert 0 < len(got_fail) < len(verd)


def test_clean_zero_violations_all_pass(clean_result):
    assert len(clean_result.violations) == 0
    assert all(clean_result.verdicts["pass"].to_pylist())
    assert len(clean_result.drift_reports) == len(SOURCES)


def test_stats_summary(clean_result):
    s = clean_result.stats
    assert s["n_rows"] == 10_000
    # HLL estimate of distinct doc_ids within 5%
    assert abs(s["approx_distinct_ids"] - 10_000) / 10_000 < 0.05
    nt = s["numeric"]["n_tok"]
    assert 1 <= nt["min"] <= nt["p50"] <= nt["p95"] <= nt["max"] <= MAX_LEN
    assert 300 < nt["p50"] < 700
    assert s["list_min"] >= 0 and s["list_max"] < VOCAB
    assert s["null_rate"]["doc_id"] == 0.0


def test_token_array_round_trip(clean_dir):
    """Per-row token-array equality: validation must not mutate the input
    (BASELINE.json input_hint invariant)."""
    import glob

    import pyarrow.parquet as pq

    from seronet_data_validator_ray.sources.parquet import plan_read, read_with_provenance

    plan = plan_read(clean_dir, SEQUENCES_SCHEMA)
    items = plan.work_items()
    ds = read_with_provenance(items, columns=["doc_id", "tokens"])
    got = {}
    for batch in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for d, t in zip(batch["doc_id"].to_pylist(), batch["tokens"].to_pylist()):
            got[d] = t
    want = {}
    for path in sorted(glob.glob(f"{clean_dir}/part-*.parquet")):
        t = pq.read_table(path, columns=["doc_id", "tokens"])
        for d, tok in zip(t["doc_id"].to_pylist(), t["tokens"].to_pylist()):
            want[d] = tok
    assert got == want


def test_eval_modes_agree(ray_session):
    """eval_mode='tasks' (warm worker pool) and 'actors' (fixed pool) must
    produce identical violation sets — same kernels, different scheduling."""
    import collections

    from seronet_data_validator_ray.datagen import SEQUENCES_SCHEMA, SOURCES
    from seronet_data_validator_ray.pipelines.seq_queries import ensure_seq
    from seronet_data_validator_ray.pipelines.validate import validate
    from seronet_data_validator_ray.rules.builtin import sequences_rules

    d = ensure_seq("/root/testdata/sf0.001")
    outs = {}
    for mode in ("actors", "tasks"):
        res = validate(
            d,
            sequences_rules(),
            expected_schema=SEQUENCES_SCHEMA,
            broadcast={"allowed_sources": SOURCES},
            eval_mode=mode,
        )
        outs[mode] = collections.Counter(res.violations["rule_id"].to_pylist())
    assert outs["actors"] == outs["tasks"]
    assert sum(outs["actors"].values()) > 0


def test_cli_validate_smoke(tmp_path):
    """python -m seronet_data_validator_ray validate: one JSON summary line,
    outputs + manifest on disk (runs in a subprocess owning its own Ray)."""
    import json
    import subprocess
    import sys

    from seronet_data_validator_ray.pipelines.seq_queries import ensure_seq

    d = ensure_seq("/root/testdata/sf0.001")
    out = str(tmp_path / "cli_out")
    proc = subprocess.run(
        [sys.executable, "-m", "seronet_data_validator_ray", "validate",
         "--input", d, "--output", out, "--cpus", "4"],
        capture_output=True, text=True, timeout=280, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["n_violations"] > 0
    assert summary["n_partitions"] == summary["metrics"]["n_files"]
    import os

    assert os.path.exists(os.path.join(out, "verdicts.parquet"))
    assert os.path.isdir(os.path.join(out, "manifest"))
    # human-readable run report (≙ the reference's 7-sheet summary workbook)
    md = open(summary["report"]["md"]).read()
    assert "# Validation run summary" in md and "## Rule tallies" in md
    assert "seq.unknown_source" in md or "source.referential" in md
    import csv as _csv

    with open(summary["report"]["csv"]) as f:
        rows = list(_csv.DictReader(f))
    assert len(rows) == summary["n_partitions"]
    assert sum(r["pass"] == "False" for r in rows) == summary["n_failed_partitions"]


def test_drift_actor_pool_path_matches_inline(ray_session):
    """validate() scores drift inline below 64 sources; the actor-pool path
    (many sources) must produce identical outcome rows for the same input."""
    import numpy as np
    import ray
    import ray.data as rd

    from seronet_data_validator_ray.stages.drift import DriftScorer, drift_input_table

    rng = np.random.default_rng(3)
    ref, obs = {}, {}
    for i in range(70):
        base_t = rng.integers(100, 1000, size=64)
        base_l = rng.integers(100, 1000, size=32)
        ref[f"s{i:02d}"] = (base_t, base_l)
        shift = 5 if i % 7 else 1  # every 7th source drifts hard
        obs[f"s{i:02d}"] = {
            "token_hist": np.roll(base_t * shift, i % 3),
            "n_tok_hist": base_l * shift,
        }
    tbl = drift_input_table(obs)
    reference = {k: {"token_hist": v[0], "n_tok_hist": v[1]} for k, v in ref.items()}
    inline = DriftScorer(reference=reference, alpha=0.01)(tbl)
    pooled = (
        rd.from_arrow(tbl)
        .map_batches(
            DriftScorer,
            fn_constructor_kwargs={"ref_ref": ray.put(reference), "alpha": 0.01},
            batch_format="pyarrow",
            concurrency=(1, 2),
        )
        .take_all()
    )
    import pandas as pd

    a = inline.to_pandas().sort_values(["partition", "kind"]).reset_index(drop=True)
    b = pd.DataFrame(pooled).sort_values(["partition", "kind"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=False
    )


def test_violation_row_cap_keeps_exact_tallies(bad_dir, reference_hists, bad_result):
    """With a tiny per-batch violation cap the row payload shrinks, but every
    verdict tally (per-partition rule_breakdown / n_errors) must match the
    uncapped run exactly via the rulecount overflow accounting rows."""
    capped = run(bad_dir, reference_hists, violation_row_cap=2)
    full = bad_result

    def tallies(res):
        import json

        df = res.verdicts.to_pandas()
        return {
            r["partition"]: {
                "n_errors": int(r["n_errors"]),
                "n_warnings": int(r["n_warnings"]),
                "rules": dict(sorted(json.loads(r["rule_breakdown"]).items())),
            }
            for _, r in df.iterrows()
            if r["schema_ok"]
        }

    assert tallies(capped) == tallies(full)
    # row payload is genuinely bounded: no (partition, rule) cell exceeds
    # cap x n_batches, and the planted rules overflow at cap=2
    assert len(capped.violations) < len(full.violations)
    # capped sample rows are real violations (same columns/schema)
    assert capped.violations.schema.equals(full.violations.schema)


def test_default_cap_bounds_every_row_fails(clean_dir):
    """With NO cap argument, a pathological every-row-fails input must not
    materialize a row-count-sized violation table driver-side, while the
    verdict tallies still count every failing row exactly."""
    import glob
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from seronet_data_validator_ray.pipelines.validate import DEFAULT_VIOLATION_ROW_CAP

    d = "/tmp/svr_fixtures/allbad"
    os.makedirs(d, exist_ok=True)
    n_rows, n_files = 0, 0
    for src in sorted(glob.glob(f"{clean_dir}/part-*.parquet")):
        t = pq.read_table(src)
        bad_src = pa.array(["__nope__"] * len(t), type=pa.string())
        t = t.set_column(t.schema.get_field_index("source"), "source", bad_src)
        pq.write_table(t, os.path.join(d, os.path.basename(src)))
        n_rows += len(t)
        n_files += 1
    res = run(d)  # default arguments — the cap must be on by default
    v = res.violations
    ref_rows = v.filter(pc.equal(v["rule_id"], "source.referential"))
    # bounded payload: at most cap rows per batch (each fixture file is well
    # under one batch), far fewer than n_rows
    assert len(ref_rows) < n_rows
    assert len(ref_rows) <= DEFAULT_VIOLATION_ROW_CAP * n_files
    # exact accounting: every failing row is still tallied in the verdicts
    total = 0
    for bd in res.verdicts["rule_breakdown"].to_pylist():
        total += json.loads(bd).get("source.referential", 0)
    assert total == n_rows


def test_corrupt_file_gates_partition_not_run(ray_session, tmp_path):
    """A truncated/corrupt parquet file must fail ITS partition (a
    schema_ok=False verdict naming the footer error) while every other
    partition validates normally — corruption is data, not a run-killer."""
    import shutil

    from seronet_data_validator_ray.datagen import SEQUENCES_SCHEMA, SOURCES
    from seronet_data_validator_ray.pipelines.seq_queries import ensure_seq
    from seronet_data_validator_ray.pipelines.validate import validate
    from seronet_data_validator_ray.rules.builtin import sequences_rules

    src = ensure_seq("/root/testdata/sf0.001")
    d = str(tmp_path / "with-corrupt")
    shutil.copytree(src, d)
    with open(os.path.join(d, "part-corrupt-0000.parquet"), "wb") as f:
        f.write(b"this is not a parquet file")

    res = validate(
        d,
        sequences_rules(),
        expected_schema=SEQUENCES_SCHEMA,
        broadcast={"allowed_sources": SOURCES},
    )
    verd = res.verdicts.to_pandas().set_index("partition")
    bad = verd.loc["part-corrupt-0000.parquet"]
    assert not bad["schema_ok"] and not bad["pass"]
    # exactly one schema.conformance error, no fabricated row errors
    assert int(bad["n_errors"]) == 1 and int(bad["n_rows"]) == 0
    v = res.violations.to_pandas()
    gate = v[(v.partition == "part-corrupt-0000.parquet") & (v.rule_id == "schema.conformance")]
    assert len(gate) == 1 and "unreadable parquet" in gate.iloc[0]["observed"]
    # the healthy partitions are unaffected (the fixture's planted
    # badschema file stays gated for its own reason)
    healthy = verd.drop(index=["part-corrupt-0000.parquet", "part-badschema-0000.parquet"])
    assert healthy["schema_ok"].all()


def test_read_fused_matches_plain_read(ray_session, tmp_path):
    """read_fused (override_num_blocks = Σ row groups, fuses with the first
    map stage) must be row-for-row identical to the plain read on multi-file
    multi-row-group input, accept FileMeta lists (skipping schema-failed
    entries) and plain path lists, honor the min_parallel escape hatch, and
    name the empty-plan error."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest
    import ray.data

    from seronet_data_validator_ray.sources.parquet import FileMeta, read_fused

    paths = []
    for i in range(3):
        t = pa.table(
            {
                "k": pa.array(range(i * 100, i * 100 + 100), type=pa.int64()),
                "v": pa.array([f"r{j}" for j in range(100)], type=pa.string()),
            }
        )
        p = str(tmp_path / f"part-{i}.parquet")
        pq.write_table(t, p, row_group_size=32)  # 4 row groups per file
        paths.append(p)

    def collect(ds):
        return sorted(ds.map_batches(lambda b: b, batch_format="pyarrow").take_all(), key=lambda r: r["k"])

    plain = collect(ray.data.read_parquet(paths, columns=["k", "v"]))
    assert collect(read_fused(paths, columns=["k", "v"])) == plain

    metas = [
        FileMeta(path=p, partition=p, num_rows=100, row_group_rows=[32, 32, 32, 4], schema_ok=True)
        for p in paths
    ]
    metas.append(
        FileMeta(path=str(tmp_path / "garbage"), partition="g", num_rows=0, row_group_rows=[], schema_ok=False)
    )
    assert collect(read_fused(metas, columns=["k", "v"])) == plain
    # min_parallel above the natural row-group count -> split path, same rows
    assert collect(read_fused(paths, columns=["k", "v"], min_parallel=999)) == plain

    with pytest.raises(ValueError, match="no readable files"):
        read_fused([m for m in metas if not m.schema_ok])
