"""Checkpoint/resume semantics (FIXTURES.md §5): abort after k waves, re-run,
assert no re-done work and outputs identical to an uninterrupted run
(≙ the reference's summary-workbook skip logic,
/root/reference/Data_Validation_v2.py:170-192)."""

import glob

import pytest

from seronet_data_validator_ray.datagen import MAX_LEN, SEQUENCES_SCHEMA, SOURCES, VOCAB
from seronet_data_validator_ray.pipelines.validate import AbortRun, validate
from seronet_data_validator_ray.rules.builtin import sequences_rules
from seronet_data_validator_ray.stages.stats import sequences_stats_spec


def run(input_dir, hists, **kw):
    return validate(
        input_dir,
        sequences_rules(),
        expected_schema=SEQUENCES_SCHEMA,
        broadcast={"allowed_sources": SOURCES},
        reference_histograms=hists,
        stats_spec=sequences_stats_spec(VOCAB, MAX_LEN),
        **kw,
    )


def canon(tbl):
    import pandas as pd

    df = tbl.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_abort_resume_identical(bad_dir, reference_hists, tmp_path):
    out_a = str(tmp_path / "aborted")
    out_b = str(tmp_path / "straight")

    n_files = len(glob.glob(f"{bad_dir}/part-*.parquet"))
    assert n_files > 4

    with pytest.raises(AbortRun):
        run(bad_dir, reference_hists, output_dir=out_a, wave_size=2, abort_after_waves=2)

    from seronet_data_validator_ray.state.manifest import Manifest

    done_after_abort = {
        p for p in Manifest(out_a).completed() if not p.startswith("__global__")
    }
    assert len(done_after_abort) == 5  # 2 waves × 2 good files + the schema-gated file

    # resume: only remaining partitions are re-validated
    r2 = run(bad_dir, reference_hists, output_dir=out_a, wave_size=2)
    rows_total = r2.metrics["total_rows"]
    assert r2.metrics["rows_validated_this_run"] < rows_total
    done = {p for p in Manifest(out_a).completed() if not p.startswith("__global__")}
    assert len(done) == n_files

    # uninterrupted run for comparison
    r3 = run(bad_dir, reference_hists, output_dir=out_b)

    assert canon(r2.violations).equals(canon(r3.violations))
    assert canon(r2.verdicts).equals(canon(r3.verdicts))
    assert r2.stats["n_rows"] == r3.stats["n_rows"]


def test_rerun_is_noop(bad_dir, reference_hists, tmp_path):
    out = str(tmp_path / "noop")
    r1 = run(bad_dir, reference_hists, output_dir=out)
    r2 = run(bad_dir, reference_hists, output_dir=out)
    assert r2.metrics["rows_validated_this_run"] == 0
    assert canon(r1.violations).equals(canon(r2.violations))
    assert canon(r1.verdicts).equals(canon(r2.verdicts))


def test_submission_lifecycle_resume(ray_session, tmp_path):
    """Multi-table lifecycle: per-table manifests land under the shared
    output dir and a second run skips completed partitions but reproduces
    identical violations + verdicts."""
    from seronet_data_validator_ray.pipelines.submission import _sf_submission

    out = str(tmp_path / "sub")
    r1 = _sf_submission("/root/testdata/sf0.001", output_dir=out)
    r2 = _sf_submission("/root/testdata/sf0.001", output_dir=out)
    assert r2.tables["orders"].metrics["rows_validated_this_run"] == 0
    assert r2.tables["lineitem"].metrics["rows_validated_this_run"] == 0
    assert r1.violations.num_rows == r2.violations.num_rows
    assert r1.table_verdicts.to_pylist() == r2.table_verdicts.to_pylist()
    assert r1.table_verdicts.to_pandas().set_index("table").loc["__cross__", "n_errors"] > 0


def test_violation_files_per_partition_sorted(bad_dir, reference_hists, tmp_path):
    """O1: one deterministic rows-<partition>.parquet per dirty partition,
    sorted by (row_index, rule_id); regenerating an input (same name, new
    mtime/rows) forces re-validation on resume (fingerprint check)."""
    import os
    import pyarrow.parquet as pq

    out = str(tmp_path / "sorted")
    run(bad_dir, reference_hists, output_dir=out)
    vdirs = glob.glob(os.path.join(out, "violations", "*"))
    assert len(vdirs) == 1
    row_files = sorted(glob.glob(os.path.join(vdirs[0], "rows-*.parquet")))
    assert row_files, "dirty partitions must each have a rows- file"
    for f in row_files:
        t = pq.read_table(f)
        parts = set(t["partition"].to_pylist())
        assert len(parts) == 1  # one partition per file
        idx = t["row_index"].to_pylist()
        assert idx == sorted(idx)

    # fingerprint: touch one input file -> that partition becomes pending
    from seronet_data_validator_ray.sources.parquet import plan_read
    from seronet_data_validator_ray.state.manifest import Manifest

    plan = plan_read(bad_dir, SEQUENCES_SCHEMA)
    target = plan.good_files[0]
    os.utime(target.path)  # new mtime, same content
    fingerprints = {
        f.partition: f"{f.num_rows}:{os.stat(f.path).st_mtime_ns}" for f in plan.files
    }
    pending = Manifest(out).pending(
        [f.partition for f in plan.files], run_rules_hash(), fingerprints
    )
    assert target.partition in pending


def run_rules_hash():
    from seronet_data_validator_ray.state.manifest import rule_set_hash

    return rule_set_hash(sequences_rules().rules)


def test_validate_uri_input(ray_session, tmp_path):
    """plan_read + the row-group reader accept scheme:// URIs end to end
    (object-store-style discovery; file:// stands in for s3:// here): same
    violations as the plain-path run, and resume works across the two
    addressing styles because partitions/fingerprints are path-agnostic."""
    from seronet_data_validator_ray.datagen import SEQUENCES_SCHEMA, SOURCES
    from seronet_data_validator_ray.pipelines.seq_queries import ensure_seq
    from seronet_data_validator_ray.pipelines.validate import validate
    from seronet_data_validator_ray.rules.builtin import sequences_rules

    local_dir = ensure_seq("/root/testdata/sf0.001")
    uri = "file://" + local_dir
    kw = dict(
        expected_schema=SEQUENCES_SCHEMA, broadcast={"allowed_sources": SOURCES}
    )
    plain = validate(local_dir, sequences_rules(), **kw)
    via_uri = validate(uri, sequences_rules(), **kw)
    a = plain.violations.to_pandas().sort_values(["rule_id", "partition", "row_index"]).reset_index(drop=True)
    b = via_uri.violations.to_pandas().sort_values(["rule_id", "partition", "row_index"]).reset_index(drop=True)
    assert a.equals(b)
    assert len(a) > 0
    # resume: URI run against an output_dir previously completed via plain path
    out = str(tmp_path / "uri-resume")
    validate(local_dir, sequences_rules(), output_dir=out, **kw)
    res = validate(uri, sequences_rules(), output_dir=out, resume=True, **kw)
    assert res.metrics["rows_validated_this_run"] == 0, "URI resume must skip completed work"
