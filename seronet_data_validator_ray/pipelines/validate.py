"""End-to-end validation pipeline (SURVEY.md §3.4 target lifecycle).

``config → plan (rule registry × schema) → provenance parquet read →
[stage 1: fused row-local rules + per-column stats partials, zero-copy Arrow
map_batches actor pool] → [stage 2: shuffles — projected groupby(doc_id)
uniqueness] → [stage 3: drift actors vs reference histograms] → sinks:
violations Parquet, verdict table, checkpoint manifest → resume = skip
partitions in manifest``.

Mirrors the observable semantics of the reference driver loop
(/root/reference/Data_Validation_v2.py:56-324): schema gate before row rules
(:231-244), per-submission(≙partition) error accumulation, cross-sheet
(≙cross-partition) checks after row rules (:259-267), verdict routing by
error counts (:272-280), and a resumable summary state (:170-192) — but as a
streaming Ray Data pipeline, not a serial folder walk.

Scale notes (100 TB posture):
- the heavy pass reads each input byte ONCE; only small outcome rows
  (violations + pickled stats partials) are materialized,
- uniqueness re-reads a **projected** (key, partition) view — the tokens
  column never enters the shuffle,
- broadcast state (allowed sets, reference histograms) is ``ray.put`` once
  and fetched once per actor,
- waves of partitions bound checkpoint granularity; a crashed wave re-runs
  idempotently (deterministic output names, manifest written after outputs).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from seronet_data_validator_ray.rules.spec import (
    ROW_COLUMN_LEVEL,
    ROW_TABLE_LEVEL,
    RuleSet,
    Severity,
)
from seronet_data_validator_ray.sources.parquet import FileMeta, ReadPlan, plan_read, read_with_provenance
from seronet_data_validator_ray.stages.drift import DriftScorer, drift_input_table
from seronet_data_validator_ray.stages.evaluate import (
    OUTCOME_SCHEMA,
    VIOLATION_COLUMNS,
    RuleEvaluator,
)
from seronet_data_validator_ray.stages.stats import PartialStats, StatsSpec
from seronet_data_validator_ray.stages.uniqueness import find_duplicate_keys
from seronet_data_validator_ray.state.manifest import Manifest, fileset_hash, rule_set_hash

VIOLATION_SCHEMA = pa.schema([OUTCOME_SCHEMA.field(c) for c in VIOLATION_COLUMNS])

# Default sampled-violation bound per (batch, rule, severity) cell. Well above
# any legitimate fixture/plant cell count (dozens), well below the default
# batch_size (8192), so ordinary runs keep their full row payload while an
# every-row-fails input is bounded to ~12% of rows per rule; the rulecount
# overflow rows keep verdict tallies exact either way (tested at
# tests/test_pipeline.py::test_violation_row_cap_keeps_exact_tallies).
DEFAULT_VIOLATION_ROW_CAP = 1024


class AbortRun(RuntimeError):
    """Test hook: simulated crash between waves (resume fixture, FIXTURES.md §5)."""


@dataclass
class ValidationResult:
    violations: pa.Table
    verdicts: pa.Table
    stats: dict = field(default_factory=dict)
    drift_reports: list = field(default_factory=list)
    metrics: dict = field(default_factory=dict)
    output_dir: str | None = None

    def violations_by_rule(self) -> dict[str, int]:
        if len(self.violations) == 0:
            return {}
        t = self.violations.group_by(["rule_id", "severity"]).aggregate([("rule_id", "count")])
        out: dict[str, int] = {}
        for rid, sev, cnt in zip(
            t["rule_id"].to_pylist(), t["severity"].to_pylist(), t["rule_id_count"].to_pylist()
        ):
            out[f"{rid}|{sev}"] = cnt
        return out


from seronet_data_validator_ray.util import ds_to_table as _ds_to_table_util


def _ds_to_table(ds, schema: pa.Schema) -> pa.Table:
    return _ds_to_table_util(ds, schema)


def _violation_row(rule_id, partition, row_index, doc_id, column, observed, severity, message):
    return {
        "rule_id": rule_id,
        "partition": partition,
        "row_index": row_index,
        "doc_id": doc_id,
        "column": column,
        "observed": observed,
        "severity": severity,
        "message": message,
    }


def _rows_to_table(rows: list[dict]) -> pa.Table:
    if not rows:
        return VIOLATION_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=VIOLATION_SCHEMA)


def _needed_columns(ruleset: RuleSet, stats_spec: StatsSpec | None) -> list[str]:
    cols: set[str] = set()
    for r in ruleset.row_local():
        cols.add(r.column)
        for p in ("of", "other", "prefix_of", "num", "den", "unit_col", "year_col", "when_col"):
            if p in r.params:
                cols.add(r.params[p])
        if r.dependency:
            cols.add(r.dependency[1])
    if ruleset.key_column:
        cols.add(ruleset.key_column)
    if stats_spec:
        cols.update(stats_spec.base_cols + stats_spec.numeric_cols)
        for c in (stats_spec.id_col, stats_spec.list_col, stats_spec.group_col):
            if c:
                cols.add(c)
    return sorted(cols)


def _gate_violations(meta: FileMeta, not_validated_rule_id: str, cap: int) -> list[dict]:
    rows = [
        _violation_row(
            "schema.conformance", meta.partition, ROW_COLUMN_LEVEL, None, "*",
            meta.schema_msg, Severity.ERROR,
            "file schema does not conform to the declared schema; row rules skipped",
        )
    ]
    n = min(meta.num_rows, cap)
    for i in range(n):
        rows.append(
            _violation_row(
                not_validated_rule_id, meta.partition, i, None, "*", None,
                Severity.NOT_VALIDATED, "row not validated: partition failed the schema gate",
            )
        )
    return rows


def validate(
    input_path,
    ruleset: RuleSet,
    *,
    expected_schema: pa.Schema | None = None,
    broadcast: dict | None = None,
    reference_histograms: dict | None = None,
    stats_spec: StatsSpec | None = None,
    output_dir: str | None = None,
    resume: bool = True,
    batch_size: int = 8192,
    eval_mode: str = "actors",
    eval_concurrency=None,
    target_rows_per_task: int = 128 * 1024,
    wave_size: int | None = None,
    abort_after_waves: int | None = None,
    drift_alpha: float = 0.01,
    not_validated_rule_id: str = "tokens.not_validated",
    max_not_validated_rows: int = 10_000,
    violation_row_cap: int | None = DEFAULT_VIOLATION_ROW_CAP,
    file_glob: str = "part-*.parquet",
) -> ValidationResult:
    """Run the full validation pipeline. Ray must already be initialised.

    `violation_row_cap` bounds the sampled violation rows per (batch, rule,
    severity) cell — ON by default so a pathological every-row-fails input
    cannot materialize row-count-sized tables driver-side; verdict tallies
    stay exact via the rulecount overflow accounting rows. Pass None for the
    uncapped (full row payload) behavior."""
    import ray

    t0 = time.perf_counter()
    phases: dict[str, float] = {}

    def _mark(name, since):
        phases[name] = phases.get(name, 0.0) + (time.perf_counter() - since)
        return time.perf_counter()

    tp = time.perf_counter()
    rules_hash = rule_set_hash(ruleset.rules)
    plan = plan_read(input_path, expected_schema, file_glob=file_glob)
    tp = _mark("plan", tp)
    manifest = Manifest(output_dir) if output_dir else None

    all_parts = [f.partition for f in plan.files]
    # input-file fingerprint (rows + mtime/size, captured by the planner's
    # filesystem listing — works for URIs too): a regenerated file with the
    # same name is re-validated on resume instead of silently skipped
    fingerprints = {f.partition: f.fingerprint for f in plan.files}
    if manifest and resume:
        pending_set = set(manifest.pending(all_parts, rules_hash, fingerprints))
    else:
        pending_set = set(all_parts)
    pending_good = [f for f in plan.good_files if f.partition in pending_set]
    pending_bad = [f for f in plan.bad_files if f.partition in pending_set]

    ctx = dict(broadcast or {})
    ctx_ref = ray.put(ctx)
    viol_dir = os.path.join(output_dir, "violations", rules_hash) if output_dir else None
    if viol_dir:
        os.makedirs(viol_dir, exist_ok=True)
    viol_tables: list[pa.Table] = []
    partials: dict[str, PartialStats] = {}
    entries: dict[str, dict] = {}

    # ---- schema gate (≙ column-error gate, Data_Validation_v2.py:231-244)
    for meta in pending_bad:
        rows = _gate_violations(meta, not_validated_rule_id, max_not_validated_rows)
        gate_tbl = _rows_to_table(rows)
        viol_tables.append(gate_tbl)
        entries[meta.partition] = {
            "input_file": meta.path,
            "input_fingerprint": fingerprints[meta.partition],
            "rows": meta.num_rows,
            "schema_ok": False,
            "schema_msg": meta.schema_msg,
            "rule_set_hash": rules_hash,
            "n_errors": 1,
            "n_warnings": 0,
            "n_not_validated": meta.num_rows,
            "rule_breakdown": {"schema.conformance": 1, not_validated_rule_id: meta.num_rows},
        }
        if manifest:
            out = os.path.join(viol_dir, f"gate-{meta.partition}.parquet")
            pq.write_table(gate_tbl, out + ".tmp")
            os.replace(out + ".tmp", out)
            manifest.mark(meta.partition, entries[meta.partition])

    # ---- waves of row-local validation (stage 1)
    columns = _needed_columns(ruleset, stats_spec)
    if plan.good_files:
        # fail FAST with a named error if a rule references a column no file
        # has — otherwise the KeyError surfaces as an opaque mid-pipeline
        # RayTaskError from inside a worker
        from seronet_data_validator_ray.sources.parquet import open_parquet_file

        available = set(open_parquet_file(plan.good_files[0].path).schema_arrow.names)
        missing = [c for c in columns if c not in available]
        if missing:
            raise ValueError(
                f"rule set {ruleset.name!r} references column(s) {missing} not present "
                f"in the input (available: {sorted(available)})"
            )
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    waves: list[list[FileMeta]] = []
    wave_files = pending_good
    step = wave_size or max(1, len(wave_files))
    for i in range(0, len(wave_files), step):
        waves.append(wave_files[i : i + step])

    rows_validated = 0
    row_rules = ruleset.row_local()
    for w_i, wave in enumerate(waves):
        if not row_rules and stats_spec is None:
            # nothing to evaluate per row and nothing to accumulate: the
            # per-partition entries below need only footer row counts, so the
            # corpus is never scanned (a lifecycle table that exists purely
            # as a cross-check side takes this path)
            tp = time.perf_counter()
            outcome_tbl = OUTCOME_SCHEMA.empty_table()
            tp = _mark("eval", tp)
            wave_viol = outcome_tbl.filter(
                pc.equal(outcome_tbl["kind"], "violation")
            ).select(VIOLATION_COLUMNS).cast(VIOLATION_SCHEMA)
            viol_tables.append(wave_viol)
            sev_counts = {}
            for meta in wave:
                entries[meta.partition] = {
                    "input_file": meta.path,
                    "input_fingerprint": fingerprints[meta.partition],
                    "rows": meta.num_rows,
                    "schema_ok": True,
                    "rule_set_hash": rules_hash,
                    "n_errors": 0,
                    "n_warnings": 0,
                    "n_not_validated": 0,
                    "rule_breakdown": {},
                }
                rows_validated += meta.num_rows
            if manifest:
                from seronet_data_validator_ray.state.manifest import _safe

                for meta in wave:
                    out = os.path.join(viol_dir, f"rows-{_safe(meta.partition)}.parquet")
                    if os.path.exists(out):
                        os.remove(out)
                    manifest.mark(meta.partition, entries[meta.partition])
            if abort_after_waves is not None and w_i + 1 >= abort_after_waves:
                raise AbortRun(f"aborted after wave {w_i + 1}/{len(waves)} (test hook)")
            continue
        sub_plan = ReadPlan(files=wave)
        items = sub_plan.work_items(target_rows_per_task)
        ds = read_with_provenance(items, columns=columns, yield_rows=batch_size)
        eval_kwargs = {
            "rules": row_rules,
            "ctx_ref": ctx_ref,
            "key_column": ruleset.key_column,
            "stats_spec": stats_spec,
            "violation_row_cap": violation_row_cap,
        }
        if eval_mode == "actors":
            # fixed-size actor pool (autoscaling from 1 ramps too slowly for a
            # finite wave); sized to the smaller of CPUs, read tasks, and the
            # work itself — each actor is a fresh process costing ~100ms to
            # spawn, so a small wave must not pay for 32 of them (~64k rows
            # of eval per actor amortizes the spawn)
            wave_rows = sum(f.num_rows for f in wave)
            conc = eval_concurrency or min(
                ncpu, max(2, len(items)), max(2, wave_rows // 65536)
            )
            outcome = ds.map_batches(
                RuleEvaluator,
                fn_constructor_kwargs=eval_kwargs,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=None,  # consume the reader's yielded blocks
                concurrency=conc,
                num_cpus=1,
            )
        else:
            # stateless tasks on the warm worker pool (no per-run actor spawn);
            # the instance pickles only rule specs — broadcast state resolves
            # once per worker via the object store (see RuleEvaluator)
            outcome = ds.map_batches(
                RuleEvaluator(**eval_kwargs),
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=None,
            )
        # ONE execution; the outcome (violations + per-batch stats rows) is
        # small, so split it driver-side instead of re-running filter stages
        tp = time.perf_counter()
        outcome_tbl = _ds_to_table(outcome, OUTCOME_SCHEMA)
        tp = _mark("eval", tp)
        wave_viol = outcome_tbl.filter(
            pc.equal(outcome_tbl["kind"], "violation")
        ).select(VIOLATION_COLUMNS).cast(VIOLATION_SCHEMA)
        viol_tables.append(wave_viol)

        # merge stats partials per partition (small)
        if stats_spec is not None:
            stats_tbl = outcome_tbl.filter(pc.equal(outcome_tbl["kind"], "stats")).select(
                ["partition", "n_rows", "payload"]
            )
            for p, payload in zip(
                stats_tbl["partition"].to_pylist(), stats_tbl["payload"].to_pylist()
            ):
                ps = PartialStats.from_bytes(payload)
                if p in partials:
                    partials[p].merge(ps)
                else:
                    partials[p] = ps

        # per-partition row-rule entries
        sev_counts: dict[str, dict] = {}
        if len(wave_viol):
            g = wave_viol.group_by(["partition", "rule_id", "severity"]).aggregate(
                [("rule_id", "count")]
            )
            for p, rid, sev, cnt in zip(
                g["partition"].to_pylist(),
                g["rule_id"].to_pylist(),
                g["severity"].to_pylist(),
                g["rule_id_count"].to_pylist(),
            ):
                d = sev_counts.setdefault(p, {"Error": 0, "Warning": 0, "Not Validated": 0, "rules": {}})
                d[sev] = d.get(sev, 0) + cnt
                d["rules"][rid] = d["rules"].get(rid, 0) + cnt
        if violation_row_cap is not None:
            # fold in the overflow accounting rows: each carries the exact
            # count of rows NOT sampled for one capped (partition, rule,
            # severity) batch cell — additive on top of the sample tallies
            rc = outcome_tbl.filter(pc.equal(outcome_tbl["kind"], "rulecount"))
            for p, rid, sev, extra in zip(
                rc["partition"].to_pylist(),
                rc["rule_id"].to_pylist(),
                rc["severity"].to_pylist(),
                rc["n_rows"].to_pylist(),
            ):
                d = sev_counts.setdefault(p, {"Error": 0, "Warning": 0, "Not Validated": 0, "rules": {}})
                d[sev] = d.get(sev, 0) + extra
                d["rules"][rid] = d["rules"].get(rid, 0) + extra
        for meta in wave:
            d = sev_counts.get(
                meta.partition, {"Error": 0, "Warning": 0, "Not Validated": 0, "rules": {}}
            )
            entries[meta.partition] = {
                "input_file": meta.path,
                "input_fingerprint": fingerprints[meta.partition],
                "rows": meta.num_rows,
                "schema_ok": True,
                "rule_set_hash": rules_hash,
                "n_errors": d["Error"],
                "n_warnings": d["Warning"],
                "n_not_validated": d["Not Validated"],
                "rule_breakdown": d["rules"],
            }
            rows_validated += meta.num_rows

        if manifest:
            # ONE deterministic violations file per partition (sorted by row),
            # written BEFORE that partition's manifest mark: a crash between
            # write and mark re-validates the partition and OVERWRITES the same
            # file, so the final concat never double-counts; ≙ per-partition
            # output ordering of the reference error workbook (SURVEY §2.7 O1)
            from seronet_data_validator_ray.state.manifest import _safe

            for meta in wave:
                part_viol = wave_viol.filter(
                    pc.equal(wave_viol["partition"], meta.partition)
                ).sort_by([("row_index", "ascending"), ("rule_id", "ascending")])
                out = os.path.join(viol_dir, f"rows-{_safe(meta.partition)}.parquet")
                if len(part_viol):
                    pq.write_table(part_viol, out + ".tmp")
                    os.replace(out + ".tmp", out)
                elif os.path.exists(out):
                    os.remove(out)  # partition re-validated clean: drop stale rows
                manifest.mark(
                    meta.partition, entries[meta.partition], stats_partial=partials.get(meta.partition)
                )
        if abort_after_waves is not None and w_i + 1 >= abort_after_waves:
            raise AbortRun(f"aborted after wave {w_i + 1}/{len(waves)} (test hook)")

    # ---- pull stats/entries for previously-completed partitions (resume path)
    if manifest:
        done = manifest.completed()
        for p, e in done.items():
            if p.startswith("__global__"):
                continue
            entries.setdefault(p, e)
            if stats_spec is not None and p not in partials:
                sp = manifest.load_stats(p)
                if sp is not None:
                    partials[p] = sp

    # ---- stage 2: global uniqueness shuffle (≙ check_for_dup_ids)
    dup_rows: list[dict] = []
    unique_specs = ruleset.unique_rules()
    if unique_specs and plan.good_files:
        spec = unique_specs[0]
        fs_hash = fileset_hash([f.partition for f in plan.good_files]) + ":" + rules_hash
        gpath = os.path.join(viol_dir, "global-dups.parquet") if output_dir else None
        dup_tbl = None
        if manifest:
            ge = manifest.global_entry("unique")
            if ge and ge.get("fileset_hash") == fs_hash and gpath and os.path.exists(gpath):
                dup_tbl = pq.read_table(gpath)
        if dup_tbl is None:
            tp = time.perf_counter()
            u_items = plan.work_items(target_rows_per_task)
            key_ds = read_with_provenance(u_items, columns=[spec.column], yield_rows=65536)
            dup_tbl = find_duplicate_keys(key_ds, key=spec.column, partition_col="partition")
            tp = _mark("unique", tp)
            if gpath:
                pq.write_table(dup_tbl, gpath + ".tmp")
                os.replace(gpath + ".tmp", gpath)
            if manifest:
                manifest.mark_global("unique", {"fileset_hash": fs_hash, "n_dups": len(dup_tbl)})
        for row in dup_tbl.to_pylist():
            dup_rows.append(
                _violation_row(
                    spec.rule_id,
                    row.get("partition", ""),
                    ROW_TABLE_LEVEL,
                    str(row[spec.column]),
                    spec.column,
                    str(row["multiplicity"]),
                    spec.severity,
                    f"Id is repeated {row['multiplicity']} times",
                )
            )
    dup_tbl_rows = _rows_to_table(dup_rows)
    viol_tables.append(dup_tbl_rows)

    # ---- global stats + stage 3: drift actors
    global_stats = None
    drift_reports: list[dict] = []
    if stats_spec is not None and partials:
        global_stats = PartialStats(stats_spec)
        for ps in partials.values():
            global_stats.merge(ps)
    if reference_histograms is not None and global_stats is not None and global_stats.group_counts:
        import ray.data as rd

        per_source = {
            g: {
                "token_hist": global_stats.group_list_hist[g].counts,
                "n_tok_hist": global_stats.group_len_hist[g].counts,
            }
            for g in global_stats.group_counts
        }
        drift_in = drift_input_table(per_source)
        tp = time.perf_counter()
        if len(drift_in) <= 64:
            # the stage input is n_sources rows (the corpus was already
            # reduced to per-source histograms in the eval pass) — for a
            # handful of sources, spawning an actor pool costs ~1 s to score
            # a 6-row table. Same DriftScorer, driver-side instance.
            drift_out = DriftScorer(reference=reference_histograms, alpha=drift_alpha)(
                drift_in
            )
        else:
            ref_ref = ray.put(reference_histograms)
            drift_ds = rd.from_arrow(drift_in).map_batches(
                DriftScorer,
                fn_constructor_kwargs={"ref_ref": ref_ref, "alpha": drift_alpha},
                batch_format="pyarrow",
                concurrency=(1, 2),
            )
            drift_out = _ds_to_table(drift_ds, OUTCOME_SCHEMA)
        tp = _mark("drift", tp)
        dmask = pc.equal(drift_out["kind"], "drift_report")
        drift_reports = [
            json.loads(m) for m in drift_out.filter(dmask)["message"].to_pylist()
        ]
        drift_viol = drift_out.filter(pc.equal(drift_out["kind"], "violation")).select(
            VIOLATION_COLUMNS
        )
        viol_tables.append(drift_viol.cast(VIOLATION_SCHEMA))
        if manifest and len(drift_viol):
            out = os.path.join(viol_dir, "global-drift.parquet")
            pq.write_table(drift_viol.cast(VIOLATION_SCHEMA), out + ".tmp")
            os.replace(out + ".tmp", out)

    if manifest and len(dup_tbl_rows):
        out = os.path.join(viol_dir, "global-dup-violations.parquet")
        pq.write_table(dup_tbl_rows, out + ".tmp")
        os.replace(out + ".tmp", out)

    # ---- verdicts (≙ folder routing by error counts, Data_Validation_v2.py:272-280)
    dup_by_part: dict[str, int] = {}
    for r in dup_rows:
        dup_by_part[r["partition"]] = dup_by_part.get(r["partition"], 0) + 1
    verdict_rows = []
    for p in sorted(entries):
        e = entries[p]
        n_err = e["n_errors"] + dup_by_part.get(p, 0)
        verdict_rows.append(
            {
                "partition": p,
                "pass": bool(e.get("schema_ok", True)) and n_err == 0,
                "schema_ok": bool(e.get("schema_ok", True)),
                "n_rows": e["rows"],
                "n_errors": n_err,
                "n_warnings": e["n_warnings"],
                "n_not_validated": e["n_not_validated"],
                "rule_breakdown": json.dumps(e.get("rule_breakdown", {}), sort_keys=True),
            }
        )
    verdicts = pa.Table.from_pylist(
        verdict_rows,
        schema=pa.schema(
            [
                pa.field("partition", pa.string()),
                pa.field("pass", pa.bool_()),
                pa.field("schema_ok", pa.bool_()),
                pa.field("n_rows", pa.int64()),
                pa.field("n_errors", pa.int64()),
                pa.field("n_warnings", pa.int64()),
                pa.field("n_not_validated", pa.int64()),
                pa.field("rule_breakdown", pa.string()),
            ]
        ),
    )
    if manifest:
        vout = os.path.join(output_dir, "verdicts.parquet")
        pq.write_table(verdicts, vout + ".tmp")
        os.replace(vout + ".tmp", vout)

    if viol_dir:
        import glob as _glob

        vfiles = sorted(
            f
            for f in _glob.glob(os.path.join(viol_dir, "*.parquet"))
            if not f.endswith("global-dups.parquet")  # raw dup keys, not violation rows
            and not os.path.basename(f).startswith("wave-")  # pre-round-2 layout
        )
        tabs = [pq.read_table(f) for f in vfiles]
        tabs = [t.cast(VIOLATION_SCHEMA) for t in tabs if len(t)]
        violations = (
            pa.concat_tables(tabs) if tabs else VIOLATION_SCHEMA.empty_table()
        )
    else:
        violations = (
            pa.concat_tables(viol_tables).cast(VIOLATION_SCHEMA)
            if viol_tables
            else VIOLATION_SCHEMA.empty_table()
        )
    wall = time.perf_counter() - t0
    metrics = {
        "n_files": len(plan.files),
        "n_pending_files": len(pending_good) + len(pending_bad),
        "rows_validated_this_run": rows_validated,
        "total_rows": int(sum(f.num_rows for f in plan.files)),
        "wall_sec": wall,
        "rows_per_sec": (rows_validated / wall) if wall > 0 else 0.0,
        "rule_set_hash": rules_hash,
        "phases": {k: round(v, 3) for k, v in phases.items()},
    }
    stats = global_stats.summary() if global_stats is not None else {}
    return ValidationResult(
        violations=violations,
        verdicts=verdicts,
        stats=stats,
        drift_reports=drift_reports,
        metrics=metrics,
        output_dir=output_dir,
    )
