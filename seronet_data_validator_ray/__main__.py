"""CLI driver — the operational surface a reference user switches to.

≙ running `python Data_Validation_v2.py` over a submission root
(/root/reference/Data_Validation_v2.py:326-360), replayed as a Ray Data job:

    python -m seronet_data_validator_ray validate \
        --input /data/sequences --output /data/out [--resume/--no-resume]

    python -m seronet_data_validator_ray query seq_violations \
        --sf-dir /root/testdata/sf0.01

Owns the Ray session (init/shutdown) — library code never does. Prints one
JSON summary line to stdout; violations/verdicts/manifest land under
--output exactly as validate() writes them.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    """Own the Ray session. RAY_ADDRESS selects the target: unset/"local"
    starts a local instance (this sandbox); on a multi-node cluster the same
    CLI runs unchanged under `ray job submit` (the job runtime presets
    RAY_ADDRESS=auto, connecting to the existing cluster — --cpus is then
    ignored because the cluster sizes itself)."""
    import os

    import ray

    if not ray.is_initialized():
        address = os.environ.get("RAY_ADDRESS", "local")
        kwargs = {"address": address, "include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus and address == "local":
            kwargs["num_cpus"] = num_cpus
        elif num_cpus:
            print(
                f"warning: --cpus {num_cpus} ignored — RAY_ADDRESS={address!r} connects to "
                "an existing cluster, which sizes itself",
                file=sys.stderr,
            )
        ray.init(**kwargs)


def cmd_validate(args) -> int:
    from seronet_data_validator_ray.datagen import SEQUENCES_SCHEMA, SOURCES
    from seronet_data_validator_ray.pipelines.validate import validate
    from seronet_data_validator_ray.rules.builtin import sequences_rules

    _init_ray(args.cpus)
    res = validate(
        args.input,
        sequences_rules(),
        expected_schema=SEQUENCES_SCHEMA if args.schema_gate else None,
        broadcast={"allowed_sources": SOURCES},
        output_dir=args.output,
        resume=args.resume,
        file_glob=args.glob,
    )
    from seronet_data_validator_ray.report import write_summary_report

    report_paths = write_summary_report(res, args.output)
    summary = {
        "n_violations": len(res.violations),
        "n_partitions": len(res.verdicts),
        "n_failed_partitions": int(
            len(res.verdicts) - res.verdicts["pass"].combine_chunks().true_count
        ),
        "metrics": res.metrics,
        "output_dir": args.output,
        "report": report_paths,
    }
    print(json.dumps(summary, default=str))
    return 0


def cmd_workbook(args) -> int:
    """Validate one multi-sheet .xlsx submission end-to-end — the reference's
    main program shape (Data_Validation_v2.py: workbook in, per-sheet +
    cross-sheet verdicts and a summary out). Rules come from a declarative
    JSON file (rules/spec.rulesets_from_json); cross-sheet key checks from
    --cross-key left_table:left_key=right_table:right_key (repeatable)."""
    import os

    from seronet_data_validator_ray.pipelines.submission import (
        CrossKeyCheck,
        validate_submission,
    )
    from seronet_data_validator_ray.report import write_submission_report
    from seronet_data_validator_ray.rules.spec import rulesets_from_json
    from seronet_data_validator_ray.sources.xlsx_source import submission_from_workbook

    _init_ray(args.cpus)
    rulesets = rulesets_from_json(args.rules)
    tables = submission_from_workbook(
        args.input, rulesets, os.path.join(args.output, "sheets")
    )
    checks = []
    for spec in args.cross_key or []:
        left, right = spec.split("=", 1)
        lt, lk = left.split(":", 1)
        rt, rk = right.split(":", 1)
        checks.append(CrossKeyCheck(f"cross.{lk}", lt, lk, rt, rk))
    res = validate_submission(tables, checks, output_dir=args.output)
    report = write_submission_report(res, args.output)
    tv = res.table_verdicts.to_pylist()
    print(
        json.dumps(
            {
                "n_violations": len(res.violations),
                "tables": {r["table"]: r["pass"] for r in tv},
                "pass": all(r["pass"] for r in tv),
                "report": report,
                "output_dir": args.output,
            }
        )
    )
    return 0


def cmd_query(args) -> int:
    import __ray_entry__ as entrymod

    _init_ray(args.cpus)
    qs = entrymod.queries()
    if args.name not in qs:
        print(json.dumps({"error": f"unknown query {args.name!r}", "known": sorted(qs)}))
        return 2
    result = qs[args.name](args.sf_dir)
    tbl = result if hasattr(result, "num_rows") else None
    if args.out_parquet and tbl is not None:
        import pyarrow.parquet as pq

        pq.write_table(tbl, args.out_parquet)
    print(
        json.dumps(
            {
                "query": args.name,
                "rows": tbl.num_rows if tbl is not None else None,
                "columns": tbl.column_names if tbl is not None else None,
                "out_parquet": args.out_parquet,
            }
        )
    )
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="seronet_data_validator_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="run the validation pipeline over a parquet dir")
    v.add_argument("--input", required=True)
    v.add_argument("--output", required=True)
    v.add_argument("--glob", default="part-*.parquet")
    v.add_argument("--cpus", type=int, default=None)
    v.add_argument("--schema-gate", action=argparse.BooleanOptionalAction, default=True)
    v.add_argument("--resume", action=argparse.BooleanOptionalAction, default=True)
    v.set_defaults(fn=cmd_validate)

    w = sub.add_parser("workbook", help="validate one multi-sheet .xlsx submission")
    w.add_argument("--input", required=True, help=".xlsx workbook path")
    w.add_argument("--rules", required=True, help="declarative ruleset JSON (sheet -> rules)")
    w.add_argument("--output", required=True)
    w.add_argument(
        "--cross-key", action="append", default=None,
        metavar="LT:LK=RT:RK", help="cross-sheet key check (repeatable)",
    )
    w.add_argument("--cpus", type=int, default=None)
    w.set_defaults(fn=cmd_workbook)

    q = sub.add_parser("query", help="run one registered pipeline by name")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--cpus", type=int, default=None)
    q.add_argument("--out-parquet", default=None)
    q.set_defaults(fn=cmd_query)

    args = ap.parse_args(argv)
    try:
        return args.fn(args)
    finally:
        import ray

        if ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
