#!/usr/bin/env python
"""Benchmark harness (SURVEY.md §7.2 M6).

Default: run the headline sequences-validation pipeline + representative
operator queries over $GRAFT_SF_DIR (default /root/testdata/sf0.1) with
ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32) and print ONE JSON
line: {"metric", "value", "unit", "queries", "sf", "num_cpus", ...}.

--scaling: run the SAME headline job twice in FRESH processes at two
parallelism levels (default 8 and 32 CPUs — the sandbox stand-in for N vs 4N
node clusters via `ray job submit`) on identical input, and report throughput
at both plus scaling efficiency T(4N)/(4·T(N)).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def _init_ray(num_cpus: int):
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False


def _headline(sf_dir: str) -> dict:
    """Full sequences validation: schema gate → fused rules + stats →
    uniqueness shuffle → drift actors."""
    from seronet_data_validator_ray.datagen import (
        MAX_LEN,
        SEQUENCES_SCHEMA,
        SOURCES,
        VOCAB,
        compute_reference_histograms,
        generate_sequences,
    )
    from seronet_data_validator_ray.pipelines.seq_queries import (
        ensure_seq,
        seq_dir_for,
        seq_rows_for,
    )
    from seronet_data_validator_ray.pipelines.validate import validate
    from seronet_data_validator_ray.rules.builtin import sequences_rules
    from seronet_data_validator_ray.stages.stats import sequences_stats_spec

    bad_dir = ensure_seq(sf_dir)
    clean_dir = seq_dir_for(sf_dir).replace("-bad", "-clean")
    generate_sequences(clean_dir, n_rows=seq_rows_for(sf_dir), seed=42, bad=False)
    hists = compute_reference_histograms(clean_dir)

    t0 = time.perf_counter()
    res = validate(
        bad_dir,
        sequences_rules(),
        expected_schema=SEQUENCES_SCHEMA,
        broadcast={"allowed_sources": SOURCES},
        reference_histograms=hists,
        stats_spec=sequences_stats_spec(VOCAB, MAX_LEN),
    )
    wall = time.perf_counter() - t0
    return {
        "wall_sec": wall,
        "rows": res.metrics["total_rows"],
        "rows_per_sec": res.metrics["total_rows"] / wall,
        "n_violations": len(res.violations),
    }


QUERY_NAMES = [
    "docs_violations",
    "dup_lineitem_orderkeys",
    "pricing_summary",
    "revenue_by_region",
    "events_hourly",
    "orders_enriched",
    "seq_violations",
    "seq_dup_ids",
    "seq_token_hist",
]


def _run_queries(sf_dir: str) -> dict:
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name in QUERY_NAMES:
        if name not in qs:
            continue
        t0 = time.perf_counter()
        qs[name](sf_dir)
        out[name] = round(time.perf_counter() - t0, 4)
    return out


def run_bench(sf_dir: str, num_cpus: int, headline_only: bool) -> dict:
    _init_ray(num_cpus)
    head = _headline(sf_dir)
    result = {
        "metric": "validated sequences/sec (end-to-end validation throughput)",
        "value": round(head["wall_sec"], 4),
        "unit": "sec",
        "rows": head["rows"],
        "rows_per_sec": round(head["rows_per_sec"], 1),
        "n_violations": head["n_violations"],
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "queries": {} if headline_only else _run_queries(sf_dir),
    }
    import ray

    ray.shutdown()
    return result


def run_scaling(sf_dir: str, lo: int, hi: int) -> dict:
    # pre-generate the input once so both runs time only the pipeline
    from seronet_data_validator_ray.pipelines.seq_queries import ensure_seq, seq_dir_for, seq_rows_for
    from seronet_data_validator_ray.datagen import generate_sequences

    ensure_seq(sf_dir)
    generate_sequences(
        seq_dir_for(sf_dir).replace("-bad", "-clean"), n_rows=seq_rows_for(sf_dir), seed=42
    )
    runs = {}
    for n in (lo, hi):
        proc = subprocess.run(
            [sys.executable, __file__, "--headline-only", "--cpus", str(n), "--sf-dir", sf_dir],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        line = proc.stdout.strip().splitlines()[-1]
        runs[n] = json.loads(line)
    tput_lo, tput_hi = runs[lo]["rows_per_sec"], runs[hi]["rows_per_sec"]
    eff = tput_hi / (tput_lo * (hi / lo))
    return {
        "metric": "scaling efficiency (throughput@4N / (4 x throughput@N))",
        "value": round(eff, 4),
        "unit": "ratio",
        "sf": sf_dir,
        "num_cpus": [lo, hi],
        "rows_per_sec": {str(lo): tput_lo, str(hi): tput_hi},
        "wall_sec": {str(lo): runs[lo]["value"], str(hi): runs[hi]["value"]},
        "queries": {},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--headline-only", action="store_true")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument(
        "--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--scale-lo", type=int, default=8)
    ap.add_argument("--scale-hi", type=int, default=32)
    args = ap.parse_args()

    if args.scaling:
        result = run_scaling(args.sf_dir, args.scale_lo, args.scale_hi)
    else:
        result = run_bench(args.sf_dir, args.cpus, args.headline_only)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
