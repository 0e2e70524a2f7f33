#!/usr/bin/env python
"""sf1 (10x) scaling bench for the headline + dedup family (r4 verdict
item #7): at sf0.1 most queries measure fixed Ray machinery (0.5-1 s
floor), so per-round deltas are noise-dominated; this tool runs each family
query PAIRED at sf0.1 and at a deterministic 10x corpus in the same window
and reports the 10x growth ratio per phase of work.

The 10x documents corpus is 10 copies of sf0.1's table with every TOKEN
prefixed by a per-copy salt (``k{K}x``): within a copy the dup/near-dup
structure is isomorphic to sf0.1, across copies token vocabularies are
DISJOINT (Jaccard 0, distinct edit-blocking keys), so pair counts scale
exactly 10x and no artificial cross-copy cliques appear. The sequences
table scales via the dir tag (seq_rows_for: sf1 -> 2M rows).

Usage: python tools/bench_sf1.py [--cpus 32]   (one JSON line per query)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = "/tmp/graft_sf1/sf1"

QUERIES = [
    "dedup_exact_digest",
    "dedup_minhash_lsh",
    "dedup_minhash_incremental",
    "dedup_jaccard_pairs",
    "dedup_edit_distance",
    "docs_dedup_spans",
    "seq_dedup_tokens",
]


def build_sf1_documents() -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out = os.path.join(SF1, "documents.parquet")
    if os.path.exists(out):
        return
    os.makedirs(SF1, exist_ok=True)
    t = pq.read_table(os.path.join(SF01, "documents.parquet"))
    n = t.num_rows
    copies = []
    for k in range(10):
        salt = f"k{k}x"
        body = pc.replace_substring(t["text"], pattern=" ", replacement=f" {salt}")
        text = pc.binary_join_element_wise(
            pa.array([salt] * n, type=pa.string()), body, ""
        )
        copies.append(
            pa.table(
                {
                    "doc_id": pc.add(t["doc_id"], pa.scalar(k * 10_000_000)),
                    "text": text,
                    "lang": t["lang"],
                    "source": t["source"],
                    "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
                }
            )
        )
    pq.write_table(pa.concat_tables(copies), out, row_group_size=8192)


def _load() -> float:
    return os.getloadavg()[0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray

    ray.init(
        address="local", num_cpus=args.cpus, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    build_sf1_documents()

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    out: dict = {"num_cpus": args.cpus, "load_start": _load(), "queries": {}}

    # headline: full validation at 200k (sf0.1) and 2M (sf1) rows, same window
    from seronet_data_validator_ray.datagen import (
        MAX_LEN, SEQUENCES_SCHEMA, SOURCES, VOCAB, compute_reference_histograms,
        generate_sequences,
    )
    from seronet_data_validator_ray.pipelines.seq_queries import ensure_seq
    from seronet_data_validator_ray.pipelines.validate import validate
    from seronet_data_validator_ray.rules.builtin import sequences_rules
    from seronet_data_validator_ray.stages.stats import sequences_stats_spec

    clean = "/tmp/graft_seq/ref-clean-10k"
    generate_sequences(clean, n_rows=10_000, seed=42, bad=False)
    hists = compute_reference_histograms(clean)
    head = {}
    for tag, sf in (("sf0.1", SF01), ("sf1", SF1)):
        d = ensure_seq(sf)
        t0 = time.perf_counter()
        res = validate(
            d, sequences_rules(), expected_schema=SEQUENCES_SCHEMA,
            broadcast={"allowed_sources": SOURCES}, reference_histograms=hists,
            stats_spec=sequences_stats_spec(VOCAB, MAX_LEN),
        )
        head[tag] = {
            "wall_sec": round(time.perf_counter() - t0, 3),
            "rows": res.metrics["total_rows"],
            "rows_per_sec": round(res.metrics["total_rows"] / (time.perf_counter() - t0), 1),
            "phases": res.metrics["phases"],
        }
    head["ratio_10x"] = round(head["sf1"]["wall_sec"] / head["sf0.1"]["wall_sec"], 2)
    out["headline_validate"] = head

    for name in QUERIES:
        fn = qs[name]
        row = {}
        for tag, sf in (("sf0.1", SF01), ("sf1", SF1)):
            t0 = time.perf_counter()
            res = fn(sf)
            row[tag] = {
                "wall_sec": round(time.perf_counter() - t0, 3),
                "rows": res.num_rows if hasattr(res, "num_rows") else len(res),
            }
        row["ratio_10x"] = round(row["sf1"]["wall_sec"] / row["sf0.1"]["wall_sec"], 2)
        out["queries"][name] = row
        print(json.dumps({name: row}), flush=True)

    out["load_end"] = _load()
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
