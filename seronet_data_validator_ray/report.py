"""Human-readable run report — the artifact a data steward reads.

≙ the reference's end-of-run summary workbook (Data_Validation_v2.py:304-316
writes seven sheets routing submissions by outcome: Uploaded / Failed File
Validation / Column Errors / Data Errors / Major / Minor / No Errors).
Here the same routing is rendered as one `summary.md` (sections per outcome
+ exact rule tallies + drift) and a `summary.csv` (the per-partition verdict
table, machine-greppable) under the run's output directory.

Everything rendered is verdict/metric-sized (one row per partition, one row
per rule) — never violation-row-sized — so the writer is safe at any scale.
"""

from __future__ import annotations

import csv
import json
import os


def _md_table(headers: list[str], rows: list[list]) -> str:
    out = ["| " + " | ".join(headers) + " |", "|" + "---|" * len(headers)]
    for r in rows:
        out.append("| " + " | ".join(str(c) for c in r) + " |")
    return "\n".join(out) + "\n"


def summarize(res) -> dict:
    """Verdict-table → routing sections + exact rule tallies (pure, testable)."""
    verd = res.verdicts.to_pylist()
    sections = {
        "failed_file_validation": [r for r in verd if not r["schema_ok"]],
        "data_errors": [r for r in verd if r["schema_ok"] and r["n_errors"] > 0],
        "minor_errors": [
            r for r in verd if r["schema_ok"] and r["n_errors"] == 0 and r["n_warnings"] > 0
        ],
        "no_errors": [
            r for r in verd if r["pass"] and r["n_warnings"] == 0
        ],
    }
    rule_tallies: dict[str, int] = {}
    for r in verd:
        for rid, cnt in json.loads(r["rule_breakdown"]).items():
            rule_tallies[rid] = rule_tallies.get(rid, 0) + int(cnt)
    return {"verdicts": verd, "sections": sections, "rule_tallies": rule_tallies}


def write_summary_report(res, output_dir: str) -> dict:
    """Render `res` (a ValidationResult) to summary.md + summary.csv under
    `output_dir`. Returns {"md": path, "csv": path}."""
    os.makedirs(output_dir, exist_ok=True)
    s = summarize(res)
    verd, sections, tallies = s["verdicts"], s["sections"], s["rule_tallies"]
    m = res.metrics or {}

    lines = ["# Validation run summary", ""]
    lines.append(
        f"- partitions: **{len(verd)}** ({len(sections['no_errors'])} clean, "
        f"{len(sections['data_errors'])} with errors, "
        f"{len(sections['minor_errors'])} warnings-only, "
        f"{len(sections['failed_file_validation'])} failed file validation)"
    )
    if m:
        lines.append(
            f"- rows: **{m.get('total_rows', '?')}** total, "
            f"{m.get('rows_validated_this_run', '?')} validated this run "
            f"({m.get('n_pending_files', '?')}/{m.get('n_files', '?')} files pending)"
        )
        lines.append(
            f"- wall: {m.get('wall_sec', 0):.2f}s "
            f"({m.get('rows_per_sec', 0):,.0f} rows/s); phases: "
            + ", ".join(f"{k} {v}s" for k, v in (m.get("phases") or {}).items())
        )
        lines.append(f"- rule set: `{m.get('rule_set_hash', '')}`")
    lines.append("")

    titles = [
        ("failed_file_validation", "Failed file validation (schema gate)"),
        ("data_errors", "Data errors"),
        ("minor_errors", "Minor errors (warnings only)"),
        ("no_errors", "Passed with no errors"),
    ]
    cols = ["partition", "n_rows", "n_errors", "n_warnings", "n_not_validated"]
    for key, title in titles:
        rows = sections[key]
        lines.append(f"## {title} ({len(rows)})")
        lines.append("")
        if rows:
            lines.append(_md_table(cols, [[r[c] for c in cols] for r in rows]))
        else:
            lines.append("_none_\n")

    lines.append(f"## Rule tallies ({len(tallies)})")
    lines.append("")
    if tallies:
        lines.append(
            _md_table(
                ["rule_id", "count"],
                sorted(tallies.items(), key=lambda kv: (-kv[1], kv[0])),
            )
        )
    else:
        lines.append("_none_\n")

    lines.append(f"## Drift reports ({len(res.drift_reports)})")
    lines.append("")
    for rep in res.drift_reports:
        lines.append(f"- `{json.dumps(rep, sort_keys=True)}`")
    lines.append("")

    md_path = os.path.join(output_dir, "summary.md")
    with open(md_path + ".tmp", "w") as f:
        f.write("\n".join(lines))
    os.replace(md_path + ".tmp", md_path)

    csv_path = os.path.join(output_dir, "summary.csv")
    fields = [
        "partition", "pass", "schema_ok", "n_rows",
        "n_errors", "n_warnings", "n_not_validated", "rule_breakdown",
    ]
    with open(csv_path + ".tmp", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        for r in verd:
            w.writerow({k: r[k] for k in fields})
    os.replace(csv_path + ".tmp", csv_path)
    return {"md": md_path, "csv": csv_path}


def write_submission_report(res, output_dir: str) -> dict:
    """Render a SubmissionResult (multi-table lifecycle) to
    submission_summary.md: per-table roll-up (≙ the reference's
    submission-level error routing, Data_Validation_v2.py:272-280), the
    cross-check row, and per-rule tallies from the merged violations —
    all table-cardinality-sized driver data."""
    os.makedirs(output_dir, exist_ok=True)
    tv = res.table_verdicts.to_pylist()
    lines = ["# Submission validation summary", ""]
    lines.append(_md_table(
        ["table", "n_rows", "n_errors", "n_warnings", "pass"],
        [[r["table"], r["n_rows"], r["n_errors"], r["n_warnings"], r["pass"]] for r in tv],
    ))
    v = res.violations
    lines.append(f"## Rule tallies ({0 if v is None else len(v)} violation rows)")
    lines.append("")
    if v is not None and len(v):
        g = v.group_by(["rule_id", "severity"]).aggregate([("rule_id", "count")])
        rows = sorted(
            zip(g["rule_id"].to_pylist(), g["severity"].to_pylist(),
                g["rule_id_count"].to_pylist()),
            key=lambda r: (-r[2], r[0]),
        )
        lines.append(_md_table(["rule_id", "severity", "count"], [list(r) for r in rows]))
    else:
        lines.append("_none_\n")
    md_path = os.path.join(output_dir, "submission_summary.md")
    with open(md_path + ".tmp", "w") as f:
        f.write("\n".join(lines))
    os.replace(md_path + ".tmp", md_path)
    return {"md": md_path}
