"""Oracle-paired queries for the reference's clinical rule families that the
driver's TPC-H-ish tables cannot exercise: the duration/date-arithmetic
bundle (M17/M18 ≙ check_duration_rules + compare_dates_to_curr,
/root/reference/File_Submission_Object.py:471-517), the viability ratio
triple (M16 ≙ compare_total_to_live + compare_viability, :519-552), fuzzy
status normalization (M21 ≙ check_for_typo, Data_Validation_v2.py:563-591)
and CSV table cleanup (M4 ≙ cleanup_table, File_Submission_Object.py:125-138).

Inputs are deterministically synthesized at small scale (BASELINE.json
instruction: no external data) under /tmp, and each oracle reads the SAME
file via DuckDB read_parquet/read_csv — full value-level parity.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa

from seronet_data_validator_ray.datagen import (
    CURR_DATE,
    DURATION_UNITS,
    STATUS_CANON,
    generate_clinical,
)

CLIN_BASE = "/tmp/graft_clinical"
CSV_BASE = "/tmp/graft_csvclean"
PII_BASE = "/tmp/graft_pii"
REGISTRY: dict[str, tuple] = {}  # name -> (fn(sf_dir) -> table, sql_template | None)

CURR_YEAR = int(CURR_DATE[:4])
CURR_MONTH = int(CURR_DATE[5:7])


def query(name: str, sql_template: str | None = None):
    def deco(fn):
        REGISTRY[name] = (fn, sql_template)
        return fn

    return deco


def _tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir)) or "sf0.001"


def _rows_for(sf_dir: str) -> int:
    m = re.search(r"sf([0-9.]+)", _tag(sf_dir))
    sf = float(m.group(1)) if m else 0.001
    return max(2_000, int(200_000 * sf))


def ensure_clinical(sf_dir: str) -> str:
    d = os.path.join(CLIN_BASE, _tag(sf_dir))
    generate_clinical(d, n_rows=_rows_for(sf_dir), seed=77)
    return d


def ensure_pii_fixture(sf_dir: str) -> str:
    from seronet_data_validator_ray.datagen import generate_pii

    d = os.path.join(PII_BASE, _tag(sf_dir))
    generate_pii(d, n_rows=_rows_for(sf_dir), seed=91)
    return d


def format_sql(name: str, sf_dir: str) -> str | None:
    _fn, sql = REGISTRY[name]
    if sql is None:
        return None
    if name == "csv_cleanup":
        return sql.format(p=os.path.join(ensure_csv_fixture(sf_dir), "data.csv"))
    if name == "jsonl_events":
        return sql.format(j=ensure_jsonl_fixture(sf_dir))
    if name == "pii_scrub":
        return sql.format(p=os.path.join(ensure_pii_fixture(sf_dir), "pii_docs.parquet"))
    return sql.format(d=ensure_clinical(sf_dir))


def _rule_violations(sf_dir: str, rules) -> pa.Table:
    from seronet_data_validator_ray.pipelines.validate import validate

    d = ensure_clinical(sf_dir)
    res = validate(d, rules, file_glob="clinical.parquet", violation_row_cap=None)
    v = res.violations
    out = v.select(["rule_id", "doc_id", "column", "observed", "severity"])
    return out.rename_columns(["rule_id", "doc_id", "column_name", "observed", "severity"])


# ----------------------------------------------------------- duration bundle

_CLIN_CTE = "WITH clin AS (SELECT * FROM read_parquet('{d}/clinical.parquet'))\n"

_DURATION_SQL = (
    _CLIN_CTE
    + f"""
SELECT 'duration.future' AS rule_id, CAST(row_id AS VARCHAR) AS doc_id,
       'duration_value' AS column_name,
       duration_unit || ': ' || printf('%g', duration_value)
         || ', Year: ' || CAST(visit_year AS VARCHAR) AS observed,
       'Error' AS severity
FROM clin
WHERE duration_value IS NOT NULL AND duration_unit IS NOT NULL AND visit_year IS NOT NULL
  AND ((lower(duration_unit) = 'month'
          AND duration_value + 12 * visit_year > 12 * {CURR_YEAR} + {CURR_MONTH})
    OR (lower(duration_unit) = 'year' AND duration_value + visit_year > {CURR_YEAR})
    OR (lower(duration_unit) = 'day'
          AND duration_value > (DATE '{CURR_DATE}' - make_date(visit_year, 1, 1))))
UNION ALL
SELECT 'duration.value_range', CAST(row_id AS VARCHAR), 'duration_value',
       printf('%g', duration_value), 'Error'
FROM clin WHERE duration_value IS NOT NULL
  AND (duration_value < 0 OR duration_value > 100000)
UNION ALL
SELECT 'duration.unit_enum', CAST(row_id AS VARCHAR), 'duration_unit', duration_unit, 'Error'
FROM clin WHERE duration_value IS NOT NULL AND duration_unit IS NOT NULL
  AND duration_unit NOT IN ({",".join("'" + u + "'" for u in DURATION_UNITS)})
UNION ALL
SELECT 'duration.unit_enum', CAST(row_id AS VARCHAR), 'duration_unit', duration_unit,
       'Not Validated'
FROM clin WHERE duration_value IS NULL
UNION ALL
SELECT 'year.range', CAST(row_id AS VARCHAR), 'visit_year',
       CAST(visit_year AS VARCHAR), 'Error'
FROM clin WHERE duration_value IS NOT NULL AND (visit_year < 1900 OR visit_year > {CURR_YEAR})
UNION ALL
SELECT 'year.range', CAST(row_id AS VARCHAR), 'visit_year',
       CAST(visit_year AS VARCHAR), 'Not Validated'
FROM clin WHERE duration_value IS NULL
"""
)


@query("clinical_duration_rules", _DURATION_SQL)
def clinical_duration_rules(sf_dir: str) -> pa.Table:
    """M17/M18: the unit-dispatched future-date rule plus the bundle's value
    range / unit enum / anchor-year range rules, with the reference's
    Not-Validated dependency semantics (rules governed by a null duration
    value are reported NV, ≙ unknow_number_dependancy)."""
    from seronet_data_validator_ray.rules.spec import RuleSet, RuleSpec

    dep = ("not_null", "duration_value", {})
    rules = RuleSet(
        name="clinical_duration",
        key_column="row_id",
        rules=[
            RuleSpec(
                "duration.future", "duration_value", "duration_future",
                {"unit_col": "duration_unit", "year_col": "visit_year", "ref_date": CURR_DATE},
                message="duration exists in the future, check duration units",
            ),
            RuleSpec(
                "duration.value_range", "duration_value", "range",
                {"lo": 0, "hi": 100000},
                message="duration value outside [0, 100000]",
            ),
            RuleSpec(
                "duration.unit_enum", "duration_unit", "in_set",
                {"values": DURATION_UNITS}, dependency=dep,
                message="unknown duration unit",
            ),
            RuleSpec(
                "year.range", "visit_year", "range",
                {"lo": 1900, "hi": CURR_YEAR}, dependency=dep,
                message=f"anchor year outside [1900, {CURR_YEAR}]",
            ),
        ],
    )
    return _rule_violations(sf_dir, rules)


# ----------------------------------------------------------- viability triple

_VIABILITY_SQL = (
    _CLIN_CTE
    + """
SELECT 'viability.ratio' AS rule_id, CAST(row_id AS VARCHAR) AS doc_id,
       'viability' AS column_name,
       printf('%g != round(100*%g/%g)', viability,
              CAST(live_cells AS DOUBLE), CAST(total_cells AS DOUBLE)) AS observed,
       'Error' AS severity
FROM clin
WHERE viability IS NOT NULL AND total_cells <> 0
  AND CAST(round(1000.0 * live_cells / total_cells) AS BIGINT)
        <> CAST(round(10 * viability) AS BIGINT)
UNION ALL
SELECT 'viability.na_when_zero', CAST(row_id AS VARCHAR), 'viability',
       printf('%g', viability), 'Warning'
FROM clin WHERE total_cells = 0 AND viability IS NOT NULL
UNION ALL
SELECT 'cells.total_ge_live', CAST(row_id AS VARCHAR), 'total_cells',
       CAST(total_cells AS VARCHAR), 'Error'
FROM clin WHERE NOT (total_cells >= live_cells)
"""
)


@query("clinical_viability_rules", _VIABILITY_SQL)
def clinical_viability_rules(sf_dir: str) -> pa.Table:
    """M15/M16: Total >= Live, the derived-ratio equality
    Viability == round(100*Live/Total, 1) (integer-tenths comparison on both
    engines), and the Total==0 ⇒ Viability-must-be-N/A Warning."""
    from seronet_data_validator_ray.rules.spec import RuleSet, RuleSpec

    rules = RuleSet(
        name="clinical_viability",
        key_column="row_id",
        rules=[
            RuleSpec(
                "viability.ratio", "viability", "ratio_eq",
                {"num": "live_cells", "den": "total_cells", "factor": 100.0, "ndigits": 1},
                message="viability must equal round(100*live/total, 1)",
            ),
            RuleSpec(
                "viability.na_when_zero", "viability", "null_required_when",
                {"when_col": "total_cells", "when_values": [0]},
                severity="Warning",
                message="Total Count is 0, Viability should be N/A",
            ),
            RuleSpec(
                "cells.total_ge_live", "total_cells", "col_cmp",
                {"other": "live_cells", "op": "ge"},
                message="Total Cell Count must be greater than Live Cell Count",
            ),
        ],
    )
    return _rule_violations(sf_dir, rules)


# ----------------------------------------------------------- status normalize

_STATUS_SQL = (
    _CLIN_CTE
    + """
SELECT row_id, status,
       CASE WHEN levenshtein(lower(status), 'completed')   <= 2 THEN 'Completed'
            WHEN levenshtein(lower(status), 'in progress') <= 2 THEN 'In Progress'
            WHEN levenshtein(lower(status), 'withdrawn')   <= 2 THEN 'Withdrawn'
            ELSE status END AS canonical
FROM clin
"""
)


@query("status_normalize", _STATUS_SQL)
def status_normalize(sf_dir: str) -> pa.Table:
    """M21 fuzzy normalization: levenshtein(lower) <= 2 against the canonical
    list, first match wins — distance computed once per distinct value."""
    import ray.data

    from seronet_data_validator_ray.functions.normalize import normalize_column_batch
    from seronet_data_validator_ray.util import ds_to_table

    d = ensure_clinical(sf_dir)
    from seronet_data_validator_ray.sources.parquet import read_fused

    ds = read_fused([os.path.join(d, "clinical.parquet")], columns=["row_id", "status"]).map_batches(
        lambda b: normalize_column_batch(b, "status", STATUS_CANON, 2),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return ds_to_table(ds).select(["row_id", "status", "canonical"])


# ----------------------------------------------------------- JSONL source

def ensure_jsonl_fixture(sf_dir: str) -> str:
    """Deterministic JSONL event export: nested payload struct + typed
    scalars, several files (the distributed axis)."""
    import json as _json

    d = os.path.join("/tmp/graft_jsonl", _tag(sf_dir))
    marker = os.path.join(d, "_OK")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    n = max(300, _rows_for(sf_dir) // 10)
    per_file = -(-n // 3)
    i = 0
    for f_i in range(3):
        lines = []
        for _ in range(per_file):
            if i >= n:
                break
            lines.append(
                _json.dumps(
                    {
                        "event_id": i,
                        "kind": ["click", "view", "buy"][i % 3],
                        "amount": round((i % 700) / 7.0, 2),
                        "meta": {"region": ["eu", "us", "ap"][i % 3 if i % 5 else 2], "retries": i % 4},
                    },
                    sort_keys=True,
                )
            )
            i += 1
        with open(os.path.join(d, f"events-{f_i}.jsonl"), "w") as fh:
            fh.write("\n".join(lines) + "\n")
    open(marker, "w").close()
    return d


_JSONL_SQL = """
SELECT kind, meta_region,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(amount * 100) AS BIGINT)) AS BIGINT) AS amount_cents,
       CAST(SUM(meta_retries) AS BIGINT) AS total_retries
FROM read_json_auto('{j}/events-*.jsonl')
CROSS JOIN LATERAL (SELECT meta.region AS meta_region, meta.retries AS meta_retries)
GROUP BY kind, meta_region
"""


@query("jsonl_events", _JSONL_SQL)
def jsonl_events(sf_dir: str) -> pa.Table:
    """JSONL source end-to-end: distributed read, struct flattening, exact
    integer aggregation per (kind, nested region)."""
    import pyarrow.compute as pc

    from seronet_data_validator_ray.sources.json_source import read_jsonl_typed
    from seronet_data_validator_ray.util import ds_to_table

    import glob as _glob

    d = ensure_jsonl_fixture(sf_dir)
    files = sorted(_glob.glob(os.path.join(d, "events-*.jsonl")))
    ds = read_jsonl_typed(files, flatten_structs=True)

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "kind": batch["kind"],
                "meta_region": batch["meta.region"],
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(pc.cast(batch["amount"], pa.float64()), 100.0),
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
                "retries": pc.cast(batch["meta.retries"], pa.int64()),
            }
        )
        g = t.group_by(["kind", "meta_region"]).aggregate(
            [("cents", "count"), ("cents", "sum"), ("retries", "sum")]
        )
        names = {"cents_count": "n", "cents_sum": "amount_cents", "retries_sum": "total_retries"}
        return g.rename_columns([names.get(c, c) for c in g.column_names])

    parts = ds_to_table(ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True))
    g = parts.group_by(["kind", "meta_region"]).aggregate(
        [("n", "sum"), ("amount_cents", "sum"), ("total_retries", "sum")]
    )
    names = {"n_sum": "n", "amount_cents_sum": "amount_cents", "total_retries_sum": "total_retries"}
    g = g.rename_columns([names.get(c, c) for c in g.column_names])
    return g.select(["kind", "meta_region", "n", "amount_cents", "total_retries"]).sort_by(
        [("kind", "ascending"), ("meta_region", "ascending")]
    )


# ----------------------------------------------------------- CSV cleanup (M4)

def ensure_csv_fixture(sf_dir: str) -> str:
    """Deterministic junk-laden CSV: blank rows, header-echo rows, an
    'Unnamed: 4' artifact column and en-dash values."""
    d = os.path.join(CSV_BASE, _tag(sf_dir))
    path = os.path.join(d, "data.csv")
    if os.path.exists(path):
        return d
    os.makedirs(d, exist_ok=True)
    n = max(200, _rows_for(sf_dir) // 10)
    lines = ["sample_id,visit,score,note,Unnamed: 4"]
    for i in range(n):
        if i % 17 == 5:
            lines.append(",,,,")  # all-empty row
        elif i % 23 == 7:
            v = f"echo_{i:05d}"
            lines.append(",".join([v] * 5))  # every cell equals column 0
        else:
            note = f"range {i}–{i + 3}" if i % 5 == 0 else f"plain note {i}"
            lines.append(f"samp_{i:05d},{i % 9},{(i % 40) / 4.0},{note},")
    with open(path + ".tmp", "w") as f:
        f.write("\n".join(lines) + "\n")
    os.replace(path + ".tmp", path)
    return d


_CSV_CLEAN_SQL = """
WITH raw AS (
  SELECT * FROM read_csv('{p}', header=true, all_varchar=true, nullstr='\\x01')
)
SELECT sample_id, CAST(NULLIF(visit, '') AS BIGINT) AS visit,
       CAST(NULLIF(score, '') AS DOUBLE) AS score,
       replace(note, '–', '-') AS note
FROM raw
WHERE NOT (coalesce(sample_id, '') = '' AND coalesce(visit, '') = ''
           AND coalesce(score, '') = '' AND coalesce(note, '') = ''
           AND coalesce("Unnamed: 4", '') = '')
  AND NOT (coalesce(visit = sample_id, FALSE) AND coalesce(score = sample_id, FALSE)
           AND coalesce(note = sample_id, FALSE)
           AND coalesce("Unnamed: 4" = sample_id, FALSE))
"""


@query("csv_cleanup", _CSV_CLEAN_SQL)
def csv_cleanup(sf_dir: str) -> pa.Table:
    """M4 cleanup_table + M2 dynamic typing in one pipeline: all-varchar
    distributed read -> vectorized cleanup (drop all-empty rows, drop
    column-0-echo rows, drop Unnamed*, en-dash normalize) -> global type
    decision -> cast. The oracle reproduces cleanup + typing in SQL over the
    same CSV."""
    from seronet_data_validator_ray.sources.csv_source import read_csv_typed
    from seronet_data_validator_ray.util import ds_to_table

    d = ensure_csv_fixture(sf_dir)
    ds = read_csv_typed(os.path.join(d, "data.csv"), force_str=("sample_id",), clean=True)
    return ds_to_table(ds).select(["sample_id", "visit", "score", "note"])


# ----------------------------------------------------------- PII redaction

_PII_SQL = """
WITH scanned AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{email}')) AS BIGINT) AS n_emails,
         CAST(len(regexp_extract_all(text, '{id}')) AS BIGINT) AS n_ids,
         regexp_replace(regexp_replace(text, '{email}', '<EMAIL>', 'g'),
                        '{id}', '<ID>', 'g') AS redacted
  FROM read_parquet('{p}')
)
SELECT doc_id, n_emails, n_ids, redacted FROM scanned
WHERE n_emails + n_ids > 0
"""


@query("pii_scrub", None)  # SQL attached below — template needs the regexes baked in
def pii_scrub(sf_dir: str) -> pa.Table:
    """PII detection + redaction over a planted-PII corpus (the scrubbing
    stage of an LLM data pipeline): vectorized RE2 count + replace per
    batch, identical patterns on the DuckDB side — value-level parity
    including the fully redacted text."""
    import pyarrow.compute as pc
    import ray.data

    from seronet_data_validator_ray.datagen import PII_EMAIL_RE, PII_ID_RE
    from seronet_data_validator_ray.util import ds_to_table

    from seronet_data_validator_ray.sources.parquet import read_fused

    d = ensure_pii_fixture(sf_dir)
    ds = read_fused([os.path.join(d, "pii_docs.parquet")])

    def scrub(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        n_emails = pc.count_substring_regex(text, PII_EMAIL_RE)
        n_ids = pc.count_substring_regex(text, PII_ID_RE)
        redacted = pc.replace_substring_regex(
            pc.replace_substring_regex(text, PII_EMAIL_RE, "<EMAIL>"), PII_ID_RE, "<ID>"
        )
        out = pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_emails": pc.cast(n_emails, pa.int64()),
                "n_ids": pc.cast(n_ids, pa.int64()),
                "redacted": redacted,
            }
        )
        keep = pc.greater(pc.add(out["n_emails"], out["n_ids"]), 0)
        return out.filter(keep)

    return ds_to_table(
        ds.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)
    ).sort_by([("doc_id", "ascending")])


def _attach_pii_sql():
    from seronet_data_validator_ray.datagen import PII_EMAIL_RE, PII_ID_RE

    fn, _ = REGISTRY["pii_scrub"]
    sql = _PII_SQL.replace("{email}", PII_EMAIL_RE).replace("{id}", PII_ID_RE)
    REGISTRY["pii_scrub"] = (fn, sql)


_attach_pii_sql()
