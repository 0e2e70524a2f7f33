"""Deterministic synthetic generator for the `sequences` input table (FIXTURES.md).

Schema (BASELINE.json `input_hint`):
    doc_id: string    -- f"{source}_{i:08d}"  (prefixed-ID shape, cf. the reference's
                          ID regex checks /root/reference/File_Submission_Object.py:302-336)
    tokens: list<int32>  -- lengths ~ clipped lognormal mean≈512 in [1, 4096],
                            values uniform in [0, VOCAB)
    n_tok:  int32     -- len(tokens), except planted violations
    source: string    -- skewed categorical; "web" ≈ 60% (the hot key)

The bad variant plants the exact violation sets of FIXTURES.md §3 (disjoint row
sets, golden counts) — mirroring the reference's known-bad fixture submission
(/root/reference/conftest.py:17-30, test_bad_submission.py).

Generation is seeded and pure-numpy; one file per (source, chunk) so a file is
a *partition* (≙ one submission folder in the reference,
/root/reference/Data_Validation_v2.py:154).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 50257
SOURCES = ["web", "books", "code", "wiki", "forums"]
SOURCE_WEIGHTS = [0.60, 0.10, 0.10, 0.10, 0.10]
MAX_LEN = 4096
N_TOK_RANGE = (1, MAX_LEN)

SEQUENCES_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string(), nullable=True),
        pa.field("tokens", pa.list_(pa.int32()), nullable=True),
        pa.field("n_tok", pa.int32(), nullable=True),
        pa.field("source", pa.string(), nullable=True),
    ]
)

# FIXTURES.md §3 golden plant counts (sf-small)
PLANT = {
    "doc_id.not_null": 7,
    "doc_id.format": 11,
    "doc_id.unique_extra": 8,  # 5 ids ×2 (5 extra) + 1 id ×4 (3 extra) → 6 dup ids
    "source.referential": 13,
    "tokens.range": 9,
    "n_tok.range": 4,
    "n_tok.eq_len": 17,
}
EXPECTED_BAD_COUNTS = {
    "doc_id.not_null": 7,
    "doc_id.format": 11,
    "doc_id.unique": 6,
    "source.referential": 13,
    "tokens.range": 9,
    "n_tok.range": 4,
    "n_tok.eq_len": 17,
    "schema.conformance": 1,
}
BAD_SCHEMA_FILE_ROWS = 50


@dataclass
class GenResult:
    out_dir: str
    files: list[str] = field(default_factory=list)
    n_rows: int = 0


def _gen_core(n_rows: int, seed: int):
    rng = np.random.default_rng(seed)
    src_idx = rng.choice(len(SOURCES), size=n_rows, p=SOURCE_WEIGHTS)
    sigma = 0.6
    mu = np.log(512.0) - sigma * sigma / 2.0
    lengths = np.clip(rng.lognormal(mu, sigma, n_rows), 1, MAX_LEN).astype(np.int64)
    total = int(lengths.sum())
    values = rng.integers(0, VOCAB, size=total, dtype=np.int32)
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    sources = np.array(SOURCES)[src_idx]
    doc_ids = np.array([f"{s}_{i:08d}" for i, s in enumerate(sources)], dtype=object)
    return sources, doc_ids, lengths, offsets, values, rng


def _plant_bad(sources, doc_ids, lengths, offsets, values, rng):
    """Apply FIXTURES.md §3 corruptions in-place on disjoint row index sets."""
    n = len(sources)
    # plant row-level corruptions only on non-"forums" rows: "forums" is the
    # whole-source drift plant and the shift would clobber planted token values
    order = rng.permutation(np.nonzero(sources != "forums")[0])
    cursor = 0

    def take(k):
        nonlocal cursor
        rows = order[cursor : cursor + k]
        cursor += k
        return rows

    n_tok = lengths.astype(np.int32).copy()

    # doc_id.not_null: 4 empty + 3 None
    rows = take(PLANT["doc_id.not_null"])
    for j, r in enumerate(rows):
        doc_ids[r] = "" if j < 4 else None

    # doc_id.format: 6 no-underscore, 5 wrong prefix (still regex-valid)
    rows = take(PLANT["doc_id.format"])
    for j, r in enumerate(rows):
        if j < 6:
            doc_ids[r] = f"badid{r:08d}"
        else:
            wrong = SOURCES[(SOURCES.index(sources[r]) + 1) % len(SOURCES)]
            doc_ids[r] = f"{wrong}_{r:08d}"

    # doc_id.unique: overwrite 8 donor rows with ids of 6 victim rows
    donors = take(PLANT["doc_id.unique_extra"])
    victims = take(6)
    # 5 ids duplicated ×2
    for j in range(5):
        doc_ids[donors[j]] = doc_ids[victims[j]]
        sources[donors[j]] = sources[victims[j]]  # keep prefix consistent
    # 1 id duplicated ×4 (3 extra copies)
    for j in range(5, 8):
        doc_ids[donors[j]] = doc_ids[victims[5]]
        sources[donors[j]] = sources[victims[5]]

    # source.referential: unknown source, prefix kept consistent so only this fires
    rows = take(PLANT["source.referential"])
    for r in rows:
        sources[r] = "sp4m"
        doc_ids[r] = f"sp4m_{r:08d}"

    # tokens.range: first token out of range
    rows = take(PLANT["tokens.range"])
    for j, r in enumerate(rows):
        values[offsets[r]] = -1 if j < 5 else VOCAB + 5

    # n_tok.range: out-of-range declared length (also makes eq_len Not-Validated)
    rows = take(PLANT["n_tok.range"])
    for j, r in enumerate(rows):
        n_tok[r] = 0 if j < 2 else 1_000_000

    # n_tok.eq_len: declared ≠ actual, still in valid range
    rows = take(PLANT["n_tok.eq_len"])
    for j, r in enumerate(rows):
        delta = (j % 3) + 1
        cand = int(lengths[r]) + (delta if int(lengths[r]) + delta <= MAX_LEN else -delta)
        n_tok[r] = np.int32(max(1, cand))

    # drift.source: shift ALL of source "forums" token values to upper half of
    # vocab — vectorized over the flattened values (a per-row loop is O(rows))
    forums_mask = sources == "forums"
    lengths_arr = (offsets[1:] - offsets[:-1]).astype(np.int64)
    flat_mask = np.repeat(forums_mask, lengths_arr)
    half = VOCAB - VOCAB // 2
    values[flat_mask] = (VOCAB // 2 + (values[flat_mask].astype(np.int64) % half)).astype(
        np.int32
    )
    return n_tok


def _gather_tokens(rows, lengths, offsets, values) -> pa.ListArray:
    """Vectorized per-chunk gather of ragged rows → a fresh int32-offset
    ListArray. Avoids materializing one global ListArray, whose flat offsets
    overflow int32 past ~2^31 total tokens (>8M rows × ~512 tok)."""
    lens = lengths[rows]
    out_offsets = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(lens, out=out_offsets[1:])
    total = int(out_offsets[-1])
    # flat source index: position j of output row r maps to offsets[r] + (j - out_offsets[r])
    idx = (
        np.arange(total, dtype=np.int64)
        - np.repeat(out_offsets[:-1], lens)
        + np.repeat(offsets[rows], lens)
    )
    return pa.ListArray.from_arrays(
        pa.array(out_offsets, type=pa.int64()).cast(pa.int32()), pa.array(values[idx])
    )


def _write_partitions(out_dir, sources, doc_ids, lengths, offsets, values, n_tok, rows_per_file):
    os.makedirs(out_dir, exist_ok=True)
    files = []
    for src in sorted(set(sources.tolist())):
        rows = np.nonzero(sources == src)[0]
        for k in range(0, len(rows), rows_per_file):
            chunk = rows[k : k + rows_per_file]
            tbl = pa.table(
                {
                    "doc_id": pa.array(doc_ids[chunk].tolist(), type=pa.string()),
                    "tokens": _gather_tokens(chunk, lengths, offsets, values),
                    "n_tok": pa.array(n_tok[chunk], type=pa.int32()),
                    "source": pa.array(sources[chunk].tolist(), type=pa.string()),
                },
                schema=SEQUENCES_SCHEMA,
            )
            path = os.path.join(out_dir, f"part-{src}-{k // rows_per_file:04d}.parquet")
            pq.write_table(tbl, path, row_group_size=min(rows_per_file, 64 * 1024))
            files.append(path)
    return files


def generate_sequences(
    out_dir: str,
    n_rows: int = 10_000,
    seed: int = 42,
    bad: bool = False,
    rows_per_file: int | None = None,
) -> GenResult:
    """Generate the sequences table; idempotent (skips if marker matches)."""
    marker = os.path.join(out_dir, "_GEN_OK.json")
    params = {"n_rows": n_rows, "seed": seed, "bad": bad, "rows_per_file": rows_per_file, "v": 3}
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                st = json.load(f)
            if st.get("params") == params:
                return GenResult(out_dir, st["files"], n_rows)
        except Exception:
            pass
    sources, doc_ids, lengths, offsets, values, rng = _gen_core(n_rows, seed)
    if bad:
        n_tok = _plant_bad(sources, doc_ids, lengths, offsets, values, rng)
    else:
        n_tok = lengths.astype(np.int32)
    rpf = rows_per_file or max(2048, n_rows // 16)
    files = _write_partitions(out_dir, sources, doc_ids, lengths, offsets, values, n_tok, rpf)

    if bad:
        # schema-conformance plant: one file with n_tok:int64 and NO source column
        m = BAD_SCHEMA_FILE_ROWS
        rng2 = np.random.default_rng(seed + 1)
        lens = np.clip(rng2.lognormal(np.log(512.0), 0.6, m), 1, MAX_LEN).astype(np.int64)
        offs = np.zeros(m + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        vals = rng2.integers(0, VOCAB, size=int(lens.sum()), dtype=np.int32)
        tbl = pa.table(
            {
                "doc_id": pa.array([f"badschema_{i:08d}" for i in range(m)]),
                "tokens": pa.ListArray.from_arrays(pa.array(offs, type=pa.int64()), pa.array(vals)),
                "n_tok": pa.array(lens, type=pa.int64()),  # wrong physical type
            }
        )
        path = os.path.join(out_dir, "part-badschema-0000.parquet")
        pq.write_table(tbl, path)
        files.append(path)

    with open(marker + ".tmp", "w") as f:
        json.dump({"params": params, "files": files}, f)
    os.replace(marker + ".tmp", marker)
    return GenResult(out_dir, files, n_rows)


def compute_reference_histograms(clean_dir: str) -> dict:
    """Per-source reference histograms from a clean generation (drift baseline).

    Returns {source: {"token_hist": int64[64], "n_tok_hist": int64[32],
    "token_edges": float64[65], "n_tok_edges": float64[33]}} — the broadcast
    state for the drift actor pool (≙ the reference tables injected once per
    run, /root/reference/Data_Validation_v1.py:277-303).
    """
    from seronet_data_validator_ray.sketches import Histogram

    import glob

    out: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(clean_dir, "part-*.parquet"))):
        tbl = pq.read_table(path, columns=["tokens", "n_tok", "source"])
        if "source" not in tbl.column_names:
            continue
        src_arr = tbl["source"].to_numpy(zero_copy_only=False)
        flat = tbl["tokens"].combine_chunks()
        for src in np.unique(src_arr):
            if src not in out:
                th = Histogram.uniform(0, VOCAB, 64)
                nh = Histogram.log_spaced(1, MAX_LEN, 32)
                out[src] = {
                    "token_hist": th,
                    "n_tok_hist": nh,
                }
            mask = src_arr == src
            sub = flat.filter(pa.array(mask))
            vals = sub.flatten().to_numpy(zero_copy_only=False)
            out[src]["token_hist"].add_array(vals)
            out[src]["n_tok_hist"].add_array(
                tbl["n_tok"].to_numpy(zero_copy_only=False)[mask]
            )
    return {
        s: {
            "token_hist": d["token_hist"].counts,
            "token_edges": d["token_hist"].edges,
            "n_tok_hist": d["n_tok_hist"].counts,
            "n_tok_edges": d["n_tok_hist"].edges,
        }
        for s, d in out.items()
    }


# --------------------------------------------------------------------- clinical

CURR_DATE = "2024-06-15"  # the reference's "current date", pinned for determinism
DURATION_UNITS = ["Day", "Week", "Month", "Year"]
STATUS_CANON = ["Completed", "In Progress", "Withdrawn"]

CLINICAL_SCHEMA = pa.schema(
    [
        pa.field("row_id", pa.int64()),
        pa.field("subject_id", pa.string()),
        pa.field("visit_year", pa.int32()),
        pa.field("duration_value", pa.float64()),
        pa.field("duration_unit", pa.string()),
        pa.field("total_cells", pa.int64()),
        pa.field("live_cells", pa.int64()),
        pa.field("viability", pa.float64()),
        pa.field("status", pa.string()),
    ]
)


def generate_clinical(out_dir: str, n_rows: int = 2000, seed: int = 77) -> str:
    """Deterministic `clinical` table mirroring the reference's prior_clinical
    sheets (duration bundle ≙ check_duration_rules / compare_dates_to_curr,
    /root/reference/File_Submission_Object.py:471-517; viability triple ≙
    compare_total_to_live / compare_viability, :519-552; status typos ≙
    check_for_typo, /root/reference/Data_Validation_v2.py:563-591).

    Planted violations (fractions of n_rows, disjoint corruption styles):
    future durations, out-of-range values/years, invalid units, unit/value
    N/A inconsistency, live>total, wrong viability, viability not N/A at
    total==0, and typo'd statuses. Rounding ties (exact .05) are perturbed
    away so numpy and DuckDB round() agree on every row by construction.
    """
    marker = os.path.join(out_dir, "_GEN_OK.json")
    params = {"n_rows": n_rows, "seed": seed, "v": 1}
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                if json.load(f).get("params") == params:
                    return out_dir
        except Exception:
            pass
    rng = np.random.default_rng(seed)
    n = n_rows
    row_id = np.arange(n, dtype=np.int64)
    subject = np.array([f"sub_{i % (n // 4 + 1):06d}" for i in range(n)], dtype=object)

    year = rng.integers(1980, 2024, size=n).astype(np.float64)
    dur = rng.integers(0, 36, size=n).astype(np.float64)
    unit = rng.choice(DURATION_UNITS, size=n, p=[0.25, 0.1, 0.4, 0.25]).astype(object)

    # plant on disjoint row sets
    order = rng.permutation(n)
    cur = 0

    def take(k):
        nonlocal cur
        r = order[cur : cur + k]
        cur += k
        return r

    k = max(5, n // 50)
    r_future = take(k)  # duration pushes past CURR_DATE
    for j, r in enumerate(r_future):
        u = DURATION_UNITS[[0, 2, 3][j % 3]]  # Day/Month/Year (Week never checked)
        unit[r] = u
        year[r] = 2023
        dur[r] = {"Day": 2000, "Month": 30, "Year": 5}[u]
    r_val_range = take(max(3, n // 100))  # negative / absurd duration values
    dur[r_val_range] = np.where(np.arange(len(r_val_range)) % 2 == 0, -3.0, 200000.0)
    r_bad_unit = take(max(3, n // 100))
    unit[r_bad_unit] = "Fortnight"
    r_year_range = take(max(3, n // 100))  # year out of [1900, curr]
    year[r_year_range] = np.where(np.arange(len(r_year_range)) % 2 == 0, 1850.0, 2031.0)
    r_na_val = take(max(3, n // 100))  # value N/A but unit present -> dependency NV
    dur[r_na_val] = np.nan
    r_na_unit = take(max(3, n // 100))  # unit N/A but value present
    unit[r_na_unit] = None

    total = rng.integers(1, 500, size=n).astype(np.int64)
    r_zero_total = take(max(4, n // 60))
    total[r_zero_total] = 0
    live = np.minimum((total * rng.uniform(0.3, 1.0, size=n)).astype(np.int64), total)
    # avoid exact-.5 tenth-of-percent rounding ties: 2000*live == total*(odd)
    with np.errstate(divide="ignore", invalid="ignore"):
        tie = (total > 0) & ((2000 * live) % np.maximum(total, 1) == 0) & (
            ((2000 * live) // np.maximum(total, 1)) % 2 == 1
        )
    live = np.where(tie & (live < total), live + 1, np.where(tie, live - 1, live))
    live = np.clip(live, 0, np.maximum(total, 0))
    with np.errstate(divide="ignore", invalid="ignore"):
        via_exact = np.floor(np.where(total > 0, 1000.0 * live / np.maximum(total, 1), 0) + 0.5) / 10.0
    viability = np.where(total > 0, via_exact, np.nan)
    r_live_gt = take(max(4, n // 60))  # live > total
    total_pos = np.maximum(total[r_live_gt], 1)
    total[r_live_gt] = total_pos
    live[r_live_gt] = total_pos + 1 + (np.arange(len(r_live_gt)) % 3)
    r_bad_via = take(max(4, n // 60))  # declared viability off by >= 0.5
    mask_pos = total[r_bad_via] > 0
    viability[r_bad_via] = np.where(mask_pos, np.clip(via_exact[r_bad_via] - 7.5, 0, None), viability[r_bad_via])
    r_via_at_zero = take(max(3, n // 100))  # total==0 but viability not N/A
    total[r_via_at_zero] = 0
    live[r_via_at_zero] = 0
    viability[r_via_at_zero] = 55.5

    status = rng.choice(STATUS_CANON, size=n).astype(object)
    typos = ["Comppleted", "completd", "In  Progress", "inprogress", "Withdrawnn", "widthdrawn"]
    r_typo = take(max(6, n // 40))
    for j, r in enumerate(r_typo):
        status[r] = typos[j % len(typos)]

    dur_arr = pa.array([None if np.isnan(v) else float(v) for v in dur], type=pa.float64())
    via_arr = pa.array([None if np.isnan(v) else float(v) for v in viability], type=pa.float64())
    tbl = pa.table(
        {
            "row_id": pa.array(row_id),
            "subject_id": pa.array(subject, type=pa.string()),
            "visit_year": pa.array(year.astype(np.int32), type=pa.int32()),
            "duration_value": dur_arr,
            "duration_unit": pa.array(unit, type=pa.string()),
            "total_cells": pa.array(total),
            "live_cells": pa.array(live),
            "viability": via_arr,
            "status": pa.array(status, type=pa.string()),
        },
        schema=CLINICAL_SCHEMA,
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tbl, os.path.join(out_dir, "clinical.parquet"))
    with open(marker + ".tmp", "w") as f:
        json.dump({"params": params}, f)
    os.replace(marker + ".tmp", marker)
    return out_dir


# planted-PII regexes — shared by the Ray redactor and the DuckDB oracle
# (both RE2); brace quantifiers avoided so SQL templates can .format() them
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
PII_ID_RE = "[0-9][0-9][0-9]-[0-9][0-9]-[0-9][0-9][0-9][0-9]"


def generate_pii(out_dir: str, n_rows: int = 2000, seed: int = 91) -> str:
    """Deterministic document table with PLANTED PII spans — the redaction
    fixture (BASELINE.json instruction: no external data). ~40% of docs
    carry 1-3 email addresses and ~25% carry 1-2 SSN-shaped ids embedded in
    word soup; the rest are clean. Locals/domains are word-based so an email
    can never accidentally contain the id shape."""
    marker = os.path.join(out_dir, "_GEN_OK.json")
    params = {"n_rows": n_rows, "seed": seed, "v": 1}
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                if json.load(f).get("params") == params:
                    return out_dir
        except Exception:
            pass
    rng = np.random.default_rng(seed)
    vocab = [
        "alpha", "beta", "gamma", "delta", "metric", "report", "contact",
        "please", "send", "invoice", "meeting", "note", "draft", "review",
        "project", "update", "status", "client", "signed", "copy",
    ]
    domains = ["example.com", "mail.test.org", "corp.example.net"]
    texts, ids = [], []
    for i in range(n_rows):
        words = list(rng.choice(vocab, size=int(rng.integers(12, 40))))
        r = rng.random()
        if r < 0.40:
            for _ in range(int(rng.integers(1, 4))):
                local = f"{rng.choice(vocab)}.{rng.choice(vocab)}{int(rng.integers(1, 99))}"
                email = f"{local}@{rng.choice(domains)}"
                words.insert(int(rng.integers(0, len(words) + 1)), email)
        if 0.35 <= r < 0.60:
            for _ in range(int(rng.integers(1, 3))):
                ssn = f"{rng.integers(100, 999)}-{rng.integers(10, 99)}-{rng.integers(1000, 9999)}"
                words.insert(int(rng.integers(0, len(words) + 1)), ssn)
        texts.append(" ".join(words))
        ids.append(i)
    tbl = pa.table(
        {
            "doc_id": pa.array(np.asarray(ids, dtype=np.int64), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tbl, os.path.join(out_dir, "pii_docs.parquet"))
    with open(marker + ".tmp", "w") as f:
        json.dump({"params": params}, f)
    os.replace(marker + ".tmp", marker)
    return out_dir
