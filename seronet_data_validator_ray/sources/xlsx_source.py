"""XLSX submission ingestion (SURVEY §2.1 S1 / "what's missing" #5).

≙ the reference reading every sheet of an .xlsx submission into a dict of
DataFrames (`pd.read_excel(..., sheet_name=None, na_filter=False)`,
/root/reference/File_Submission_Object.py:79-81) and the reference-table
loads of get_assay_data_from_box.py:8-49.

This container has no openpyxl, and an XLSX file is only a zip of XML — so
the reader is a small stdlib (zipfile + ElementTree) parser that produces
the same all-strings contract as the CSV path (na_filter=False analog:
every cell arrives as a string, blanks are ''), then reuses the SAME
vectorized cleanup + dynamic-typing stages as ``read_csv_typed``. If
openpyxl IS present it is preferred (import-try), covering styled files the
minimal parser does not.

Scale note: one submission workbook is small (≤14 sheets in the reference);
the distributed axis is MANY workbooks — ``read_xlsx_dir`` fans file
parsing out as Ray tasks and returns one Dataset per sheet name.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree

import pyarrow as pa

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PKG_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _col_index(ref: str) -> int:
    """'BC12' -> 0-based column index (54)."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return n - 1


def _cell_text(cell, shared: list[str]) -> str:
    t = cell.get("t", "n")
    if t == "s":
        v = cell.find(f"{_NS}v")
        return shared[int(v.text)] if v is not None and v.text is not None else ""
    if t == "inlineStr":
        return "".join(tnode.text or "" for tnode in cell.iter(f"{_NS}t"))
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return ""
    if t == "n" or t == "str":
        txt = v.text
        # integers serialized as '5' stay '5'; trim float artifacts like '5.0'
        if t == "n" and re.fullmatch(r"-?\d+\.0", txt):
            txt = txt[:-2]
        return txt
    if t == "b":
        return "TRUE" if v.text == "1" else "FALSE"
    return v.text


def parse_xlsx(path: str) -> dict[str, pa.Table]:
    """Parse every sheet into an all-string Arrow table (first row = header,
    missing cells = ''). Pure stdlib; see module docstring."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ElementTree.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        wb = ElementTree.fromstring(z.read("xl/workbook.xml"))
        rels = ElementTree.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        target_of = {
            rel.get("Id"): rel.get("Target").lstrip("/")
            for rel in rels.iter(f"{_PKG_REL_NS}Relationship")
        }
        out: dict[str, pa.Table] = {}
        for sheet in wb.iter(f"{_NS}sheet"):
            name = sheet.get("name")
            target = target_of[sheet.get(f"{_REL_NS}id")]
            if not target.startswith("xl/"):
                target = "xl/" + target
            root = ElementTree.fromstring(z.read(target))
            rows: list[dict[int, str]] = []
            max_col = -1
            for row in root.iter(f"{_NS}row"):
                cells: dict[int, str] = {}
                auto = 0
                for cell in row.iter(f"{_NS}c"):
                    ref = cell.get("r")
                    ci = _col_index(ref) if ref else auto
                    auto = ci + 1
                    cells[ci] = _cell_text(cell, shared)
                    max_col = max(max_col, ci)
                rows.append(cells)
            if not rows or max_col < 0:
                out[name] = pa.table({})
                continue
            header = [rows[0].get(c, f"Unnamed: {c}") or f"Unnamed: {c}" for c in range(max_col + 1)]
            # disambiguate duplicate headers pandas-style (value, value.1, ...)
            seen: dict[str, int] = {}
            uniq_header = []
            for h in header:
                k = seen.get(h, 0)
                seen[h] = k + 1
                uniq_header.append(h if k == 0 else f"{h}.{k}")
            header = uniq_header
            cols: dict[str, list[str]] = {h: [] for h in header}
            for r in rows[1:]:
                for c, h in enumerate(header):
                    cols[h].append(r.get(c, ""))
            out[name] = pa.table({h: pa.array(v, type=pa.string()) for h, v in cols.items()})
    return out


def _parse_any(path: str) -> dict[str, pa.Table]:
    try:  # prefer openpyxl when the environment has it (styled/odd files)
        import openpyxl  # noqa: F401
        import pandas as pd

        sheets = pd.read_excel(path, sheet_name=None, na_filter=False, dtype=str)
        return {
            name: pa.table(
                {str(c): pa.array(df[c].astype(str).tolist(), type=pa.string()) for c in df.columns}
            )
            for name, df in sheets.items()
        }
    except ImportError:
        return parse_xlsx(path)


def read_xlsx_typed(path: str, sheet: str, force_str: tuple[str, ...] = (), clean: bool = True):
    """One sheet -> typed, cleaned Ray Dataset (same contract as
    read_csv_typed: all-varchar ingest, vectorized cleanup, global dynamic
    typing)."""
    import ray.data

    from seronet_data_validator_ray.sources.csv_source import (
        cast_batch,
        cleanup_batch,
        decide_types,
        type_verdict_batch,
    )

    tbl = _parse_any(path)[sheet]
    ds = ray.data.from_arrow(tbl)
    if clean:
        ds = ds.map_batches(cleanup_batch, batch_format="pyarrow", zero_copy_batch=True)
    from seronet_data_validator_ray.util import ds_to_table

    verdicts = ds_to_table(
        ds.map_batches(type_verdict_batch, batch_format="pyarrow", zero_copy_batch=True)
    )
    decided = decide_types(verdicts, force_str=force_str)
    return ds.map_batches(
        cast_batch, fn_kwargs={"decided": decided}, batch_format="pyarrow", zero_copy_batch=True
    )


def read_xlsx_dir(paths: list[str], sheet: str, force_str: tuple[str, ...] = (), clean: bool = True):
    """Many workbooks -> ONE all-string Dataset for a sheet name (file
    parsing fans out as Ray tasks; provenance column = file basename), ready
    for the cleanup/typing stages or validate()."""
    import os

    import ray.data

    def parse_one(row: dict) -> list[dict]:
        tbl = _parse_any(row["path"]).get(sheet)
        if tbl is None or tbl.num_rows == 0:
            return []
        out = tbl.to_pylist()
        base = os.path.basename(row["path"])
        for r in out:
            r["partition"] = base
        return out

    return ray.data.from_items([{"path": p} for p in paths]).flat_map(parse_one)


def submission_from_workbook(
    path: str,
    rulesets: dict,
    scratch_dir: str,
    force_str: dict | None = None,
) -> dict:
    """One multi-sheet .xlsx workbook -> TableSpecs for validate_submission —
    the reference's primary entry shape (a submission IS a workbook;
    File_Submission_Object.py:79-81 reads every sheet, Data_Validation_v2
    validates each then cross-checks). Each sheet named in `rulesets` is
    parsed, cleaned and dynamically typed via the shared CSV machinery, then
    landed as parquet under <scratch_dir>/<sheet>/ so the full lifecycle
    (manifest resume, per-partition violations, cross-sheet checks) applies
    unchanged. Missing sheets raise a named error (pair with
    state.backfill.backfill_missing_tables to synthesize them instead)."""
    import os

    import pyarrow.parquet as pq

    from seronet_data_validator_ray.pipelines.submission import TableSpec
    from seronet_data_validator_ray.util import ds_to_table

    force_str = force_str or {}
    available = _parse_any(path)
    out = {}
    for sheet, ruleset in rulesets.items():
        if sheet not in available:
            raise KeyError(
                f"workbook {path!r} has no sheet {sheet!r} "
                f"(has: {sorted(available)}); backfill or fix the submission"
            )
        ds = read_xlsx_typed(path, sheet, force_str=tuple(force_str.get(sheet, ())))
        tbl = ds_to_table(ds)
        tdir = os.path.join(scratch_dir, sheet)
        os.makedirs(tdir, exist_ok=True)
        fpath = os.path.join(tdir, f"part-{sheet}-0000.parquet")
        pq.write_table(tbl, fpath + ".tmp")
        os.replace(fpath + ".tmp", fpath)
        out[sheet] = TableSpec(input_path=tdir, ruleset=ruleset)
    return out
