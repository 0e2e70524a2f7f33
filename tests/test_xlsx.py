"""XLSX ingestion: a workbook is crafted in-test with stdlib zipfile (shared
strings, inline strings, numeric cells, a junk row, an Unnamed column, an
en-dash) and must round-trip through parse -> cleanup -> dynamic typing with
the same semantics as the CSV path."""

import zipfile

import pyarrow as pa


def _write_xlsx(path, sheets: dict[str, list[list]]):
    """Minimal writer: shared strings for str cells, inline numbers."""
    shared: list[str] = []
    sindex: dict[str, int] = {}

    def cell_xml(ref, v):
        if isinstance(v, (int, float)):
            return f'<c r="{ref}" t="n"><v>{v}</v></c>'
        if v is None or v == "":
            return f'<c r="{ref}"/>'
        if v not in sindex:
            sindex[v] = len(shared)
            shared.append(v)
        return f'<c r="{ref}" t="s"><v>{sindex[v]}</v></c>'

    def colref(i):
        s = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            s = chr(ord("A") + r) + s
        return s

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
    sheet_xmls = {}
    for si, (name, rows) in enumerate(sheets.items(), 1):
        body = []
        for ri, row in enumerate(rows, 1):
            cells = "".join(cell_xml(f"{colref(ci)}{ri}", v) for ci, v in enumerate(row))
            body.append(f'<row r="{ri}">{cells}</row>')
        sheet_xmls[f"xl/worksheets/sheet{si}.xml"] = (
            f'<?xml version="1.0"?><worksheet {ns}><sheetData>{"".join(body)}</sheetData></worksheet>'
        )
    wb_sheets = "".join(
        f'<sheet name="{name}" sheetId="{i}" r:id="rId{i}"/>'
        for i, name in enumerate(sheets, 1)
    )
    rels = "".join(
        f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i}.xml"/>'
        for i in range(1, len(sheets) + 1)
    )
    sst = "".join(f"<si><t>{s}</t></si>" for s in shared)
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("xl/workbook.xml", f'<?xml version="1.0"?><workbook {ns} {rns}><sheets>{wb_sheets}</sheets></workbook>')
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            f'<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">{rels}</Relationships>',
        )
        z.writestr("xl/sharedStrings.xml", f'<?xml version="1.0"?><sst {ns}>{sst}</sst>')
        for p, xml in sheet_xmls.items():
            z.writestr(p, xml)


def test_xlsx_parse_and_type(ray_session, tmp_path):
    from seronet_data_validator_ray.sources.xlsx_source import parse_xlsx, read_xlsx_typed
    from seronet_data_validator_ray.util import ds_to_table

    path = str(tmp_path / "sub.xlsx")
    _write_xlsx(
        path,
        {
            "samples": [
                ["sample_id", "visit", "score", "note", "Unnamed: 4"],
                ["s_001", 1, 2.5, "ok–fine", ""],
                ["", "", "", "", ""],  # all-empty row -> dropped by cleanup
                ["echo", "echo", "echo", "echo", "echo"],  # col-0 echo -> dropped
                ["s_002", 7, 0.25, "plain", ""],
            ],
            "meta": [["k", "v"], ["owner", "lab–3"]],
        },
    )
    raw = parse_xlsx(path)
    assert set(raw) == {"samples", "meta"}
    assert raw["samples"].num_rows == 4  # header consumed, junk still present
    assert raw["samples"].column_names[:4] == ["sample_id", "visit", "score", "note"]

    typed = ds_to_table(read_xlsx_typed(path, "samples", force_str=("sample_id",)))
    assert typed.column_names == ["sample_id", "visit", "score", "note"]  # Unnamed dropped
    assert typed.num_rows == 2  # junk rows dropped
    assert typed["visit"].type == pa.int64()
    assert typed["score"].type == pa.float64()
    assert typed["note"].to_pylist() == ["ok-fine", "plain"]  # en-dash normalized
    assert typed["sample_id"].type == pa.string()

    meta = ds_to_table(read_xlsx_typed(path, "meta"))
    assert meta.to_pylist() == [{"k": "owner", "v": "lab-3"}]


def test_xlsx_dir_fanout(ray_session, tmp_path):
    from seronet_data_validator_ray.sources.xlsx_source import read_xlsx_dir

    paths = []
    for i in range(3):
        p = str(tmp_path / f"wb{i}.xlsx")
        _write_xlsx(p, {"samples": [["id", "n"], [f"a{i}", i], [f"b{i}", i * 10]]})
        paths.append(p)
    ds = read_xlsx_dir(paths, "samples")
    rows = ds.take_all()
    assert len(rows) == 6
    assert {r["partition"] for r in rows} == {"wb0.xlsx", "wb1.xlsx", "wb2.xlsx"}


def test_xlsx_duplicate_headers(tmp_path):
    """Duplicate header names must disambiguate pandas-style, not crash."""
    from seronet_data_validator_ray.sources.xlsx_source import parse_xlsx

    path = str(tmp_path / "dup.xlsx")
    _write_xlsx(path, {"s": [["id", "value", "value"], ["a", 1, 2], ["b", 3, 4]]})
    t = parse_xlsx(path)["s"]
    assert t.column_names == ["id", "value", "value.1"]
    assert t["value"].to_pylist() == ["1", "3"]
    assert t["value.1"].to_pylist() == ["2", "4"]


def test_submission_from_workbook_end_to_end(ray_session, tmp_path):
    """A two-sheet workbook -> TableSpecs -> validate_submission: per-sheet
    row rules AND the cross-sheet key check fire exactly on the planted
    errors (the reference's primary entry shape, workbook-in/verdicts-out)."""
    import pyarrow.compute as pc

    from seronet_data_validator_ray.pipelines.submission import (
        CrossKeyCheck,
        validate_submission,
    )
    from seronet_data_validator_ray.rules.spec import RuleSet, RuleSpec
    from seronet_data_validator_ray.sources.xlsx_source import submission_from_workbook

    path = str(tmp_path / "submission.xlsx")
    _write_xlsx(
        path,
        {
            "orders": [
                ["order_id", "status"],
                ["1", "O"], ["2", "F"], ["3", "X"], ["9", "O"],  # X bad; 9 has no lines
            ],
            "lines": [
                ["order_id", "qty"],
                ["1", "5"], ["1", "7"], ["2", "900"], ["4", "2"],  # 900 bad; 4 orphan
            ],
        },
    )
    rulesets = {
        "orders": RuleSet(
            name="orders", key_column="order_id",
            rules=[RuleSpec("status.enum", "status", "in_set",
                            {"values": ["O", "F", "P"]}, message="bad status")],
        ),
        "lines": RuleSet(
            name="lines", key_column="order_id",
            rules=[RuleSpec("qty.range", "qty", "range", {"lo": 1, "hi": 100},
                            message="qty out of range")],
        ),
    }
    tables = submission_from_workbook(path, rulesets, str(tmp_path / "scratch"))
    res = validate_submission(
        tables,
        [CrossKeyCheck("cross.order_id", "orders", "order_id", "lines", "order_id")],
    )
    v = res.violations
    by_rule = {}
    for rid in v["rule_id"].to_pylist():
        by_rule[rid] = by_rule.get(rid, 0) + 1
    # left_only: orders 3 (bad status AND no lines) and 9; right_only: line 4
    assert by_rule == {"status.enum": 1, "qty.range": 1, "cross.order_id": 3}
    cross = v.filter(pc.equal(v["rule_id"], "cross.order_id"))
    assert sorted(cross["doc_id"].to_pylist()) == ["3", "4", "9"]
    # missing-sheet contract is a named error
    import pytest

    with pytest.raises(KeyError, match="no sheet"):
        submission_from_workbook(path, {"nope": rulesets["orders"]}, str(tmp_path / "s2"))


def test_cli_workbook_smoke(tmp_path):
    """python -m seronet_data_validator_ray workbook: declarative JSON rules
    + cross-key flag -> one JSON verdict line + submission_summary.md
    (subprocess owns its own Ray)."""
    import json
    import subprocess
    import sys

    wb = str(tmp_path / "sub.xlsx")
    _write_xlsx(
        wb,
        {
            "orders": [["order_id", "status"], ["1", "O"], ["2", "X"]],
            "lines": [["order_id", "qty"], ["1", "5"], ["2", "7"]],
        },
    )
    rules = {
        "orders": {
            "name": "orders", "key_column": "order_id",
            "rules": [{"rule_id": "status.enum", "column": "status",
                       "kind": "in_set", "params": {"values": ["O", "F", "P"]},
                       "message": "bad status"}],
        },
        "lines": {
            "name": "lines", "key_column": "order_id",
            "rules": [{"rule_id": "qty.range", "column": "qty",
                       "kind": "range", "params": {"lo": 1, "hi": 100}}],
        },
    }
    rpath = str(tmp_path / "rules.json")
    with open(rpath, "w") as f:
        json.dump(rules, f)
    out = str(tmp_path / "out")
    proc = subprocess.run(
        [sys.executable, "-m", "seronet_data_validator_ray", "workbook",
         "--input", wb, "--rules", rpath, "--output", out,
         "--cross-key", "orders:order_id=lines:order_id", "--cpus", "4"],
        capture_output=True, text=True, timeout=280, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["pass"] is False            # planted bad status
    assert summary["tables"]["lines"] is True  # clean sheet passes
    assert summary["n_violations"] == 1
    md = open(summary["report"]["md"]).read()
    assert "status.enum" in md and "__cross__" in md
