"""CSV ingestion with the reference's dynamic-typing semantics.

The reference reads every sheet with ``pd.read_csv(..., na_filter=False)`` —
all cells arrive as raw strings and ``convert_data_type`` retypes per cell:
float first, then date, else string, with underscore-containing values pinned
to string (/root/reference/File_Submission_Object.py:22-34, 74-90) and a
forced-string column list (/root/reference/File_Submission_Object.py:208-220).

Ray-Data-first equivalent: ``ray.data.read_csv`` with all-varchar parse
options (the distributed analog of na_filter=False), then ONE vectorized
``map_batches`` coercion stage per batch:

- a column is cast to int64 / float64 / timestamp only if EVERY non-empty
  cell parses (column-level typing like pandas, not per-cell object mixing —
  per-cell dynamic typing cannot exist in Arrow and the reference only ever
  consumes whole typed columns);
- underscore rule and ``force_str`` columns stay utf8;
- empty string stays empty string (na_filter=False contract), so a column
  with blanks can still type: blanks become nulls only in typed columns.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.csv as pacsv

_DATE_RE = r"^\d{4}-\d{2}-\d{2}$"
_INT_RE = r"^[+-]?\d+$"
_FLOAT_RE = r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"


def _all_match(col, pattern: str, nonempty) -> bool:
    m = pc.match_substring_regex(col, pattern)
    ok = pc.or_(pc.invert(nonempty), pc.fill_null(m, False))
    res = pc.all(ok).as_py()
    # all() over an EMPTY block is null — an empty block carries no typing
    # evidence and must stay vacuously true, not poison the global AND
    return True if res is None else bool(res)


def type_verdict_batch(batch: pa.Table) -> pa.Table:
    """Per-batch PARTIAL typing evidence per column: (all_int, all_float,
    all_date, any_underscore, any_nonempty). AND/OR-mergeable, so the global
    column type is decided once from tiny partials — a per-batch decision
    would let blank-only blocks type differently and split the schema."""
    names, ai, af, ad, us, ne = [], [], [], [], [], []
    for name in batch.column_names:
        col = batch[name]
        if not pa.types.is_string(col.type):
            continue
        nonempty = pc.and_(pc.is_valid(col), pc.not_equal(col, ""))
        names.append(name)
        ai.append(_all_match(col, _INT_RE, nonempty))
        af.append(_all_match(col, _FLOAT_RE, nonempty))
        ad.append(_all_match(col, _DATE_RE, nonempty))
        us.append(bool(pc.any(pc.and_kleene(nonempty, pc.match_substring(col, "_"))).as_py()))
        ne.append(bool(pc.any(nonempty).as_py()))
    return pa.table(
        {
            "column": pa.array(names, type=pa.string()),
            "all_int": pa.array(ai),
            "all_float": pa.array(af),
            "all_date": pa.array(ad),
            "any_underscore": pa.array(us),
            "any_nonempty": pa.array(ne),
        }
    )


def decide_types(verdicts: pa.Table, force_str: tuple[str, ...] = ()) -> dict[str, pa.DataType]:
    """Merge partial verdicts -> one target type per column."""
    import collections

    acc: dict[str, dict] = collections.defaultdict(
        lambda: {"all_int": True, "all_float": True, "all_date": True,
                 "any_underscore": False, "any_nonempty": False}
    )
    for row in verdicts.to_pylist():
        a = acc[row["column"]]
        a["all_int"] &= row["all_int"]
        a["all_float"] &= row["all_float"]
        a["all_date"] &= row["all_date"]
        a["any_underscore"] |= row["any_underscore"]
        a["any_nonempty"] |= row["any_nonempty"]
    out: dict[str, pa.DataType] = {}
    for name, a in acc.items():
        if name in force_str or a["any_underscore"] or not a["any_nonempty"]:
            out[name] = pa.string()
        elif a["all_int"]:
            out[name] = pa.int64()
        elif a["all_float"]:
            out[name] = pa.float64()
        elif a["all_date"]:
            out[name] = pa.timestamp("us")
        else:
            out[name] = pa.string()
    return out


def cast_batch(batch: pa.Table, decided: dict[str, pa.DataType]) -> pa.Table:
    out = {}
    for name in batch.column_names:
        col = batch[name]
        target = decided.get(name)
        if target is None or target == col.type or not pa.types.is_string(col.type):
            out[name] = col
            continue
        nonempty = pc.and_(pc.is_valid(col), pc.not_equal(col, ""))
        nulled = pc.if_else(nonempty, col, pa.scalar(None, type=pa.string()))
        if pa.types.is_timestamp(target):
            out[name] = pc.strptime(nulled, format="%Y-%m-%d", unit="us")
        else:
            out[name] = pc.cast(nulled, target)
    return pa.table(out)


_UNIT_SUFFIX_RE = __import__("re").compile(r" \((?:cells/mL|mL|Years|Days|min|hrs)\)")


def clean_column_name(name: str) -> str:
    """≙ clean_up_column_names (/root/reference/File_Submission_Object.py:9-19):
    strip unit-suffix parentheticals, degree marks, normalize '-80' freezer
    labels and dashes to underscores."""
    name = _UNIT_SUFFIX_RE.sub("", name)
    name = name.replace("°C", "").replace("-80", "80").replace("-", "_")
    return name.strip()


def clean_column_names_batch(batch: pa.Table) -> pa.Table:
    """Header-sanitizing rename stage (SURVEY §2.2 M1) — per-batch metadata
    work only, no data movement."""
    return batch.rename_columns([clean_column_name(c) for c in batch.column_names])


def cleanup_batch(batch: pa.Table) -> pa.Table:
    """≙ cleanup_table (/root/reference/File_Submission_Object.py:125-138),
    vectorized over the all-string batch:

    1. drop rows where EVERY cell is null/empty (the dropna(how='all') of a
       na_filter=False read, where blanks are '' not NaN),
    2. drop rows where every cell equals the row's column-0 value (the
       reference's header-echo artifact check, evaluated BEFORE col drops),
    3. drop 'Unnamed*' columns (Excel export artifacts),
    4. normalize en-dash '–' to '-' in every string cell
       (also ≙ the unit-string normalization habit of Validation_Rules.py:10).
    """
    if batch.num_rows == 0 or not batch.column_names:
        return batch.select(
            [c for c in batch.column_names if not c.startswith("Unnamed")]
        )
    col0 = batch[batch.column_names[0]]
    all_empty = None
    all_eq = None
    for name in batch.column_names:
        col = batch[name]
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            empty = pc.or_kleene(pc.is_null(col), pc.fill_null(pc.equal(col, ""), False))
        else:
            empty = pc.is_null(col)
        empty = pc.fill_null(empty, True)
        eq0 = pc.fill_null(pc.equal(col, col0), False)
        all_empty = empty if all_empty is None else pc.and_(all_empty, empty)
        all_eq = eq0 if all_eq is None else pc.and_(all_eq, eq0)
    keep = pc.invert(pc.or_(all_empty, all_eq))
    out = batch.filter(keep).select(
        [c for c in batch.column_names if not c.startswith("Unnamed")]
    )
    cols = {}
    for name in out.column_names:
        col = out[name]
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            col = pc.replace_substring(col, "–", "-")
        cols[name] = col
    return pa.table(cols)


def _peek_columns(path: str) -> list[str]:
    """Column names from the first CSV block (streaming open, no full read)."""
    with pacsv.open_csv(path) as reader:
        return reader.schema.names


def read_csv_typed(paths, force_str: tuple[str, ...] = (), concurrency=None, clean: bool = False):
    """All-varchar distributed CSV read + vectorized typing stage.

    ``clean=True`` applies :func:`cleanup_batch` (≙ the reference's
    cleanup_table) BEFORE typing — matching the reference's clean-then-type
    order, so junk rows cannot poison a column's type decision.

    Returns a lazy Dataset; the typing stage is a plain map_batches so it
    fuses with downstream transforms.
    """
    import glob
    import os

    import ray.data

    if isinstance(paths, str) and os.path.isdir(paths):
        found = sorted(glob.glob(os.path.join(paths, "*.csv")))
        if not found:
            raise FileNotFoundError(f"no *.csv files in directory: {paths}")
        first = found[0]
    elif isinstance(paths, str):
        first = paths
    else:
        first = paths[0]
    all_str = {name: pa.string() for name in _peek_columns(first)}
    ds = ray.data.read_csv(
        paths,
        # na_filter=False analog: everything is a string, nothing becomes NaN
        convert_options=pacsv.ConvertOptions(
            column_types=all_str,
            strings_can_be_null=False,
            auto_dict_encode=False,
        ),
        read_options=pacsv.ReadOptions(use_threads=False),
        parse_options=pacsv.ParseOptions(newlines_in_values=False),
    )
    if clean:
        ds = ds.map_batches(cleanup_batch, batch_format="pyarrow", zero_copy_batch=True)

    # pass 1: tiny per-batch typing partials -> one global decision
    from seronet_data_validator_ray.util import ds_to_table

    verdicts = ds_to_table(
        ds.map_batches(type_verdict_batch, batch_format="pyarrow", zero_copy_batch=True)
    )
    decided = decide_types(verdicts, force_str=force_str)

    # pass 2: cast with the fixed decision (re-reads the CSV; the read is the
    # cheap part and the decision table is bytes)
    return ds.map_batches(
        cast_batch,
        fn_kwargs={"decided": decided},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
