"""Vectorized rule kernels over zero-copy Arrow batches.

Each kernel maps the semantics of one reference check primitive
(SURVEY.md §2.2) onto ``pyarrow.compute`` / numpy — no Python loop ever runs
over rows. A kernel has signature::

    kernel(table: pa.Table, column: str, params: dict, ctx: dict)
        -> (fail_mask: np.ndarray[bool], observed)

``observed`` is ``None`` (report the rule column's value), a full-length
``pa.Array`` to take failing indices from, or a ``dict[int, str]`` of
precomputed per-row observed values (used by list kernels to report the
offending element). Null cells never *fail* a kernel other than ``not_null``
— missingness is its own rule (≙ get_missing_values,
/root/reference/File_Submission_Object.py:590-622), so a single bad cell is
reported exactly once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _col(table: pa.Table, name: str) -> pa.Array:
    col = table.column(name)
    if isinstance(col, pa.ChunkedArray):
        if col.num_chunks == 1:
            return col.chunk(0)  # zero-copy — combine_chunks would copy
        return col.combine_chunks()
    return col


def _to_bool(mask) -> np.ndarray:
    if isinstance(mask, (pa.Array, pa.ChunkedArray)):
        mask = pc.fill_null(mask, False)
        return np.asarray(mask.to_numpy(zero_copy_only=False), dtype=bool)
    return np.asarray(mask, dtype=bool)


def _resolve_values(params: dict, ctx: dict):
    if "ref" in params:
        return ctx[params["ref"]]
    return params["values"]


# ----------------------------------------------------------------- kernels

def k_not_null(table, column, params, ctx):
    """≙ get_missing_values: '' is the explicit missing token
    (/root/reference/File_Submission_Object.py:594-596); Arrow nulls too."""
    col = _col(table, column)
    null = pc.is_null(col)
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        empty = pc.equal(col, "")
        fail = pc.or_kleene(null, pc.fill_null(empty, False))
    else:
        fail = null
    return _to_bool(fail), None


def k_in_set(table, column, params, ctx):
    """≙ check_in_list (/root/reference/File_Submission_Object.py:369-385) and
    the broadcast-allowed-set anti-join check_assay_special (:289-300)."""
    col = _col(table, column)
    values = list(_resolve_values(params, ctx))
    ok = pc.is_in(col, value_set=pa.array(values, type=col.type))
    fail = pc.and_kleene(pc.invert(ok), pc.is_valid(col))
    if pa.types.is_string(col.type):
        fail = pc.and_kleene(fail, pc.invert(pc.fill_null(pc.equal(col, ""), False)))
    return _to_bool(fail), None


def k_regex(table, column, params, ctx):
    """≙ check_id_field regex shape check
    (/root/reference/File_Submission_Object.py:302-336)."""
    col = _col(table, column)
    ok = pc.match_substring_regex(col, params["pattern"])
    fail = pc.and_kleene(pc.invert(ok), pc.is_valid(col))
    fail = pc.and_kleene(fail, pc.invert(pc.fill_null(pc.equal(col, ""), False)))
    return _to_bool(fail), None


def k_id_format(table, column, params, ctx):
    """ID shape + prefix-vs-source consistency in one rule (≙ check_id_field's
    regex + CBC-prefix ownership, /root/reference/File_Submission_Object.py:302-336).

    params: pattern (anchored regex), prefix_of (column whose value must equal
    the id's prefix before ``sep``), sep (default "_")."""
    col = _col(table, column)
    sep = params.get("sep", "_")
    bad_shape = pc.invert(pc.match_substring_regex(col, params["pattern"]))
    fail = pc.fill_null(bad_shape, False)
    if params.get("prefix_of"):
        other = _col(table, params["prefix_of"])
        prefix = pc.list_element(pc.split_pattern(col, sep), 0)
        bad_prefix = pc.not_equal(prefix, other)
        fail = pc.or_kleene(fail, pc.fill_null(bad_prefix, False))
    fail = pc.and_kleene(fail, pc.is_valid(col))
    fail = pc.and_kleene(fail, pc.invert(pc.fill_null(pc.equal(col, ""), False)))
    return _to_bool(fail), None


def k_range(table, column, params, ctx):
    """≙ check_if_number bounds + integrality
    (/root/reference/File_Submission_Object.py:433-469)."""
    col = _col(table, column)
    lo, hi = params.get("lo"), params.get("hi")
    fail = pa.array(np.zeros(len(col), dtype=bool))
    if lo is not None:
        fail = pc.or_kleene(fail, pc.less(col, lo))
    if hi is not None:
        fail = pc.or_kleene(fail, pc.greater(col, hi))
    if params.get("integer") and pa.types.is_floating(col.type):
        fail = pc.or_kleene(fail, pc.not_equal(col, pc.floor(col)))
    return _to_bool(pc.fill_null(fail, False)), None


def flat_list_view(table, column, ctx):
    """(lengths:int32, flat:native-dtype) view of a list column, cached per
    batch in ``ctx["__flat_cache__"]`` so the token-range kernel and the stats
    histogrammer flatten the 17 MB values buffer ONCE per batch, not three
    times — this stage is memory-bandwidth-bound at 32 actors."""
    cache = ctx.get("__flat_cache__") if isinstance(ctx, dict) else None
    if cache is not None and column in cache:
        return cache[column]
    col = _col(table, column)
    if isinstance(col, pa.ListArray):
        # ZERO-copy: a ListArray's values ARE the flat buffer; offsets are
        # absolute into it even for sliced arrays, and a null row repeats
        # its offset (length 0) — same semantics as fill_null(len, 0)
        offs = col.offsets.to_numpy(zero_copy_only=False)
        vals = col.values.to_numpy(zero_copy_only=False)
        flat = vals[offs[0] : offs[-1]] if len(offs) else vals[:0]
        lengths = np.diff(offs)
    else:
        lengths = pc.fill_null(pc.list_value_length(col), 0).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    if cache is not None:
        cache[column] = (lengths, flat)
    return lengths, flat


def k_list_value_range(table, column, params, ctx):
    """All list elements must lie in [lo, hi) — the token-range check
    (≙ check_if_number applied element-wise, SURVEY.md M6). Reports the first
    offending element per row as the observed value."""
    col = _col(table, column)
    lengths, flat = flat_list_view(table, column, ctx)
    lengths = np.asarray(lengths, dtype=np.int64)
    lo, hi = params["lo"], params["hi"]
    bad = (flat < lo) | (flat >= hi)
    n = len(col)
    mask = np.zeros(n, dtype=bool)
    observed: dict[int, str] = {}
    if bad.any():
        parents = np.repeat(np.arange(n, dtype=np.int64), lengths)
        bad_idx = np.nonzero(bad)[0]
        rows, first = np.unique(parents[bad_idx], return_index=True)
        mask[rows] = True
        firsts = flat[bad_idx[first]]
        observed = {int(r): str(v) for r, v in zip(rows, firsts)}
    return mask, observed


def k_eq_len_of(table, column, params, ctx):
    """Declared length == actual container length — ``n_tok == len(tokens)``
    (≙ the cross-column arithmetic invariants compare_total_to_live /
    compare_viability, /root/reference/File_Submission_Object.py:519-552).

    params: of (list or string column), mode ("list" | "utf8")."""
    col = _col(table, column)
    of = _col(table, params["of"])
    if params.get("mode", "list") == "list":
        lengths, _flat = flat_list_view(table, params["of"], ctx)
        length = pa.array(lengths).cast(col.type)
    else:
        length = pc.cast(pc.utf8_length(of), col.type)
    # a null container column must NOT fail eq_len (flat_list_view reports a
    # null row as length 0): missingness is the not_null rule's job, and the
    # SQL oracle's `col <> len(of)` is NULL (no violation) for a null `of`
    fail = pc.and_kleene(pc.not_equal(col, length), pc.is_valid(of))
    mask = _to_bool(fail)
    # observed strings only for the failing rows — building them for the
    # whole column costs three full-width allocations per batch
    rows = np.nonzero(mask)[0]
    observed = {
        int(r): f"{col[int(r)].as_py()}!={length[int(r)].as_py()}" for r in rows
    }
    return mask, observed


def k_col_cmp(table, column, params, ctx):
    """Cross-column comparison (≙ compare_total_to_live ``Total >= Live``,
    /root/reference/File_Submission_Object.py:519-529).
    params: other, op in {ge, le, gt, lt, eq, ne}."""
    col = _col(table, column)
    other = _col(table, params["other"])
    op = {
        "ge": pc.greater_equal,
        "le": pc.less_equal,
        "gt": pc.greater,
        "lt": pc.less,
        "eq": pc.equal,
        "ne": pc.not_equal,
    }[params["op"]]
    fail = pc.invert(op(col, other))
    return _to_bool(pc.fill_null(fail, False)), None


def k_substr_of(table, column, params, ctx):
    """Hierarchical-ID nesting: value must be a substring of another column
    (≙ check_if_substr, /root/reference/File_Submission_Object.py:356-367).

    pc.match_substring takes only a scalar pattern, so per-row containment
    runs through numpy's fixed-width char kernels (one C pass; width = the
    batch's longest value — fine for ID-shaped columns). Null on either side
    never fails; an empty needle is always contained (find == 0)."""
    col = _col(table, column)
    other = _col(table, params["other"])
    a = pc.fill_null(col, "").to_numpy(zero_copy_only=False).astype(str)
    b = pc.fill_null(other, "").to_numpy(zero_copy_only=False).astype(str)
    found = np.char.find(b, a) >= 0
    valid = _to_bool(pc.and_kleene(pc.is_valid(col), pc.is_valid(other)))
    return valid & ~found, None


def k_contains_any(table, column, params, ctx):
    """Substring-containment against a list (≙ check_interpertation,
    /root/reference/File_Submission_Object.py:387-397)."""
    col = pc.utf8_lower(_col(table, column))
    ok = pa.array(np.zeros(len(col), dtype=bool))
    for v in _resolve_values(params, ctx):
        ok = pc.or_kleene(ok, pc.match_substring(col, str(v).lower()))
    fail = pc.and_kleene(pc.invert(ok), pc.is_valid(col))
    return _to_bool(fail), None


def k_str_len_range(table, column, params, ctx):
    """String length bounds (quality-check primitive)."""
    col = _col(table, column)
    length = pc.utf8_length(col)
    lo, hi = params.get("lo"), params.get("hi")
    fail = pa.array(np.zeros(len(col), dtype=bool))
    if lo is not None:
        fail = pc.or_kleene(fail, pc.less(length, lo))
    if hi is not None:
        fail = pc.or_kleene(fail, pc.greater(length, hi))
    return _to_bool(pc.fill_null(fail, False)), None


def k_forbidden_values(table, column, params, ctx):
    """Value must NOT be one of ``values`` (≙ compare_viability's
    'Total Count is 0 ⇒ Viability should be N/A' warning shape,
    /root/reference/File_Submission_Object.py:541-544 — typed columns encode
    N/A as null, so 'must be N/A' becomes 'forbidden concrete values')."""
    col = _col(table, column)
    values = list(_resolve_values(params, ctx))
    fail = pc.and_kleene(pc.is_in(col, value_set=pa.array(values, type=col.type)), pc.is_valid(col))
    return _to_bool(fail), None


def k_null_required_when(table, column, params, ctx):
    """Column must be N/A (null) when a sibling column holds a trigger value
    (≙ compare_viability's 'Total Count is 0, Viability_Count should be N/A'
    Warning, /root/reference/File_Submission_Object.py:541-544).
    params: when_col, when_values."""
    col = _col(table, column)
    when = _col(table, params["when_col"])
    trigger = pc.is_in(when, value_set=pa.array(list(params["when_values"]), type=when.type))
    fail = pc.and_kleene(pc.fill_null(trigger, False), pc.is_valid(col))
    return _to_bool(fail), None


def k_ratio_eq(table, column, params, ctx):
    """Derived-ratio consistency (≙ compare_viability,
    /root/reference/File_Submission_Object.py:531-552):
    ``col == round(factor * num / den, ndigits)`` with ``den == 0`` or any
    null operand never failing (the zero-den warning is its own
    forbidden-values rule). Compared in integer tenths on BOTH engines
    (round half-away-from-zero) so DuckDB round() parity holds exactly.

    params: num, den (column names), factor (default 100.0), ndigits (default 1)."""
    col = _col(table, column)
    num = _col(table, params["num"])
    den = _col(table, params["den"])
    factor = float(params.get("factor", 100.0))
    scale = 10.0 ** int(params.get("ndigits", 1))
    c = col.to_numpy(zero_copy_only=False).astype(np.float64)
    a = num.to_numpy(zero_copy_only=False).astype(np.float64)
    b = den.to_numpy(zero_copy_only=False).astype(np.float64)
    valid = (
        _to_bool(pc.is_valid(col)) & _to_bool(pc.is_valid(num)) & _to_bool(pc.is_valid(den))
    ) & (b != 0)
    bb = np.where(valid, b, 1.0)

    def _half_away(x):
        return np.sign(x) * np.floor(np.abs(x) + 0.5)

    want = _half_away(scale * factor * a / bb)
    got = _half_away(scale * np.where(valid, c, 0.0))
    mask = valid & (want != got)
    rows = np.nonzero(mask)[0]
    observed = {
        int(r): f"{c[int(r)]:g} != round({factor:g}*{a[int(r)]:g}/{b[int(r)]:g})" for r in rows
    }
    return mask, observed


def k_duration_future(table, column, params, ctx):
    """Duration lands in the future (≙ compare_dates_to_curr's unit-dispatched
    month/year/day arithmetic, /root/reference/File_Submission_Object.py:490-517,
    driven by the check_duration_rules bundle :471-488): with anchor year Y and
    reference date D —
      unit Month: value + 12*Y > 12*year(D) + month(D)
      unit Year:  value + Y > year(D)
      unit Day:   value > days between Jan 1 of Y and D
    'Week' rows are never checked — faithfully mirroring the reference, whose
    unit dispatch has no Week branch. Null value/year/unit rows never fail.

    params: unit_col, year_col, ref_date 'YYYY-MM-DD'.
    Observed: '<Unit>: <value>, Year: <year>' (≙ error_val, ref :512-515)."""
    col = _col(table, column)
    unit = _col(table, params["unit_col"])
    yr = _col(table, params["year_col"])
    ref = np.datetime64(params["ref_date"], "D")
    curr_year = int(str(ref)[:4])
    curr_month = int(str(ref)[5:7])
    v = col.to_numpy(zero_copy_only=False).astype(np.float64)
    y = yr.to_numpy(zero_copy_only=False).astype(np.float64)
    u = pc.utf8_lower(pc.fill_null(unit, "")).to_numpy(zero_copy_only=False)
    valid = (
        _to_bool(pc.is_valid(col)) & _to_bool(pc.is_valid(yr)) & _to_bool(pc.is_valid(unit))
    )
    valid &= ~np.isnan(v) & ~np.isnan(y) & (y >= 1) & (y <= 9999)
    yi = np.where(valid, y, 2000).astype(np.int64)
    # days from Jan 1 of the anchor year to the reference date, leap-exact
    jan1 = (yi - 1970).astype("timedelta64[Y]") + np.datetime64("1970", "Y")
    day_dur = (ref - jan1.astype("datetime64[D]")).astype(np.int64)
    vv = np.where(valid, v, 0.0)
    fail = valid & (
        ((u == "month") & (vv + 12 * yi > 12 * curr_year + curr_month))
        | ((u == "year") & (vv + yi > curr_year))
        | ((u == "day") & (vv > day_dur))
    )
    rows = np.nonzero(fail)[0]
    unit_raw = unit.to_numpy(zero_copy_only=False)
    observed = {
        int(r): f"{unit_raw[int(r)]}: {v[int(r)]:g}, Year: {int(y[int(r)])}" for r in rows
    }
    return fail, observed


def k_in_dictionary(table, column, params, ctx):
    """M14 ≙ the icd10 stateful lookup (check_icd10,
    /root/reference/File_Submission_Object.py:576-583): membership against a
    LARGE reference dictionary held in WORKER STATE. The ctx broadcast is
    ``ray.put`` once on the driver and resolved once per worker/actor
    (stages/evaluate.RuleEvaluator), so a multi-million-entry code table is
    never pickled into task closures or shipped per batch — the in_set
    kernel's small-enum path does not scale there.

    params: ``ref`` — ctx key whose value is a SORTED numpy array (sort at
    build time). Membership is one vectorized searchsorted per batch:
    O(log n) per value against an arbitrarily large dictionary, no per-call
    hash-set construction."""
    d = ctx[params["ref"]]
    col = _col(table, column)
    valid = _to_bool(pc.is_valid(col))
    if col.null_count:
        fill = params.get("null_fill", "" if pa.types.is_string(col.type) else 0)
        col = pc.fill_null(col, fill)
    vals = col.to_numpy(zero_copy_only=False)
    if len(d) == 0:
        return valid, None
    pos = np.minimum(np.searchsorted(d, vals), len(d) - 1)
    ok = d[pos] == vals
    return (~ok) & valid, None


KERNELS = {
    "not_null": k_not_null,
    "in_dictionary": k_in_dictionary,
    "in_set": k_in_set,
    "regex": k_regex,
    "id_format": k_id_format,
    "range": k_range,
    "list_value_range": k_list_value_range,
    "eq_len_of": k_eq_len_of,
    "col_cmp": k_col_cmp,
    "substr_of": k_substr_of,
    "contains_any": k_contains_any,
    "str_len_range": k_str_len_range,
    "forbidden_values": k_forbidden_values,
    "null_required_when": k_null_required_when,
    "ratio_eq": k_ratio_eq,
    "duration_future": k_duration_future,
}


def register_kernel(kind: str, fn) -> None:
    """User-extension hook (SURVEY §2.10): plug a custom rule kind into the
    fused evaluator. ``fn(table, column, params, ctx) -> (mask, observed)``
    where ``mask`` is a per-row bool violation array and ``observed`` is
    ``None``, a per-row Arrow string array, or a ``{row: str}`` dict.
    Must be vectorized — it runs per Arrow batch on every worker.

    Register at import time in the module that defines the rule set, so the
    registration replays inside each Ray worker when the rule module is
    deserialized (≙ new `elif` branches in the reference's per-sheet rule
    functions, /root/reference/Validation_Rules.py:129-513 — but as a plain
    Python entry point instead of a source edit).
    """
    if not callable(fn):
        raise TypeError(f"kernel for {kind!r} must be callable")
    KERNELS[kind] = fn


def evaluate_kernel(table: pa.Table, kind: str, column: str, params: dict, ctx: dict):
    try:
        kernel = KERNELS[kind]
    except KeyError:
        raise KeyError(
            f"no rule kernel registered for kind={kind!r}; "
            f"known kinds: {sorted(KERNELS)}; add one with register_kernel()"
        ) from None
    return kernel(table, column, params, ctx)
