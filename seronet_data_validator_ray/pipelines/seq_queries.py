"""Oracle-paired queries over the north-rule `sequences` table.

The driver's test data has no pre-tokenized sequences table, so these queries
deterministically synthesize one (seed=42, FIXTURES.md schema, planted
violations) under /tmp, scaled to the requested sf dir, and the oracle SQL
reads the SAME parquet via DuckDB ``read_parquet`` — full value-level parity
for the flagship validation semantics (row rules incl. dependency gating,
duplicate IDs, per-source verdicts/stats/histograms).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from seronet_data_validator_ray.datagen import (
    MAX_LEN,
    SEQUENCES_SCHEMA,
    SOURCES,
    VOCAB,
    generate_sequences,
)

SEQ_BASE = "/tmp/graft_seq"
REGISTRY: dict[str, tuple] = {}  # name -> (fn(sf_dir) -> table, sql | None)

_VALIDATE_CACHE: dict[str, object] = {}


def query(name: str, sql_template: str | None = None):
    def deco(fn):
        REGISTRY[name] = (fn, sql_template)
        return fn

    return deco


def seq_rows_for(sf_dir: str) -> int:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    sf = float(m.group(1)) if m else 0.001
    return max(10_000, int(2_000_000 * sf))


def seq_dir_for(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf0.001"
    return os.path.join(SEQ_BASE, f"{tag}-bad")


def ensure_seq(sf_dir: str) -> str:
    d = seq_dir_for(sf_dir)
    generate_sequences(d, n_rows=seq_rows_for(sf_dir), seed=42, bad=True)
    return d


def clean_dir_for(sf_dir: str) -> str:
    return seq_dir_for(sf_dir).replace("-bad", "-clean")


def ensure_clean(sf_dir: str) -> str:
    """Clean generation at the same scale/seed — the drift reference corpus
    (same files entry() feeds to compute_reference_histograms)."""
    d = clean_dir_for(sf_dir)
    generate_sequences(d, n_rows=seq_rows_for(sf_dir), seed=42, bad=False)
    return d


_CTE = """
WITH seq AS (
  SELECT doc_id, tokens, CAST(n_tok AS BIGINT) AS n_tok, source
  FROM read_parquet('{d}/part-*.parquet', union_by_name=true, filename=true)
  WHERE filename NOT LIKE '%badschema%'
)
"""


def _validated(sf_dir: str):
    from seronet_data_validator_ray.pipelines.validate import validate
    from seronet_data_validator_ray.rules.builtin import sequences_rules

    d = ensure_seq(sf_dir)
    if d not in _VALIDATE_CACHE:
        _VALIDATE_CACHE[d] = validate(
            d,
            sequences_rules(),
            expected_schema=SEQUENCES_SCHEMA,
            broadcast={"allowed_sources": SOURCES},
            # exact-violation-list contract (DuckDB oracle compares rows)
            violation_row_cap=None,
        )
    return _VALIDATE_CACHE[d]


# ----------------------------------------------------------------- violations

_ROW_RULES = [
    "doc_id.not_null",
    "doc_id.format",
    "source.not_null",
    "source.referential",
    "tokens.range",
    "n_tok.range",
    "n_tok.eq_len",
]

_SEQ_VIOLATIONS_SQL = (
    _CTE
    + f"""
SELECT 'doc_id.not_null' AS rule_id, doc_id, 'doc_id' AS column_name,
       doc_id AS observed, 'Error' AS severity
FROM seq WHERE doc_id IS NULL OR doc_id = ''
UNION ALL
SELECT 'doc_id.format', doc_id, 'doc_id', doc_id, 'Error' FROM seq
WHERE doc_id IS NOT NULL AND doc_id <> ''
  AND (NOT regexp_matches(doc_id, '^[a-z0-9]+_[0-9]+$')
       OR string_split(doc_id, '_')[1] <> source)
UNION ALL
SELECT 'source.not_null', doc_id, 'source', source, 'Error'
FROM seq WHERE source IS NULL OR source = ''
UNION ALL
SELECT 'source.referential', doc_id, 'source', source, 'Error' FROM seq
WHERE source IS NOT NULL AND source <> ''
  AND source NOT IN ({','.join("'" + s + "'" for s in SOURCES)})
UNION ALL
SELECT 'tokens.range', doc_id, 'tokens',
       CAST(list_filter(tokens, x -> x < 0 OR x >= {VOCAB})[1] AS VARCHAR), 'Error'
FROM seq WHERE len(list_filter(tokens, x -> x < 0 OR x >= {VOCAB})) > 0
UNION ALL
SELECT 'n_tok.range', doc_id, 'n_tok', CAST(n_tok AS VARCHAR), 'Error'
FROM seq WHERE n_tok < 1 OR n_tok > {MAX_LEN}
UNION ALL
SELECT 'n_tok.eq_len', doc_id, 'n_tok',
       CAST(n_tok AS VARCHAR) || '!=' || CAST(len(tokens) AS VARCHAR), 'Error'
FROM seq WHERE n_tok BETWEEN 1 AND {MAX_LEN} AND n_tok <> len(tokens)
UNION ALL
SELECT 'n_tok.eq_len', doc_id, 'n_tok', CAST(n_tok AS VARCHAR), 'Not Validated'
FROM seq WHERE n_tok < 1 OR n_tok > {MAX_LEN}
"""
)


@query("seq_violations", _SEQ_VIOLATIONS_SQL)
def seq_violations(sf_dir: str) -> pa.Table:
    res = _validated(sf_dir)
    v = res.violations
    v = v.filter(pc.is_in(v["rule_id"], pa.array(_ROW_RULES)))
    return v.select(["rule_id", "doc_id", "column", "observed", "severity"]).rename_columns(
        ["rule_id", "doc_id", "column_name", "observed", "severity"]
    )


# ----------------------------------------------------------------- duplicate ids

@query(
    "seq_dup_ids",
    _CTE
    + """
SELECT doc_id, count(*) AS multiplicity FROM seq
WHERE doc_id IS NOT NULL AND doc_id <> ''
GROUP BY doc_id HAVING count(*) > 1
""",
)
def seq_dup_ids(sf_dir: str) -> pa.Table:
    res = _validated(sf_dir)
    v = res.violations
    dups = v.filter(pc.equal(v["rule_id"], "doc_id.unique"))
    return pa.table(
        {
            "doc_id": dups["doc_id"],
            "multiplicity": pc.cast(dups["observed"], pa.int64()),
        }
    )


# ----------------------------------------------------------------- per-source verdicts

_BAD_ROW_SQL = f"""(
  (doc_id IS NULL OR doc_id = '')
  OR (doc_id IS NOT NULL AND doc_id <> ''
      AND (NOT regexp_matches(doc_id, '^[a-z0-9]+_[0-9]+$')
           OR string_split(doc_id, '_')[1] <> source))
  OR (source IS NULL OR source = '')
  OR (source IS NOT NULL AND source <> ''
      AND source NOT IN ({','.join("'" + s + "'" for s in SOURCES)}))
  OR (len(list_filter(tokens, x -> x < 0 OR x >= {VOCAB})) > 0)
  OR (n_tok < 1 OR n_tok > {MAX_LEN})
  OR (n_tok BETWEEN 1 AND {MAX_LEN} AND n_tok <> len(tokens))
)"""


@query(
    "seq_verdict_by_source",
    _CTE
    + f"""
SELECT source, count(*) AS n_rows,
       CAST(SUM(CASE WHEN {_BAD_ROW_SQL} THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_rows
FROM seq GROUP BY source
""",
)
def seq_verdict_by_source(sf_dir: str) -> pa.Table:
    from seronet_data_validator_ray.rules.builtin import sequences_rules
    from seronet_data_validator_ray.rules.kernels import evaluate_kernel
    from seronet_data_validator_ray.sources.parquet import plan_read, read_with_provenance

    d = ensure_seq(sf_dir)
    ctx = {"allowed_sources": SOURCES}
    rules = [r for r in sequences_rules().row_local()]

    def prep(batch: pa.Table) -> pa.Table:
        # per-batch evaluation sharing the flat-tokens cache via ctx
        bctx = dict(ctx)
        bctx["__flat_cache__"] = {}
        bad = np.zeros(len(batch), dtype=bool)
        for spec in rules:
            mask, _ = evaluate_kernel(batch, spec.kind, spec.column, spec.params, bctx)
            if spec.dependency is not None:
                dk, dc, dp = spec.dependency
                dep_fail, _ = evaluate_kernel(batch, dk, dc, dp, bctx)
                mask = mask & ~dep_fail
            bad |= mask
        # COMBINER: one partial row per source per batch (pre-aggregation
        # before the merge — never ship a row per input row)
        src = np.asarray(batch["source"].to_numpy(zero_copy_only=False), dtype=object)
        src = np.where([s is None for s in src], "", src)
        uniq, gidx = np.unique(src, return_inverse=True)
        n_rows = np.bincount(gidx, minlength=len(uniq))
        n_bad = np.bincount(gidx, weights=bad.astype(np.float64), minlength=len(uniq))
        return pa.table(
            {
                "source": pa.array([str(s) for s in uniq], type=pa.string()),
                "n_rows": pa.array(n_rows, type=pa.int64()),
                "n_bad_rows": pa.array(n_bad.astype(np.int64), type=pa.int64()),
            }
        )

    plan = plan_read(d, SEQUENCES_SCHEMA)
    ds = read_with_provenance(
        plan.work_items(), columns=["doc_id", "tokens", "n_tok", "source"], yield_rows=8192
    )
    partials = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    from seronet_data_validator_ray.util import ds_to_table

    tbl = ds_to_table(partials)
    g = tbl.group_by("source").aggregate([("n_rows", "sum"), ("n_bad_rows", "sum")])
    return g.rename_columns(["source", "n_rows", "n_bad_rows"]).select(
        ["source", "n_rows", "n_bad_rows"]
    )


# ----------------------------------------------------------------- per-source stats

@query(
    "seq_stats_by_source",
    _CTE
    + """
SELECT source, count(*) AS n_rows, CAST(SUM(n_tok) AS BIGINT) AS sum_n_tok,
       min(n_tok) AS min_n_tok, max(n_tok) AS max_n_tok,
       count(DISTINCT doc_id) AS n_ids
FROM seq GROUP BY source
""",
)
def seq_stats_by_source(sf_dir: str) -> pa.Table:
    """Per-source stats with per-batch COMBINERS: one partial row per
    (source, batch) for the associative stats, plus within-batch-unique
    (source, hash64(doc_id)) pairs for the exact distinct — the exact analog
    of the HLL sketch the engine uses for the same stat at true scale, where
    the distinct-pair merge would run through the bucketed exchange of
    stages/uniqueness.py instead of a driver-side np.unique."""
    from seronet_data_validator_ray.sketches import hash64
    from seronet_data_validator_ray.sources.parquet import plan_read, read_with_provenance
    from seronet_data_validator_ray.util import ds_to_table

    d = ensure_seq(sf_dir)
    plan = plan_read(d, SEQUENCES_SCHEMA)

    def partials(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch["source"].to_numpy(zero_copy_only=False), dtype=object)
        n_tok = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, gidx = np.unique(src, return_inverse=True)
        n_rows = np.bincount(gidx, minlength=len(uniq))
        sums = np.bincount(gidx, weights=n_tok.astype(np.float64), minlength=len(uniq))
        mins = np.full(len(uniq), np.iinfo(np.int64).max)
        maxs = np.full(len(uniq), np.iinfo(np.int64).min)
        np.minimum.at(mins, gidx, n_tok)
        np.maximum.at(maxs, gidx, n_tok)
        # distinct ids, hash-compacted and deduped within the batch
        valid = pc.is_valid(batch["doc_id"]).to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].filter(pa.array(valid))
        h = hash64(ids)
        gi = gidx[valid]
        pair = np.unique(np.stack([gi.astype(np.uint64), h]), axis=1)
        stats = pa.table(
            {
                "kind": pa.array(["s"] * len(uniq), type=pa.string()),
                "source": pa.array([str(s) for s in uniq], type=pa.string()),
                "n_rows": pa.array(n_rows, type=pa.int64()),
                "sum_n_tok": pa.array(sums.astype(np.int64), type=pa.int64()),
                "min_n_tok": pa.array(mins, type=pa.int64()),
                "max_n_tok": pa.array(maxs, type=pa.int64()),
                "h": pa.array(np.zeros(len(uniq), dtype=np.uint64), type=pa.uint64()),
            }
        )
        idrows = pa.table(
            {
                "kind": pa.array(["i"] * pair.shape[1], type=pa.string()),
                "source": pa.array([str(uniq[int(g)]) for g in pair[0]], type=pa.string()),
                "n_rows": pa.array(np.zeros(pair.shape[1], dtype=np.int64)),
                "sum_n_tok": pa.array(np.zeros(pair.shape[1], dtype=np.int64)),
                "min_n_tok": pa.array(np.zeros(pair.shape[1], dtype=np.int64)),
                "max_n_tok": pa.array(np.zeros(pair.shape[1], dtype=np.int64)),
                "h": pa.array(pair[1], type=pa.uint64()),
            }
        )
        return pa.concat_tables([stats, idrows])

    ds = read_with_provenance(
        plan.work_items(), columns=["doc_id", "n_tok", "source"], yield_rows=65536
    ).map_batches(partials, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    tbl = ds_to_table(ds)
    s = tbl.filter(pc.equal(tbl["kind"], "s"))
    g = s.group_by("source").aggregate(
        [("n_rows", "sum"), ("sum_n_tok", "sum"), ("min_n_tok", "min"), ("max_n_tok", "max")]
    ).rename_columns(["source", "n_rows", "sum_n_tok", "min_n_tok", "max_n_tok"])
    i = tbl.filter(pc.equal(tbl["kind"], "i"))
    iu = i.select(["source", "h"]).group_by(["source", "h"]).aggregate([])
    n_ids = iu.group_by("source").aggregate([("h", "count")]).rename_columns(
        ["source", "n_ids"]
    )
    return g.join(n_ids, keys="source").select(
        ["source", "n_rows", "sum_n_tok", "min_n_tok", "max_n_tok", "n_ids"]
    )


# ----------------------------------------------------------------- token histogram

_NBINS = 64

@query(
    "seq_token_hist",
    _CTE
    + f"""
SELECT source,
       CAST(least(greatest(floor(x * {_NBINS}.0 / {VOCAB}.0), 0), {_NBINS - 1}) AS BIGINT) AS bin,
       count(*) AS n
FROM (SELECT source, unnest(tokens) AS x FROM seq)
GROUP BY 1, 2
""",
)
def seq_token_hist(sf_dir: str) -> pa.Table:
    from seronet_data_validator_ray.sources.parquet import plan_read, read_with_provenance

    d = ensure_seq(sf_dir)
    plan = plan_read(d, SEQUENCES_SCHEMA)

    def partial_hist(batch: pa.Table) -> pa.Table:
        from seronet_data_validator_ray.rules.kernels import flat_list_view

        # zero-copy int32 flatten + integer binning (identical to the SQL
        # floor(x*64/50257): exact because 64x/VOCAB never lands within f64
        # rounding error of an integer for 0 < x < VOCAB)
        lengths, flat = flat_list_view(batch, "tokens", {})
        bins = flat.astype(np.int32, copy=True)
        np.multiply(bins, np.int32(_NBINS), out=bins)
        np.floor_divide(bins, np.int32(VOCAB), out=bins)
        np.clip(bins, 0, _NBINS - 1, out=bins)
        src = batch.column("source").to_numpy(zero_copy_only=False)
        uniq, gidx = np.unique(np.asarray(src, dtype=object), return_inverse=True)
        if len(uniq) == 1:
            combo = np.bincount(bins, minlength=_NBINS)[None, :]
        else:
            parent = np.repeat(gidx, lengths)
            combo = np.bincount(parent * _NBINS + bins, minlength=len(uniq) * _NBINS).reshape(
                len(uniq), _NBINS
            )
        rows_src, rows_bin, rows_n = [], [], []
        for k, s in enumerate(uniq):
            nz = np.nonzero(combo[k])[0]
            rows_src += [str(s)] * len(nz)
            rows_bin += nz.tolist()
            rows_n += combo[k][nz].tolist()
        return pa.table(
            {
                "source": pa.array(rows_src, type=pa.string()),
                "bin": pa.array(rows_bin, type=pa.int64()),
                "n": pa.array(rows_n, type=pa.int64()),
            }
        )

    # plain task-based read (no provenance needed for a histogram; the
    # provenance reader's actor pool costs ~1-2 s per call — same change as
    # _tagged_hist_partials); plan_read still gates schema-mismatch files
    import ray.data

    from seronet_data_validator_ray.sources.parquet import read_fused

    ds = read_fused(plan.files, columns=["tokens", "source"]).map_batches(
        partial_hist,
        batch_format="pyarrow",
        zero_copy_batch=True,
        # the kernel allocates flat-sized temporaries (bins, parent); ~8k
        # rows ≈ 4M tokens keeps them cache-resident instead of paying
        # first-touch pages for 0.5 GB per whole-file fused block
        batch_size=8192,
    )
    # partials are <= n_sources * 64 rows per block: merge with one
    # driver-side Arrow group_by (Ray's distributed aggregate has a fixed
    # machinery cost that dwarfs this tiny payload — see BASELINE.md)
    from seronet_data_validator_ray.util import ds_to_table

    partials = ds_to_table(ds)
    g = partials.group_by(["source", "bin"]).aggregate([("n", "sum")])
    return g.rename_columns(["source", "bin", "n"]).select(["source", "bin", "n"])


# ----------------------------------------------------------------- source remix

MIX_WEIGHTS = {"web": 2, "books": 8, "code": 8, "wiki": 8, "forums": 8}  # keep i%10 < w

_MIX_CASE = "CASE source " + " ".join(
    f"WHEN '{s}' THEN {w}" for s, w in MIX_WEIGHTS.items()
) + " ELSE 0 END"

_SEQ_MIX_SQL = (
    _CTE
    + f"""
SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
       CAST(SUM(n_tok) AS BIGINT) AS kept_tokens
FROM seq
WHERE doc_id IS NOT NULL AND regexp_matches(doc_id, '^[a-z0-9]+_[0-9]+$')
  AND CAST(string_split(doc_id, '_')[2] AS BIGINT) % 10 < ({_MIX_CASE})
GROUP BY source
"""
)


@query("seq_source_mix", _SEQ_MIX_SQL)
def seq_source_mix(sf_dir: str) -> pa.Table:
    """Deterministic corpus remixing (domain reweighting — the data-mixing
    step of a training pipeline): keep each doc iff its id residue falls
    under the source's weight, downsampling the hot 'web' source 4x while
    keeping the cold sources at 80%. Pure streaming filter + per-batch
    combiner; the keep decision is a pure function of the row, so the mix
    is reproducible shard-by-shard (and the oracle replays it in SQL)."""
    from seronet_data_validator_ray.sources.parquet import plan_read, read_with_provenance
    from seronet_data_validator_ray.util import ds_to_table

    d = ensure_seq(sf_dir)
    plan = plan_read(d, SEQUENCES_SCHEMA)

    def mix(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        ok = pc.match_substring_regex(pc.fill_null(ids, ""), r"^[a-z0-9]+_[0-9]+$")
        b = batch.filter(pc.fill_null(ok, False))
        if b.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], type=pa.string()),
                    "n_kept": pa.array([], type=pa.int64()),
                    "kept_tokens": pa.array([], type=pa.int64()),
                }
            )
        suffix = pc.cast(pc.list_element(pc.split_pattern(b["doc_id"], "_"), 1), pa.int64())
        residue = pc.cast(suffix, pa.int64()).to_numpy(zero_copy_only=False) % 10
        src = np.asarray(b["source"].to_numpy(zero_copy_only=False), dtype=object)
        weights = np.array([MIX_WEIGHTS.get(s, 0) for s in src], dtype=np.int64)
        keep = residue < weights
        kept = b.filter(pa.array(keep))
        s2 = np.asarray(kept["source"].to_numpy(zero_copy_only=False), dtype=object)
        ntok = kept["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, gidx = np.unique(s2, return_inverse=True)
        return pa.table(
            {
                "source": pa.array([str(s) for s in uniq], type=pa.string()),
                "n_kept": pa.array(np.bincount(gidx, minlength=len(uniq)), type=pa.int64()),
                "kept_tokens": pa.array(
                    np.bincount(gidx, weights=ntok.astype(np.float64), minlength=len(uniq)).astype(
                        np.int64
                    ),
                    type=pa.int64(),
                ),
            }
        )

    ds = read_with_provenance(
        plan.work_items(), columns=["doc_id", "n_tok", "source"], yield_rows=8192
    ).map_batches(mix, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    tbl = ds_to_table(ds)
    g = tbl.group_by("source").aggregate([("n_kept", "sum"), ("kept_tokens", "sum")])
    g = g.rename_columns(
        [{"n_kept_sum": "n_kept", "kept_tokens_sum": "kept_tokens"}.get(c, c) for c in g.column_names]
    )
    return g.select(["source", "n_kept", "kept_tokens"]).sort_by([("source", "ascending")])


def format_sql(name: str, sf_dir: str) -> str | None:
    fn, sql = REGISTRY[name]
    if sql is None:
        return None
    if "{c}" in sql:
        ensure_clean(sf_dir)  # the oracle reads the clean reference files too
    return sql.format(d=seq_dir_for(sf_dir), c=clean_dir_for(sf_dir))


# ----------------------------------------------------------------- clean-split sink

@query(
    "seq_split_clean",
    _CTE
    + f"""
SELECT source, CAST(SUM(CASE WHEN NOT {_BAD_ROW_SQL} THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
FROM seq GROUP BY source
HAVING SUM(CASE WHEN NOT {_BAD_ROW_SQL} THEN 1 ELSE 0 END) > 0
""",
)
def seq_split_clean(sf_dir: str) -> pa.Table:
    """Quarantine split + resumable sink (K1/K4 family): stream the table
    once, drop every row failing a row-local rule, and ``write_parquet`` the
    clean rows PARTITIONED BY source (one directory per partition — a failed
    run can skip finished partitions). The returned per-source counts come
    from the WRITTEN files' footers, so the oracle match verifies the sink,
    not just the filter."""
    import glob as _glob
    import shutil

    import pyarrow.parquet as _pq

    from seronet_data_validator_ray.rules.builtin import sequences_rules
    from seronet_data_validator_ray.rules.kernels import evaluate_kernel
    from seronet_data_validator_ray.sources.parquet import plan_read, read_with_provenance

    d = ensure_seq(sf_dir)
    out_dir = d + "-cleanout"
    shutil.rmtree(out_dir, ignore_errors=True)
    ctx = {"allowed_sources": SOURCES}
    rules = sequences_rules().row_local()

    def keep_clean(batch: pa.Table) -> pa.Table:
        bctx = dict(ctx)
        bctx["__flat_cache__"] = {}
        bad = np.zeros(len(batch), dtype=bool)
        for spec in rules:
            mask, _ = evaluate_kernel(batch, spec.kind, spec.column, spec.params, bctx)
            if spec.dependency is not None:
                dk, dc, dp = spec.dependency
                dep_fail, _ = evaluate_kernel(batch, dk, dc, dp, bctx)
                mask = (mask & ~dep_fail) | dep_fail  # dependency-invalid rows are not clean
            bad |= mask
        return batch.select(["doc_id", "tokens", "n_tok", "source"]).filter(
            pa.array(~bad)
        )

    plan = plan_read(d, SEQUENCES_SCHEMA)
    ds = read_with_provenance(
        plan.work_items(), columns=["doc_id", "tokens", "n_tok", "source"], yield_rows=8192
    ).map_batches(keep_clean, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    ds.write_parquet(out_dir, partition_cols=["source"])

    # count what was actually WRITTEN, from the footers
    rows: dict[str, int] = {}
    for f in _glob.glob(os.path.join(out_dir, "**", "*.parquet"), recursive=True):
        src = ""
        for part in f.split(os.sep):
            if part.startswith("source="):
                src = part.split("=", 1)[1]
        rows[src] = rows.get(src, 0) + _pq.ParquetFile(f).metadata.num_rows
    srcs = sorted(rows)
    return pa.table(
        {
            "source": pa.array(srcs, type=pa.string()),
            "n_clean": pa.array([rows[s] for s in srcs], type=pa.int64()),
        }
    )


# ----------------------------------------------------------------- packing

PACK_LEN = 2048

_SEQ_PACK_SQL = (
    _CTE
    + f"""
, s AS (
  SELECT doc_id, COALESCE(len(tokens), 0) AS nt FROM seq WHERE doc_id IS NOT NULL
), p AS (
  SELECT doc_id, nt,
         SUM(nt) OVER (ORDER BY doc_id, nt ROWS UNBOUNDED PRECEDING) - nt AS start_off
  FROM s
)
SELECT doc_id, CAST(nt AS BIGINT) AS n_tok_actual,
       CAST(start_off AS BIGINT) AS start_off,
       CAST(start_off // {PACK_LEN} AS BIGINT) AS pack_id
FROM p
"""
)


@query("seq_pack", _SEQ_PACK_SQL)
def seq_pack(sf_dir: str) -> pa.Table:
    """Sequence packing for LLM training (chunked-concat layout): every doc
    gets its exact global token offset in the deterministic concat order
    (doc_id, len) and the id of the {PACK_LEN}-token pack its first token
    lands in. Docs spanning a boundary continue into the next pack — the
    standard pretraining chunking.

    Plan shape (holds at 10^12 rows): one global sort — per-BLOCK token sums
    are SCALARS, so the exclusive-prefix merge is block-count-sized on the
    driver (never user/doc-cardinality) — then a vectorized per-block
    cumsum emit. The degenerate one-partition prefix scan, cheaper than the
    per-user machinery of functions.windows.running_number."""
    import ray

    from seronet_data_validator_ray.sources.parquet import plan_read, read_with_provenance

    d = ensure_seq(sf_dir)
    plan = plan_read(d, SEQUENCES_SCHEMA)
    ds = read_with_provenance(plan.work_items(), columns=["doc_id", "tokens"], yield_rows=65536)

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nt = pc.fill_null(pc.cast(pc.list_value_length(batch["tokens"]), pa.int64()), 0)
        t = pa.table({"doc_id": batch["doc_id"], "nt": nt})
        return t.filter(pc.is_valid(batch["doc_id"]))

    mat = (
        ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .sort(["doc_id", "nt"])
        .materialize()
    )
    refs = mat.to_arrow_refs()

    def block_sum(t: pa.Table) -> int:
        import pyarrow.compute as pc

        return int(pc.sum(t["nt"]).as_py() or 0)

    def emit(t: pa.Table, base: int) -> pa.Table:
        nt = t["nt"].to_numpy(zero_copy_only=False)
        start = base + np.cumsum(nt) - nt
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tok_actual": pa.array(nt, type=pa.int64()),
                "start_off": pa.array(start, type=pa.int64()),
                "pack_id": pa.array(start // PACK_LEN, type=pa.int64()),
            }
        )

    sum_task = ray.remote(block_sum)
    sums = ray.get([sum_task.remote(r) for r in refs])
    bases = np.zeros(len(sums), dtype=np.int64)
    np.cumsum(sums[:-1], out=bases[1:])
    emit_task = ray.remote(emit)
    outs = [t for t in ray.get([emit_task.remote(r, int(b)) for r, b in zip(refs, bases)]) if len(t)]
    if not outs:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.string()),
                "n_tok_actual": pa.array([], type=pa.int64()),
                "start_off": pa.array([], type=pa.int64()),
                "pack_id": pa.array([], type=pa.int64()),
            }
        )
    return pa.concat_tables(outs)


# ----------------------------------------------------------------- drift stats

_LEN_NBINS = 32

_DRIFT_SQL = f"""
WITH bad AS (
  SELECT tokens, CAST(n_tok AS BIGINT) AS n_tok, source
  FROM read_parquet('{{d}}/part-*.parquet', union_by_name=true, filename=true)
  WHERE filename NOT LIKE '%badschema%'
), cln AS (
  SELECT tokens, CAST(n_tok AS BIGINT) AS n_tok, source
  FROM read_parquet('{{c}}/part-*.parquet', union_by_name=true)
), srcs AS (SELECT DISTINCT source FROM cln),
tbins AS (SELECT range AS bin FROM range({_NBINS})),
lbins AS (SELECT range AS bin FROM range({_LEN_NBINS})),
ot AS (
  SELECT source,
         CAST(least(greatest(floor(x * {_NBINS}.0 / {VOCAB}.0), 0), {_NBINS - 1}) AS BIGINT) AS bin,
         count(*) AS c
  FROM (SELECT source, unnest(tokens) AS x FROM bad) GROUP BY 1, 2
), rt AS (
  SELECT source,
         CAST(least(greatest(floor(x * {_NBINS}.0 / {VOCAB}.0), 0), {_NBINS - 1}) AS BIGINT) AS bin,
         count(*) AS c
  FROM (SELECT source, unnest(tokens) AS x FROM cln) GROUP BY 1, 2
), ol AS (
  SELECT source,
         CAST(least(greatest(floor(n_tok * {_LEN_NBINS}.0 / {MAX_LEN + 1}.0), 0), {_LEN_NBINS - 1}) AS BIGINT) AS bin,
         count(*) AS c
  FROM bad WHERE n_tok IS NOT NULL GROUP BY 1, 2
), rl AS (
  SELECT source,
         CAST(least(greatest(floor(n_tok * {_LEN_NBINS}.0 / {MAX_LEN + 1}.0), 0), {_LEN_NBINS - 1}) AS BIGINT) AS bin,
         count(*) AS c
  FROM cln GROUP BY 1, 2
), jt AS (
  SELECT s.source, b.bin, COALESCE(o.c, 0) AS oc, COALESCE(r.c, 0) AS rc
  FROM srcs s CROSS JOIN tbins b
  LEFT JOIN ot o ON o.source = s.source AND o.bin = b.bin
  LEFT JOIN rt r ON r.source = s.source AND r.bin = b.bin
), ct AS (
  SELECT source, bin, oc, rc,
         SUM(oc) OVER (PARTITION BY source ORDER BY bin ROWS UNBOUNDED PRECEDING) AS co,
         SUM(rc) OVER (PARTITION BY source ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cr,
         SUM(oc) OVER (PARTITION BY source) AS no,
         SUM(rc) OVER (PARTITION BY source) AS nr
  FROM jt
), tok AS (
  SELECT source,
         CAST(MAX(ABS(co * nr - cr * no)) AS BIGINT) AS ks_tok,
         CAST(SUM(ABS(oc * nr - rc * no)) AS BIGINT) AS l1_tok,
         CAST(MAX(no) AS BIGINT) AS n_tok_obs, CAST(MAX(nr) AS BIGINT) AS n_tok_ref
  FROM ct GROUP BY source
), jl AS (
  SELECT s.source, b.bin, COALESCE(o.c, 0) AS oc, COALESCE(r.c, 0) AS rc
  FROM srcs s CROSS JOIN lbins b
  LEFT JOIN ol o ON o.source = s.source AND o.bin = b.bin
  LEFT JOIN rl r ON r.source = s.source AND r.bin = b.bin
), cl AS (
  SELECT source, bin, oc, rc,
         SUM(oc) OVER (PARTITION BY source ORDER BY bin ROWS UNBOUNDED PRECEDING) AS co,
         SUM(rc) OVER (PARTITION BY source ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cr,
         SUM(oc) OVER (PARTITION BY source) AS no,
         SUM(rc) OVER (PARTITION BY source) AS nr
  FROM jl
), lent AS (
  SELECT source,
         CAST(MAX(ABS(co * nr - cr * no)) AS BIGINT) AS ks_len,
         CAST(SUM(ABS(oc * nr - rc * no)) AS BIGINT) AS l1_len,
         CAST(MAX(no) AS BIGINT) AS n_rows_obs, CAST(MAX(nr) AS BIGINT) AS n_rows_ref
  FROM cl GROUP BY source
)
SELECT t.source, ks_tok, l1_tok, n_tok_obs, n_tok_ref,
       ks_len, l1_len, n_rows_obs, n_rows_ref,
       CAST(CASE WHEN 200 * ks_tok > n_tok_obs * n_tok_ref
                   OR 200 * ks_len > n_rows_obs * n_rows_ref
            THEN 1 ELSE 0 END AS BIGINT) AS drifted
FROM tok t JOIN lent l ON t.source = l.source
ORDER BY t.source
"""


def _drift_hist_partial(batch: pa.Table) -> pa.Table:
    """Per-batch per-source (bin, count) partials for BOTH the 64-bin token
    histogram (bins 0..63) and the 32-bin n_tok histogram (bins 64..95) —
    one zero-copy flatten + two bincounts, no Python over rows."""
    from seronet_data_validator_ray.rules.kernels import flat_list_view

    lengths, flat = flat_list_view(batch, "tokens", {})
    # int32 throughout: tok*_NBINS <= (VOCAB-1)*64 ≈ 3.2M fits comfortably,
    # and halving the flat-sized temporaries matters on this
    # first-touch-bound host (BASELINE.md round 5)
    tb = flat.astype(np.int32, copy=True)
    np.multiply(tb, np.int32(_NBINS), out=tb)
    np.floor_divide(tb, np.int32(VOCAB), out=tb)
    np.clip(tb, 0, _NBINS - 1, out=tb)
    src = np.asarray(batch.column("source").to_numpy(zero_copy_only=False), dtype=object)
    uniq, gidx = np.unique(src, return_inverse=True)
    parent = np.repeat(gidx.astype(np.int32), lengths)
    np.multiply(parent, np.int32(_NBINS), out=parent)
    np.add(tb, parent, out=tb)  # in-place (group, bin) combine
    combo_t = np.bincount(tb, minlength=len(uniq) * _NBINS).reshape(
        len(uniq), _NBINS
    )
    nt = batch.column("n_tok")
    lb = np.asarray(
        pc.fill_null(nt, 0).to_numpy(zero_copy_only=False), dtype=np.int64
    )
    np.multiply(lb, np.int64(_LEN_NBINS), out=lb)
    np.floor_divide(lb, np.int64(MAX_LEN + 1), out=lb)
    np.clip(lb, 0, _LEN_NBINS - 1, out=lb)
    vmask = np.asarray(pc.is_valid(nt).to_numpy(zero_copy_only=False), dtype=bool)
    combo_l = np.bincount(
        (gidx * _LEN_NBINS + lb)[vmask], minlength=len(uniq) * _LEN_NBINS
    ).reshape(len(uniq), _LEN_NBINS)
    rows_src, rows_bin, rows_n = [], [], []
    for k, s in enumerate(uniq):
        nz = np.nonzero(combo_t[k])[0]
        rows_src += [str(s)] * len(nz)
        rows_bin += nz.tolist()
        rows_n += combo_t[k][nz].tolist()
        nz = np.nonzero(combo_l[k])[0]
        rows_src += [str(s)] * len(nz)
        rows_bin += (nz + _NBINS).tolist()
        rows_n += combo_l[k][nz].tolist()
    return pa.table(
        {
            "source": pa.array(rows_src, type=pa.string()),
            "bin": pa.array(rows_bin, type=pa.int64()),
            "n": pa.array(rows_n, type=pa.int64()),
        }
    )


def _tagged_hist_partials(d: str, tag: str):
    """Histogram-partial Dataset for one corpus dir, each partial row tagged
    with the corpus name so several corpora can share ONE execution.

    Plain task-based read_parquet, NOT read_with_provenance: histograms need
    no (partition, row_index) provenance, and the provenance reader's
    actor-pool spin-up costs seconds per call on a cold pool. plan_read
    still supplies the file list so schema-mismatch partitions stay gated
    out (the oracle excludes them the same way: filename NOT LIKE
    '%badschema%')."""
    import ray.data

    from seronet_data_validator_ray.sources.parquet import plan_read

    plan = plan_read(d, SEQUENCES_SCHEMA)

    def partial(batch: pa.Table, _tag=tag) -> pa.Table:
        t = _drift_hist_partial(batch)
        return t.append_column("corpus", pa.array([_tag] * len(t), type=pa.string()))

    from seronet_data_validator_ray.sources.parquet import read_fused

    return read_fused(plan.files, columns=["tokens", "n_tok", "source"]).map_batches(
        partial,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=8192,  # bound the flat-sized histogram temporaries
    )


def _source_hists_multi(dirs: dict[str, str]) -> dict[str, dict]:
    """{tag: {source: (tok_hist int64[64], len_hist int64[32])}} for several
    corpora in ONE streaming execution (a Dataset execution carries ~1-2 s of
    fixed scheduling cost, so drift's two scans union into one run). Partials
    are <= n_sources * 96 rows per block — same rationale as seq_token_hist;
    the merge is one tiny driver Arrow group_by."""
    from seronet_data_validator_ray.util import ds_to_table

    parts = [_tagged_hist_partials(d, tag) for tag, d in dirs.items()]
    ds = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
    partials = ds_to_table(ds)
    g = partials.group_by(["corpus", "source", "bin"]).aggregate([("n", "sum")])
    corp = np.asarray(g.column("corpus").to_numpy(zero_copy_only=False), dtype=object)
    srcs = np.asarray(g.column("source").to_numpy(zero_copy_only=False), dtype=object)
    bins = g.column("bin").to_numpy(zero_copy_only=False)
    ns = g.column("n_sum").to_numpy(zero_copy_only=False)
    out: dict[str, dict] = {tag: {} for tag in dirs}
    for tag in out:
        cm = corp == tag
        for s in np.unique(srcs[cm]):
            m = cm & (srcs == s)
            tok = np.zeros(_NBINS, dtype=np.int64)
            ln = np.zeros(_LEN_NBINS, dtype=np.int64)
            b, v = bins[m], ns[m]
            tm = b < _NBINS
            tok[b[tm]] = v[tm]
            ln[b[~tm] - _NBINS] = v[~tm]
            out[tag][str(s)] = (tok, ln)
    return out


def _source_hists(d: str) -> dict:
    """Single-corpus convenience wrapper over :func:`_source_hists_multi`."""
    return _source_hists_multi({"obs": d})["obs"]


@query("seq_drift", _DRIFT_SQL)
def seq_drift(sf_dir: str) -> pa.Table:
    """Distribution-drift detection per source partition, driver-checkable
    mirror of the DriftScorer actor stage (stages/drift.py, SURVEY.md ST4;
    ≙ reference-state drift comparison /root/reference/Data_Validation_v1.py:277-303).

    Observed = the bad corpus; reference = the clean generation at the same
    scale (what entry() feeds compute_reference_histograms). Statistics are
    INTEGER-EXACT cross-multiplied forms so the DuckDB oracle hash-matches
    bit-for-bit: with per-source observed counts o_b (N_o total) and
    reference counts r_b (N_r),

      ks_* = max_b |cum(o)_b * N_r - cum(r)_b * N_o|   (= KS D * N_o * N_r)
      l1_* = sum_b |o_b * N_r - r_b * N_o|             (= L1 distance * N_o * N_r)

    and `drifted` applies the D > 0.005 effect-size gate as the exact integer
    comparison 200*ks > N_o*N_r. Python-int arithmetic on the (sources x 96)
    merged table avoids int64 overflow at any corpus size (DuckDB's HUGEINT
    does the same on the oracle side). The drift plant shifts source "forums"
    wholesale (datagen.py:155), which this flags."""
    hists = _source_hists_multi(
        {"obs": ensure_seq(sf_dir), "ref": ensure_clean(sf_dir)}
    )
    obs, ref = hists["obs"], hists["ref"]
    cols: dict[str, list] = {
        k: []
        for k in (
            "source ks_tok l1_tok n_tok_obs n_tok_ref "
            "ks_len l1_len n_rows_obs n_rows_ref drifted".split()
        )
    }
    for s in sorted(ref):
        rt, rl = ref[s]
        ot, ol = obs.get(s, (np.zeros(_NBINS, dtype=np.int64), np.zeros(_LEN_NBINS, dtype=np.int64)))

        def stats(o, r):
            o = [int(x) for x in o]
            r = [int(x) for x in r]
            no, nr = sum(o), sum(r)
            co = cr = 0
            ks = l1 = 0
            for ob, rb in zip(o, r):
                co += ob
                cr += rb
                ks = max(ks, abs(co * nr - cr * no))
                l1 += abs(ob * nr - rb * no)
            return ks, l1, no, nr

        ks_t, l1_t, no_t, nr_t = stats(ot, rt)
        ks_l, l1_l, no_l, nr_l = stats(ol, rl)
        cols["source"].append(s)
        cols["ks_tok"].append(ks_t)
        cols["l1_tok"].append(l1_t)
        cols["n_tok_obs"].append(no_t)
        cols["n_tok_ref"].append(nr_t)
        cols["ks_len"].append(ks_l)
        cols["l1_len"].append(l1_l)
        cols["n_rows_obs"].append(no_l)
        cols["n_rows_ref"].append(nr_l)
        cols["drifted"].append(
            int(200 * ks_t > no_t * nr_t or 200 * ks_l > no_l * nr_l)
        )
    arrays = {"source": pa.array(cols["source"], type=pa.string())}
    for k in list(cols)[1:]:
        arrays[k] = pa.array(cols[k], type=pa.int64())
    return pa.table(arrays)


# ----------------------------------------------------------------- curriculum

CURR_BATCH = 256

_SEQ_CURRICULUM_SQL = (
    _CTE
    + f"""
, s AS (
  SELECT doc_id, CAST(n_tok AS BIGINT) AS nt FROM seq
  WHERE doc_id IS NOT NULL AND n_tok IS NOT NULL
), r AS (
  SELECT nt, row_number() OVER (ORDER BY nt, doc_id) - 1 AS rk FROM s
)
SELECT CAST(rk // {CURR_BATCH} AS BIGINT) AS batch_id,
       CAST(count(*) AS BIGINT) AS n_seqs,
       CAST(min(nt) AS BIGINT) AS min_len,
       CAST(max(nt) AS BIGINT) AS max_len,
       CAST(sum(nt) AS BIGINT) AS sum_tok
FROM r GROUP BY 1
"""
)


@query("seq_curriculum", _SEQ_CURRICULUM_SQL)
def seq_curriculum(sf_dir: str) -> pa.Table:
    """Length-sorted curriculum batching (padding-efficient pretraining
    batches): global sort by (n_tok, doc_id), fixed-size batch assignment by
    global rank, per-batch stats (count / min / max / token sum).

    Plan shape: one range-partitioned global sort; per-block row COUNTS are
    scalars so the rank prefix merge is block-count-sized on the driver (the
    seq_pack degenerate prefix scan); per-block batch partials are run-length
    aggregates over consecutive ranks (batches split across block boundaries
    re-merge in a tiny batch-count-sized group_by). Tied (n_tok, doc_id) rows
    may permute across a batch boundary, but every emitted aggregate depends
    only on n_tok, so the result is tie-invariant — value-hash parity with
    the SQL window oracle holds."""
    import ray

    from seronet_data_validator_ray.sources.parquet import plan_read, read_with_provenance

    d = ensure_seq(sf_dir)
    plan = plan_read(d, SEQUENCES_SCHEMA)
    ds = read_with_provenance(plan.work_items(), columns=["doc_id", "n_tok"], yield_rows=65536)

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = pa.table(
            {"doc_id": batch["doc_id"], "nt": pc.cast(batch["n_tok"], pa.int64())}
        )
        return t.filter(
            pc.and_(pc.is_valid(batch["doc_id"]), pc.is_valid(batch["n_tok"]))
        )

    mat = (
        ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .sort(["nt", "doc_id"])
        .materialize()
    )
    refs = mat.to_arrow_refs()  # dataset order == sort order

    def block_count(t: pa.Table) -> int:
        return t.num_rows

    def partials(t: pa.Table, base: int) -> pa.Table:
        nt = t["nt"].to_numpy(zero_copy_only=False)
        if not len(nt):
            return pa.table(
                {
                    "batch_id": pa.array([], type=pa.int64()),
                    "n_seqs": pa.array([], type=pa.int64()),
                    "min_len": pa.array([], type=pa.int64()),
                    "max_len": pa.array([], type=pa.int64()),
                    "sum_tok": pa.array([], type=pa.int64()),
                }
            )
        bid = (base + np.arange(len(nt), dtype=np.int64)) // CURR_BATCH
        starts = np.nonzero(np.r_[True, bid[1:] != bid[:-1]])[0]
        sizes = np.diff(np.r_[starts, len(nt)])
        # block is (nt, doc_id)-sorted: group min is the first row, max the last
        return pa.table(
            {
                "batch_id": pa.array(bid[starts], type=pa.int64()),
                "n_seqs": pa.array(sizes.astype(np.int64), type=pa.int64()),
                "min_len": pa.array(nt[starts], type=pa.int64()),
                "max_len": pa.array(nt[starts + sizes - 1], type=pa.int64()),
                "sum_tok": pa.array(np.add.reduceat(nt, starts), type=pa.int64()),
            }
        )

    count_task = ray.remote(block_count)
    counts = ray.get([count_task.remote(r) for r in refs])
    bases = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=bases[1:])
    emit_task = ray.remote(partials)
    outs = [t for t in ray.get([emit_task.remote(r, int(b)) for r, b in zip(refs, bases)]) if len(t)]
    merged = pa.concat_tables(outs)
    g = merged.group_by("batch_id").aggregate(
        [("n_seqs", "sum"), ("min_len", "min"), ("max_len", "max"), ("sum_tok", "sum")]
    )
    g = g.rename_columns(
        [
            {
                "n_seqs_sum": "n_seqs",
                "min_len_min": "min_len",
                "max_len_max": "max_len",
                "sum_tok_sum": "sum_tok",
            }.get(c, c)
            for c in g.column_names
        ]
    )
    return g.select(["batch_id", "n_seqs", "min_len", "max_len", "sum_tok"]).sort_by(
        [("batch_id", "ascending")]
    )


# ----------------------------------------------------------- balanced shards

SHARD_N = 16

_SHARD_BALANCE_SQL = (
    _CTE
    + f"""
, s AS (
  SELECT doc_id, CAST(n_tok AS BIGINT) AS nt FROM seq
  WHERE doc_id IS NOT NULL AND n_tok IS NOT NULL
), r AS (
  SELECT nt, (row_number() OVER (ORDER BY nt DESC, doc_id) - 1) % {SHARD_N} AS shard
  FROM s
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS sum_tok,
       CAST(max(nt) AS BIGINT) AS max_tok
FROM r GROUP BY shard
"""
)


@query("seq_shard_balance", _SHARD_BALANCE_SQL)
def seq_shard_balance(sf_dir: str) -> pa.Table:
    """Token-balanced output-shard planning (the write-side partitioner a
    training job wants: every shard carries ~the same token count, so no
    data-loader rank starves). Deterministic longest-first round-robin:
    global sort by (n_tok DESC, doc_id) + shard = rank % SHARD_N — within
    any run of 16 consecutive ranks every shard receives one doc, bounding
    the worst shard-total gap by one max-length doc. Same plan shape as
    seq_curriculum: ONE range-partitioned sort, scalar per-block counts for
    the rank prefix (block-count-sized driver state), per-block shard
    partials via bincount, tiny driver merge. Tie-permutations of equal
    (nt, doc_id) ranks cannot occur (doc_id breaks ties), and every emitted
    aggregate depends only on nt — exact SQL parity."""
    import ray

    from seronet_data_validator_ray.sources.parquet import plan_read, read_with_provenance

    d = ensure_seq(sf_dir)
    plan = plan_read(d, SEQUENCES_SCHEMA)
    ds = read_with_provenance(plan.work_items(), columns=["doc_id", "n_tok"], yield_rows=65536)

    def project(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"doc_id": batch["doc_id"], "nt": pc.cast(batch["n_tok"], pa.int64())}
        )
        return t.filter(
            pc.and_(pc.is_valid(batch["doc_id"]), pc.is_valid(batch["n_tok"]))
        )

    mat = (
        ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .sort(["nt", "doc_id"], descending=[True, False])
        .materialize()
    )
    refs = mat.to_arrow_refs()  # dataset order == sort order

    def block_count(t: pa.Table) -> int:
        return t.num_rows

    def partials(t: pa.Table, base: int) -> pa.Table:
        nt = t["nt"].to_numpy(zero_copy_only=False)
        if not len(nt):
            return pa.table(
                {
                    "shard": pa.array([], type=pa.int64()),
                    "n_docs": pa.array([], type=pa.int64()),
                    "sum_tok": pa.array([], type=pa.int64()),
                    "max_tok": pa.array([], type=pa.int64()),
                }
            )
        shard = (base + np.arange(len(nt), dtype=np.int64)) % SHARD_N
        n = np.bincount(shard, minlength=SHARD_N)
        s = np.zeros(SHARD_N, dtype=np.int64)
        np.add.at(s, shard, nt)
        mx = np.zeros(SHARD_N, dtype=np.int64)
        np.maximum.at(mx, shard, nt)
        nz = np.nonzero(n)[0]
        return pa.table(
            {
                "shard": pa.array(nz, type=pa.int64()),
                "n_docs": pa.array(n[nz].astype(np.int64), type=pa.int64()),
                "sum_tok": pa.array(s[nz], type=pa.int64()),
                "max_tok": pa.array(mx[nz], type=pa.int64()),
            }
        )

    count_task = ray.remote(block_count)
    counts = ray.get([count_task.remote(r) for r in refs])
    bases = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=bases[1:])
    emit_task = ray.remote(partials)
    outs = [
        t for t in ray.get([emit_task.remote(r, int(b)) for r, b in zip(refs, bases)]) if len(t)
    ]
    merged = pa.concat_tables(outs)
    g = merged.group_by("shard").aggregate(
        [("n_docs", "sum"), ("sum_tok", "sum"), ("max_tok", "max")]
    )
    g = g.rename_columns(
        [
            {"n_docs_sum": "n_docs", "sum_tok_sum": "sum_tok", "max_tok_max": "max_tok"}.get(
                c, c
            )
            for c in g.column_names
        ]
    )
    return g.select(["shard", "n_docs", "sum_tok", "max_tok"]).sort_by(
        [("shard", "ascending")]
    )


# ----------------------------------------------------------------- OOV rate

_OOV_SQL = (
    _CTE
    + f"""
SELECT source,
       CAST(SUM(len(list_filter(tokens, x -> x < 0 OR x >= {VOCAB}))) AS BIGINT) AS n_oov,
       CAST(SUM(len(tokens)) AS BIGINT) AS n_tokens,
       CAST(SUM(len(list_filter(tokens, x -> x < 0 OR x >= {VOCAB}))) * 1000000
            // SUM(len(tokens)) AS BIGINT) AS oov_ppm
FROM seq
WHERE source IS NOT NULL AND source <> '' AND len(tokens) > 0
GROUP BY source
"""
)


@query("seq_oov_rate", _OOV_SQL)
def seq_oov_rate(sf_dir: str) -> pa.Table:
    """Per-source out-of-vocabulary token rate in exact integer ppm (the
    corpus-health metric behind the tokens.range rule, M6 generalized from
    row flagging to a distribution summary). One no-shuffle pass: zero-copy
    token flatten, one vectorized range mask, per-source token totals via
    length-weighted bincounts; partials are n_sources rows per block, merged
    with one driver Arrow group_by (exact Python-int division at the end —
    token totals at 10^12 rows stay inside int64, and the ppm division is
    done once per source, not per row)."""
    from seronet_data_validator_ray.rules.kernels import flat_list_view

    d = ensure_seq(sf_dir)
    import ray.data

    from seronet_data_validator_ray.sources.parquet import plan_read

    plan = plan_read(d, SEQUENCES_SCHEMA)

    def partial(batch: pa.Table) -> pa.Table:
        src_valid = pc.and_kleene(
            pc.is_valid(batch["source"]), pc.not_equal(batch["source"], "")
        )
        sub = batch.filter(pc.fill_null(src_valid, False))
        lengths, flat = flat_list_view(sub, "tokens", {})
        keep = lengths > 0  # SQL drops len(tokens)=0 ROWS (a source of only
        # empty rows must not appear in the output)
        src = np.asarray(sub["source"].to_numpy(zero_copy_only=False), dtype=object)
        uniq, gidx = np.unique(src[keep], return_inverse=True)
        oov = (flat < 0) | (flat >= VOCAB)
        # every flat token belongs to a row with length >= 1, so repeating the
        # per-row group id by length covers the whole oov mask; len-0 rows
        # contribute nothing (any placeholder gid works — 0 is safe)
        gid_of_row = np.zeros(len(lengths), dtype=np.int32)
        gid_of_row[keep] = gidx
        tok_gid = np.repeat(gid_of_row, lengths)
        n_tok = np.bincount(gidx, weights=lengths[keep], minlength=len(uniq)).astype(np.int64)
        # count only the (rare) OOV tokens — bincount with a float weights
        # array would materialize a flat-sized float64 temporary
        n_oov = np.bincount(tok_gid[oov], minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "source": pa.array([str(u) for u in uniq], type=pa.string()),
                "n_oov": pa.array(n_oov, type=pa.int64()),
                "n_tokens": pa.array(n_tok, type=pa.int64()),
            }
        )

    from seronet_data_validator_ray.sources.parquet import read_fused

    ds = read_fused(plan.files, columns=["tokens", "source"]).map_batches(
        partial,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=8192,  # bound the flat-sized membership temporaries
    )
    from seronet_data_validator_ray.util import ds_to_table

    partials = ds_to_table(ds)
    g = partials.group_by("source").aggregate([("n_oov", "sum"), ("n_tokens", "sum")])
    oovs = g["n_oov_sum"].to_pylist()
    toks = g["n_tokens_sum"].to_pylist()
    return pa.table(
        {
            "source": g["source"],
            "n_oov": pa.array(oovs, type=pa.int64()),
            "n_tokens": pa.array(toks, type=pa.int64()),
            "oov_ppm": pa.array(
                [o * 1_000_000 // t for o, t in zip(oovs, toks)], type=pa.int64()
            ),
        }
    )




# --------------------------------------------------------- repetition stats

_REPETITION_SQL = """
WITH seq AS (
  SELECT doc_id, tokens FROM read_parquet('{c}/part-*.parquet')
  WHERE len(tokens) > 0
),
t AS (SELECT doc_id, unnest(tokens) AS tok FROM seq),
g AS (SELECT doc_id, tok, count(*) AS n FROM t GROUP BY doc_id, tok),
s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(CAST(sum(n) AS HUGEINT) AS BIGINT) AS n_tok,
             CAST(max(n) AS BIGINT) AS top_count
      FROM g GROUP BY doc_id),
top AS (
  SELECT g.doc_id, CAST(min(g.tok) AS BIGINT) AS top_token
  FROM g JOIN s ON g.doc_id = s.doc_id AND g.n = s.top_count
  GROUP BY g.doc_id
)
SELECT s.doc_id, s.n_tok, s.n_distinct,
       (10000 * s.n_distinct) // s.n_tok AS distinct_ratio_bp,
       top.top_token, s.top_count
FROM s JOIN top ON s.doc_id = top.doc_id
"""


@query("seq_repetition_stats", _REPETITION_SQL)
def seq_repetition_stats(sf_dir: str) -> pa.Table:
    """Per-sequence TOKEN-REPETITION profile over the clean corpus — the
    Gopher-style "fraction in the most common token" quality signal at the
    token (not word) level: distinct-token count, distinct ratio in exact
    integer basis points, and the modal token with a deterministic min-token
    tie-break (mirrored in the oracle's min(tok)-at-max-count join).

    One no-shuffle pass: zero-copy token flatten, per-(row, token) counts
    from ONE np.unique over a (row << 32 | token) composite (token ids are
    int32, so the composite is exact in int64), per-row distinct counts via
    bincount and the modal token via one lexsort — no per-row Python, no
    groupby; every row's stats complete inside its own block, so 10^12
    sequences stream with zero exchange. ≙ SURVEY §2.11 quality family
    (reference analog: per-column value-profile checks,
    File_Submission_Object.py:345 generalized to token arrays)."""
    import ray.data

    from seronet_data_validator_ray.sources.parquet import plan_read

    d = ensure_clean(sf_dir)
    plan = plan_read(d, SEQUENCES_SCHEMA)

    def stats(batch: pa.Table) -> pa.Table:
        from seronet_data_validator_ray.rules.kernels import flat_list_view

        lengths, flat = flat_list_view(batch, "tokens", {})
        keep = lengths > 0
        n = len(lengths)
        row_of = np.repeat(np.arange(n, dtype=np.int64), lengths)
        comp = (row_of << np.int64(32)) | flat.astype(np.int64)
        uniq, counts = np.unique(comp, return_counts=True)
        rows_u = uniq >> np.int64(32)
        toks_u = uniq & np.int64(0xFFFFFFFF)
        n_distinct = np.bincount(rows_u, minlength=n).astype(np.int64)
        # modal token per row, ties to the smallest token id:
        # lexsort = rows asc, then count desc, then token asc
        order = np.lexsort((toks_u, -counts, rows_u))
        _, first = np.unique(rows_u[order], return_index=True)
        top_tok = np.zeros(n, dtype=np.int64)
        top_cnt = np.zeros(n, dtype=np.int64)
        rows_first = rows_u[order][first]
        top_tok[rows_first] = toks_u[order][first]
        top_cnt[rows_first] = counts[order][first]
        n_tok = lengths.astype(np.int64)
        out = pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tok": pa.array(n_tok, type=pa.int64()),
                "n_distinct": pa.array(n_distinct, type=pa.int64()),
                "distinct_ratio_bp": pa.array(
                    np.where(keep, (10000 * n_distinct) // np.maximum(n_tok, 1), 0),
                    type=pa.int64(),
                ),
                "top_token": pa.array(top_tok, type=pa.int64()),
                "top_count": pa.array(top_cnt, type=pa.int64()),
            }
        )
        return out.filter(pa.array(keep))

    from seronet_data_validator_ray.sources.parquet import read_fused

    ds = read_fused(
        plan.files,
        columns=["doc_id", "tokens"],
        # fused wins where it counts: COLD (first run in a session — the
        # only temperature a one-pass production scan has) the split path
        # round-trips the 2 GB decoded token payload through never-touched
        # plasma pages (measured 28.5 s vs 10.2 s fused); warm it is ~15%
        # faster (4.6 vs 5.1 s) but a per-query sweep never runs warm
    ).map_batches(
        stats,
        batch_format="pyarrow",
        zero_copy_batch=True,
        # ~4k rows ≈ 2M tokens keeps the packed (row<<32|token) sort
        # cache-resident; a whole-file block paid first-touch pages on
        # three 0.5 GB temporaries per task (measured 4 s -> 29 s)
        batch_size=4096,
    )
    from seronet_data_validator_ray.util import ds_to_table

    return ds_to_table(ds)


# ------------------------------------------------------ token-array exact dedup

_SEQ_DEDUP_TOKENS_SQL = (
    _CTE
    + """
SELECT min(doc_id) AS keep_doc_id, CAST(count(*) AS BIGINT) AS n_copies,
       CAST(len(tokens) AS BIGINT) AS n_tok
FROM seq
WHERE tokens IS NOT NULL AND doc_id IS NOT NULL AND doc_id <> ''
GROUP BY tokens
"""
)


@query("seq_dedup_tokens", _SEQ_DEDUP_TOKENS_SQL)
def seq_dedup_tokens(sf_dir: str) -> pa.Table:
    """Exact dedup of TOKEN ARRAYS over the north-star corpus — duplicate
    pre-tokenized sequences are the token-level analog of duplicate text,
    and this is the digest-mode plan a 10^12-row run takes: a positional
    polynomial uint64 hash of each array (one cumprod + one reduceat per
    block, no per-row Python) is the 16 B shuffle key; ONE hash-bucketed
    exchange aggregates (min doc_id, count, n_tok) per digest; hash groups
    with count > 1 fetch their member arrays in a pruned second scan and
    split by true content, so int32 token payloads never enter an exchange
    and hash collisions cannot merge distinct sequences. The oracle groups
    by the raw list column — results must hash-match. See
    functions/dedup.py token_dedup_groups (collision recovery is driven by
    a weak-hash test seam in tests/test_training_ops.py)."""
    import ray.data

    from seronet_data_validator_ray.functions.dedup import token_dedup_groups
    from seronet_data_validator_ray.sources.parquet import plan_read

    d = ensure_seq(sf_dir)
    plan = plan_read(d, SEQUENCES_SCHEMA)
    from seronet_data_validator_ray.sources.parquet import read_fused

    ds = read_fused(plan.files, columns=["doc_id", "tokens"])
    return token_dedup_groups(ds)
