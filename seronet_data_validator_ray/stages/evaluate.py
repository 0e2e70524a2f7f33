"""The fused row-local rule evaluator — ONE ``map_batches`` pass per batch.

Replaces the reference's per-column Python dispatch loop
(/root/reference/Validation_Rules.py:4-61) with a single vectorized pass that
evaluates every row-local rule AND accumulates the per-column stats partial,
emitting a *small* outcome table per batch:

- ``kind="violation"`` rows — one per (rule, failing row), schema per
  FIXTURES.md §4 (≙ Error_list, /root/reference/File_Submission_Object.py:71-72),
- one ``kind="stats"`` row per partition present in the batch, carrying the
  pickled :class:`PartialStats` in a binary column.

The heavy input batch (tokens lists) is read once and dropped; only the small
outcome flows on. Used as an actor-pool stage
(``map_batches(RuleEvaluator, concurrency=..., batch_format="pyarrow",
zero_copy_batch=True)``) so rule compilation and the broadcast allowed-set
lookup happen once per actor, not once per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from seronet_data_validator_ray.rules.kernels import _col, evaluate_kernel
from seronet_data_validator_ray.rules.spec import RuleSpec, Severity
from seronet_data_validator_ray.stages.stats import PartialStats, StatsSpec

OUTCOME_SCHEMA = pa.schema(
    [
        pa.field("kind", pa.string()),
        pa.field("rule_id", pa.string()),
        pa.field("partition", pa.string()),
        pa.field("row_index", pa.int64()),
        pa.field("doc_id", pa.string()),
        pa.field("column", pa.string()),
        pa.field("observed", pa.string()),
        pa.field("severity", pa.string()),
        pa.field("message", pa.string()),
        pa.field("n_rows", pa.int64()),
        pa.field("payload", pa.binary()),
    ]
)

VIOLATION_COLUMNS = [
    "rule_id",
    "partition",
    "row_index",
    "doc_id",
    "column",
    "observed",
    "severity",
    "message",
]


def _string_take(col: pa.Array, idx: np.ndarray) -> pa.Array:
    taken = col.take(pa.array(idx, type=pa.int64()))
    if not pa.types.is_string(taken.type):
        try:
            taken = pc.cast(taken, pa.string())
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            # e.g. list columns: Arrow has no list->utf8 cast; observed rows
            # are few (violations only), so a Python repr is fine here
            taken = pa.array(
                [str(v)[:120] for v in taken.to_pylist()], type=pa.string()
            )
    return taken


import collections as _collections

_BROADCAST_CACHE: dict = _collections.OrderedDict()
_BROADCAST_CACHE_MAX = 8  # bounded: repeated queries each ray.put fresh refs,
# and an unbounded per-worker cache would grow for the life of the cluster


def _resolve_broadcast(ref) -> dict:
    """Fetch a broadcast ObjectRef once per worker process (bounded LRU)."""
    import ray

    key = ref.hex() if hasattr(ref, "hex") else str(ref)
    if key in _BROADCAST_CACHE:
        _BROADCAST_CACHE.move_to_end(key)
        return _BROADCAST_CACHE[key]
    val = ray.get(ref)
    _BROADCAST_CACHE[key] = val
    while len(_BROADCAST_CACHE) > _BROADCAST_CACHE_MAX:
        _BROADCAST_CACHE.popitem(last=False)
    return val


class RuleEvaluator:
    """Callable stage: works both as an actor-pool CLASS (state resolved once
    per actor) and as a pickled instance for stateless tasks (broadcast ctx
    resolved lazily, once per worker process, via ``_resolve_broadcast``)."""

    def __init__(
        self,
        rules: list[RuleSpec],
        ctx: dict | None = None,
        ctx_ref=None,
        key_column: str | None = "doc_id",
        stats_spec: StatsSpec | None = None,
        violation_row_cap: int | None = None,
    ):
        self._base_ctx = ctx or {}
        self._ctx_ref = ctx_ref
        self._resolved: dict | None = None if ctx_ref is not None else dict(self._base_ctx)
        self.rules = [r for r in rules if r.kind != "unique"]
        self.key_column = key_column
        self.stats_spec = stats_spec
        # 100 TB guard: a pathological input (every row fails a rule) must not
        # stream row-count-sized violation payloads to the driver. When set,
        # each batch emits at most cap sample rows per (rule, severity) cell
        # plus one 'rulecount' accounting row carrying the cell's FULL count
        # per partition, so verdict totals stay exact while the row payload is
        # bounded by cap x rules x batches.
        self.violation_row_cap = violation_row_cap

    @property
    def ctx(self) -> dict:
        if self._resolved is None:
            merged = dict(self._base_ctx)
            merged.update(_resolve_broadcast(self._ctx_ref))
            self._resolved = merged
        return self._resolved

    def __getstate__(self):
        # never pickle resolved broadcast data into task submissions
        state = dict(self.__dict__)
        if self._ctx_ref is not None:
            state["_resolved"] = None
        return state

    # ----------------------------------------------------------------- helpers

    def _provenance(self, batch: pa.Table):
        n = len(batch)
        if "partition" in batch.column_names:
            part = _col(batch, "partition")
        else:
            part = pa.array([self.ctx.get("default_partition", "")] * n)
        if "row_index" in batch.column_names:
            ridx = _col(batch, "row_index")
        else:
            ridx = pa.array(np.full(n, -1, dtype=np.int64))
        return part, ridx

    def _emit(self, batch, part, ridx, key, spec, mask, observed, severity):
        idx = np.nonzero(mask)[0]
        if len(idx) == 0:
            return None
        overflow = None
        cap = self.violation_row_cap
        if cap is not None and len(idx) > cap:
            # slow path, only when a batch cell actually overflows: count the
            # rows NOT sampled, per partition, so the driver can add the exact
            # remainder to the verdict tallies without double-counting the
            # cap sample rows it already sees
            parts_np = np.asarray(part.to_numpy(zero_copy_only=False), dtype=object)
            full_u, full_c = np.unique(parts_np[idx], return_counts=True)
            samp_u, samp_c = np.unique(parts_np[idx[:cap]], return_counts=True)
            sampled_of = dict(zip(samp_u, samp_c))
            extra = np.array(
                [c - sampled_of.get(u, 0) for u, c in zip(full_u, full_c)], dtype=np.int64
            )
            nz = extra > 0
            uniq, counts = full_u[nz], extra[nz]
            k = len(uniq)
            overflow = pa.table(
                {
                    "kind": pa.array(["rulecount"] * k),
                    "rule_id": pa.array([spec.rule_id] * k),
                    "partition": pa.array([str(u) for u in uniq], type=pa.string()),
                    "row_index": pa.nulls(k, pa.int64()),
                    "doc_id": pa.nulls(k, pa.string()),
                    "column": pa.array([spec.column] * k),
                    "observed": pa.nulls(k, pa.string()),
                    "severity": pa.array([severity] * k),
                    "message": pa.nulls(k, pa.string()),
                    "n_rows": pa.array(counts, type=pa.int64()),
                    "payload": pa.nulls(k, pa.binary()),
                },
                schema=OUTCOME_SCHEMA,
            )
            idx = idx[:cap]
        take_idx = pa.array(idx, type=pa.int64())
        if isinstance(observed, dict):
            obs = pa.array([observed.get(int(i), "") for i in idx], type=pa.string())
        elif observed is not None:
            obs = _string_take(observed, idx)
        elif spec.column in batch.column_names:
            obs = _string_take(_col(batch, spec.column), idx)
        else:
            obs = pa.array([""] * len(idx), type=pa.string())
        msg = spec.describe() if severity != Severity.NOT_VALIDATED else (
            f"{spec.rule_id}: dependency invalid, rule not evaluated"
        )
        sample = pa.table(
            {
                "kind": pa.array(["violation"] * len(idx)),
                "rule_id": pa.array([spec.rule_id] * len(idx)),
                "partition": part.take(take_idx),
                "row_index": pc.cast(ridx.take(take_idx), pa.int64()),
                "doc_id": key.take(take_idx) if key is not None else pa.nulls(len(idx), pa.string()),
                "column": pa.array([spec.column] * len(idx)),
                "observed": obs,
                "severity": pa.array([severity] * len(idx)),
                "message": pa.array([msg] * len(idx)),
                "n_rows": pa.nulls(len(idx), pa.int64()),
                "payload": pa.nulls(len(idx), pa.binary()),
            },
            schema=OUTCOME_SCHEMA,
        )
        return sample if overflow is None else pa.concat_tables([sample, overflow])

    # ----------------------------------------------------------------- call

    def __call__(self, batch: pa.Table) -> pa.Table:
        # per-batch flatten cache shared by list kernels and stats (the list
        # values buffer is ~17 MB/batch; flattening it once matters at 32
        # concurrent actors) — reset each batch, read by flat_list_view
        self.ctx["__flat_cache__"] = {}
        part, ridx = self._provenance(batch)
        if self.key_column and self.key_column in batch.column_names:
            key = _col(batch, self.key_column)
            if not pa.types.is_string(key.type):
                key = pc.cast(key, pa.string())
        else:
            key = None

        out: list[pa.Table] = []
        for spec in self.rules:
            dep_fail = None
            if spec.dependency is not None:
                dkind, dcol, dparams = spec.dependency
                dep_fail, _ = evaluate_kernel(batch, dkind, dcol, dparams, self.ctx)
                t = self._emit(
                    batch, part, ridx, key, spec, dep_fail, None, Severity.NOT_VALIDATED
                )
                if t is not None:
                    out.append(t)
            if getattr(spec, "kernel", None) is not None:
                # user rule: the callable travels BY VALUE inside the spec
                # (cloudpickle), so it exists on every worker without imports
                mask, observed = spec.kernel(batch, spec.column, spec.params, self.ctx)
            else:
                mask, observed = evaluate_kernel(
                    batch, spec.kind, spec.column, spec.params, self.ctx
                )
            if dep_fail is not None:
                mask = mask & ~dep_fail
            t = self._emit(batch, part, ridx, key, spec, mask, observed, spec.severity)
            if t is not None:
                out.append(t)

        if self.stats_spec is not None:
            parts_np = np.asarray(part.to_numpy(zero_copy_only=False), dtype=object)
            uniq = np.unique(parts_np)
            stats_rows = {"partition": [], "n_rows": [], "payload": []}
            if len(uniq) == 1:
                subs = [(str(uniq[0]), batch, True)]  # common case: no copy
            else:
                subs = [
                    (str(p), batch.filter(pa.array(parts_np == p)), False) for p in uniq
                ]
            for p, sub, whole in subs:
                flat_view = (
                    self.ctx["__flat_cache__"].get(self.stats_spec.list_col)
                    if whole and self.stats_spec.list_col
                    else None
                )
                ps = PartialStats(self.stats_spec).update(sub, flat_view=flat_view)
                stats_rows["partition"].append(p)
                stats_rows["n_rows"].append(len(sub))
                stats_rows["payload"].append(ps.to_bytes())
            k = len(stats_rows["partition"])
            out.append(
                pa.table(
                    {
                        "kind": pa.array(["stats"] * k),
                        "rule_id": pa.nulls(k, pa.string()),
                        "partition": pa.array(stats_rows["partition"], type=pa.string()),
                        "row_index": pa.nulls(k, pa.int64()),
                        "doc_id": pa.nulls(k, pa.string()),
                        "column": pa.nulls(k, pa.string()),
                        "observed": pa.nulls(k, pa.string()),
                        "severity": pa.nulls(k, pa.string()),
                        "message": pa.nulls(k, pa.string()),
                        "n_rows": pa.array(stats_rows["n_rows"], type=pa.int64()),
                        "payload": pa.array(stats_rows["payload"], type=pa.binary()),
                    },
                    schema=OUTCOME_SCHEMA,
                )
            )
        if not out:
            return OUTCOME_SCHEMA.empty_table()
        return pa.concat_tables(out)
