"""Per-column statistics partials — computed per Arrow batch, merged associatively.

Engine-native stats per the north rule (min/max, null-rate, HyperLogLog
cardinality, t-digest quantiles, per-source histograms for drift), grounded in
the reference's exact-but-serial analogs (distinct-ID collection
/root/reference/File_Submission_Object.py:624-652, missing-value counting
:590-622, Rule_Count metrics :290).

Partials ride the outcome dataset as a pickled binary column, get merged per
partition by a small ``groupby("partition").map_groups`` (tree reduce — never
a driver-side scan of every batch), and the per-partition results merge into
run-level stats on the driver (#partitions rows, small).
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from seronet_data_validator_ray.sketches import Histogram, HyperLogLog, TDigest


@dataclass
class StatsSpec:
    numeric_cols: list[str] = field(default_factory=list)
    id_col: str | None = None          # HLL cardinality target
    list_col: str | None = None        # token list column (histogram + min/max)
    group_col: str | None = None       # per-group (source) drift histograms
    list_hist: tuple = (0, 50257, 64)  # (lo, hi, nbins) uniform bins
    len_hist: tuple = (1, 4096, 32)    # (lo, hi, nbins) log-spaced bins
    base_cols: list[str] = field(default_factory=list)  # null-count targets


class PartialStats:
    def __init__(self, spec: StatsSpec):
        self.spec = spec
        self.n_rows = 0
        self.null_counts: dict[str, int] = {c: 0 for c in spec.base_cols}
        self.numeric: dict[str, dict] = {
            c: {"min": None, "max": None, "tdigest": TDigest()} for c in spec.numeric_cols
        }
        self.hll = HyperLogLog() if spec.id_col else None
        self.list_minmax: list | None = None
        self.group_counts: dict[str, int] = {}
        self.group_list_hist: dict[str, Histogram] = {}
        self.group_len_hist: dict[str, Histogram] = {}

    # ------------------------------------------------------------------ update

    def update(self, batch: pa.Table, flat_view=None) -> "PartialStats":
        """``flat_view``: optional pre-flattened (lengths, flat) of
        ``spec.list_col`` for this exact batch (the evaluator's per-batch
        cache) — skips a second 17 MB flatten."""
        spec = self.spec
        n = len(batch)
        self.n_rows += n
        for c in spec.base_cols:
            if c in batch.column_names:
                self.null_counts[c] += batch.column(c).null_count
        for c in spec.numeric_cols:
            col = batch.column(c)
            mm = pc.min_max(col)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            st = self.numeric[c]
            if lo is not None:
                st["min"] = lo if st["min"] is None else min(st["min"], lo)
                st["max"] = hi if st["max"] is None else max(st["max"], hi)
            vals = pc.drop_null(col).to_numpy(zero_copy_only=False)
            st["tdigest"].add_array(np.asarray(vals, dtype=np.float64))
        if spec.id_col and self.hll is not None:
            ids = pc.drop_null(batch.column(spec.id_col))
            if len(ids):
                self.hll.add_array(ids.combine_chunks())

        if spec.list_col and spec.list_col in batch.column_names:
            # flattened tokens stay in their NATIVE int32: every widening or
            # float temporary here is a 17-35 MB allocation per batch, and 32
            # concurrent actors turn that into a memory-bandwidth wall (this
            # section measured 48 s of a 62 s eval phase before the rewrite)
            if flat_view is not None:
                lengths, flat = flat_view
            else:
                col = batch.column(spec.list_col)
                col = col.chunk(0) if col.num_chunks == 1 else col.combine_chunks()
                lengths = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
                    zero_copy_only=False
                )  # int32, one small copy
                flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
            if len(flat):
                fmin, fmax = float(flat.min()), float(flat.max())
                if self.list_minmax is None:
                    self.list_minmax = [fmin, fmax]
                else:
                    self.list_minmax[0] = min(self.list_minmax[0], fmin)
                    self.list_minmax[1] = max(self.list_minmax[1], fmax)
            if spec.group_col and spec.group_col in batch.column_names:
                groups = batch.column(spec.group_col).to_numpy(zero_copy_only=False)
                groups = np.asarray(
                    ["" if g is None else str(g) for g in groups], dtype=object
                )
                uniq, gidx = np.unique(groups, return_inverse=True)
                lo, hi, nb = spec.list_hist
                # integer binning in int32 with in-place ops: (tok - lo)*nb
                # fits int32 for nb*hi < 2^31 (64 * 50257 « 2^31)
                bins = flat.astype(np.int32, copy=True) if flat.dtype != np.int32 else flat.copy()
                if lo:
                    np.subtract(bins, np.int32(lo), out=bins)
                np.multiply(bins, np.int32(nb), out=bins)
                np.floor_divide(bins, np.int32(hi - lo), out=bins)
                np.clip(bins, 0, nb - 1, out=bins)
                llo, lhi, lnb = spec.len_hist
                ref_len_hist = Histogram.log_spaced(llo, lhi, lnb)
                lbins = np.clip(
                    np.searchsorted(ref_len_hist.edges, lengths, side="right") - 1, 0, lnb - 1
                )
                if len(uniq) == 1:
                    # single-source batch (the common case: files are written
                    # one partition per source) — no combined-index pass
                    combo = np.bincount(bins, minlength=nb)[None, :]
                    lcombo = np.bincount(lbins, minlength=lnb)[None, :]
                    gcounts = np.array([len(gidx)])
                else:
                    parent_g = np.repeat(gidx.astype(np.int32), lengths)
                    np.multiply(parent_g, np.int32(nb), out=parent_g)
                    np.add(parent_g, bins, out=parent_g)
                    combo = np.bincount(parent_g, minlength=len(uniq) * nb).reshape(
                        len(uniq), nb
                    )
                    lcombo = np.bincount(gidx * lnb + lbins, minlength=len(uniq) * lnb).reshape(
                        len(uniq), lnb
                    )
                    gcounts = np.bincount(gidx, minlength=len(uniq))
                for k, g in enumerate(uniq):
                    if g not in self.group_list_hist:
                        self.group_list_hist[g] = Histogram.uniform(lo, hi, nb)
                        self.group_len_hist[g] = Histogram.log_spaced(llo, lhi, lnb)
                        self.group_counts[g] = 0
                    self.group_list_hist[g].counts += combo[k]
                    self.group_len_hist[g].counts += lcombo[k]
                    self.group_counts[g] += int(gcounts[k])
        return self

    # ------------------------------------------------------------------ merge

    def merge(self, other: "PartialStats") -> "PartialStats":
        self.n_rows += other.n_rows
        for c, v in other.null_counts.items():
            self.null_counts[c] = self.null_counts.get(c, 0) + v
        for c, st in other.numeric.items():
            mine = self.numeric.setdefault(
                c, {"min": None, "max": None, "tdigest": TDigest()}
            )
            if st["min"] is not None:
                mine["min"] = st["min"] if mine["min"] is None else min(mine["min"], st["min"])
                mine["max"] = st["max"] if mine["max"] is None else max(mine["max"], st["max"])
            mine["tdigest"].merge(st["tdigest"])
        if other.hll is not None:
            if self.hll is None:
                self.hll = other.hll
            else:
                self.hll.merge(other.hll)
        if other.list_minmax is not None:
            if self.list_minmax is None:
                self.list_minmax = list(other.list_minmax)
            else:
                self.list_minmax[0] = min(self.list_minmax[0], other.list_minmax[0])
                self.list_minmax[1] = max(self.list_minmax[1], other.list_minmax[1])
        for g in other.group_counts:
            if g not in self.group_counts:
                self.group_counts[g] = other.group_counts[g]
                self.group_list_hist[g] = other.group_list_hist[g]
                self.group_len_hist[g] = other.group_len_hist[g]
            else:
                self.group_counts[g] += other.group_counts[g]
                self.group_list_hist[g].merge(other.group_list_hist[g])
                self.group_len_hist[g].merge(other.group_len_hist[g])
        return self

    # ------------------------------------------------------------------ io

    def to_bytes(self) -> bytes:
        return pickle.dumps(self)

    @staticmethod
    def from_bytes(b: bytes) -> "PartialStats":
        return pickle.loads(b)

    def summary(self) -> dict:
        out: dict = {
            "n_rows": self.n_rows,
            "null_rate": {
                c: (v / self.n_rows if self.n_rows else 0.0)
                for c, v in self.null_counts.items()
            },
            "numeric": {},
            "group_counts": dict(self.group_counts),
        }
        for c, st in self.numeric.items():
            td = st["tdigest"]
            out["numeric"][c] = {
                "min": st["min"],
                "max": st["max"],
                "p50": td.quantile(0.5),
                "p95": td.quantile(0.95),
                "p99": td.quantile(0.99),
            }
        if self.hll is not None:
            out["approx_distinct_ids"] = self.hll.estimate()
        if self.list_minmax is not None:
            out["list_min"], out["list_max"] = self.list_minmax
        return out


def sequences_stats_spec(vocab: int, max_len: int) -> StatsSpec:
    return StatsSpec(
        numeric_cols=["n_tok"],
        id_col="doc_id",
        list_col="tokens",
        group_col="source",
        list_hist=(0, vocab, 64),
        len_hist=(1, max_len, 32),
        base_cols=["doc_id", "tokens", "n_tok", "source"],
    )
