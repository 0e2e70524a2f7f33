"""Mergeable sketches for per-column statistics.

The reference engine has no sketches (SURVEY.md §2.6); the north rule adds
HyperLogLog cardinality and t-digest quantiles as engine-native per-column
stats. All sketches here are:

- **partial-computable** per Arrow batch (vectorized numpy),
- **associatively mergeable** (so they flow through ``map_batches`` partials
  → small ``groupby`` merge, never a full shuffle of raw values),
- **pickle-serializable** (carried in a binary column between stages).

Hashing uses polars' stable 64-bit hash (deterministic for a fixed seed and
polars version, consistent across processes — required for HLL / MinHash
partials computed on different workers to merge correctly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


# --------------------------------------------------------------------------- hashing

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_SPLITMIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_C2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * _SPLITMIX_C1
    x = (x ^ (x >> np.uint64(27))) * _SPLITMIX_C2
    return x ^ (x >> np.uint64(31))


def hash64(arr: "pa.Array | pa.ChunkedArray | np.ndarray | list", seed: int = 0) -> np.ndarray:
    """Stable vectorized 64-bit hash → uint64 ndarray. Pure numpy (FNV-1a over
    string bytes, iterated by character position; splitmix64 finalizer for
    integers) — deterministic across processes/nodes, no heavy imports in
    worker processes."""
    if isinstance(arr, (list, np.ndarray)):
        arr = pa.array(arr)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    with np.errstate(over="ignore"):
        if pa.types.is_integer(arr.type) or pa.types.is_floating(arr.type):
            vals = np.asarray(arr.cast(pa.int64()).to_numpy(zero_copy_only=False))
            h = _splitmix64(vals.view(np.uint64) ^ _splitmix64(np.uint64(seed) + np.uint64(1)))
            return h
        arr = arr.cast(pa.large_string()) if pa.types.is_string(arr.type) else arr
        if not (pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)):
            arr = arr.cast(pa.large_binary())
        null_mask = np.zeros(len(arr), dtype=bool)
        if arr.null_count:
            null_mask = np.asarray(pa.compute.is_null(arr).to_numpy(zero_copy_only=False))
            arr = pa.compute.fill_null(arr, "")
        buffers = arr.buffers()
        offsets = np.frombuffer(buffers[1], dtype=np.int64, count=len(arr) + 1 + arr.offset)
        offsets = offsets[arr.offset : arr.offset + len(arr) + 1]
        data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
        starts = offsets[:-1].astype(np.int64)
        lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
        h = np.full(len(arr), _FNV_OFFSET ^ _splitmix64(np.array([seed], np.uint64))[0], dtype=np.uint64)
        maxlen = int(lengths.max()) if len(lengths) else 0
        for pos in range(maxlen):
            m = lengths > pos
            if not m.any():
                break
            ch = data[starts[m] + pos].astype(np.uint64)
            h[m] = (h[m] ^ ch) * _FNV_PRIME
        # mix in length so "a"+"" and "a" with trailing behavior differ robustly
        h = _splitmix64(h ^ lengths.view(np.uint64))
        h[null_mask] = _splitmix64(np.full(int(null_mask.sum()), np.uint64(seed), dtype=np.uint64))
        return h


# --------------------------------------------------------------------------- HyperLogLog

class HyperLogLog:
    """Dense HyperLogLog with 2**p registers (default p=12 → ~1.6% rel. error).

    Engine-native analog of the reference's exact distinct-ID collection
    (``get_all_unique_ids``, /root/reference/File_Submission_Object.py:624-652)
    at scales where an exact distinct is a full shuffle.
    """

    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        if len(h) == 0:
            return self
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rem = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = number of leading zeros in the remaining 64-p bits, + 1
        # leading zero count via bit_length: lz = 64 - bit_length(rem)
        bl = np.zeros(len(rem), dtype=np.int64)
        r = rem.copy()
        # vectorized bit_length for uint64
        for shift in (32, 16, 8, 4, 2, 1):
            mask = r >= (np.uint64(1) << np.uint64(shift))
            bl[mask] += shift
            r[mask] >>= np.uint64(shift)
        bl[rem > 0] += 1
        rank = (64 - bl + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def add_array(self, arr, seed: int = 0) -> "HyperLogLog":
        return self.add_hashes(hash64(arr, seed=seed))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / float(np.sum(np.exp2(-self.registers.astype(np.float64))))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                est = m * np.log(m / zeros)  # linear counting for small range
        return float(est)


# --------------------------------------------------------------------------- t-digest

def _k1(q: np.ndarray, delta: float) -> np.ndarray:
    """t-digest scale function k1 (arcsine) — more resolution at the tails."""
    return delta / (2.0 * np.pi) * np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0)


class TDigest:
    """Merging t-digest (Dunning's k1 scale function), numpy-backed.

    Batches are pre-reduced with an equal-weight vectorized pass before the
    (small) centroid merge loop, so adding a 100k-value batch costs one sort
    + reduceat, not a Python loop over values.
    """

    __slots__ = ("delta", "means", "weights", "count", "vmin", "vmax")

    def __init__(self, delta: float = 200.0):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.count = 0.0
        self.vmin = np.inf
        self.vmax = -np.inf

    # -- internals

    @staticmethod
    def _prereduce(values: np.ndarray, max_chunks: int = 512):
        """Sort values and reduce to ≤ max_chunks weighted centroids."""
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return np.empty(0), np.empty(0)
        v.sort()
        if len(v) <= max_chunks:
            return v, np.ones(len(v))
        edges = np.linspace(0, len(v), max_chunks + 1).astype(np.int64)
        edges = np.unique(edges)
        sums = np.add.reduceat(v, edges[:-1])
        cnts = np.diff(edges).astype(np.float64)
        return sums / cnts, cnts

    def _merge_centroids(self, means: np.ndarray, weights: np.ndarray):
        if len(means) == 0:
            return
        import math

        am = np.concatenate([self.means, means])
        aw = np.concatenate([self.weights, weights])
        order = np.argsort(am, kind="stable")
        am, aw = am[order].tolist(), aw[order].tolist()
        total = float(sum(aw))
        kf = self.delta / (2.0 * math.pi)

        def k1(q: float) -> float:  # scalar k1 — no array allocation per centroid
            return kf * math.asin(2.0 * min(max(q, 0.0), 1.0) - 1.0)

        out_m: list[float] = []
        out_w: list[float] = []
        cum = 0.0
        cur_m, cur_w = am[0], aw[0]
        k_lo = k1(0.0)
        for i in range(1, len(am)):
            q_hi = (cum + cur_w + aw[i]) / total
            if k1(q_hi) - k_lo <= 1.0:
                cur_m = (cur_m * cur_w + am[i] * aw[i]) / (cur_w + aw[i])
                cur_w += aw[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                cum += cur_w
                k_lo = k1(cum / total)
                cur_m, cur_w = am[i], aw[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.array(out_m)
        self.weights = np.array(out_w)

    # -- public

    def add_array(self, values: np.ndarray) -> "TDigest":
        m, w = self._prereduce(values)
        if len(m) == 0:
            return self
        self.count += w.sum()
        self.vmin = min(self.vmin, float(m[0]))
        self.vmax = max(self.vmax, float(m[-1]))
        self._merge_centroids(m, w)
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        if other.count == 0:
            return self
        self.count += other.count
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self._merge_centroids(other.means, other.weights)
        return self

    def quantile(self, q: float) -> float:
        if self.count == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * self.count
        if target <= cum[0]:
            return self.vmin if q <= 0 else float(
                np.interp(target, [0, cum[0]], [self.vmin, self.means[0]])
            )
        if target >= cum[-1]:
            return self.vmax if q >= 1 else float(
                np.interp(target, [cum[-1], self.count], [self.means[-1], self.vmax])
            )
        return float(np.interp(target, cum, self.means))


# --------------------------------------------------------------------------- histograms

class Histogram:
    """Fixed-bin mergeable histogram (the drift primitive, SURVEY.md §2.4 ST4)."""

    __slots__ = ("edges", "counts")

    def __init__(self, edges: np.ndarray, counts: np.ndarray | None = None):
        self.edges = np.asarray(edges, dtype=np.float64)
        self.counts = (
            np.zeros(len(self.edges) - 1, dtype=np.int64)
            if counts is None
            else np.asarray(counts, dtype=np.int64)
        )

    @classmethod
    def uniform(cls, lo: float, hi: float, nbins: int) -> "Histogram":
        return cls(np.linspace(lo, hi, nbins + 1))

    @classmethod
    def log_spaced(cls, lo: float, hi: float, nbins: int) -> "Histogram":
        return cls(np.exp(np.linspace(np.log(max(lo, 1e-9)), np.log(hi), nbins + 1)))

    def add_array(self, values: np.ndarray) -> "Histogram":
        if len(values) == 0:
            return self
        v = np.asarray(values, dtype=np.float64)
        idx = np.searchsorted(self.edges, v, side="right") - 1
        np.clip(idx, 0, len(self.counts) - 1, out=idx)
        self.counts += np.bincount(idx, minlength=len(self.counts)).astype(np.int64)
        return self

    def merge(self, other: "Histogram") -> "Histogram":
        self.counts += other.counts
        return self

    @property
    def total(self) -> int:
        return int(self.counts.sum())
