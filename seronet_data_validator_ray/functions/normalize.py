"""Fuzzy status normalization (SURVEY §2.2 M21).

≙ check_for_typo (/root/reference/Data_Validation_v2.py:563-591): the
reference fuzzy-matches free-typed status strings against a canonical set
before routing submissions. Here the semantics are pinned exactly so a
DuckDB ``levenshtein`` oracle can reproduce them:

    canonical(s) = the FIRST canonical (in declared order) whose
    levenshtein(lower(s), lower(canonical)) <= max_dist, else s unchanged.

Execution is a stateless ``map_batches`` stage that dictionary-encodes the
batch and computes the edit distance once per *distinct* value (vocab-sized
work, not row-sized) — no per-row Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _levenshtein(a: str, b: str) -> int:
    """Standard unit-cost edit distance (matches DuckDB's levenshtein)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def canonicalize(values: list, canon: list[str], max_dist: int = 2) -> list:
    """Map each distinct value to its canonical form (first match wins)."""
    canon_low = [c.lower() for c in canon]
    out = []
    for v in values:
        if v is None:
            out.append(None)
            continue
        lv = v.lower()
        mapped = v
        for c, cl in zip(canon, canon_low):
            if _levenshtein(lv, cl) <= max_dist:
                mapped = c
                break
        out.append(mapped)
    return out


def normalize_column_batch(
    batch: pa.Table, column: str, canon: list[str], max_dist: int = 2, out_col: str = "canonical"
) -> pa.Table:
    """Append the canonicalized column; distance computed per distinct value."""
    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    import pyarrow.compute as pc

    enc = col.dictionary_encode()
    mapped = canonicalize(enc.dictionary.to_pylist(), canon, max_dist)
    # null rows encode as null indices; fill with -1 BEFORE to_numpy (a null
    # int index would otherwise surface as NaN and break the fancy lookup)
    idx = pc.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False).astype(np.int64)
    lookup = np.asarray(mapped, dtype=object)
    vals = np.where(idx >= 0, lookup[np.maximum(idx, 0)], None)
    return batch.append_column(out_col, pa.array(vals.tolist(), type=pa.string()))
