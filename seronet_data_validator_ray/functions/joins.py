"""Join / lookup operators (SURVEY.md §2.5).

Scale pattern: the *small* side of every reference join (assay tables, ID
maps) is broadcast — ``ray.put`` once, fetched once per actor — and the join
runs vectorized per batch with ``pyarrow.Table.join`` / ``pc.is_in``; no
shuffle. Large-large joins co-partition by key (bucket groupby) instead
(see dedup/ngram pipelines for the pattern).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


class BroadcastJoiner:
    """Actor-pool stage: left join each batch against a broadcast small table
    (≙ check_merge importing dependency columns from a sibling sheet,
    /root/reference/File_Submission_Object.py:222-248)."""

    def __init__(self, right_ref=None, right: pa.Table | None = None, keys=None,
                 right_keys=None, join_type: str = "left outer"):
        if right_ref is not None:
            import ray

            right = ray.get(right_ref)
        self.right = right
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.right_keys = (
            [right_keys] if isinstance(right_keys, str) else list(right_keys or self.keys)
        )
        self.join_type = join_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.join(
            self.right, keys=self.keys, right_keys=self.right_keys, join_type=self.join_type
        )


def broadcast_key_set(table_or_array) -> set:
    if isinstance(table_or_array, pa.Table):
        table_or_array = table_or_array.column(0)
    return table_or_array


class SemiAntiFilter:
    """Broadcast semi/anti join as a vectorized membership filter
    (≙ the anti-join referential check check_assay_special,
    /root/reference/File_Submission_Object.py:289-300)."""

    def __init__(self, keys_ref=None, keys=None, column: str = None, anti: bool = True):
        if keys_ref is not None:
            import ray

            keys = ray.get(keys_ref)
        self.keys = keys
        self.column = column
        self.anti = anti

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.column)
        member = pc.is_in(col, value_set=pa.array(self.keys, type=col.type))
        mask = pc.invert(member) if self.anti else member
        return batch.filter(pc.fill_null(mask, self.anti))


def reconcile_keys(ds_left, ds_right, left_key: str, right_key: str):
    """Symmetric key reconciliation: keys present on exactly one side
    (≙ shipping-vs-aliquot full-outer + non-'both' filter,
    /root/reference/Data_Validation_v2.py:262-267, and check_map_ids
    /root/reference/File_Submission_Object.py:758-784).

    Both sides are projected to their key column before any data moves, then
    reduced to distinct keys per side (small), compared on the driver.
    Returns a pa.Table (key_value: string, present_in: 'left_only'|'right_only').
    """
    lk = set(ds_left.unique(left_key))
    rk = set(ds_right.unique(right_key))
    rows = [{"key_value": str(k), "present_in": "left_only"} for k in lk - rk]
    rows += [{"key_value": str(k), "present_in": "right_only"} for k in rk - lk]
    schema = pa.schema([("key_value", pa.string()), ("present_in", pa.string())])
    return pa.Table.from_pylist(rows, schema=schema) if rows else schema.empty_table()
