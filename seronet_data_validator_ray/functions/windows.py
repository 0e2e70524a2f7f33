"""Windowed / sessionized aggregates over event streams.

The reference is strictly batch with no windowing (SURVEY.md §2.9); these are
the streaming-shaped operators a large-scale pipeline needs, expressed as
Ray Data compositions: tumbling windows = vectorized bucket column +
``groupby`` aggregate; sessionization = hash shuffle on the entity key +
per-group vectorized gap detection in ``map_groups``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_window(
    ds,
    ts_col: str = "ts",
    unit: str = "hour",
    group_cols: list[str] | None = None,
    value_col: str | None = None,
) -> pa.Table:
    """Tumbling-window aggregate: (window_start_us, *group_cols, n, sum_value_cents)."""
    import ray
    from ray.data.aggregate import Count, Sum

    group_cols = group_cols or []

    def prep(batch: pa.Table) -> pa.Table:
        cols = {
            "hour_us": pc.cast(
                pc.cast(pc.floor_temporal(batch[ts_col], unit=unit), pa.int64()), pa.int64()
            )
        }
        for g in group_cols:
            cols[g] = batch[g]
        if value_col is not None:
            cols["value_cents"] = pc.cast(
                pc.round(
                    pc.multiply(pc.cast(batch[value_col], pa.float64()), 100.0),
                    round_mode="half_towards_infinity",  # DuckDB round() parity
                ),
                pa.int64(),
            )
        return pa.table(cols)

    aggs = [Count(alias_name="n")]
    if value_col is not None:
        aggs.append(Sum("value_cents", alias_name="sum_value_cents"))
    out = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["hour_us"] + group_cols)
        .aggregate(*aggs)
    )
    from seronet_data_validator_ray.util import ds_to_table

    names = ["hour_us"] + group_cols + ["n"] + (["sum_value_cents"] if value_col else [])
    tbl = ds_to_table(out)
    if len(tbl) == 0:
        return pa.table({n: [] for n in names})
    return tbl.select(names)


def sessionize(
    ds,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
):
    """Per-user sessionization with an inactivity gap — groupby(user) shuffle +
    vectorized per-group diff/cumsum (no Python loop over events).

    Returns a pa.Table (user_id, n_sessions, n_events, max_session_events).
    """
    import ray

    gap_us = int(gap_minutes * 60 * 1e6)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g[ts_col].astype("int64").to_numpy())
        new_session = np.ones(len(ts), dtype=np.int64)
        if len(ts) > 1:
            new_session[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sess_id = np.cumsum(new_session)
        counts = np.bincount(sess_id)[1:]
        return pd.DataFrame(
            {
                "user_id": [g[user_col].iloc[0]],
                "n_sessions": [int(sess_id[-1])] if len(ts) else [0],
                "n_events": [len(ts)],
                "max_session_events": [int(counts.max())] if len(ts) else [0],
            }
        )

    from seronet_data_validator_ray.util import ds_to_table

    out = ds.groupby(user_col).map_groups(per_group, batch_format="pandas")
    schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_sessions", pa.int64()),
            ("n_events", pa.int64()),
            ("max_session_events", pa.int64()),
        ]
    )
    return ds_to_table(out, schema)
