"""Prior-state backfill seam — fetch reference rows for a submission's keys.

≙ ``populate_missing_keys`` (/root/reference/File_Submission_Object.py:812-867):
when a submission omits a sheet, the reference pulls that sheet's rows from
the prior-state MySQL DB with ``SELECT ... WHERE <key> IN (<submission keys>)``
and validates the merged object. Here the same contract is a pluggable
fetcher:

- ``ReferenceFetcher.fetch(table, key_column, keys)`` is the external-DB
  hook. The default ``ParquetReferenceFetcher`` streams a prior-corpus
  parquet table through Ray (keys broadcast ONCE via ``ray.put``, vectorized
  searchsorted probe per batch — the prior corpus can be arbitrarily large,
  the matched rows are submission-sized by construction). A real database
  deployment swaps this class for one that issues the keyed SELECT.
- ``backfill_missing_tables`` gathers the key set from the submitted sheets
  (per-batch distinct, driver merge — submission-scoped, small), fetches,
  writes the fetched sheet to scratch parquet and returns a new TableSpec
  dict, so ``validate_submission`` treats the backfilled sheet exactly like
  a submitted one (row rules + cross-sheet checks).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


class ParquetReferenceFetcher:
    """Default fetcher: the 'prior-state DB' is a directory of parquet tables
    (<prior_dir>/<table>.parquet). Scale posture: the corpus table streams
    through map_batches; only the sorted key array (submission-sized) is
    broadcast."""

    def __init__(self, prior_dir: str, columns: dict[str, list[str]] | None = None):
        self.prior_dir = prior_dir
        self.columns = columns or {}

    def fetch(self, table: str, key_column: str, keys) -> pa.Table:
        import ray
        import ray.data

        from seronet_data_validator_ray.util import ds_to_table

        karr = np.sort(np.asarray(keys))
        keys_ref = ray.put(karr)

        def probe(batch: pa.Table, ref=keys_ref) -> pa.Table:
            k = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            if len(k) == 0:
                return batch.slice(0, 0)
            vals = batch[key_column].to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(k, vals), len(k) - 1)
            return batch.filter(pa.array(k[pos] == vals))

        from seronet_data_validator_ray.sources.parquet import read_fused

        ds = read_fused(
            [os.path.join(self.prior_dir, f"{table}.parquet")],
            columns=self.columns.get(table),
        )
        return ds_to_table(ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True))


@dataclass
class BackfillRule:
    """Backfill `table` (when absent from the submission) with prior rows
    whose `key_column` appears in the submitted `from_table.from_column`."""

    table: str
    key_column: str
    from_table: str
    from_column: str
    ruleset: object  # RuleSet for the backfilled sheet


def _collect_keys(spec, column: str) -> np.ndarray:
    """Distinct keys of one submitted sheet: per-batch unique combiners,
    driver merge (submission-scoped — the reference inlines the same set
    into its SQL IN-list)."""
    import ray.data

    from seronet_data_validator_ray.util import ds_to_table

    def uniq(batch: pa.Table) -> pa.Table:
        return pa.table({column: pa.array(np.unique(batch[column].to_numpy(zero_copy_only=False)))})

    files = os.path.join(spec.input_path, spec.file_glob)
    import glob as _glob

    paths = sorted(_glob.glob(files))
    from seronet_data_validator_ray.sources.parquet import read_fused

    ds = read_fused(paths, columns=[column])
    t = ds_to_table(ds.map_batches(uniq, batch_format="pyarrow", zero_copy_batch=True))
    return np.unique(t[column].to_numpy(zero_copy_only=False))


def backfill_missing_tables(
    tables: dict,
    rules: list[BackfillRule],
    fetcher,
    scratch_dir: str,
) -> dict:
    """Return `tables` plus a TableSpec for every BackfillRule whose sheet is
    absent (present sheets are left untouched, like the reference's
    ``"x.csv" not in self.Data_Object_Table`` guards). Fetched sheets land as
    parquet under ``<scratch_dir>/<table>/`` so the rest of the lifecycle —
    manifests, resume, violations-per-partition — applies unchanged."""
    from seronet_data_validator_ray.pipelines.submission import TableSpec

    out = dict(tables)
    for rule in rules:
        if rule.table in out:
            continue
        src = out.get(rule.from_table)
        if src is None:
            raise KeyError(
                f"backfill of {rule.table!r} needs submitted sheet {rule.from_table!r}"
            )
        keys = _collect_keys(src, rule.from_column)
        fetched = fetcher.fetch(rule.table, rule.key_column, keys)
        tdir = os.path.join(scratch_dir, rule.table)
        os.makedirs(tdir, exist_ok=True)
        path = os.path.join(tdir, "part-backfill-0000.parquet")
        pq.write_table(fetched, path + ".tmp")
        os.replace(path + ".tmp", path)
        out[rule.table] = TableSpec(input_path=tdir, ruleset=rule.ruleset)
    return out
