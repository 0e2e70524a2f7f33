"""Checkpoint manifest — per-partition lineage + metrics, idempotent resume.

≙ the reference's summary-workbook status machine: a re-run reads the summary,
skips already-processed submissions, and reprocesses updated ones
(/root/reference/Data_Validation_v2.py:170-192, 563-591;
get_data_to_check.py:4-22). Here:

- one JSON file per completed partition under ``<output>/manifest/`` written
  via temp-file + atomic rename AFTER that partition's outputs have landed,
- each entry records lineage (input file, rows, rule-set hash) + verdict +
  metrics, and points at a pickled per-partition stats sidecar (so global
  per-source drift histograms can be rebuilt on resume without re-reading
  completed partitions),
- job start diffs the input listing against the manifest → pending set; a
  partition whose rule-set hash changed is re-validated.
"""

from __future__ import annotations

import hashlib
import json
import os
import pickle
import time


def rule_set_hash(rules) -> str:
    blob = json.dumps(
        [
            [r.rule_id, r.column, r.kind, sorted(r.params.items()), r.severity,
             list(r.dependency or [])]
            for r in sorted(rules, key=lambda r: r.rule_id)
        ],
        default=str,
    )
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def _safe(name: str) -> str:
    return "".join(c if c.isalnum() or c in "-._" else "_" for c in name)


class Manifest:
    def __init__(self, output_dir: str):
        self.output_dir = output_dir
        self.manifest_dir = os.path.join(output_dir, "manifest")
        self.stats_dir = os.path.join(output_dir, "stats")
        os.makedirs(self.manifest_dir, exist_ok=True)
        os.makedirs(self.stats_dir, exist_ok=True)

    # ------------------------------------------------------------------ read

    def completed(self) -> dict[str, dict]:
        out = {}
        for fn in os.listdir(self.manifest_dir):
            if not fn.endswith(".json"):
                continue
            try:
                with open(os.path.join(self.manifest_dir, fn)) as f:
                    e = json.load(f)
                out[e["partition"]] = e
            except (json.JSONDecodeError, KeyError, OSError):
                continue  # torn write → treated as not completed
        return out

    def pending(
        self,
        partitions: list[str],
        rules_hash: str,
        fingerprints: dict[str, str] | None = None,
    ) -> list[str]:
        """Partitions needing (re)validation. A completed partition is skipped
        only when BOTH its rule-set hash and its input-file fingerprint
        (rows + mtime) match — a regenerated input with the same name must be
        reprocessed, like the reference's updated-submission logic
        (/root/reference/Data_Validation_v2.py:170-192)."""
        done = self.completed()
        out = []
        for p in partitions:
            e = done.get(p)
            if e is None or e.get("rule_set_hash") != rules_hash:
                out.append(p)
                continue
            if fingerprints is not None and e.get("input_fingerprint") != fingerprints.get(p):
                out.append(p)
        return out

    # ------------------------------------------------------------------ write

    def mark(self, partition: str, entry: dict, stats_partial=None) -> None:
        entry = dict(entry)
        entry["partition"] = partition
        entry["completed_at"] = time.time()
        if stats_partial is not None:
            spath = os.path.join(self.stats_dir, _safe(partition) + ".pkl")
            with open(spath + ".tmp", "wb") as f:
                pickle.dump(stats_partial, f)
            os.replace(spath + ".tmp", spath)
            entry["stats_sidecar"] = spath
        path = os.path.join(self.manifest_dir, _safe(partition) + ".json")
        with open(path + ".tmp", "w") as f:
            json.dump(entry, f, default=str)
        os.replace(path + ".tmp", path)

    def load_stats(self, partition: str):
        path = os.path.join(self.stats_dir, _safe(partition) + ".pkl")
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            return pickle.load(f)

    # ------------------------------------------------------------------ global checks

    def global_entry(self, name: str) -> dict | None:
        path = os.path.join(self.manifest_dir, f"__global__{_safe(name)}.json")
        if not os.path.exists(path):
            return None
        try:
            with open(path) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError):
            return None

    def mark_global(self, name: str, entry: dict) -> None:
        entry = dict(entry)
        entry["completed_at"] = time.time()
        path = os.path.join(self.manifest_dir, f"__global__{_safe(name)}.json")
        with open(path + ".tmp", "w") as f:
            json.dump(entry, f, default=str)
        os.replace(path + ".tmp", path)


def fileset_hash(partitions: list[str]) -> str:
    return hashlib.sha256("\n".join(sorted(partitions)).encode()).hexdigest()[:16]
