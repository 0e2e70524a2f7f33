"""Distribution-drift detection vs reference histograms — actor-pool stage.

≙ the reference's "reference state fetched once, used per submission" pattern
(assay tables /root/reference/Data_Validation_v1.py:277-303; MySQL backfill
state /root/reference/File_Submission_Object.py:812-867 — SURVEY.md §2.4 ST4).

The scorer is a callable CLASS used with
``map_batches(DriftScorer, concurrency=(1, k))`` so the reference histograms
are fetched from the object store ONCE per actor (in ``__init__``), then
reused across batches; per-source observed histograms arrive as small rows
(already merged from batch partials), never raw token values.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from seronet_data_validator_ray.rules.spec import ROW_CROSS_LEVEL, Severity
from seronet_data_validator_ray.stages.evaluate import OUTCOME_SCHEMA
from seronet_data_validator_ray.stattests import chi2_two_sample, ks_two_sample_from_hist


def drift_input_table(per_source: dict) -> pa.Table:
    """{source: {"token_hist": int64[], "n_tok_hist": int64[]}} → small Arrow table."""
    srcs = sorted(per_source)
    return pa.table(
        {
            "source": pa.array(srcs, type=pa.string()),
            "token_hist": pa.array(
                [np.asarray(per_source[s]["token_hist"]).tolist() for s in srcs],
                type=pa.list_(pa.int64()),
            ),
            "n_tok_hist": pa.array(
                [np.asarray(per_source[s]["n_tok_hist"]).tolist() for s in srcs],
                type=pa.list_(pa.int64()),
            ),
        }
    )


class DriftScorer:
    def __init__(self, reference: dict | None = None, ref_ref=None, alpha: float = 0.01,
                 min_effect_d: float = 0.005):
        if ref_ref is not None:
            import ray

            reference = ray.get(ref_ref)
        self.reference = reference or {}
        self.alpha = alpha
        self.min_effect_d = min_effect_d

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out = {c.name: [] for c in OUTCOME_SCHEMA}

        def emit(kind, source, severity, observed, message):
            out["kind"].append(kind)
            out["rule_id"].append("drift.source")
            out["partition"].append(f"__source__:{source}")
            out["row_index"].append(ROW_CROSS_LEVEL)
            out["doc_id"].append(None)
            out["column"].append("tokens")
            out["observed"].append(observed)
            out["severity"].append(severity)
            out["message"].append(message)
            out["n_rows"].append(None)
            out["payload"].append(None)

        for r in rows:
            src = r["source"]
            ref = self.reference.get(src)
            if ref is None:
                emit(
                    "violation", src, Severity.WARNING, src,
                    "no reference histogram for source — drift not evaluated",
                )
                continue
            obs_t = np.asarray(r["token_hist"], dtype=np.float64)
            ref_t = np.asarray(ref["token_hist"], dtype=np.float64)
            stat, dof, p_chi = chi2_two_sample(obs_t, ref_t)
            d, p_ks = ks_two_sample_from_hist(obs_t, ref_t)
            obs_n = np.asarray(r["n_tok_hist"], dtype=np.float64)
            ref_n = np.asarray(ref["n_tok_hist"], dtype=np.float64)
            stat_n, dof_n, p_chi_n = chi2_two_sample(obs_n, ref_n)
            d_n, p_ks_n = ks_two_sample_from_hist(obs_n, ref_n)
            report = {
                "source": src,
                "token": {"chi2": stat, "dof": dof, "p_chi2": p_chi, "ks_d": d, "p_ks": p_ks},
                "n_tok": {
                    "chi2": stat_n, "dof": dof_n, "p_chi2": p_chi_n,
                    "ks_d": d_n, "p_ks": p_ks_n,
                },
            }
            drifted = (
                p_chi < self.alpha and p_ks < self.alpha and d > self.min_effect_d
            ) or (
                p_chi_n < self.alpha and p_ks_n < self.alpha and d_n > self.min_effect_d
            )
            emit("drift_report", src, None, None, json.dumps(report))
            if drifted:
                emit(
                    "violation", src, Severity.WARNING,
                    f"ks_d={max(d, d_n):.4f}",
                    f"distribution drift vs reference (chi2 p={min(p_chi, p_chi_n):.3g}, "
                    f"KS p={min(p_ks, p_ks_n):.3g})",
                )
        return pa.table(out, schema=OUTCOME_SCHEMA)
