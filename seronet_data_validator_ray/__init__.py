"""seronet_data_validator_ray — a Ray-Data-native schema + constraint validation engine.

Built from scratch (NOT a port) with the validation capabilities of
CBIIT/seronet-data-validator (reference at /root/reference, see SURVEY.md),
re-expressed as streaming ``ray.data.Dataset`` pipelines of ``map_batches``
over zero-copy Arrow batches, for Parquet tables of pre-tokenized training
sequences ``(doc_id: string, tokens: list<int32>, n_tok: int32, source: string)``.

Public API:

- :func:`seronet_data_validator_ray.pipelines.validate.validate` — end-to-end
  validation: schema gate → fused row-local rules + stats partials →
  uniqueness shuffle → drift actors → violations / verdicts / manifest.
- :mod:`seronet_data_validator_ray.rules` — declarative rule registry
  (RuleSpec + vectorized kernels).
- :mod:`seronet_data_validator_ray.functions` — training-data-pipeline
  operators: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  embedding), similarity search, text analysis, windowed aggregates,
  multimodal plumbing.

No module in this package calls ``ray.init()`` / ``ray.shutdown()``; the
caller (driver, bench.py, pytest fixture) owns the Ray session.
"""

from seronet_data_validator_ray.rules.spec import RuleSpec, Severity  # noqa: F401
from seronet_data_validator_ray.pipelines.validate import validate, ValidationResult  # noqa: F401

__version__ = "0.1.0"
