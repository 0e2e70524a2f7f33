"""Declarative rule registry.

The reference dispatches rules imperatively — per-sheet ``elif header_name in
[...]`` chains calling ~15 check primitives on a mutable Submission_Object
(/root/reference/Validation_Rules.py:129-513). Here the same semantics are a
*data structure*: a list of :class:`RuleSpec` compiled once per worker into a
fused vectorized evaluator (SURVEY.md §2.3 "engine mapping").

Severity model (≙ Message_Type, /root/reference/File_Submission_Object.py:272,
287, 423, 572): ``Error`` / ``Warning`` / ``Not Validated``. A rule with a
``dependency`` is only evaluated on rows where the dependency predicate holds;
rows where it fails get a ``Not Validated`` violation instead (≙
unknown_list_dependancy / unknow_number_dependancy,
/root/reference/File_Submission_Object.py:276-287).

Sentinel row indices (≙ /root/reference/File_Submission_Object.py:263, 272,
354; Validation_Rules.py:83-97):
  >= 0  : data-row violation (0-based row index within the source file)
  -1    : whole-column / schema-level violation
  -3    : table-level (duplicate-ID) violation
  -5    : cross-partition / source-level violation
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

ROW_COLUMN_LEVEL = -1
ROW_TABLE_LEVEL = -3
ROW_CROSS_LEVEL = -5


class Severity:
    ERROR = "Error"
    WARNING = "Warning"
    NOT_VALIDATED = "Not Validated"


@dataclass(frozen=True)
class RuleSpec:
    """One declarative rule over one (primary) column.

    kind — name of a vectorized kernel in
    :mod:`seronet_data_validator_ray.rules.kernels`; ``params`` are
    kernel-specific. ``dependency`` is an optional ``(kind, column, params)``
    predicate gating evaluation (M5/M20 semantics).
    """

    rule_id: str
    column: str
    kind: str
    params: dict = field(default_factory=dict)
    severity: str = Severity.ERROR
    message: str = ""
    dependency: tuple[str, str, dict] | None = None
    # custom vectorized kernel fn(table, column, params, ctx) -> (mask, observed);
    # carried BY VALUE through cloudpickle so user rules reach every Ray worker
    # without a registry import on the worker side (SURVEY §2.10)
    kernel: Any = None

    def describe(self) -> str:
        return self.message or f"{self.column} failed {self.kind} {self.params}"


@dataclass
class RuleSet:
    """A named collection of rules for one table schema."""

    name: str
    rules: list[RuleSpec]
    key_column: str | None = None  # the uniqueness / provenance key (e.g. doc_id)

    def row_local(self) -> list[RuleSpec]:
        return [r for r in self.rules if r.kind not in ("unique",)]

    def unique_rules(self) -> list[RuleSpec]:
        return [r for r in self.rules if r.kind == "unique"]
