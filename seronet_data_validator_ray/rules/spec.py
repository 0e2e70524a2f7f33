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


def ruleset_from_dict(obj: dict) -> RuleSet:
    """Build a RuleSet from plain data (parsed JSON/YAML) — the declarative
    config surface a deployment edits without code:

        {"name": "orders", "key_column": "order_id",
         "rules": [{"rule_id": "status.enum", "column": "status",
                    "kind": "in_set", "params": {"values": ["O","F","P"]},
                    "severity": "Error", "message": "...",
                    "dependency": ["not_null", "status", {}]}]}

    ≙ the reference's per-sheet rule tables (Validation_Rules.py:129-513)
    expressed as data. Unknown kernel kinds fail at evaluation time with the
    registry's named KeyError; `kernel` callables are code-only by design
    (no eval of config strings)."""
    rules = []
    for r in obj.get("rules", []):
        dep = r.get("dependency")
        rules.append(
            RuleSpec(
                rule_id=r["rule_id"],
                column=r["column"],
                kind=r["kind"],
                params=dict(r.get("params", {})),
                severity=r.get("severity", Severity.ERROR),
                message=r.get("message", ""),
                dependency=tuple(dep) if dep else None,
            )
        )
    return RuleSet(name=obj["name"], rules=rules, key_column=obj.get("key_column"))


def rulesets_from_json(path: str) -> dict[str, RuleSet]:
    """Load {sheet/table name -> RuleSet} from a JSON file of the
    ruleset_from_dict shape (top level: {"<table>": {...}, ...})."""
    import json

    with open(path) as f:
        data = json.load(f)
    return {name: ruleset_from_dict(obj) for name, obj in data.items()}
