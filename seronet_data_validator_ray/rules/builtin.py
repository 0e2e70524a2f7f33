"""Builtin rule sets.

``sequences_rules`` is the north-rule contract over the
``(doc_id, tokens, n_tok, source)`` input table (SURVEY.md §7.1);
``documents_rules`` applies the same engine to the driver's ``documents``
test table — demonstrating that the registry is schema-generic, unlike the
reference's hard-coded per-sheet dispatch
(/root/reference/Validation_Rules.py:129-513).
"""

from __future__ import annotations

from seronet_data_validator_ray.datagen import MAX_LEN, VOCAB
from seronet_data_validator_ray.rules.spec import RuleSet, RuleSpec, Severity

DOC_ID_PATTERN = r"^[a-z0-9]+_[0-9]+$"


def sequences_rules(
    vocab: int = VOCAB,
    max_len: int = MAX_LEN,
    allowed_sources_ref: str = "allowed_sources",
) -> RuleSet:
    n_tok_dep = ("range", "n_tok", {"lo": 1, "hi": max_len})
    return RuleSet(
        name="sequences",
        key_column="doc_id",
        rules=[
            RuleSpec(
                "doc_id.not_null", "doc_id", "not_null",
                message="doc_id is missing (empty or null)",
            ),
            RuleSpec(
                "doc_id.format", "doc_id", "id_format",
                {"pattern": DOC_ID_PATTERN, "prefix_of": "source"},
                message="doc_id must match ^<source>_<digits>$",
            ),
            RuleSpec(
                "doc_id.unique", "doc_id", "unique",
                message="doc_id is repeated",
            ),
            RuleSpec(
                "source.referential", "source", "in_set",
                {"ref": allowed_sources_ref},
                message="source not in the allowed set",
            ),
            RuleSpec(
                "source.not_null", "source", "not_null",
                message="source is missing",
            ),
            RuleSpec(
                "tokens.range", "tokens", "list_value_range",
                {"lo": 0, "hi": vocab},
                message=f"token value outside [0, {vocab})",
            ),
            RuleSpec(
                "n_tok.range", "n_tok", "range",
                {"lo": 1, "hi": max_len},
                message=f"n_tok outside [1, {max_len}]",
            ),
            RuleSpec(
                "n_tok.eq_len", "n_tok", "eq_len_of",
                {"of": "tokens", "mode": "list"},
                dependency=n_tok_dep,
                message="n_tok != len(tokens)",
            ),
        ],
    )


def documents_rules(
    allowed_langs=("en", "de", "fr", "es", "zh"),
    allowed_sources_ref: str = "allowed_doc_sources",
    min_chars: int = 1,
    max_chars: int = 100_000,
) -> RuleSet:
    return RuleSet(
        name="documents",
        key_column="doc_id",
        rules=[
            RuleSpec("text.not_null", "text", "not_null", message="text is missing"),
            RuleSpec(
                "lang.enum", "lang", "in_set",
                {"values": list(allowed_langs)},
                message="lang not in allowed language set",
            ),
            RuleSpec(
                "source.referential", "source", "in_set",
                {"ref": allowed_sources_ref},
                message="source not in allowed set",
            ),
            RuleSpec(
                "n_chars.range", "n_chars", "range",
                {"lo": min_chars, "hi": max_chars},
                message=f"n_chars outside [{min_chars}, {max_chars}]",
            ),
            RuleSpec(
                "n_chars.eq_len", "n_chars", "eq_len_of",
                {"of": "text", "mode": "utf8"},
                message="n_chars != length(text)",
            ),
            RuleSpec("doc_id.unique", "doc_id", "unique", message="doc_id is repeated"),
        ],
    )
