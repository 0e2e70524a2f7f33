from seronet_data_validator_ray.rules.spec import RuleSpec, Severity, RuleSet  # noqa: F401
from seronet_data_validator_ray.rules.builtin import sequences_rules, documents_rules  # noqa: F401
