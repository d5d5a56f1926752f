"""tag_spark — a PySpark-native schema + constraint validation engine.

A from-scratch re-expression of the validation semantics of dhowden/tag
(strict versioned vocabulary checks, field-level decode constraints,
duplicate handling, metadata-invariant checksums, canonical normalization)
as table-level checks over transcript tables
``(conv_id, turn_idx, role, text, tool, ts)``.

Design bets (see SURVEY.md §4):
 - everything compiles to Spark SQL expressions / built-in functions;
 - no custom Catalyst rules, no per-row Python UDFs in the hot path;
 - one scan + one conv_id shuffle for the whole row+window check suite;
 - pandas/Arrow UDAFs only for the per-partition stats sketches.
"""

from tag_spark.schema import (
    TRANSCRIPT_SCHEMA,
    VIOLATION_SCHEMA,
    VERDICT_SCHEMA,
    DEFAULT_ROLES,
    DEFAULT_TOOLS,
)
from tag_spark.operators.checks import (
    Check,
    NotNull,
    NonEmpty,
    InSet,
    InRange,
    LengthMax,
    RegexDisallow,
    Conditional,
    SqlPredicate,
    Unique,
    ContiguousIndex,
    Monotonic,
    RefIntegrity,
)
from tag_spark.operators.suite import ValidationSuite, ValidationResult, default_transcript_suite

__all__ = [
    "TRANSCRIPT_SCHEMA",
    "VIOLATION_SCHEMA",
    "VERDICT_SCHEMA",
    "DEFAULT_ROLES",
    "DEFAULT_TOOLS",
    "Check",
    "NotNull",
    "NonEmpty",
    "InSet",
    "InRange",
    "LengthMax",
    "RegexDisallow",
    "Conditional",
    "SqlPredicate",
    "Unique",
    "ContiguousIndex",
    "Monotonic",
    "RefIntegrity",
    "ValidationSuite",
    "ValidationResult",
    "default_transcript_suite",
]

__version__ = "0.1.0"
