"""sparkcheck — a from-scratch PySpark-native expectation/validation engine.

Reproduces the declarative expect_column_* contract of the reference
(void/great_expectations 0.13.47) with a Spark-first architecture: every
metric in a suite compiles into slots of ONE fused DataFrame aggregation per
domain (SURVEY.md §4), per-partition verdicts via rollup, sketches
(HLL++/percentile_approx) as distributed aggregates, and Arrow pandas UDFs
for per-row audio invariants. No reference code is copied.
"""

from . import splitters
from .checkpoint import Checkpoint, run_checkpoint
from .io import read_table, read_table_delta, snapshots, write_table
from .profiler import build_reference_profile, suite_from_profile
from .runner import ValidationRun, resolve_evaluation_parameters, validate
from .streaming import StreamValidator, validate_stream
from .types import (
    ExpectationConfiguration,
    ExpectationSuite,
    ExpectationSuiteValidationResult,
    ExpectationValidationResult,
)
from .validator import Validator

__version__ = "0.1.0"

__all__ = [
    "Checkpoint",
    "ExpectationConfiguration",
    "ExpectationSuite",
    "ExpectationSuiteValidationResult",
    "ExpectationValidationResult",
    "StreamValidator",
    "ValidationRun",
    "Validator",
    "build_reference_profile",
    "read_table",
    "read_table_delta",
    "resolve_evaluation_parameters",
    "run_checkpoint",
    "snapshots",
    "splitters",
    "suite_from_profile",
    "validate",
    "validate_stream",
    "write_table",
]
