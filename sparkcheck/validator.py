"""Interactive validator: `v.expect_column_values_to_not_be_null(column=...)`.

Mirrors the reference's entry point A (Validator.__getattr__ dynamic dispatch,
great_expectations/validator/validator.py:223-351): each expect_* call builds
an ExpectationConfiguration, validates it immediately, records it into the
suite, and returns the EVR.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from .expectations.defs import REGISTRY
from .runner import ValidationRun
from .types import (
    ExpectationConfiguration,
    ExpectationSuite,
    ExpectationSuiteValidationResult,
    ExpectationValidationResult,
)


class Validator:
    def __init__(
        self,
        df: DataFrame,
        *,
        tables: dict[str, DataFrame] | None = None,
        suite_name: str = "default",
        result_format: Any = "BASIC",
        catch_exceptions: bool = True,
    ) -> None:
        self.df = df
        self.tables = tables or {}
        self.suite = ExpectationSuite(suite_name)
        self.result_format = result_format
        self.catch_exceptions = catch_exceptions

    def __getattr__(self, name: str):
        if name.startswith("expect_") and name in REGISTRY:
            def _call(**kwargs: Any) -> ExpectationValidationResult:
                config = ExpectationConfiguration(name, kwargs)
                one = ExpectationSuite("_interactive", [config])
                run = ValidationRun(
                    self.df, tables=self.tables,
                    result_format=kwargs.get("result_format", self.result_format),
                    catch_exceptions=kwargs.get("catch_exceptions", self.catch_exceptions))
                result = run.run(one)
                self.suite.expectations.append(config)
                return result.results[0]
            return _call
        raise AttributeError(name)

    def head(self, n_rows: int = 5, fetch_all: bool = False) -> list:
        """table.head metric (reference
        expectations/metrics/table_metrics/table_head.py:139-153): the first
        n rows of the validated batch, as Rows. Profiler/debug aid —
        `fetch_all` collects the whole batch (driver-memory hazard, same as
        the reference)."""
        if fetch_all:
            return self.df.collect()
        return self.df.head(n_rows)

    def validate(
        self,
        suite: ExpectationSuite | None = None,
        *,
        result_format: Any = None,
        per_partition: bool = False,
        unique_strategy: str = "exact",
    ) -> ExpectationSuiteValidationResult:
        from .runner import validate as _validate
        return _validate(
            self.df, suite or self.suite, tables=self.tables,
            result_format=result_format or self.result_format,
            catch_exceptions=self.catch_exceptions,
            per_partition=per_partition, unique_strategy=unique_strategy)
