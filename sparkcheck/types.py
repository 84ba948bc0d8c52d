"""Core declarative types: expectation configs, suites, validation results.

Semantics mirror the reference (void/great_expectations 0.13.47):
- ExpectationConfiguration: (expectation_type, kwargs, meta) —
  great_expectations/core/expectation_configuration.py
- ExpectationSuite: named JSON-round-trippable list of configs —
  great_expectations/core/expectation_suite.py
- ExpectationValidationResult / ExpectationSuiteValidationResult:
  {success, result, exception_info, meta} + suite statistics —
  great_expectations/core/expectation_validation_result.py:40-68,273-292

This is a from-scratch PySpark-native implementation; no reference code is
copied.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from typing import Any


def _stable_json(obj: Any) -> str:
    """Deterministic JSON for id-hashing (reference: core/id_dict.py:8-23)."""
    return json.dumps(obj, sort_keys=True, default=str)


def kwargs_id(kwargs: dict) -> str:
    return hashlib.md5(_stable_json(kwargs).encode()).hexdigest()


@dataclass(frozen=True)
class MetricKey:
    """Identity of a metric: (name, domain id, value-kwargs id).

    Reference: validator/metric_configuration.py:62-68. This is the dedup key
    that lets one fused aggregation pass serve many expectations.
    """

    name: str
    domain_id: str
    value_id: str

    @classmethod
    def of(cls, name: str, domain_kwargs: dict | None = None, value_kwargs: dict | None = None) -> "MetricKey":
        return cls(name, kwargs_id(domain_kwargs or {}), kwargs_id(value_kwargs or {}))


@dataclass
class ExpectationConfiguration:
    expectation_type: str
    kwargs: dict = field(default_factory=dict)
    meta: dict = field(default_factory=dict)

    def to_dict(self) -> dict:
        return {
            "expectation_type": self.expectation_type,
            "kwargs": self.kwargs,
            "meta": self.meta,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ExpectationConfiguration":
        return cls(d["expectation_type"], dict(d.get("kwargs", {})), dict(d.get("meta", {})))

    @property
    def id(self) -> str:
        return kwargs_id({"t": self.expectation_type, "k": self.kwargs})


@dataclass
class ExpectationSuite:
    expectation_suite_name: str
    expectations: list[ExpectationConfiguration] = field(default_factory=list)
    meta: dict = field(default_factory=dict)

    def add(self, expectation_type: str, **kwargs: Any) -> "ExpectationSuite":
        self.expectations.append(ExpectationConfiguration(expectation_type, kwargs))
        return self

    def to_dict(self) -> dict:
        return {
            "expectation_suite_name": self.expectation_suite_name,
            "expectations": [e.to_dict() for e in self.expectations],
            "meta": self.meta,
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, default=str)

    @classmethod
    def from_dict(cls, d: dict) -> "ExpectationSuite":
        return cls(
            d["expectation_suite_name"],
            [ExpectationConfiguration.from_dict(e) for e in d.get("expectations", [])],
            dict(d.get("meta", {})),
        )

    @classmethod
    def from_json(cls, s: str) -> "ExpectationSuite":
        return cls.from_dict(json.loads(s))


@dataclass
class ExpectationValidationResult:
    """Per-expectation result. JSON contract mirrors the reference EVR
    (core/expectation_validation_result.py:40-68)."""

    success: bool
    expectation_config: ExpectationConfiguration
    result: dict = field(default_factory=dict)
    exception_info: dict = field(
        default_factory=lambda: {
            "raised_exception": False,
            "exception_message": None,
            "exception_traceback": None,
        }
    )
    meta: dict = field(default_factory=dict)

    def to_dict(self) -> dict:
        return {
            "success": self.success,
            "expectation_config": self.expectation_config.to_dict(),
            "result": self.result,
            "exception_info": self.exception_info,
            "meta": self.meta,
        }


@dataclass
class ExpectationSuiteValidationResult:
    """Suite result + statistics (reference:
    core/expectation_validation_result.py:273-292; statistics assembled at
    validator/validator.py:1397-1427)."""

    success: bool
    results: list[ExpectationValidationResult]
    statistics: dict = field(default_factory=dict)
    meta: dict = field(default_factory=dict)

    def to_dict(self) -> dict:
        return {
            "success": self.success,
            "results": [r.to_dict() for r in self.results],
            "statistics": self.statistics,
            "meta": self.meta,
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, default=str)


def build_statistics(results: list[ExpectationValidationResult]) -> dict:
    evaluated = len(results)
    successful = sum(1 for r in results if r.success)
    return {
        "evaluated_expectations": evaluated,
        "successful_expectations": successful,
        "unsuccessful_expectations": evaluated - successful,
        "success_percent": (100.0 * successful / evaluated) if evaluated else None,
    }
