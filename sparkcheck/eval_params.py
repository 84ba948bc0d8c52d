"""Evaluation-parameter expression evaluator.

The reference's `$PARAMETER` values may be *expressions*, not just names
(core/evaluation_parameters.py:34-120): arithmetic (+ - * / ** with
parentheses), `round`/`trunc`/`abs`, and the temporal builtins `now()`,
`datetime(...)`, `timedelta(...)` — e.g.
``{"$PARAMETER": "now() - timedelta(weeks=52)"}``. Names resolve from the
caller-supplied parameter dict.

This implementation is a restricted AST walk (ast.parse + node whitelist) —
no eval(), no attribute access, no subscripts, no calls outside the
whitelist — so a hostile expression string cannot execute anything.
"""

from __future__ import annotations

import ast
import datetime
import math
import re
from typing import Any

_FUNCS: dict[str, Any] = {
    "now": datetime.datetime.now,
    "datetime": datetime.datetime,
    "timedelta": datetime.timedelta,
    "round": round,
    "trunc": math.trunc,
    "abs": abs,
    "min": min,
    "max": max,
}

def _guarded_pow(a: Any, b: Any) -> Any:
    # unbounded ** can hang/OOM the driver (10**10**10); parameters never
    # legitimately need huge exponents
    if not isinstance(a, (int, float)) or not isinstance(b, (int, float)):
        raise ParameterExpressionError("** requires numbers")
    if abs(b) > 64 or abs(a) > 1e9:
        raise ParameterExpressionError("** operands out of allowed range")
    return a ** b


def _guarded_mult(a: Any, b: Any) -> Any:
    # sequence repetition ('a' * 10**9) is a driver-memory bomb; parameters
    # only need numeric (and timedelta) multiplication
    if isinstance(a, (str, list, tuple)) or isinstance(b, (str, list, tuple)):
        raise ParameterExpressionError("sequence repetition not allowed")
    return a * b


_BINOPS = {
    ast.Add: lambda a, b: a + b,
    ast.Sub: lambda a, b: a - b,
    ast.Mult: _guarded_mult,
    ast.Div: lambda a, b: a / b,
    ast.Pow: _guarded_pow,
    # the reference's grammar spells exponentiation '^' (core/
    # evaluation_parameters.py: expop = Literal("^")); Python parses that
    # as BitXor, so map it to the same guarded pow. (Known divergence:
    # Python's ^ is left-associative while the reference's ^ is
    # right-associative — only chains like 2^3^2 differ; use parentheses.)
    ast.BitXor: _guarded_pow,
    ast.Mod: lambda a, b: a % b,
}

_UNARY = {ast.USub: lambda a: -a, ast.UAdd: lambda a: +a}


class ParameterExpressionError(ValueError):
    pass


def _ev(node: ast.AST, params: dict) -> Any:
    if isinstance(node, ast.Expression):
        return _ev(node.body, params)
    if isinstance(node, ast.Constant):
        if isinstance(node.value, (int, float, str, bool)) or node.value is None:
            return node.value
        raise ParameterExpressionError(f"literal not allowed: {node.value!r}")
    if isinstance(node, ast.Name):
        if node.id in params:
            return params[node.id]
        raise KeyError(node.id)
    if isinstance(node, ast.BinOp) and type(node.op) in _BINOPS:
        return _BINOPS[type(node.op)](_ev(node.left, params), _ev(node.right, params))
    if isinstance(node, ast.UnaryOp) and type(node.op) in _UNARY:
        return _UNARY[type(node.op)](_ev(node.operand, params))
    if isinstance(node, ast.Call):
        if not isinstance(node.func, ast.Name) or node.func.id not in _FUNCS:
            raise ParameterExpressionError(
                f"function not allowed: {ast.dump(node.func)}")
        args = [_ev(a, params) for a in node.args]
        kwargs = {kw.arg: _ev(kw.value, params) for kw in node.keywords
                  if kw.arg is not None}
        return _FUNCS[node.func.id](*args, **kwargs)
    raise ParameterExpressionError(f"node not allowed: {type(node).__name__}")


# ------------------------------------------------------------------ URNs
#
# The reference resolves `urn:great_expectations:...` identifiers inside
# $PARAMETER expressions (core/urn.py grammar; core/evaluation_parameters.py
# :105-110 embeds them as idents, :343-369 looks a lone URN up in the
# supplied evaluation_parameters dict — the data context pre-populates those
# keys from dependent validation results). Here the committed verdict store
# plays the data-context role: `parameters_from_verdicts` keys are the
# lookup table, and this shim translates a validations URN into those keys
# so an imported GE suite JSON runs unmodified.

_URN_RE = re.compile(r"urn:great_expectations:[A-Za-z][A-Za-z0-9_$?=%.&:,]*")


def parse_ge_urn(urn: str) -> dict:
    """Parse a GE URN into its named parts (reference core/urn.py grammar:
    metrics → run_id:suite:metric[:kwargs]; validations → suite:metric
    [:kwargs]; stores → store:metric[:kwargs])."""
    prefix = "urn:great_expectations:"
    if not urn.startswith(prefix):
        raise ParameterExpressionError(f"not a GE urn: {urn}")
    parts = urn[len(prefix):].split(":")
    urn_type = parts[0]
    fields = {"urn_type": urn_type}
    if urn_type == "validations" and len(parts) in (3, 4):
        fields["expectation_suite_name"], fields["metric_name"] = parts[1], parts[2]
        kwargs_part = parts[3] if len(parts) == 4 else None
    elif urn_type == "metrics" and len(parts) in (4, 5):
        fields["run_id"], fields["expectation_suite_name"] = parts[1], parts[2]
        fields["metric_name"] = parts[3]
        kwargs_part = parts[4] if len(parts) == 5 else None
    elif urn_type == "stores" and len(parts) in (3, 4):
        fields["store_name"], fields["metric_name"] = parts[1], parts[2]
        kwargs_part = parts[3] if len(parts) == 4 else None
    else:
        raise ParameterExpressionError(f"unrecognized GE urn shape: {urn}")
    if kwargs_part:
        fields["metric_kwargs"] = dict(
            kv.split("=", 1) for kv in kwargs_part.split("&") if "=" in kv)
    return fields


def resolve_urn(urn: str, params: dict) -> Any:
    """Resolve a GE URN against an evaluation-parameter dict.

    Order: (1) the raw URN as a literal key (reference behavior — the
    context injects URN-keyed values); (2) for validations URNs, translate
    `<etype>.result.<field>` + `column=<c>` kwargs into the
    `parameters_from_verdicts` key space (`<etype>:<domain>:<field>`, plus
    `table.row_count` for row-count observed_value). Raises KeyError when
    nothing matches — the caller converts that into an unresolved-parameter
    exception EVR, matching the reference's EvaluationParameterError."""
    if urn in params:
        return params[urn]
    f = parse_ge_urn(urn)
    if f["urn_type"] != "validations":
        raise KeyError(urn)
    metric = f.get("metric_name", "")
    if ".result." not in metric:
        raise KeyError(urn)
    etype, field = metric.split(".result.", 1)
    domain = f.get("metric_kwargs", {}).get("column", "")
    for key in (f"{etype}:{domain}:{field}",):
        if key in params:
            return params[key]
    if field == "observed_value":
        if etype.startswith("expect_table_row_count") and "table.row_count" in params:
            return params["table.row_count"]
        # row-count family aside, observed_value of a map expectation is its
        # element/unexpected decomposition in the verdict store
        key = f"{etype}:{domain}:element_count"
        if key in params:
            return params[key]
    raise KeyError(urn)


def evaluate_parameter_expression(expression: str, params: dict | None = None) -> Any:
    """Evaluate a `$PARAMETER` expression string.

    GE URN identifiers (colons make them unparseable as Python) are
    resolved first — a lone URN returns its value directly (any type,
    matching the reference's single-identifier special case); URNs embedded
    in arithmetic are substituted as bound placeholder names.

    Raises KeyError when the expression is (or references) an unsupplied
    plain name or URN — the caller treats that as an unresolved parameter —
    and ParameterExpressionError for anything outside the grammar."""
    params = dict(params or {})
    if expression.strip().startswith("urn:great_expectations:"):
        stripped = expression.strip()
        if _URN_RE.fullmatch(stripped):
            return resolve_urn(stripped, params)
    urns = _URN_RE.findall(expression)
    for i, urn in enumerate(dict.fromkeys(urns)):  # dedupe, keep order
        name = f"__urn_{i}"
        params[name] = resolve_urn(urn, params)
        expression = expression.replace(urn, name)
    try:
        tree = ast.parse(expression, mode="eval")
    except SyntaxError as exc:
        raise ParameterExpressionError(f"unparseable expression: {expression}") from exc
    return _ev(tree, params)
