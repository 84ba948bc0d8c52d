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


def evaluate_parameter_expression(expression: str, params: dict | None = None) -> Any:
    """Evaluate a `$PARAMETER` expression string.

    Raises KeyError when the expression is (or references) an unsupplied
    plain name — the caller treats that as an unresolved parameter — and
    ParameterExpressionError for anything outside the grammar."""
    try:
        tree = ast.parse(expression, mode="eval")
    except SyntaxError as exc:
        raise ParameterExpressionError(f"unparseable expression: {expression}") from exc
    return _ev(tree, params or {})
