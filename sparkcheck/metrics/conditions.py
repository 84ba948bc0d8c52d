"""Map-condition builders: expectation kwargs -> pyspark.sql.Column booleans.

Each builder returns the *expected* condition (True = row satisfies the
expectation). The planner composes the unexpected condition as
``nonnull & ~expected`` exactly like the reference's
`column_condition_partial` wrapper
(great_expectations/expectations/metrics/map_metric_provider.py:426-504,
492-495). Semantics per condition follow the reference files cited on each
builder (SURVEY.md §2.3/§2.4); the implementations are new, Spark-first —
native Catalyst expressions wherever possible (no per-row Python UDFs; the
reference uses row UDFs for strftime/json — we use `try_to_timestamp` /
`try_parse_json` instead).
"""

from __future__ import annotations

import re
from functools import reduce
from typing import Any

import pandas as pd
from pyspark.sql import Column, Window
from pyspark.sql import functions as F


def _c(kwargs: dict) -> Column:
    return F.col(kwargs["column"])


# --- single-column conditions (reference: expectations/metrics/column_map_metrics/) ---


def not_null(kwargs: dict) -> Column:
    # column_values_non_null.py:35-37
    return _c(kwargs).isNotNull()


def null(kwargs: dict) -> Column:
    # column_values_null.py:35-37
    return _c(kwargs).isNull()


def _bound_chain(col: Column, kwargs: dict) -> Column:
    min_value = kwargs.get("min_value")
    max_value = kwargs.get("max_value")
    strict_min = kwargs.get("strict_min", False)
    strict_max = kwargs.get("strict_max", False)
    conds = []
    if min_value is not None:
        conds.append(col > min_value if strict_min else col >= min_value)
    if max_value is not None:
        conds.append(col < max_value if strict_max else col <= max_value)
    if not conds:
        return F.lit(True)
    return reduce(lambda a, b: a & b, conds)


def _parse_dt_bounds(kwargs: dict) -> dict:
    """parse_strings_as_datetimes=True (deprecated in the reference but
    corpus-exercised, column_values_between.py:46-63): string min/max parsed
    with dateutil before comparison; non-strings pass through."""
    from dateutil.parser import parse
    out = dict(kwargs)
    for k in ("min_value", "max_value"):
        v = out.get(k)
        if v is not None:
            try:
                out[k] = parse(v)
            except (TypeError, ValueError):
                pass
    return out


# Column-side datetime parse formats for parse_strings_as_datetimes: ISO
# first (bare try_to_timestamp), then the common non-ISO shapes dateutil
# accepts. The reference parses EVERY row with dateutil (unbounded format
# space, per-row Python); we cover ISO + these JVM-side patterns and any
# string outside them parses to null → unexpected. Constraint documented
# here by design — a full dateutil emulation would put a Python UDF in the
# hot path.
_DT_FALLBACK_FORMATS = ("M/d/yyyy H:m:s", "M/d/yyyy", "M-d-yyyy H:m:s",
                        "M-d-yyyy", "yyyy/M/d", "yyyyMMdd")


def _dt_parsed_col(col: Column) -> Column:
    return F.coalesce(
        F.try_to_timestamp(col),
        *[F.try_to_timestamp(col, F.lit(f)) for f in _DT_FALLBACK_FORMATS])


def between(kwargs: dict) -> Column:
    # column_values_between.py:222 — chained comparisons per strict flags
    if kwargs.get("parse_strings_as_datetimes"):
        import datetime as _dt
        kwargs = _parse_dt_bounds(kwargs)
        if any(isinstance(kwargs.get(k), (_dt.datetime, _dt.date))
               for k in ("min_value", "max_value")):
            # parse the COLUMN side too (ADVICE r2): with datetime bounds,
            # a non-ISO string value like '01/02/2018' would implicitly
            # cast to null and count as unexpected, diverging from the
            # reference's dateutil-parses-both semantics. A string NO format
            # parses (dateutil would raise there) is unexpected, not null —
            # hence the coalesce(False).
            return F.coalesce(
                _bound_chain(_dt_parsed_col(_c(kwargs)), kwargs), F.lit(False))
    return _bound_chain(_c(kwargs), kwargs)


def in_set(kwargs: dict) -> Column:
    # column_values_in_set.py:77-100; golden corpus: None value_set is the
    # universal set (vacuously true), EMPTY value_set marks every non-null
    # value unexpected
    value_set = kwargs.get("value_set")
    if value_set is None:
        return F.lit(True)
    if not value_set:
        return F.lit(False)
    return _c(kwargs).isin(_maybe_parse_set(kwargs, value_set))


def _maybe_parse_set(kwargs: dict, value_set) -> list:
    """parse_strings_as_datetimes on in_set/not_in_set: parse string members
    with dateutil. NOTE a deliberate semantic choice: the reference's SPARK
    engine ignores this kwarg entirely ('just compare the strings as is',
    column_values_in_set.py:84-91) while its pandas engine parses the set —
    and the golden corpus 'out' encodes the PANDAS behavior, which is also
    the only useful one (the corpus datetime cases are spark-suppressed in
    the reference). We implement the pandas semantics."""
    if not kwargs.get("parse_strings_as_datetimes"):
        return list(value_set)
    from dateutil.parser import parse
    out = []
    for v in value_set:
        try:
            out.append(parse(v) if isinstance(v, str) else v)
        except (TypeError, ValueError):
            out.append(v)
    return out


def not_in_set(kwargs: dict) -> Column:
    # column_values_not_in_set.py:81 (None/None-element kwargs are rejected
    # by the runner's config validation before this builder runs)
    value_set = kwargs.get("value_set")
    if not value_set:
        return F.lit(True)
    return ~_c(kwargs).isin(_maybe_parse_set(kwargs, value_set))


def value_length_between(kwargs: dict) -> Column:
    # column_value_lengths.py:173
    return _bound_chain(F.length(_c(kwargs)), kwargs)


def value_length_equals(kwargs: dict) -> Column:
    # column_value_lengths.py:35-38
    return F.length(_c(kwargs)) == F.lit(int(kwargs["value"]))


def match_regex(kwargs: dict) -> Column:
    # column_values_match_regex.py:38-40 (Java regex via rlike)
    return _c(kwargs).rlike(kwargs["regex"])


def not_match_regex(kwargs: dict) -> Column:
    return ~_c(kwargs).rlike(kwargs["regex"])


def match_regex_list(kwargs: dict) -> Column:
    # column_values_match_regex_list.py:75-83
    regexes = kwargs["regex_list"]
    match_on = kwargs.get("match_on", "any")
    col = _c(kwargs)
    conds = [col.rlike(r) for r in regexes]
    op = (lambda a, b: a & b) if match_on == "all" else (lambda a, b: a | b)
    return reduce(op, conds)


def not_match_regex_list(kwargs: dict) -> Column:
    # column_values_not_match_regex_list.py:54-62 — conjunction of negations
    col = _c(kwargs)
    return reduce(lambda a, b: a & b, [~col.rlike(r) for r in kwargs["regex_list"]])


def _like(col: Column, pattern: str) -> Column:
    return col.like(pattern)


def match_like_pattern(kwargs: dict) -> Column:
    # SQL-only in the reference (column_values_match_like_pattern.py;
    # suppressed for spark at self_check/util.py:1310-1313) — trivial on Spark.
    return _like(_c(kwargs), kwargs["like_pattern"])


def not_match_like_pattern(kwargs: dict) -> Column:
    return ~_like(_c(kwargs), kwargs["like_pattern"])


def match_like_pattern_list(kwargs: dict) -> Column:
    col = _c(kwargs)
    match_on = kwargs.get("match_on", "any")
    conds = [_like(col, p) for p in kwargs["like_pattern_list"]]
    op = (lambda a, b: a & b) if match_on == "all" else (lambda a, b: a | b)
    return reduce(op, conds)


def not_match_like_pattern_list(kwargs: dict) -> Column:
    col = _c(kwargs)
    return reduce(lambda a, b: a & b, [~_like(col, p) for p in kwargs["like_pattern_list"]])


_STRFTIME_TO_JAVA = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd",
    "%H": "HH", "%I": "hh", "%M": "mm", "%S": "ss",
    "%f": "SSSSSS", "%j": "DDD", "%p": "a", "%z": "xx", "%%": "'%'",
}


def strftime_to_java(fmt: str) -> str:
    """Tokenizing translation: %-codes map to java.time patterns; any other
    alphabetic literal (e.g. the T in ISO-8601) must be single-quoted or the
    java parser treats it as a pattern letter."""
    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            code = fmt[i:i + 2]
            if code not in _STRFTIME_TO_JAVA:
                raise ValueError(f"unsupported strftime code: {code}")
            out.append(_STRFTIME_TO_JAVA[code])
            i += 2
        elif fmt[i].isalpha() or fmt[i] == "'":
            out.append("'" + fmt[i].replace("'", "''") + "'")
            i += 1
        else:
            out.append(fmt[i])
            i += 1
    return "".join(out)


def match_strftime_format(kwargs: dict) -> Column:
    # Reference uses a per-row Python UDF (column_values_match_strftime_format.py:33-57);
    # ours stays JVM-side via try_to_timestamp on the converted pattern.
    java_fmt = strftime_to_java(kwargs["strftime_format"])
    return F.try_to_timestamp(_c(kwargs), F.lit(java_fmt)).isNotNull()


def json_parseable(kwargs: dict) -> Column:
    # Reference uses a per-row json.loads UDF (column_values_json_parseable.py:28-36);
    # ours: Spark 4 variant parser, JVM-side.
    return F.try_parse_json(_c(kwargs)).isNotNull()


def match_json_schema(kwargs: dict) -> Column:
    """Reference uses a per-row jsonschema.validate UDF
    (column_values_match_json_schema.py:38-46); ours is an Arrow-batched
    pandas UDF (one python call per batch, not per row)."""
    import json as _json

    schema = kwargs["json_schema"]
    if isinstance(schema, str):
        schema = _json.loads(schema)

    @F.pandas_udf("boolean")
    def _matches(s: pd.Series) -> pd.Series:
        import jsonschema

        validator = jsonschema.validators.validator_for(schema)(schema)

        def ok(v):
            if v is None:
                return None
            try:
                validator.validate(_json.loads(v))
                return True
            except (_json.JSONDecodeError, jsonschema.ValidationError, TypeError):
                return False

        return s.map(ok)

    return _matches(_c(kwargs))


def dateutil_parseable(kwargs: dict) -> Column:
    """Reference is pandas-only (suppressed for spark, self_check/util.py:1314);
    ours: Arrow-batched pandas UDF over dateutil.parser."""
    @F.pandas_udf("boolean")
    def _parseable(s: pd.Series) -> pd.Series:
        from dateutil.parser import parse

        def ok(v):
            if v is None:
                return None
            try:
                parse(v)
                return True
            except (ValueError, OverflowError, TypeError):
                return False

        return s.map(ok)

    return _parseable(_c(kwargs))


def _ordered_window(kwargs: dict) -> Window:
    ob = kwargs.get("order_by")
    if ob is None:
        order_cols = [F.monotonically_increasing_id()]
    elif isinstance(ob, (list, tuple)):
        order_cols = [F.col(c) for c in ob]
    else:
        order_cols = [F.col(ob)]
    if kwargs.get("group_by"):
        return Window.partitionBy(kwargs["group_by"]).orderBy(*order_cols)
    import warnings
    warnings.warn(
        f"increasing/decreasing on '{kwargs.get('column')}' without "
        "`group_by`: a global ordered window collapses the whole table into "
        "ONE partition (Spark 'No Partition Defined for Window operation') — "
        "a straggler at scale. Pass group_by=<series key> to keep the window "
        "partitioned.", stacklevel=3)
    return Window.orderBy(*order_cols)


def increasing(kwargs: dict) -> Column:
    """Reference: window lag over the existing row order
    (column_values_increasing.py:80-192). Ours: optional `group_by` keeps the
    window partitioned (scalable); without it we document the single-partition
    hazard and order by monotonically_increasing_id (batch order). `order_by`
    may be a column name or a list (tie-break keys)."""
    col = _c(kwargs)
    strictly = kwargs.get("strictly", False)
    prev = F.lag(col).over(_ordered_window(kwargs))
    cmp = (col > prev) if strictly else (col >= prev)
    return prev.isNull() | cmp


def decreasing(kwargs: dict) -> Column:
    col = _c(kwargs)
    strictly = kwargs.get("strictly", False)
    prev = F.lag(col).over(_ordered_window(kwargs))
    cmp = (col < prev) if strictly else (col <= prev)
    return prev.isNull() | cmp


def unique(kwargs: dict) -> Column:
    """Window form used only for the violation-sample pass; counts come from
    the groupBy dup-count job (see runner). Reference marks ALL rows of a
    duplicated value unexpected (column_values_unique.py:83-87)."""
    return F.count(F.lit(1)).over(Window.partitionBy(_c(kwargs))) <= 1


def z_score_under_threshold(kwargs: dict, mean: float, stddev: float) -> Column:
    """Dependent condition (column_values_z_score.py:82-97): needs resolved
    column.mean / column.standard_deviation from the fused pass first."""
    threshold = float(kwargs["threshold"])
    double_sided = kwargs.get("double_sided", True)
    if stddev is None or stddev == 0 or mean is None:
        return F.lit(True)
    z = (_c(kwargs) - F.lit(float(mean))) / F.lit(float(stddev))
    return (F.abs(z) < threshold) if double_sided else (z < threshold)


# --- column-pair conditions (reference: column_pair_map_metrics/) ---


def pair_equal(kwargs: dict) -> Column:
    # column_pair_values_equal.py:40-43
    return F.col(kwargs["column_A"]).eqNullSafe(F.col(kwargs["column_B"]))


def pair_a_greater_than_b(kwargs: dict) -> Column:
    # column_pair_values_greater.py:98-129
    a, b = F.col(kwargs["column_A"]), F.col(kwargs["column_B"])
    return (a >= b) if kwargs.get("or_equal") else (a > b)


def pair_in_set(kwargs: dict) -> Column:
    # column_pair_values_in_set.py:77-92
    a, b = F.col(kwargs["column_A"]), F.col(kwargs["column_B"])
    pairs = kwargs["value_pairs_set"]
    conds = [a.eqNullSafe(F.lit(x)) & b.eqNullSafe(F.lit(y)) for x, y in pairs]
    return reduce(lambda p, q: p | q, conds) if conds else F.lit(True)


def pair_domain_filter(kwargs: dict) -> Column:
    """`ignore_row_if` for pairs (sparkdf_execution_engine.py:421-456)."""
    a, b = F.col(kwargs["column_A"]), F.col(kwargs["column_B"])
    mode = kwargs.get("ignore_row_if", "both_values_are_missing")
    if mode == "both_values_are_missing":
        return ~(a.isNull() & b.isNull())
    if mode == "either_value_is_missing":
        return a.isNotNull() & b.isNotNull()
    return F.lit(True)  # "neither" / "never"


# --- multicolumn conditions (reference: multicolumn_map_metrics/) ---


def multicolumn_domain_filter(kwargs: dict) -> Column:
    """`ignore_row_if` for column lists (sparkdf_execution_engine.py:458-479)."""
    cols = [F.col(c) for c in kwargs["column_list"]]
    mode = kwargs.get("ignore_row_if", "all_values_are_missing")
    if mode == "all_values_are_missing":
        return ~reduce(lambda a, b: a & b, [c.isNull() for c in cols])
    if mode == "any_value_is_missing":
        return reduce(lambda a, b: a & b, [c.isNotNull() for c in cols])
    return F.lit(True)


def multicolumn_sum_equal(kwargs: dict) -> Column:
    # multicolumn_sum_equal.py:37-44 — COALESCE(c,0) sum == total
    total = kwargs["sum_total"]
    cols = [F.coalesce(F.col(c), F.lit(0)) for c in kwargs["column_list"]]
    return reduce(lambda a, b: a + b, cols) == F.lit(total)


def select_unique_within_record(kwargs: dict) -> Column:
    # select_column_values_unique_within_record.py:68-83 — NOT-OR of pairwise eqNullSafe
    cols = [F.col(c) for c in kwargs["column_list"]]
    pair_eq = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            pair_eq.append(cols[i].eqNullSafe(cols[j]))
    return ~reduce(lambda a, b: a | b, pair_eq) if pair_eq else F.lit(True)


def compound_columns_unique(kwargs: dict) -> Column:
    """Window form for samples only (compound_columns_unique.py:142-148);
    counts come from the groupBy dup job."""
    cols = [F.col(c) for c in kwargs["column_list"]]
    return F.count(F.lit(1)).over(Window.partitionBy(*cols)) <= 1


# Prefix match, NOT fully anchored: the reference parses with pyparsing
# parseString(parseAll=False), which silently IGNORES trailing text
# ('col("x") > 5 AND ...' filters on x>5). `col("` is a case-SENSITIVE
# Literal there; only `.notnull()` is a CaselessLiteral.
_GE_DSL_RE = re.compile(
    r'^\s*col\("(?P<column>[A-Za-z][A-Za-z0-9_.]*)"\)\s*'
    r'(?:(?P<notnull>\.\s*(?i:notnull)\s*\(\s*\))|'
    r'(?P<op>>=|<=|==|>|<)\s*'
    r'(?:(?P<fnumber>[+-]?\d+(?:\.\d*)?(?:[eE][+-]?\d+)?)|'
    r'"(?P<dq>[A-Za-z0-9.]+)"|'
    r"'(?P<sq>[A-Za-z0-9.]+)'))")


def parse_ge_dsl_condition(row_condition: str) -> Column:
    """The GE mini-DSL condition parser (reference
    expectations/row_conditions.py:31-96): ``col("x") > 5``,
    ``col("x") == "v"``, ``col("x").notnull()``. Same grammar (one
    comparison, numeric or quoted alnum literal, ops > < >= <= ==; string
    literals only with ==) and same error contract (ValueError on anything
    else — the reference raises ConditionParserError)."""
    m = _GE_DSL_RE.match(row_condition)
    if not m:
        raise ValueError(f"unable to parse condition: {row_condition}")
    col = F.col(m.group("column"))
    if m.group("notnull"):
        return col.isNotNull()
    op = m.group("op")
    sval = m.group("dq") or m.group("sq")
    if sval is not None:
        if op != "==":
            raise ValueError(
                f"Invalid operator: {op} for string literal spark condition.")
        return col == sval
    raw = m.group("fnumber")
    try:
        num: float | int = int(raw)
    except ValueError:
        num = float(raw)
    return {">": col > num, "<": col < num, ">=": col >= num,
            "<=": col <= num, "==": col == num}[op]


def row_condition_filter(kwargs: dict) -> Column | None:
    """Domain row_condition. condition_parser='spark' (default): Spark-SQL
    predicate string, Catalyst-parsed (reference
    sparkdf_execution_engine.py:405-409).
    condition_parser='great_expectations__experimental__': the GE mini-DSL
    (parse_ge_dsl_condition above)."""
    rc = kwargs.get("row_condition")
    if not rc:
        return None
    parser = kwargs.get("condition_parser", "spark")
    if parser == "great_expectations__experimental__":
        return parse_ge_dsl_condition(rc)
    if parser in ("spark", None):
        return F.expr(rc)
    raise ValueError(f"unsupported condition_parser: {parser}")
