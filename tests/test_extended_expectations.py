"""Tests for the extended expectation surface: json-schema / dateutil
pandas-UDF conditions, Cramér's phi, p-value drift variants, and the legacy
multicolumn-unique alias. Ground truths are hand-computed on literal tables
(the reference's golden-JSON style, SURVEY.md §5)."""

import math

import pytest

from sparkcheck import ExpectationSuite, validate
from sparkcheck.metrics import sketches


def _one(df, etype, **kw):
    suite = ExpectationSuite("t").add(etype, **kw)
    return validate(df, suite).results[0]


# ------------------------------------------------------------- UDF conditions


def test_match_json_schema(spark):
    schema = {"type": "object", "properties": {"a": {"type": "number"}},
              "required": ["a"]}
    df = spark.createDataFrame(
        [('{"a": 1}',), ('{"a": "x"}',), ('{"b": 2}',), ("not json",), (None,)],
        "j string")
    r = _one(df, "expect_column_values_to_match_json_schema",
             column="j", json_schema=schema)
    assert r.result["element_count"] == 5
    assert r.result["unexpected_count"] == 3  # wrong type, missing key, invalid
    assert r.result["missing_count"] == 1
    assert not r.success


def test_dateutil_parseable(spark):
    df = spark.createDataFrame(
        [("2024-01-01",), ("Jan 5 2020 4:30pm",), ("not a date",), (None,)],
        "d string")
    r = _one(df, "expect_column_values_to_be_dateutil_parseable", column="d")
    assert r.result["unexpected_count"] == 1
    assert r.result["missing_count"] == 1


# -------------------------------------------------------------- cramers phi


def test_cramers_phi_perfect_association(spark):
    # B fully determined by A -> phi = 1
    rows = [("x", "u")] * 10 + [("y", "v")] * 10
    df = spark.createDataFrame(rows, "a string, b string")
    r = _one(df, "expect_column_pair_cramers_phi_value_to_be_less_than",
             column_A="a", column_B="b", threshold=0.5)
    assert r.result["observed_value"] == pytest.approx(1.0)
    assert not r.success


def test_cramers_phi_independence(spark):
    # perfectly balanced 2x2 -> chi2 = 0 -> phi = 0
    rows = [("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    r = _one(df, "expect_column_pair_cramers_phi_value_to_be_less_than",
             column_A="a", column_B="b", threshold=0.1)
    assert r.result["observed_value"] == pytest.approx(0.0)
    assert r.success


def test_cramers_phi_max_cells_guard(spark):
    df = spark.createDataFrame([(i, i) for i in range(50)], "a int, b int")
    r = _one(df, "expect_column_pair_cramers_phi_value_to_be_less_than",
             column_A="a", column_B="b", threshold=0.5, max_cells=10)
    assert r.exception_info["raised_exception"]


# --------------------------------------------------------------- p-values


def test_gammainc_matches_known_chi2_values():
    # chi2 sf(x=3.84, dof=1) ~ 0.05; sf(x=5.99, dof=2) ~ 0.05
    assert sketches._gammainc_upper_reg(0.5, 3.841 / 2) == pytest.approx(0.05, abs=1e-3)
    assert sketches._gammainc_upper_reg(1.0, 5.991 / 2) == pytest.approx(0.05, abs=1e-3)
    assert sketches._gammainc_upper_reg(2.5, 11.070 / 2) == pytest.approx(0.05, abs=1e-3)


def test_ks_exact_cdf_marsaglia():
    """Marsaglia–Tsang–Wang exact P(D_n < d): the paper's worked value
    K(100, 0.1) ≈ 0.747307 (JSS 2003), boundary behavior, monotonicity, and
    convergence to the asymptotic formula at larger n."""
    assert sketches.ks_cdf_exact(100, 0.1) == pytest.approx(0.747307, abs=1e-5)
    assert sketches.ks_cdf_exact(10, 0.0) == 0.0
    assert sketches.ks_cdf_exact(10, 1.0) == 1.0
    vals = [sketches.ks_cdf_exact(20, d) for d in (0.1, 0.2, 0.3, 0.4)]
    assert vals == sorted(vals)
    # exact vs asymptotic agree at n=50 within the correction's error
    assert sketches.ks_p_value_small_n(0.15, 50) == pytest.approx(
        sketches.ks_p_value(0.15, 50), abs=0.01)


def test_kolmogorov_sf_known_values():
    # Q_KS(1.36) ~ 0.049 (the classic 5% critical value)
    assert sketches.kolmogorov_sf(1.36) == pytest.approx(0.049, abs=2e-3)
    assert sketches.kolmogorov_sf(0.0) == 1.0


def test_chisquare_p_value_drift(spark):
    rows = [(float(v),) for v in ([5.0] * 50 + [15.0] * 50)]
    df = spark.createDataFrame(rows, "x double")
    po = {"bins": [0.0, 10.0, 20.0], "weights": [0.5, 0.5]}
    r = _one(df, "expect_column_chisquare_test_p_value_to_be_greater_than",
             column="x", partition_object=po, threshold=0.05)
    # observed matches expected exactly -> chi2 = 0 -> p = 1
    assert r.result["observed_value"] == pytest.approx(1.0)
    assert r.success
    # now a drifted expectation
    po2 = {"bins": [0.0, 10.0, 20.0], "weights": [0.9, 0.1]}
    r2 = _one(df, "expect_column_chisquare_test_p_value_to_be_greater_than",
              column="x", partition_object=po2, threshold=0.05)
    assert r2.result["observed_value"] < 0.001
    assert not r2.success


def test_bootstrapped_ks_p_value_drift(spark):
    rows = [(float(v),) for v in ([5.0] * 500 + [15.0] * 500)]
    df = spark.createDataFrame(rows, "x double")
    po_ok = {"bins": [0.0, 10.0, 20.0], "weights": [0.5, 0.5]}
    r = _one(df, "expect_column_bootstrapped_ks_test_p_value_to_be_greater_than",
             column="x", partition_object=po_ok, threshold=0.05)
    assert r.success and r.result["observed_value"] == pytest.approx(1.0)
    po_bad = {"bins": [0.0, 10.0, 20.0], "weights": [0.95, 0.05]}
    r2 = _one(df, "expect_column_bootstrapped_ks_test_p_value_to_be_greater_than",
              column="x", partition_object=po_bad, threshold=0.05)
    assert not r2.success


def test_parameterized_distribution_ks(spark):
    # data uniform on [0, 100) in 4 equal bins vs uniform distribution -> p ~ 1
    rows = [(float(i % 100),) for i in range(2000)]
    df = spark.createDataFrame(rows, "x double")
    r = _one(df,
             "expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than",
             column="x", distribution="uniform",
             params={"min_value": 0.0, "max_value": 100.0},
             partition_object={"bins": [0.0, 25.0, 50.0, 75.0, 100.0]},
             threshold=0.05)
    assert r.success
    # same data vs norm(0,1) -> emphatic reject
    r2 = _one(df,
              "expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than",
              column="x", distribution="norm", params={"mean": 50.0, "std_dev": 1.0},
              partition_object={"bins": [0.0, 25.0, 50.0, 75.0, 100.0]},
              threshold=0.05)
    assert not r2.success


def test_distribution_cdf_norm():
    assert sketches.distribution_cdf("norm", {"mean": 0, "std_dev": 1}, 0.0) == pytest.approx(0.5)
    assert sketches.distribution_cdf("norm", {"mean": 0, "std_dev": 1}, 1.96) == pytest.approx(0.975, abs=1e-3)


# ------------------------------------------------------------- legacy alias


def test_multicolumn_values_to_be_unique_alias(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (3, "a")], "x int, y string")
    r = _one(df, "expect_multicolumn_values_to_be_unique", column_list=["x", "y"])
    assert r.result["unexpected_count"] == 2  # both rows of the dup pair
    assert not r.success


# --------------------------------------------- auto uniqueness + eval params


def test_unique_auto_clean_skips_exact(spark):
    df = spark.range(10_000).select(F_col("id").alias("k"))
    r = _one_strategy(df, "auto")
    assert r.success
    assert r.result["details"]["strategy"] == "hll_prescreen_clean"
    assert r.result["unexpected_count"] == 0


def test_unique_auto_suspect_falls_back_to_exact(spark):
    from pyspark.sql import functions as F
    # 30% duplicates: far outside the 3*rsd noise band -> exact fallback
    df = spark.range(10_000).select((F.col("id") % 7000).alias("k"))
    r = _one_strategy(df, "auto")
    assert not r.success
    assert r.result["details"]["strategy"] == "exact_after_suspect_prescreen"
    assert r.result["unexpected_count"] == 6000  # 3000 dup pairs -> 6000 rows


def _one_strategy(df, strategy):
    from sparkcheck import ExpectationSuite, validate
    suite = ExpectationSuite("u").add("expect_column_values_to_be_unique", column="k")
    return validate(df, suite, unique_strategy=strategy).results[0]


def F_col(name):
    from pyspark.sql import functions as F
    return F.col(name)


def test_evaluation_parameters(spark):
    from sparkcheck import ExpectationSuite, validate
    df = spark.createDataFrame([(i,) for i in range(10)], "v int")
    suite = (ExpectationSuite("ep")
             .add("expect_table_row_count_to_equal", value={"$PARAMETER": "expected_rows"})
             .add("expect_column_max_to_be_between",
                  min_value=0, max_value={"$PARAMETER": "max_v"}, column="v"))
    res = validate(df, suite, evaluation_parameters={"expected_rows": 10, "max_v": 9})
    assert res.success
    res2 = validate(df, suite, evaluation_parameters={"expected_rows": 11, "max_v": 9})
    assert not res2.results[0].success and res2.results[1].success
    import pytest as _pytest
    with _pytest.raises(KeyError):
        validate(df, suite, catch_exceptions=False)
    # missing parameter + catch_exceptions=True (default): the unresolved
    # expectation becomes an exception EVR, the rest of the suite still runs
    res3 = validate(df, suite, evaluation_parameters={"max_v": 9})
    assert not res3.results[0].success
    assert res3.results[0].exception_info["raised_exception"]
    assert "expected_rows" in res3.results[0].exception_info["exception_message"]
    assert res3.results[1].success  # resolved expectation ran normally


class TestGeDslRowCondition:
    """GE mini-DSL condition_parser='great_expectations__experimental__'
    (reference expectations/row_conditions.py:31-96)."""

    def _count(self, spark, df, rc):
        from sparkcheck import ExpectationSuite, validate
        suite = ExpectationSuite("dsl").add(
            "expect_table_row_count_to_be_between", min_value=0,
            row_condition=rc,
            condition_parser="great_expectations__experimental__")
        return validate(df, suite).results[0].result["observed_value"]

    def test_numeric_comparisons(self, spark):
        df = spark.createDataFrame(
            [(i, f"s{i}") for i in range(10)], "x bigint, s string")
        assert self._count(spark, df, 'col("x") > 5') == 4
        assert self._count(spark, df, 'col("x") >= 5') == 5
        assert self._count(spark, df, 'col("x") < 5') == 5
        assert self._count(spark, df, 'col("x") <= 5') == 6
        assert self._count(spark, df, 'col("x") == 5') == 1
        assert self._count(spark, df, 'col("x") > 2.5') == 7

    def test_string_equality_and_notnull(self, spark):
        df = spark.createDataFrame(
            [("a",), ("b",), (None,)], "s string")
        assert self._count(spark, df, 'col("s") == "a"') == 1
        assert self._count(spark, df, "col(\"s\") == 'b'") == 1
        assert self._count(spark, df, 'col("s").notnull()') == 2

    def test_trailing_text_ignored_like_reference(self, spark):
        """pyparsing parseString(parseAll=False): trailing text after one
        parsed condition is silently ignored by the reference."""
        df = spark.createDataFrame([(i,) for i in range(10)], "x bigint")
        assert self._count(
            spark, df, 'col("x") > 5 AND col("x") > 100') == 4  # x>5 only

    def test_case_sensitivity_matches_reference(self, spark):
        from sparkcheck.metrics.conditions import parse_ge_dsl_condition
        import pytest as _pytest
        parse_ge_dsl_condition('col("x").NotNull()')  # notnull is caseless
        with _pytest.raises(ValueError):
            parse_ge_dsl_condition('COL("x") > 5')  # col( is case-sensitive

    def test_parse_errors(self, spark):
        from sparkcheck.metrics.conditions import parse_ge_dsl_condition
        import pytest as _pytest
        for bad in ('x > 5',                            # must use col("...")
                    'col("s") > "a"'):                  # string only with ==
            with _pytest.raises(ValueError):
                parse_ge_dsl_condition(bad)
        # engine path: the parse error becomes an exception EVR
        from sparkcheck import ExpectationSuite, validate
        df = spark.createDataFrame([(1,)], "x bigint")
        suite = ExpectationSuite("bad").add(
            "expect_table_row_count_to_be_between", min_value=0,
            row_condition="garbage ===",
            condition_parser="great_expectations__experimental__")
        r = validate(df, suite).results[0]
        assert not r.success and r.exception_info["raised_exception"]

    def test_domains_keyed_by_parser(self, spark):
        """The same row_condition string under different parsers must not
        share a fused domain."""
        from sparkcheck.planner import compile_suite
        from sparkcheck.types import ExpectationConfiguration as EC
        plan = compile_suite([
            EC("expect_table_row_count_to_be_between",
               {"min_value": 0, "row_condition": 'col("x") > 5',
                "condition_parser": "great_expectations__experimental__"}),
            EC("expect_table_row_count_to_be_between",
               {"min_value": 0, "row_condition": 'col("x") > 5'}),
        ])
        assert len(plan.domains) == 2


def test_parameter_expressions(spark):
    """$PARAMETER values may be expressions: temporal builtins + arithmetic
    (reference core/evaluation_parameters.py)."""
    import datetime
    from sparkcheck import ExpectationSuite, validate
    from sparkcheck.eval_params import (ParameterExpressionError,
                                        evaluate_parameter_expression)
    assert evaluate_parameter_expression("3 * 7 + 1") == 22
    assert evaluate_parameter_expression("round(10 / 3)") == 3
    assert evaluate_parameter_expression("trunc(x * 2)", {"x": 2.6}) == 5
    assert evaluate_parameter_expression("datetime(2003, 1, 1)") == \
        datetime.datetime(2003, 1, 1)
    delta = datetime.datetime.now() - evaluate_parameter_expression(
        "now() - timedelta(weeks=52)")
    assert abs(delta - datetime.timedelta(weeks=52)) < datetime.timedelta(minutes=5)
    # whitelist: attribute access / imports / subscripts are rejected
    import pytest as _pytest
    for bad in ("__import__('os')", "().__class__", "x[0]", "open('f')"):
        with _pytest.raises((ParameterExpressionError, KeyError)):
            evaluate_parameter_expression(bad, {"x": [1]})
    # end-to-end: a timestamp bound from now()
    df = spark.createDataFrame(
        [(datetime.datetime(2020, 1, 1),)], "ts timestamp")
    suite = ExpectationSuite("t").add(
        "expect_column_values_to_be_between", column="ts",
        max_value={"$PARAMETER": "now()"})
    assert validate(df, suite).results[0].success


def test_parameter_expression_resource_guards():
    """Hostile/typo'd expressions must raise, not hang or OOM the driver."""
    from sparkcheck.eval_params import (ParameterExpressionError,
                                        evaluate_parameter_expression)
    import pytest as _pytest
    for bad in ("10**10**10", "'a' * 10**9", "10**1000", "[1] * 999999999"):
        with _pytest.raises(ParameterExpressionError):
            evaluate_parameter_expression(bad)
    assert evaluate_parameter_expression("2 ** 10") == 1024


def test_between_parses_non_iso_datetime_strings_column_side(spark):
    """parse_strings_as_datetimes must parse the COLUMN values too, not just
    the bounds (reference column_values_between.py dateutil-parses-both):
    '01/02/2018' implicitly casts to null in Spark, so without the column-
    side parse it would wrongly count as unexpected (ADVICE r2)."""
    from sparkcheck import ExpectationSuite, validate
    df = spark.createDataFrame(
        [("2018-01-02",), ("01/02/2018",), ("2018/01/02",), ("20180102",),
         ("12/31/2030",), ("not a date",)], "d string")
    suite = ExpectationSuite("dt").add(
        "expect_column_values_to_be_between", column="d",
        min_value="2018-01-01", max_value="2018-12-31",
        parse_strings_as_datetimes=True)
    r = validate(df, suite).results[0]
    # the four 2018 spellings are in range; out-of-range + unparseable fail
    assert r.result["unexpected_count"] == 2
    assert set(r.result["partial_unexpected_list"]) == {"12/31/2030",
                                                        "not a date"}


def test_parameter_caret_is_exponentiation():
    """The reference grammar spells exponentiation '^' (core/
    evaluation_parameters.py: expop = Literal('^')); reference-authored
    expressions like 'trunc(v ^ 2)' must evaluate, not raise."""
    from sparkcheck.eval_params import (ParameterExpressionError,
                                        evaluate_parameter_expression)
    import pytest as _pytest
    assert evaluate_parameter_expression("2 ^ 10") == 1024
    assert evaluate_parameter_expression("trunc(v ^ 2)", {"v": 3.5}) == 12
    with _pytest.raises(ParameterExpressionError):  # same pow guards apply
        evaluate_parameter_expression("10 ^ 1000")


def test_urn_parse_and_resolve():
    """GE URN grammar (reference core/urn.py) parses and resolves against
    parameters_from_verdicts-style keys."""
    from sparkcheck.eval_params import (evaluate_parameter_expression,
                                        parse_ge_urn, resolve_urn)
    u = ("urn:great_expectations:validations:day1:"
         "expect_column_values_to_not_be_null.result.unexpected_count:"
         "column=clip_id")
    f = parse_ge_urn(u)
    assert f["urn_type"] == "validations"
    assert f["expectation_suite_name"] == "day1"
    assert f["metric_name"] == \
        "expect_column_values_to_not_be_null.result.unexpected_count"
    assert f["metric_kwargs"] == {"column": "clip_id"}
    params = {
        "expect_column_values_to_not_be_null:clip_id:unexpected_count": 7,
        "table.row_count": 3000,
    }
    assert resolve_urn(u, params) == 7
    # raw URN key wins when supplied directly (reference literal-key path)
    assert resolve_urn(u, {u: 42}) == 42
    # table row-count observed_value maps onto table.row_count
    u2 = ("urn:great_expectations:validations:day1:"
          "expect_table_row_count_to_equal.result.observed_value")
    assert resolve_urn(u2, params) == 3000
    # lone URN as the whole expression returns the value unchanged
    assert evaluate_parameter_expression(u2, params) == 3000
    # URN embedded in arithmetic
    assert evaluate_parameter_expression(f"{u2} - 1000", params) == 2000
    import pytest as _pytest
    with _pytest.raises(KeyError):
        resolve_urn("urn:great_expectations:validations:day1:"
                    "expect_nothing.result.unexpected_count", params)
