"""EVR parity vs the REFERENCE great_expectations engine on shared fixtures.

Runs the reference's own SparkDFDataset (great_expectations 0.13.47,
/root/reference, imported as-is via tests/ge_reference_shim.py) next to
sparkcheck on identical DataFrames and diffs the validation results
field-by-field — the comparison rules mirror the reference's own harness
(self_check/util.py:1913-2060): unexpected lists compared sorted,
observed_value with allclose, percentages with rtol.

This is the BASELINE.md "verdict parity" gate: success flag, element_count,
missing_count, unexpected_count, unexpected_percent(-nonmissing), and the
partial_unexpected_list must agree.
"""

import math

import pytest

from sparkcheck import ExpectationSuite, validate

from ge_reference_shim import install_reference_ge

ge = install_reference_ge()

pytestmark = pytest.mark.skipif(ge is None, reason="reference GE not loadable")


@pytest.fixture(scope="module")
def fixtures(spark):
    """Shared literal tables (FIXTURES.md §3 style)."""
    mixed = spark.createDataFrame(
        [("2", 1, 1, "1", 1.0, '{"a": 1}'),
         ("2", 1, 2, "1", 2.5, "nope"),
         ("2", 2, 3, "2", float("nan"), None),
         (None, None, None, "2", None, '{"b": []}')],
        "a string, c int, uniq int, mult_dup string, x double, json_col string")
    audio = spark.createDataFrame(
        [("clip-1", 16000, 3000, "wav", "hello world"),
         ("clip-2", 22050, 200, "flac", "quick brown fox"),
         ("clip-2", 1234, 500, "ogg", None),
         (None, 48000, 30000, "wav", "ok"),
         ("bad_5", 8000, 800, "mp3", "x y z")],
        "clip_id string, sr_hz int, dur_ms int, codec string, transcript string")
    return {"mixed": mixed, "audio": audio}


def _reference_result(df, expectation_type, kwargs):
    from great_expectations.dataset.sparkdf_dataset import SparkDFDataset
    d = SparkDFDataset(df)
    fn = getattr(d, expectation_type, None)
    if fn is None:
        pytest.skip(f"reference V2 dataset lacks {expectation_type}")
    return fn(**kwargs, result_format="BASIC")


def _ours(df, expectation_type, kwargs):
    suite = ExpectationSuite("p").add(expectation_type, **kwargs)
    return validate(df, suite, result_format="BASIC").results[0]


def _close(a, b, rtol=1e-6):
    if a is None or b is None:
        return a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        if isinstance(a, float) and isinstance(b, float) and math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(float(a), float(b), rel_tol=rtol, abs_tol=1e-9)
    return a == b


def _sorted_list(v):
    return sorted((x for x in (v or [])), key=lambda x: (x is None, str(x)))


CASES = [
    # (table, expectation, kwargs)
    ("mixed", "expect_column_values_to_not_be_null", {"column": "a"}),
    ("mixed", "expect_column_values_to_not_be_null", {"column": "a", "mostly": 0.5}),
    ("mixed", "expect_column_values_to_be_null", {"column": "a"}),
    ("mixed", "expect_column_values_to_be_between",
     {"column": "c", "min_value": 1, "max_value": 1, "mostly": 0.5}),
    ("mixed", "expect_column_values_to_be_between",
     {"column": "c", "min_value": 0, "max_value": 10}),
    ("mixed", "expect_column_values_to_be_in_set",
     {"column": "mult_dup", "value_set": ["1"]}),
    ("mixed", "expect_column_values_to_not_be_in_set",
     {"column": "mult_dup", "value_set": ["9"]}),
    ("mixed", "expect_column_values_to_be_unique", {"column": "uniq"}),
    ("mixed", "expect_column_values_to_be_unique", {"column": "mult_dup"}),
    ("mixed", "expect_column_values_to_be_unique", {"column": "a"}),
    ("mixed", "expect_column_value_lengths_to_be_between",
     {"column": "mult_dup", "min_value": 1, "max_value": 1}),
    ("mixed", "expect_column_value_lengths_to_equal",
     {"column": "a", "value": 1}),
    ("audio", "expect_column_values_to_match_regex",
     {"column": "clip_id", "regex": "^clip-[0-9]+$"}),
    ("audio", "expect_column_values_to_not_match_regex",
     {"column": "clip_id", "regex": "^bad_"}),
    ("audio", "expect_column_values_to_be_in_set",
     {"column": "codec", "value_set": ["wav", "flac", "mp3", "opus"], "mostly": 0.5}),
    ("audio", "expect_column_values_to_be_between",
     {"column": "sr_hz", "min_value": 8000, "max_value": 48000, "mostly": 0.5}),
    ("mixed", "expect_column_mean_to_be_between",
     {"column": "c", "min_value": 1, "max_value": 2}),
    ("mixed", "expect_column_min_to_be_between",
     {"column": "c", "min_value": 0, "max_value": 1}),
    ("mixed", "expect_column_max_to_be_between",
     {"column": "c", "min_value": 2, "max_value": 2}),
    ("mixed", "expect_column_sum_to_be_between",
     {"column": "c", "min_value": 4, "max_value": 4}),
    ("mixed", "expect_column_stdev_to_be_between",
     {"column": "c", "min_value": 0, "max_value": 1}),
    ("audio", "expect_column_mean_to_be_between",
     {"column": "dur_ms", "min_value": 0, "max_value": 100000}),
    ("mixed", "expect_column_unique_value_count_to_be_between",
     {"column": "mult_dup", "min_value": 2, "max_value": 2}),
    ("mixed", "expect_column_proportion_of_unique_values_to_be_between",
     {"column": "mult_dup", "min_value": 0, "max_value": 0.5}),
    ("audio", "expect_column_most_common_value_to_be_in_set",
     {"column": "codec", "value_set": ["wav"]}),
    ("mixed", "expect_column_distinct_values_to_be_in_set",
     {"column": "mult_dup", "value_set": ["1", "2", "3"]}),
    ("mixed", "expect_column_distinct_values_to_contain_set",
     {"column": "mult_dup", "value_set": ["1"]}),
    ("mixed", "expect_column_distinct_values_to_equal_set",
     {"column": "mult_dup", "value_set": ["1", "2"]}),
    ("mixed", "expect_table_row_count_to_equal", {"value": 4}),
    ("mixed", "expect_table_row_count_to_be_between",
     {"min_value": 1, "max_value": 10}),
    ("audio", "expect_column_values_to_be_json_parseable", {"column": "transcript", "mostly": 0.01}),
    ("mixed", "expect_column_values_to_be_json_parseable", {"column": "json_col", "mostly": 0.5}),
    ("audio", "expect_column_pair_values_to_be_equal",
     {"column_A": "clip_id", "column_B": "clip_id"}),
    ("audio", "expect_column_pair_values_a_to_be_greater_than_b",
     {"column_A": "dur_ms", "column_B": "sr_hz", "mostly": 0.1,
      "ignore_row_if": "either_value_is_missing"}),
]


@pytest.mark.parametrize("table,etype,kwargs", CASES,
                         ids=[f"{t}-{e.replace('expect_column_', '').replace('expect_table_', 't_')}-{i}"
                              for i, (t, e, kwargs) in enumerate(CASES)])
def test_evr_parity(spark, fixtures, table, etype, kwargs):
    df = fixtures[table]
    ref = _reference_result(df, etype, dict(kwargs))
    ours = _ours(df, etype, dict(kwargs))

    assert bool(ours.success) == bool(ref.success), (
        f"success mismatch: ours={ours.success} ref={ref.success} "
        f"ref result={dict(ref.result)} ours={ours.result}")

    rr, orr = dict(ref.result), ours.result
    for field in ("element_count", "missing_count", "unexpected_count"):
        if field in rr and field in orr:
            assert orr[field] == rr[field], (
                f"{field}: ours={orr[field]} ref={rr[field]}")
    for field in ("unexpected_percent_nonmissing", "unexpected_percent_total",
                  "missing_percent"):
        if field in rr and field in orr and rr[field] is not None:
            assert _close(orr[field], rr[field], rtol=1e-9), (
                f"{field}: ours={orr[field]} ref={rr[field]}")
    if "partial_unexpected_list" in rr and "partial_unexpected_list" in orr:
        assert _sorted_list(orr["partial_unexpected_list"]) == \
            _sorted_list(rr["partial_unexpected_list"])
    if "observed_value" in rr and "observed_value" in orr:
        ov_r, ov_o = rr["observed_value"], orr["observed_value"]
        if isinstance(ov_r, list) and isinstance(ov_o, list):
            assert _sorted_list(ov_o) == _sorted_list(ov_r)
        else:
            assert _close(ov_o, ov_r), f"observed: ours={ov_o} ref={ov_r}"


class TestUnexpectedIndexListParity:
    """Keyed unexpected-index analogue vs the reference's pandas-only
    positional `unexpected_index_list` (expectation.py:2087-2103): Spark has
    no stable row index, so the caller names business-key columns
    (unexpected_index_column_names); with a key column that EQUALS the
    pandas positional index, the two contracts must agree on membership,
    truncation (partial = first partial_unexpected_count at SUMMARY) and
    placement (full list only at COMPLETE)."""

    ROWS = [("clip-1", 16000), ("clip-2", 99000), ("clip-2", 1234),
            (None, 98000), ("bad_5", 97000), ("clip-9", 8000)]

    def _both(self, spark):
        import pandas as pd
        from great_expectations.dataset.pandas_dataset import PandasDataset
        pdf = pd.DataFrame(self.ROWS, columns=["clip_id", "sr_hz"])
        ref = PandasDataset(pdf)
        sdf = spark.createDataFrame(
            [(i, a, b) for i, (a, b) in enumerate(self.ROWS)],
            "idx int, clip_id string, sr_hz int")
        return ref, sdf

    def _ours(self, sdf, rf, **kwargs):
        suite = ExpectationSuite("p").add(
            "expect_column_values_to_be_between", column="sr_hz", **kwargs)
        return validate(sdf, suite, result_format={
            "result_format": rf, "partial_unexpected_count": 2,
            "unexpected_index_column_names": ["idx"]}).results[0]

    def test_summary_truncation_and_membership(self, spark):
        ref, sdf = self._both(spark)
        r = ref.expect_column_values_to_be_between(
            column="sr_hz", min_value=1000, max_value=50000,
            result_format={"result_format": "SUMMARY",
                           "partial_unexpected_count": 2})
        ours = self._ours(sdf, "SUMMARY", min_value=1000, max_value=50000)
        # 3 violations (rows 1, 3, 4) but partial truncates to 2 — same rule
        ref_partial = r.result["partial_unexpected_index_list"]
        our_partial = ours.result["partial_unexpected_index_list"]
        assert len(ref_partial) == len(our_partial) == 2
        # our keyed entries carry the key AND the domain value
        for e in our_partial:
            assert set(e) == {"idx", "sr_hz"}
        # membership: every reported key is a true violation index
        all_viol = {1, 3, 4}
        assert set(ref_partial) <= all_viol
        assert {e["idx"] for e in our_partial} <= all_viol
        # SUMMARY must NOT carry the full list — reference placement rule
        assert "unexpected_index_list" not in ours.result
        assert "unexpected_index_list" not in r.result

    def test_complete_full_list_matches(self, spark):
        ref, sdf = self._both(spark)
        r = ref.expect_column_values_to_be_between(
            column="sr_hz", min_value=1000, max_value=50000,
            result_format="COMPLETE")
        ours = self._ours(sdf, "COMPLETE", min_value=1000, max_value=50000)
        assert set(r.result["unexpected_index_list"]) == \
            {e["idx"] for e in ours.result["unexpected_index_list"]} == {1, 3, 4}
        # values agree row-by-row through the key
        ref_by_idx = dict(zip(r.result["unexpected_index_list"],
                              r.result["unexpected_list"]))
        for e in ours.result["unexpected_index_list"]:
            assert ref_by_idx[e["idx"]] == e["sr_hz"]

    def test_opt_out_keeps_reference_spark_shape(self, spark):
        """Without unexpected_index_column_names the result has no index
        keys at all — matching the reference's Spark engine, which emits
        None/omits them (self_check/util.py:1994-2000)."""
        _, sdf = self._both(spark)
        suite = ExpectationSuite("p").add(
            "expect_column_values_to_be_between", column="sr_hz",
            min_value=1000, max_value=50000)
        r = validate(sdf, suite, result_format="COMPLETE").results[0]
        assert "unexpected_index_list" not in r.result
        assert "partial_unexpected_index_list" not in r.result
