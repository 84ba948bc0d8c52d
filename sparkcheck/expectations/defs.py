"""Declarative expectation registry.

One spec per reference expectation (SURVEY.md §2.6 — every file in
great_expectations/expectations/core/), mapping the expectation type to:
- its kind (how the planner compiles it),
- the condition / aggregate builders (sparkcheck.metrics.*),
- default kwargs (reference: ColumnMapExpectation defaults mostly=1,
  result_format=BASIC — expectation.py:1403-1411).

Kinds:
- "map"            per-row condition, fused into the single agg pass
- "map_window"     condition needs a window (increasing/decreasing) -> own job
- "map_unique"     uniqueness via groupBy dup-count job (NOT the reference's
                   window-over-all-rows which shuffles everything; see runner)
- "map_dependent"  condition depends on fused aggregates (z-score) -> 2nd pass
- "agg"            single aggregate expression + between-validation
- "agg_custom"     several fused slots + custom validate fn
- "schema"         pure schema check, no scan
- "value"          needs its own job (most_common_value)
- "referential"    join against another table (ours; reference does this via
                   evaluation-parameter URNs, core/evaluation_parameters.py)
- "drift"          binned-distribution comparison (KL/KS/PSI)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..metrics import conditions as C


@dataclass
class ExpectationSpec:
    name: str
    kind: str
    condition: Callable[[dict], Column] | None = None
    # predicate defining "non-missing" rows; None => column.isNotNull()
    nonnull: Callable[[dict], Column] | None = None
    # when False the expectation itself judges nulls (not_null / null):
    # denominator = element_count, missing_count = 0
    filter_nulls: bool = True
    # expression collected as the unexpected sample value; None => the column
    sample_value: Callable[[dict], Column] | None = None
    agg: Callable[[dict], Column] | None = None
    defaults: dict = field(default_factory=dict)
    # for agg_custom/schema/value/referential/drift kinds:
    extra: dict = field(default_factory=dict)


REGISTRY: dict[str, ExpectationSpec] = {}


def _reg(spec: ExpectationSpec) -> ExpectationSpec:
    REGISTRY[spec.name] = spec
    return spec


def get_spec(expectation_type: str) -> ExpectationSpec:
    if expectation_type not in REGISTRY:
        raise KeyError(f"unknown expectation_type: {expectation_type}")
    return REGISTRY[expectation_type]


_MOSTLY = {"mostly": 1.0}

# ---------------------------------------------------------------- column map

_reg(ExpectationSpec(
    "expect_column_values_to_not_be_null", "map",
    condition=C.not_null, filter_nulls=False, defaults=dict(_MOSTLY)))
_reg(ExpectationSpec(
    "expect_column_values_to_be_null", "map",
    condition=C.null, filter_nulls=False, defaults=dict(_MOSTLY)))
_reg(ExpectationSpec(
    "expect_column_values_to_be_between", "map",
    condition=C.between, defaults={**_MOSTLY, "strict_min": False, "strict_max": False}))
_reg(ExpectationSpec(
    "expect_column_values_to_be_in_set", "map",
    condition=C.in_set, defaults=dict(_MOSTLY)))
_reg(ExpectationSpec(
    "expect_column_values_to_not_be_in_set", "map",
    condition=C.not_in_set, defaults=dict(_MOSTLY)))
_reg(ExpectationSpec(
    "expect_column_value_lengths_to_be_between", "map",
    condition=C.value_length_between, defaults=dict(_MOSTLY)))
_reg(ExpectationSpec(
    "expect_column_value_lengths_to_equal", "map",
    condition=C.value_length_equals, defaults=dict(_MOSTLY)))
_reg(ExpectationSpec(
    "expect_column_values_to_match_regex", "map",
    condition=C.match_regex, defaults=dict(_MOSTLY)))
_reg(ExpectationSpec(
    "expect_column_values_to_not_match_regex", "map",
    condition=C.not_match_regex, defaults=dict(_MOSTLY)))
_reg(ExpectationSpec(
    "expect_column_values_to_match_regex_list", "map",
    condition=C.match_regex_list, defaults={**_MOSTLY, "match_on": "any"}))
_reg(ExpectationSpec(
    "expect_column_values_to_not_match_regex_list", "map",
    condition=C.not_match_regex_list, defaults=dict(_MOSTLY)))
_reg(ExpectationSpec(
    "expect_column_values_to_match_like_pattern", "map",
    condition=C.match_like_pattern, defaults=dict(_MOSTLY)))
_reg(ExpectationSpec(
    "expect_column_values_to_not_match_like_pattern", "map",
    condition=C.not_match_like_pattern, defaults=dict(_MOSTLY)))
_reg(ExpectationSpec(
    "expect_column_values_to_match_like_pattern_list", "map",
    condition=C.match_like_pattern_list, defaults={**_MOSTLY, "match_on": "any"}))
_reg(ExpectationSpec(
    "expect_column_values_to_not_match_like_pattern_list", "map",
    condition=C.not_match_like_pattern_list, defaults=dict(_MOSTLY)))
_reg(ExpectationSpec(
    "expect_column_values_to_match_strftime_format", "map",
    condition=C.match_strftime_format, defaults=dict(_MOSTLY)))
_reg(ExpectationSpec(
    "expect_column_values_to_be_json_parseable", "map",
    condition=C.json_parseable, defaults=dict(_MOSTLY)))
_reg(ExpectationSpec(
    "expect_column_values_to_match_json_schema", "map",
    condition=C.match_json_schema, defaults=dict(_MOSTLY)))
_reg(ExpectationSpec(
    "expect_column_values_to_be_dateutil_parseable", "map",
    condition=C.dateutil_parseable, defaults=dict(_MOSTLY)))

_reg(ExpectationSpec(
    "expect_column_values_to_be_increasing", "map_window",
    condition=C.increasing, defaults={**_MOSTLY, "strictly": False}))
_reg(ExpectationSpec(
    "expect_column_values_to_be_decreasing", "map_window",
    condition=C.decreasing, defaults={**_MOSTLY, "strictly": False}))

_reg(ExpectationSpec(
    "expect_column_values_to_be_unique", "map_unique",
    condition=C.unique, defaults=dict(_MOSTLY)))
_reg(ExpectationSpec(
    "expect_compound_columns_to_be_unique", "map_unique",
    condition=C.compound_columns_unique, defaults=dict(_MOSTLY),
    extra={"compound": True}))
# legacy V2 name (reference marks it notimplemented in V3 for every engine,
# self_check/util.py:1320; semantics = compound uniqueness)
_reg(ExpectationSpec(
    "expect_multicolumn_values_to_be_unique", "map_unique",
    condition=C.compound_columns_unique, defaults=dict(_MOSTLY),
    extra={"compound": True}))

_reg(ExpectationSpec(
    "expect_column_value_z_scores_to_be_less_than", "map_dependent",
    defaults={**_MOSTLY, "double_sided": True}))

# ------------------------------------------------------------- pair map

def _pair_sample(kw: dict):
    # violation sample = the [A, B] value pair with original types (golden
    # corpus: unexpected_list entries are 2-element lists)
    return F.struct(F.col(kw["column_A"]).alias("A"), F.col(kw["column_B"]).alias("B"))


_reg(ExpectationSpec(
    "expect_column_pair_values_to_be_equal", "map",
    condition=C.pair_equal, nonnull=C.pair_domain_filter,
    sample_value=_pair_sample,
    defaults={**_MOSTLY, "ignore_row_if": "both_values_are_missing"}))
_pair_gt = ExpectationSpec(
    "expect_column_pair_values_a_to_be_greater_than_b", "map",
    condition=C.pair_a_greater_than_b, nonnull=C.pair_domain_filter,
    sample_value=_pair_sample,
    defaults={**_MOSTLY, "or_equal": False, "ignore_row_if": "both_values_are_missing"})
_reg(_pair_gt)
# the reference registers the camel-case variant too (its golden corpus and
# V2 API use A/B capitals)
REGISTRY["expect_column_pair_values_A_to_be_greater_than_B"] = _pair_gt
_reg(ExpectationSpec(
    "expect_column_pair_values_to_be_in_set", "map",
    condition=C.pair_in_set, nonnull=C.pair_domain_filter,
    sample_value=_pair_sample,
    defaults={**_MOSTLY, "ignore_row_if": "both_values_are_missing"}))

# ---------------------------------------------------------- multicolumn map

_reg(ExpectationSpec(
    "expect_multicolumn_sum_to_equal", "map",
    condition=C.multicolumn_sum_equal, nonnull=C.multicolumn_domain_filter,
    sample_value=lambda kw: F.struct(*[F.col(c) for c in kw["column_list"]]),
    defaults={**_MOSTLY, "ignore_row_if": "all_values_are_missing"}))
_reg(ExpectationSpec(
    "expect_select_column_values_to_be_unique_within_record", "map",
    condition=C.select_unique_within_record, nonnull=C.multicolumn_domain_filter,
    sample_value=lambda kw: F.struct(*[F.col(c) for c in kw["column_list"]]),
    defaults={**_MOSTLY, "ignore_row_if": "all_values_are_missing"}))

# ------------------------------------------------------- column aggregates

def _col(kw: dict) -> Column:
    return F.col(kw["column"])


_reg(ExpectationSpec(
    "expect_column_mean_to_be_between", "agg",
    agg=lambda kw: F.avg(_col(kw)),
    defaults={"strict_min": False, "strict_max": False}))
_reg(ExpectationSpec(
    "expect_column_min_to_be_between", "agg",
    agg=lambda kw: F.min(_col(kw)),
    defaults={"strict_min": False, "strict_max": False}))
_reg(ExpectationSpec(
    "expect_column_max_to_be_between", "agg",
    agg=lambda kw: F.max(_col(kw)),
    defaults={"strict_min": False, "strict_max": False}))
_reg(ExpectationSpec(
    "expect_column_sum_to_be_between", "agg",
    agg=lambda kw: F.sum(_col(kw)),
    defaults={"strict_min": False, "strict_max": False}))
# reference uses SAMPLE stddev (column_standard_deviation.py:48-51)
_reg(ExpectationSpec(
    "expect_column_stdev_to_be_between", "agg",
    agg=lambda kw: F.stddev_samp(_col(kw)),
    defaults={"strict_min": False, "strict_max": False}))
_reg(ExpectationSpec(
    "expect_column_median_to_be_between", "agg",
    agg=lambda kw: F.median(_col(kw)),
    defaults={"strict_min": False, "strict_max": False}))
_reg(ExpectationSpec(
    "expect_column_unique_value_count_to_be_between", "agg",
    # exact by default; approximate=True uses HLL++ (north_star: HLL with
    # exact fallback). approx_count_distinct default rsd = 0.05.
    agg=lambda kw: (F.approx_count_distinct(_col(kw), kw.get("rsd", 0.05))
                    if kw.get("approximate") else F.count_distinct(_col(kw))),
    defaults={"approximate": False}))

_reg(ExpectationSpec(
    "expect_column_quantile_values_to_be_between", "agg_custom",
    extra={"handler": "quantiles"}))
_reg(ExpectationSpec(
    "expect_column_proportion_of_unique_values_to_be_between", "agg_custom",
    extra={"handler": "unique_proportion"}))
_reg(ExpectationSpec(
    "expect_column_distinct_values_to_be_in_set", "agg_custom",
    extra={"handler": "distinct_set", "mode": "subset"}))
_reg(ExpectationSpec(
    "expect_column_distinct_values_to_contain_set", "agg_custom",
    extra={"handler": "distinct_set", "mode": "superset"}))
_reg(ExpectationSpec(
    "expect_column_distinct_values_to_equal_set", "agg_custom",
    extra={"handler": "distinct_set", "mode": "equal"}))

_reg(ExpectationSpec(
    "expect_column_most_common_value_to_be_in_set", "value",
    extra={"handler": "most_common_value"}, defaults={"ties_okay": False}))
# reference is pandas-only (crosstab + chi2 — expect_column_pair_cramers_phi
# _value_to_be_less_than); ours: distributed groupBy(A,B) contingency +
# driver-side chi2/phi (guarded by max_cells)
_reg(ExpectationSpec(
    "expect_column_pair_cramers_phi_value_to_be_less_than", "value",
    extra={"handler": "cramers_phi"},
    defaults={"threshold": 0.1, "max_cells": 10_000}))

# ------------------------------------------------------------- table level

_reg(ExpectationSpec(
    "expect_table_row_count_to_equal", "agg_custom",
    extra={"handler": "row_count", "mode": "equal"}))
_reg(ExpectationSpec(
    "expect_table_row_count_to_be_between", "agg_custom",
    extra={"handler": "row_count", "mode": "between"}))
_reg(ExpectationSpec(
    "expect_table_row_count_to_equal_other_table", "referential",
    extra={"handler": "row_count_other_table"}))

_reg(ExpectationSpec("expect_column_to_exist", "schema", extra={"handler": "column_exists"}))
_reg(ExpectationSpec("expect_table_columns_to_match_ordered_list", "schema",
                     extra={"handler": "columns_ordered"}))
_reg(ExpectationSpec("expect_table_columns_to_match_set", "schema",
                     extra={"handler": "columns_set"}, defaults={"exact_match": True}))
_reg(ExpectationSpec("expect_table_column_count_to_equal", "schema",
                     extra={"handler": "column_count", "mode": "equal"}))
_reg(ExpectationSpec("expect_table_column_count_to_be_between", "schema",
                     extra={"handler": "column_count", "mode": "between"}))
_reg(ExpectationSpec("expect_column_values_to_be_of_type", "schema",
                     extra={"handler": "of_type"}))
_reg(ExpectationSpec("expect_column_values_to_be_in_type_list", "schema",
                     extra={"handler": "in_type_list"}))

# ------------------------------------------------- referential integrity

_reg(ExpectationSpec(
    "expect_column_values_to_be_in_table", "referential",
    extra={"handler": "fk"}, defaults=dict(_MOSTLY)))

# ------------------------------------------------------ distribution drift

_reg(ExpectationSpec(
    "expect_column_kl_divergence_to_be_less_than", "drift",
    extra={"score": "kl"},
    defaults={"tail_weight_holdout": 0.0, "internal_weight_holdout": 0.0,
              "bucketize_data": True}))
_reg(ExpectationSpec(
    "expect_column_ks_statistic_to_be_less_than", "drift",
    extra={"score": "ks"}, defaults={}))
_reg(ExpectationSpec(
    "expect_column_psi_to_be_less_than", "drift",
    extra={"score": "psi"}, defaults={}))
_reg(ExpectationSpec(
    "expect_column_chisquare_statistic_to_be_less_than", "drift",
    extra={"score": "chisq"}, defaults={}))
# p-value drift variants (reference scores these with scipy on raw pandas
# data — pandas-only; ours scores the binned sketch with scipy-free tails,
# success = p_value > threshold)
_reg(ExpectationSpec(
    "expect_column_chisquare_test_p_value_to_be_greater_than", "drift",
    extra={"score": "chisq_p", "direction": "greater"},
    defaults={"threshold": 0.05}))
_reg(ExpectationSpec(
    "expect_column_bootstrapped_ks_test_p_value_to_be_greater_than", "drift",
    extra={"score": "ks_p", "direction": "greater"},
    defaults={"threshold": 0.05}))
_reg(ExpectationSpec(
    "expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than",
    "drift",
    extra={"score": "ks_param_p", "direction": "greater"},
    defaults={"threshold": 0.05}))

# ------------------------------------------------------- audio invariants

_reg(ExpectationSpec(
    "expect_audio_snr_vs_reference_to_be_above", "audio",
    extra={"handler": "snr"}, defaults={**_MOSTLY, "min_snr_db": 30.0}))
# byte-identity of the payload vs the reference twin via hash equality —
# prescreen-only (no decode, no binary shuffle; zero binary READ with a
# stored hash_column). Ours: the reference has no binary operators.
_reg(ExpectationSpec(
    "expect_audio_payload_to_match_reference", "audio",
    extra={"handler": "payload"}, defaults=dict(_MOSTLY)))
# header-vs-metadata consistency: decoded RIFF header sample rate must equal
# the sr_hz metadata column (ours — the reference has no binary operators)
_reg(ExpectationSpec(
    "expect_audio_header_to_match_metadata", "audio",
    extra={"handler": "header"}, defaults=dict(_MOSTLY)))

# audio x transcript consistency: transcript word rate vs clip duration.
# Pure-Catalyst pair condition over (transcript, dur_ms) — fused into the
# single metadata agg pass, zero binary read (unlike the decode-path audio
# kinds above), and mergeable for incremental validation since it is a plain
# map kind. Ours: the reference has no multimodal consistency operators; the
# kwarg contract (column_A/column_B + mostly) mirrors its pair expectations
# (column_pair_map_expectation, expectation.py:2097-2185).


def _words_per_second(kw: dict) -> Column:
    tr = F.trim(F.col(kw["column_A"]))
    words = F.when(tr == "", F.lit(0)).otherwise(F.size(F.split(tr, r"\s+")))
    # try_divide: NULL (not an ANSI error) on dur_ms == 0; the condition's
    # (dur_ms > 0) conjunct already marks those rows unexpected
    return F.try_divide(words.cast("double"),
                        F.col(kw["column_B"]).cast("double") / 1000.0)


# payload-vs-metadata duration consistency for canonical PCM16 mono WAV:
# the duration implied by the payload byte length ((len - header)/2 samples
# at sr_hz) must match the dur_ms metadata column within tolerance_ms. Pure
# Catalyst (F.length / F.substring on binary) — zero decode, zero python,
# fused into the single metadata agg pass like any other map condition, so
# at 10^12 rows it costs one whole-stage-codegen pass over already-read
# bytes. The canonical-header assumption (header_bytes=44, PCM16 mono) is
# the contract; non-canonical containers need the parsed
# expect_audio_header_to_match_metadata check instead. Ours: the reference
# has no binary operators.


def _pcm_duration_ms(kw: dict) -> Column:
    data = (F.length(F.col(kw["bytes_column"]))
            - F.lit(int(kw["header_bytes"]))).cast("double")
    # try_divide: NULL (not an ANSI error) on sr_hz == 0; the condition's
    # (sr_hz > 0) conjunct already marks those rows unexpected
    return F.try_divide(data / 2.0 * 1000.0,
                        F.col(kw["sr_column"]).cast("double"))


_reg(ExpectationSpec(
    "expect_audio_pcm_duration_to_match_metadata", "map",
    condition=lambda kw: (
        (F.substring(F.col(kw["bytes_column"]), 1, 4) == F.lit(b"RIFF"))
        & (F.col(kw["sr_column"]) > 0)
        & (F.abs(_pcm_duration_ms(kw)
                 - F.col(kw["dur_column"]).cast("double"))
           <= F.lit(float(kw["tolerance_ms"])))),
    nonnull=lambda kw: (F.col(kw["bytes_column"]).isNotNull()
                        & F.col(kw["sr_column"]).isNotNull()
                        & F.col(kw["dur_column"]).isNotNull()),
    sample_value=lambda kw: F.struct(
        F.col(kw["dur_column"]).alias("dur_ms"),
        F.round(_pcm_duration_ms(kw), 3).alias("pcm_ms"),
        F.col(kw["sr_column"]).alias("sr_hz"),
        F.length(F.col(kw["bytes_column"])).alias("payload_bytes")),
    defaults={**_MOSTLY, "bytes_column": "bytes", "sr_column": "sr_hz",
              "dur_column": "dur_ms", "tolerance_ms": 1.0,
              "header_bytes": 44}))

_reg(ExpectationSpec(
    "expect_transcript_words_per_second_to_be_between", "map",
    condition=lambda kw: (F.col(kw["column_B"]) > 0)
    & _words_per_second(kw).between(kw["min_wps"], kw["max_wps"]),
    nonnull=lambda kw: (F.col(kw["column_A"]).isNotNull()
                        & F.col(kw["column_B"]).isNotNull()),
    sample_value=lambda kw: F.struct(
        F.substring(F.col(kw["column_A"]), 1, 40).alias("transcript_head"),
        F.col(kw["column_B"]).alias("dur_ms"),
        F.round(_words_per_second(kw), 3).alias("wps")),
    defaults={**_MOSTLY, "column_A": "transcript", "column_B": "dur_ms",
              "min_wps": 1.0, "max_wps": 40.0}))
