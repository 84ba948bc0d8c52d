"""GE-compatible result formatting.

Replicates the reference's `_format_map_output`
(great_expectations/expectations/expectation.py:1989-2109) and the `mostly`
success semantics (`ColumnMapExpectation._validate`, expectation.py:1557-1603)
and aggregate between-semantics
(`TableExpectation._validate_metric_value_between`, expectation.py:1319-1381).

Result formats:
- BOOLEAN_ONLY: {}
- BASIC: element_count, unexpected_count, unexpected_percent,
  partial_unexpected_list, missing_count, missing_percent,
  unexpected_percent_total, unexpected_percent_nonmissing
- SUMMARY: + partial_unexpected_counts (most-common, tie-broken (-count, value))
- COMPLETE: + unexpected_list
(The reference's positional `unexpected_index_list` is Pandas-only — Spark
has no stable row index (expectation.py:1541-1553, self_check/util.py:
1994-2000). Our analogue is opt-in: pass
``result_format={"result_format": "SUMMARY", "unexpected_index_column_names":
["clip_id"]}`` and SUMMARY adds `partial_unexpected_index_list` /
COMPLETE adds `unexpected_index_list`, each entry a dict of the named
business-key column(s) + the domain column's unexpected value — the shape
the reference's newer result-format contract uses for keyed indices.)
"""

from __future__ import annotations

from collections import Counter
from typing import Any

RESULT_FORMATS = ("BOOLEAN_ONLY", "BASIC", "SUMMARY", "COMPLETE")
DEFAULT_PARTIAL_UNEXPECTED_COUNT = 20  # reference: data_asset/util.py:24-28


def normalize_result_format(result_format: Any) -> dict:
    if isinstance(result_format, str):
        return {
            "result_format": result_format,
            "partial_unexpected_count": DEFAULT_PARTIAL_UNEXPECTED_COUNT,
        }
    rf = dict(result_format)
    rf.setdefault("result_format", "BASIC")
    rf.setdefault("partial_unexpected_count", DEFAULT_PARTIAL_UNEXPECTED_COUNT)
    rf.setdefault("unexpected_index_column_names", None)
    return rf


def mostly_success(element_count: int, nonnull_count: int, unexpected_count: int, mostly: float) -> bool:
    """Reference mostly semantics (expectation.py:1581-1603): vacuously true
    when the table is empty or the column is all-null; else
    (nonnull - unexpected) / nonnull >= mostly."""
    if element_count == 0 or nonnull_count == 0:
        return True
    success_ratio = (nonnull_count - unexpected_count) / nonnull_count
    return success_ratio >= mostly


def format_map_output(
    result_format: dict,
    success: bool,
    element_count: int,
    nonnull_count: int,
    unexpected_count: int,
    unexpected_list: list | None = None,
    unexpected_index_list: list | None = None,
) -> dict:
    """Build the map-expectation `result` dict, field-for-field compatible
    with the reference (expectation.py:1989-2109). `unexpected_index_list`
    (keyed entries from unexpected_index_column_names) follows the
    reference's placement rules: truncated to partial_unexpected_count at
    SUMMARY, full at COMPLETE (expectation.py:2087-2103); the keys are
    emitted only when an index list was collected (opt-in)."""
    rf = result_format["result_format"]
    if rf == "BOOLEAN_ONLY":
        return {}

    missing_count = element_count - nonnull_count
    if element_count > 0:
        unexpected_percent_total = unexpected_count / element_count * 100.0
        missing_percent = missing_count / element_count * 100.0
        if nonnull_count > 0:
            unexpected_percent_nonmissing = unexpected_count / nonnull_count * 100.0
        else:
            unexpected_percent_nonmissing = None
    else:
        unexpected_percent_total = None
        missing_percent = None
        unexpected_percent_nonmissing = None

    k = result_format["partial_unexpected_count"]
    ulist = list(unexpected_list) if unexpected_list is not None else []
    result = {
        "element_count": element_count,
        "unexpected_count": unexpected_count,
        "unexpected_percent": unexpected_percent_nonmissing,
        "partial_unexpected_list": ulist[:k],
        "missing_count": missing_count,
        "missing_percent": missing_percent,
        "unexpected_percent_total": unexpected_percent_total,
        "unexpected_percent_nonmissing": unexpected_percent_nonmissing,
    }

    if rf == "BASIC":
        return result

    # SUMMARY adds partial_unexpected_counts (reference: expectation.py:2068-2094)
    try:
        counts = Counter(ulist)
        partial_counts = [
            {"value": v, "count": c}
            for v, c in sorted(counts.items(), key=lambda vc: (-vc[1], str(vc[0])))
        ][:k]
    except TypeError:  # unhashable values
        partial_counts = []
    result["partial_unexpected_counts"] = partial_counts
    if unexpected_index_list is not None:
        result["partial_unexpected_index_list"] = unexpected_index_list[:k]

    if rf == "SUMMARY":
        return result

    # COMPLETE adds the full unexpected list
    result["unexpected_list"] = ulist
    if unexpected_index_list is not None:
        result["unexpected_index_list"] = unexpected_index_list
    return result


def validate_metric_value_between(
    value: Any,
    min_value: Any = None,
    max_value: Any = None,
    strict_min: bool = False,
    strict_max: bool = False,
) -> dict:
    """Aggregate between-semantics (reference expectation.py:1319-1381):
    open bounds when None; returns {success, result:{observed_value}}."""
    if value is None:
        return {"success": False, "result": {"observed_value": None}}
    above = True
    if min_value is not None:
        above = value > min_value if strict_min else value >= min_value
    below = True
    if max_value is not None:
        below = value < max_value if strict_max else value <= max_value
    return {"success": bool(above and below), "result": {"observed_value": value}}
