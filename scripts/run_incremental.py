#!/usr/bin/env python
"""spark-submit entry point for the incremental validation loop.

Usage (north rule execution mode — run this on every new snapshot commit):

    python scripts/make_pyfiles.py          # -> dist/sparkcheck.zip

    spark-submit --py-files dist/sparkcheck.zip scripts/run_incremental.py \
        --table /path/to/audio_clips \
        --suite suites/audio_contract.json \
        --store /path/to/incremental_store \
        [--reference name=/path/to/ref ...] [--frozen-reference] \
        [--strict]

Each invocation validates ONLY the snapshots the stats store has not seen
(one fused statistics pass per append delta — at 10^12 rows nothing already
validated is re-read) and prints the merged whole-table verdicts plus the
list of expectations that cannot be merged from statistics (run those
through scripts/run_checkpoint.py on a full scan when they matter). Exit
code 0 iff every MERGEABLE expectation passes; 2 if the suite has
unsupported expectations and --strict was given.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--table", required=True,
                    help="snapshot-log table dir (sparkcheck.io.write_table)")
    ap.add_argument("--suite", required=True, help="ExpectationSuite JSON file")
    ap.add_argument("--store", required=True, help="incremental stats store")
    ap.add_argument("--reference", action="append", default=[],
                    help="name=path of a reference table (repeatable)")
    ap.add_argument("--frozen-reference", action="store_true",
                    help="assert the reference tables never change between "
                         "deltas: audio + referential counts become "
                         "mergeable (violations are detected at merge)")
    ap.add_argument("--strict", action="store_true",
                    help="refuse suites with non-mergeable expectations")
    ap.add_argument("--result-format", default="BASIC")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.appName("sparkcheck-incremental")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())

    from sparkcheck import ExpectationSuite
    from sparkcheck.incremental import IncrementalCheckpoint

    with open(args.suite) as f:
        suite = ExpectationSuite.from_json(f.read())
    tables = {}
    for spec in args.reference:
        name, _, path = spec.partition("=")
        tables[name] = spark.read.parquet(path)

    try:
        inc = IncrementalCheckpoint(
            suite, args.store, result_format=args.result_format,
            tables=tables, frozen_reference=args.frozen_reference,
            strict=args.strict)
    except ValueError as e:
        print(json.dumps({"error": str(e)}))
        return 2

    ran = inc.validate_table(spark, args.table)
    result = inc.merged_result(spark)
    ok = bool(result.success)
    print(json.dumps({
        "validated_now": ran["validated_now"],
        "snapshots_merged": result.meta["incremental"]["snapshots_merged"],
        "verdicts": [{
            "expectation_type": r.expectation_config.expectation_type,
            "domain": r.expectation_config.kwargs.get("column", ""),
            "success": bool(r.success),
            "element_count": r.result.get("element_count"),
            "unexpected_count": r.result.get("unexpected_count"),
            "observed_value": r.result.get("observed_value"),
        } for r in result.results],
        "unsupported": result.meta["incremental"]["unsupported"],
        "suite_success": ok,
    }, default=str))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
