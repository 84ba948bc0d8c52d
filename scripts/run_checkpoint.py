#!/usr/bin/env python
"""spark-submit entry point for a checkpointed validation run.

Usage (north rule: `spark-submit --py-files` on a multi-executor cluster):

    # package the engine once
    python scripts/make_pyfiles.py          # -> dist/sparkcheck.zip

    spark-submit --py-files dist/sparkcheck.zip scripts/run_checkpoint.py \
        --table /path/to/audio_clips \
        --suite suites/audio_contract.json \
        --store /path/to/checkpoint_store \
        --group-key clip_id --n-groups 64 \
        [--reference name=/path/to/ref ...] \
        [--snapshot-id snap-123] [--resume]

The run validates group-by-group (deterministic hash of --group-key), commits
each group's verdict rows + the manifest atomically, and on a re-run (same
--store) skips already-committed groups — the kill/resume contract
(sparkcheck/checkpoint.py). Exit code 0 iff every expectation passed in the
suite-level rollup.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--table", required=True,
                    help="input table path (parquet dir, or manifest dir from sparkcheck.io.write_table)")
    ap.add_argument("--suite", required=True, help="ExpectationSuite JSON file")
    ap.add_argument("--store", required=True, help="checkpoint store directory")
    ap.add_argument("--group-key", required=True,
                    help="stable column hashed into commit groups (e.g. clip_id)")
    ap.add_argument("--n-groups", type=int, default=64)
    ap.add_argument("--group-mode", default="hash", choices=["hash", "column"],
                    help="'column': one commit group per distinct value of "
                         "--group-key (prunes partitioned layouts); 'hash': "
                         "deterministic xxhash64 buckets")
    ap.add_argument("--reference", action="append", default=[],
                    help="name=path of a reference table (repeatable)")
    ap.add_argument("--single-pass", action="store_true",
                    help="validate ALL groups in one table scan (per-group "
                         "verdicts from a rollup agg) instead of one scan "
                         "per group — use when the layout cannot prune per "
                         "group; commit is all-or-nothing")
    ap.add_argument("--snapshot-id", default="snap-0")
    ap.add_argument("--result-format", default="BASIC")
    ap.add_argument("--unique-strategy", default="exact", choices=["exact", "approx"])
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.appName("sparkcheck-checkpoint")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
             .getOrCreate())

    from sparkcheck import Checkpoint, ExpectationSuite
    from sparkcheck.io import read_table

    with open(args.suite) as f:
        suite = ExpectationSuite.from_json(f.read())

    import os
    if os.path.exists(os.path.join(args.table, "manifest.json")):
        df, manifest = read_table(spark, args.table)
        snapshot_id = manifest.get("snapshot_id", args.snapshot_id)
    else:
        df, snapshot_id = spark.read.parquet(args.table), args.snapshot_id

    tables = {}
    for spec in args.reference:
        name, _, path = spec.partition("=")
        tables[name] = spark.read.parquet(path)

    cp = Checkpoint(args.store, suite, group_key=args.group_key,
                    n_groups=args.n_groups, group_mode=args.group_mode,
                    tables=tables,
                    result_format=args.result_format,
                    unique_strategy=args.unique_strategy)
    stats = (cp.run_single_pass(df, snapshot_id=snapshot_id)
             if args.single_pass else cp.run(df, snapshot_id=snapshot_id))
    rollup = cp.rollup(spark).collect()
    ok = all(r["success"] for r in rollup)
    print(json.dumps({
        "run": stats,
        "rollup": [{k: r[k] for k in ("expectation_type", "domain", "success",
                                      "element_count", "unexpected_count")}
                   for r in rollup],
        "suite_success": ok,
    }, default=str))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
