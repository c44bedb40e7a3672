#!/usr/bin/env python3
"""Plan audit: execute each query, then report the FINAL adaptive plan's
physical characteristics — join strategies, exchange count, whole-stage
codegen spans, parquet pushdown/pruning. (Pre-action `.explain` shows
`isFinalPlan=false` without codegen annotation, so this executes first.)

Usage: python scripts/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from rental_data_pipeline_spark.session import get_spark  # noqa: E402

JOINS = r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|CartesianProduct|BroadcastNestedLoop"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("explain_audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        plan = df._jdf.queryExecution().executedPlan().toString()
        joins = sorted(set(re.findall(JOINS, plan)))
        codegen = len(set(re.findall(r"\*\((\d+)\)", plan)))
        exchanges = len(re.findall(r"\bExchange\b", plan))
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        python_ops = len(re.findall(r"MapInPandas|ArrowEvalPython|FlatMapGroupsInPandas", plan))
        print(
            f"{name:32s} joins={','.join(joins) or '-':30s} "
            f"codegen_spans={codegen:3d} exchanges={exchanges:3d} "
            f"pushed_filter_scans={pushed} python_stages={python_ops}"
        )


if __name__ == "__main__":
    main()
