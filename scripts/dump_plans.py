#!/usr/bin/env python3
"""Dump ``explain("formatted")`` for registry queries to a directory.

Usage: python scripts/dump_plans.py <out_dir> [sf_dir] [query ...]

Writes <out_dir>/<query>.txt with the formatted plan of the DataFrame
the query returns. Queries that execute during construction (the
streaming slots, which return a localCheckpoint of a finished
StreamingQuery) still dump their — trivial — final-frame plan; their
real machinery is profiled by scripts/streaming_floor.py instead.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rental_data_pipeline_spark.session import get_spark  # noqa: E402
from rental_data_pipeline_spark import queries as registry  # noqa: E402


def main() -> None:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        "dump_plans", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in registry.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # pragma: no cover - diagnostic tool
            text = f"ERROR: {exc}\n"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(text)
        print(f"wrote {name} ({len(text)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
