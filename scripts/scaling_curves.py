#!/usr/bin/env python3
"""Empirical scaling curves for the heavy training-data operators.

Runs each representative operator at sf0.001 / sf0.01 / sf0.1 (10x
data steps) and fits the log-log slope: an exponent near 1.0 is linear
scaling — the property the 100 TB design claims rest on; an exponent
near 2.0 would expose a hidden quadratic (the thing the inverted-index
/ banding / broadcast designs exist to avoid). Fixed per-query session
overhead deflates small-sf times, so the slope between the two LARGEST
scales is the honest one and is reported separately.

Usage: python scripts/scaling_curves.py [ops...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rental_data_pipeline_spark.session import get_spark  # noqa: E402
from rental_data_pipeline_spark.sources.tables import load_table  # noqa: E402

# "1x10" = ten id-shifted sf0.1 replicas (synthetic 10x tier; see _x10)
SFS = ["0.001", "0.01", "0.1", "1x10"]


def _ops():
    from pyspark.sql import functions as F

    from rental_data_pipeline_spark.operators import dedup as D
    from rental_data_pipeline_spark.operators import similarity as S
    from rental_data_pipeline_spark.operators import textstats as TS
    from rental_data_pipeline_spark.operators.sketch import sampled_quantiles

    def _x10(df, id_col):
        """Synthetic 10x tier: ten id-shifted replicas with a per-copy
        token salt appended to text (distinct docs, preserved overlap
        structure within each replica) — extends the measured curve one
        decade past the largest generated table."""
        reps = df.sparkSession.range(10).select(F.col("id").alias("__rep"))
        out = df.crossJoin(reps).withColumn(
            id_col, F.col(id_col) + F.col("__rep") * 10_000_000
        )
        if "text" in out.columns:
            out = out.withColumn(
                "text",
                F.concat(F.col("text"), F.lit(" uniq"), F.col("__rep")),
            )
        return out.drop("__rep")

    def docs(spark, sf):
        if sf == "1x10":
            return _x10(load_table(spark, "documents", "/root/testdata/sf0.1"), "doc_id")
        return load_table(spark, "documents", f"/root/testdata/sf{sf}")

    def embs(spark, sf):
        if sf == "1x10":
            return _x10(load_table(spark, "embeddings", "/root/testdata/sf0.1"), "vec_id")
        return load_table(spark, "embeddings", f"/root/testdata/sf{sf}")

    return {
        "exact_dedup": lambda spark, sf: D.exact_duplicates(docs(spark, sf)),
        "jaccard_capped": lambda spark, sf: D.jaccard_pairs(
            docs(spark, sf), threshold=0.8, max_doc_freq=5
        ),
        "minhash_lsh": lambda spark, sf: D.minhash_lsh_pairs(
            docs(spark, sf), threshold=0.8
        ),
        "simhash": lambda spark, sf: D.simhash_near_pairs(docs(spark, sf)),
        "ann_ivf": lambda spark, sf: S.ivf_topk(
            embs(spark, sf), query_ids=[1, 2, 3, 4, 5], top_k=5
        ),
        "embedding_near_dup": lambda spark, sf: S.embedding_near_dup_pairs(
            embs(spark, sf), threshold=0.4, bucketed=True
        ),
        "span_dedup": lambda spark, sf: D.duplicated_spans(
            docs(spark, sf), window=10
        ),
        "span_cut": lambda spark, sf: D.cut_duplicated_spans(
            docs(spark, sf), window=10
        ),
        # the multi-length sweep should cost ~one span_dedup scan, not
        # |windows| of them (shared tokenize + shared explode)
        "span_dedup_multi": lambda spark, sf: D.multi_window_duplicated_spans(
            docs(spark, sf), windows=[10, 20]
        ),
        "text_profile": lambda spark, sf: TS.profile(docs(spark, sf)),
        "tfidf": lambda spark, sf: TS.tfidf_top_terms(docs(spark, sf)),
        # round-13 additions: the reworked bounded-memory quantile
        # sketch and the bigram-LM quality score — both should hold a
        # ~linear slope (the sketch's two-level rank is k-bounded per
        # shard; the LM's joins move distinct (lang, w1[, w2]) counts)
        "bottomk_quantiles": lambda spark, sf: sampled_quantiles(
            docs(spark, sf), ["lang"], "n_chars", "doc_id", [0.5, 0.9], k=128
        ),
        "bigram_lm_ppl": lambda spark, sf: TS.bigram_lm_perplexity(
            docs(spark, sf)
        ),
    }


def main() -> None:
    ops = _ops()
    only = set(sys.argv[1:])
    spark = get_spark("scaling_curves")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    for name, fn in ops.items():
        if only and name not in only:
            continue
        times, rows = [], []
        for sf in SFS:
            # every tier is timed cold: the smallest tier absorbs
            # session/codegen warmup, which is why exponent_top_decade
            # (largest two tiers) is the reported slope
            t0 = time.perf_counter()
            n = fn(spark, sf).count()
            times.append(round(time.perf_counter() - t0, 3))
            rows.append(n)
            spark.catalog.clearCache()
        slope_all = (math.log10(times[-1]) - math.log10(times[0])) / (
            len(SFS) - 1
        )
        slope_top = math.log10(times[-1] / times[-2])
        results[name] = {
            "sf": SFS,
            "sec": times,
            "rows": rows,
            "exponent_all": round(slope_all, 2),
            "exponent_top_decade": round(slope_top, 2),
        }
        print(
            f"{name:22s} sec={times} rows={rows} "
            f"exp(top decade)={slope_top:+.2f}",
            flush=True,
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
