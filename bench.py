#!/usr/bin/env python3
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full computation,
no driver-side collect bottleneck), which is how a cluster job would
be measured.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rental_data_pipeline_spark.session import get_spark  # noqa: E402
from rental_data_pipeline_spark import queries as registry  # noqa: E402

# Headline set == the full 50-entry driver registry (round 4): every
# oracle-checked query is timed, so BENCH queries match CORRECTNESS
# keys one-for-one. Totals are not comparable to rounds 1-2 (suite
# consolidation in round 3) or to round 3 (10 queries added, extraction
# fixtures are now page-size-realistic); use calib_sec to normalize
# per-query times across rounds.
HEADLINE = [
    "cdc_merge_state",
    "cdc_change_feed",
    "dedup_last_wins",
    "pricing_summary",
    "top_orders_per_customer",
    "enrich_supplier_geo",
    "worklist_unions",
    "filter_recent_or_active",
    "cdc_key_lifecycle",
    "worklist_anti_joins",
    "json_props_pluck",
    "scalar_suite",
    # training-data ops (documents/embeddings)
    "text_profile",
    "text_length_percentiles",
    "dedup_exact",
    "dedup_fingerprint_groups",
    "dedup_simhash",
    "dedup_near_pairs",
    "dedup_canonical_corpus",
    "embedding_quantize",
    "tfidf_top_terms",
    "ann_topk_methods",
    "kmeans_cells",
    "similarity_near_dup",
    "skew_salted_join",
    "sample_deterministic",
    "stratified_sample_split",
    "sketch_distinct_counts",
    "ngram_lm_counts",
    "corpus_curate",
    "dedup_components",
    "decontaminate_ngram",
    "pii_scrub",
    "text_repetition",
    "multimodal_decode",
    "multimodal_frames",
    "chunk_documents",
    "pack_sequences",
    # extraction layer (render → parse → project round-trip)
    "extract_listing_fields",
    "extract_search_cards",
    "extract_quarantine_pagination",
    # streaming: real-engine window agg + micro-batch CDC + stateful op
    "streaming_window_stats",
    "session_window_stats",
    "streaming_merge_state",
    "stateful_price_changes",
    # custom/OLAP operators
    "asof_click_before_purchase",
    "pricing_rollup",
    "range_join_incident_window",
    "gapfill_user_daily",
    # the full five-step job (extraction + 3 CDC merges + enrichment)
    "pipeline_end_to_end",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # Console progress bars share stderr with the JSON line's capture
    # window — r8's artifact arrived truncated mid-JSON. Keep the
    # emission path clean.
    spark = get_spark(
        "bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    qs = registry.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in os.environ.get("SPARK_GRAFT_BENCH_EXTRA", "").split(",") if n in qs
    ]

    from pyspark.sql import functions as F  # noqa: E402

    # Prepared artifacts build LAZILY inside the warmup pass (each
    # query's first call), NOT in an up-front phase: measured both ways
    # (round 11), an up-front build — serial or 6-way concurrent —
    # charges the session's first-complex-job JIT/codegen storm to the
    # builds (~70 s wall vs ~22 s lazily on the same host) and breaks
    # cross-round comparability of value_cold. Deployments that want
    # one up-front call use queries.prebuild_artifacts(spark, sf_dir).

    # Untimed warmup pass over every headline query: absorbs JIT/codegen
    # compilation, Python-worker pool spawn, and OS page-fault cost of
    # the peak working set, so the timed pass measures steady-state
    # throughput (the regime a long-running cluster job operates in).
    # This VM serves first-touch memory pages lazily at ~5 MB/s; without
    # the warmup, whichever query first grows the heap or forks the
    # Python workers absorbs a 10-30 s fault storm at random.
    for name in names:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    def sched_sample() -> float:
        # one sample of the fixed 3-stage shuffle job (see probe_sched)
        t0 = time.perf_counter()
        (
            spark.range(0, 1_000_000, 1, 32)
            .repartition(32, F.pmod("id", F.lit(997)))
            .groupBy(F.pmod("id", F.lit(1009)).alias("g"))
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.sum("n")).collect()
        )
        return round(time.perf_counter() - t0, 3)

    # Per-slot noise bracketing (round-7 verdict): the host stalls in
    # bursts (calib_sched swung 0.69→2.24→0.71 within ONE session, and
    # r7 recorded a 3.7x phantom regression on an untouched query), so
    # a single per-run calibration can't tell a slow query from a slow
    # MINUTE. The heaviest slots get a scheduling-probe sample
    # immediately before and after EACH timed rep; a recorded time
    # whose bracket is inflated is host noise, not a regression.
    HEAVY = {
        "pipeline_end_to_end", "ann_topk_methods", "dedup_components",
        "streaming_merge_state", "extract_listing_fields",
    }

    # Two timed repetitions, min per query: the min is the standard
    # noise-robust estimator for a deterministic workload — it reports
    # the machine-limited runtime, not transient host interference.
    timings: dict[str, float] = {}
    query_calib: dict[str, dict] = {}
    for _rep in range(2):
        for name in names:
            heavy = name in HEAVY
            if heavy:
                b = sched_sample()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            if heavy:
                a = sched_sample()
                slot = query_calib.setdefault(
                    name, {"sched_before": [], "sched_after": []}
                )
                slot["sched_before"].append(b)
                slot["sched_after"].append(a)
            timings[name] = min(timings.get(name, dt), dt)
            # queries are independent jobs: drop any operator-level persisted
            # intermediates so one query's cache doesn't skew the next
            spark.catalog.clearCache()

    # Fixed CPU calibration probe: a pure-compute hash-aggregate over a
    # generated range (no I/O, no Python workers). Identical work every
    # round, so cross-round query-time comparisons can be normalized for
    # host-speed drift (round-3 measurement: the same committed queries
    # ran ~2x slower than round 2 on an otherwise idle VM).
    # Three samples, median: the normalizer is load-bearing for every
    # cross-round comparison, so one GC pause or cron wakeup must not
    # be able to skew a whole round's normalization (a min-of-2 can be
    # dragged by a single clean sample landing next to a dirty one).
    # Two probe sizes: the 200M probe matches rounds 3-4 (comparable
    # across all instrumented rounds) but finishes in ~0.1-0.3 s, where
    # scheduling jitter is a large relative error (observed 3x spread
    # between its own samples); the 1G probe amortizes that jitter and
    # is the preferred normalizer from round 5 on.
    def probe(n_rows: int) -> list[float]:
        samples = []
        for _rep in range(3):
            t0 = time.perf_counter()
            (
                spark.range(0, n_rows, 1, 32)
                .select(F.xxhash64("id").alias("h"))
                .agg(F.expr("bit_xor(h)")).collect()
            )
            samples.append(round(time.perf_counter() - t0, 3))
        return samples

    # Scheduling probe: the CPU probes above are single-stage pure
    # compute, but most registry queries at sf0.1 are OVERHEAD-bound —
    # multi-stage plans of 32 tiny tasks each, where task launch +
    # shuffle machinery dominates. Round-5 observation: a host ran the
    # CPU probe 2x FASTER than round 4's while untouched queries ran
    # ~1.3x slower — pure-CPU normalization alone inverts the story for
    # overhead-bound queries. This probe times a fixed 3-stage
    # shuffle-heavy job (2 exchanges x 32 tasks on 1M rows: negligible
    # compute, all machinery) so cross-round comparisons can bracket a
    # query between the compute-bound and overhead-bound normalizers.
    def probe_sched() -> list[float]:
        samples = []
        for _rep in range(3):
            t0 = time.perf_counter()
            (
                spark.range(0, 1_000_000, 1, 32)
                .repartition(32, F.pmod("id", F.lit(997)))
                .groupBy(F.pmod("id", F.lit(1009)).alias("g"))
                .agg(F.count(F.lit(1)).alias("n"))
                .agg(F.sum("n")).collect()
            )
            samples.append(round(time.perf_counter() - t0, 3))
        return samples

    calib_samples = probe(200_000_000)
    calib_long_samples = probe(1_000_000_000)
    calib_sched_samples = probe_sched()
    calib = sorted(calib_samples)[1]

    from rental_data_pipeline_spark import prepared as _prepared

    builds = _prepared.build_log()
    value = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_runtime",
        "value": value,
        # steady-state total + the one-time prepared-artifact builds a
        # fresh session pays (state folds, trained indexes): warm vs
        # cold cross-round comparisons are mechanical, not archaeology.
        "value_cold": round(value + sum(builds.values()), 3),
        "unit": "sec",
        "queries": timings,
        "calib_sec": calib,
        "calib_long_sec": sorted(calib_long_samples)[1],
        "calib_sched_sec": sorted(calib_sched_samples)[1],
        "sf": sf,
    }
    # The driver captures only a ~2000-char output tail: r8's JSON line
    # outgrew it (query_calib + probe sample lists) and arrived
    # truncated mid-line ("parsed": null). The stdout line now carries
    # the contract fields + the three scalar calibrations and stays
    # well under the window; the full detail (probe samples, per-slot
    # sched brackets) goes to BENCH_LAST.json next to this script.
    full = dict(out)
    full.update(
        {
            "calib_samples": calib_samples,
            "calib_long_samples": calib_long_samples,
            "calib_sched_samples": calib_sched_samples,
            "query_calib": query_calib,
            # one-time prepared-artifact build costs (state folds,
            # trained indexes) — amortized by the session memo,
            # reported here rather than hidden
            "prepared_builds": builds,
        }
    )
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LAST.json"),
        "w",
    ) as f:
        json.dump(full, f, indent=1)
    # tear down streams + session BEFORE emitting the JSON line so a
    # late streaming-shutdown stack can't interleave with it on stdout
    for q in spark.streams.active:
        try:
            q.stop()
        except Exception:
            pass
    spark.stop()
    line = json.dumps(out)
    print(line, flush=True)


if __name__ == "__main__":
    main()
