"""The five-step pipeline job (SURVEY §3.1, ref parse_data.py:510-542)
as one Spark batch dataflow.

    0 setup      S1 state load, S5/S6 search config → predicates
    1 search     E2 card split → F5 → A2 ids → J7/J8 tombstones →
                 P1 → X3-X5 → J1 merge
    2 listings   J9 scope union (J6 ∪ J7 ∪ F2, flag-gated) →
                 E1 parse → P1 → X3-X5 → J1 merge
    3 distance   F3/P3 work select → J11 two-stage lookup joins →
                 X16 km → J10 merge back
    4 snapshots  K1 state JSON, K2 full CSV, F4+K3 filtered CSV
    5 metrics    A7 per-stage row counts via ``Observation``

Live HTTP never enters the query path (SURVEY §7.3): page content
arrives as DataFrames — ``search_pages`` (page_id, html) and
``listing_pages_for(ids)`` (html, url) — which in production read the
crawl landing directory and in tests are rendered fixtures
(operators/extract fixture renderers). The geo lookups (J11) are
lookup *tables* (address→lat/lon, lat/lon→meters), replacing the
reference's serial rate-limited HTTP (distance.py:39-90) with joins.

Scale shape: one state-sized shuffle per merge (the merge is
join-free, state rides as seed rows), broadcast lookups for geo, and
all projections fused by Catalyst. The whole job is restartable from
the state table (T3).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession

from rental_data_pipeline_spark.observe import SafeObservation
from pyspark.sql import functions as F

from rental_data_pipeline_spark.functions.numeric import (
    km_from_meters,
    parse_numeric_value,
)
from rental_data_pipeline_spark.operators.extract import (
    parse_listing_pages,
    quarantine_split,
    split_cards,
)
from rental_data_pipeline_spark.operators.merge import merge_listings
from rental_data_pipeline_spark.operators.normalize import normalize_listings
from rental_data_pipeline_spark.operators import sinks


# ---------------------------------------------------------------------------
# S5/S6: declarative search config → predicate / source URL
# ---------------------------------------------------------------------------


@dataclass
class SearchConfig:
    """The YAML search predicates (ref search_configs/search_config.yaml
    + construct_url.py:16-40): effectively
    ``price <= maxprice AND district IN (...) AND metro IN (...)``."""

    maxprice: int | None = None
    districts: list[int] = field(default_factory=list)
    metros: list[int] = field(default_factory=list)
    rooms: list[int] = field(default_factory=list)

    def predicate(self, price_col: str = "price_value", district_col: str = "district",
                  metro_col: str = "metro_id", rooms_col: str = "room_count"):
        """The same predicates as ordinary ``where()`` clauses —
        pushdown-to-website becomes pushdown-to-parquet (SURVEY §3.2)."""
        p = F.lit(True)
        if self.maxprice is not None:
            p = p & (F.col(price_col) <= self.maxprice)
        if self.districts:
            p = p & F.col(district_col).isin(self.districts)
        if self.metros:
            p = p & F.col(metro_col).isin(self.metros)
        if self.rooms:
            p = p & F.col(rooms_col).isin(self.rooms)
        return p


def construct_search_url(cfg: SearchConfig, base: str = "https://example.test/cat.php",
                         page: int | None = None) -> str:
    """S6: compile predicates to the source query string with repeated
    params for IN-lists (ref construct_url.py:16-40) — driver-side."""
    parts = ["deal_type=rent", "engine_version=2", "offer_type=flat"]
    if page is not None:
        parts.append(f"p={page}")
    if cfg.maxprice is not None:
        # `is not None`, not truthiness: the reference emits the param
        # whenever the key exists (construct_url.py:38 emits
        # maxprice=0), and the vectorized twin below uses isNotNull —
        # a zero bound must reach the website like it reaches parquet
        parts.append(f"maxprice={cfg.maxprice}")
    parts += [f"district%5B{i}%5D={d}" for i, d in enumerate(cfg.districts)]
    parts += [f"metro%5B{i}%5D={m}" for i, m in enumerate(cfg.metros)]
    parts += [f"room{r}=1" for r in cfg.rooms]
    return base + "?" + "&".join(parts)


def compile_search_urls(
    df: DataFrame, base: str = "https://example.test/cat.php"
) -> DataFrame:
    """S6, distributed: compile a DataFrame of search configs
    (``maxprice int, districts array<int>, metros array<int>,
    rooms array<int>, page int``) to source URLs as a pure column
    expression — the scale path when one crawl plans thousands of
    search shards (ref construct_url.py:16-40 compiles one config
    driver-side; this is its vectorized twin)."""
    empty = F.array().cast("array<string>")

    def opt(cond: Column, part: Column) -> Column:
        return F.when(cond, F.array(part)).otherwise(empty)

    def indexed(col: str, prefix: str) -> Column:
        return F.transform(
            F.col(col),
            lambda v, i: F.concat(
                F.lit(f"{prefix}%5B"), i.cast("string"), F.lit("%5D="), v.cast("string")
            ),
        )

    parts = F.concat(
        F.array(F.lit("deal_type=rent"), F.lit("engine_version=2"), F.lit("offer_type=flat")),
        opt(F.col("page").isNotNull(), F.concat(F.lit("p="), F.col("page").cast("string"))),
        opt(F.col("maxprice").isNotNull(), F.concat(F.lit("maxprice="), F.col("maxprice").cast("string"))),
        F.coalesce(indexed("districts", "district"), empty),
        F.coalesce(indexed("metros", "metro"), empty),
        F.coalesce(
            F.transform(
                F.col("rooms"),
                lambda r: F.concat(F.lit("room"), r.cast("string"), F.lit("=1")),
            ),
            empty,
        ),
    )
    return df.withColumn("url", F.concat(F.lit(base + "?"), F.array_join(parts, "&")))


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------


@dataclass
class PipelineConfig:
    """T2 scope flags (defaults per parse_data.py:44-57) + injected now."""

    now: str = "2024-06-15 12:00:00"
    update_current_search_listings: bool = False
    should_scrape_new: bool = True
    check_if_unpublished: bool = True
    check_missing_estimations: bool = False
    search: SearchConfig = field(default_factory=SearchConfig)
    # declarative row contracts on the parsed listing batch (operators/
    # expectations.py): failing rows are quarantined before the merge
    # and per-rule violation counts ride the A7 Observation metrics —
    # the Spark form of the reference's imperative per-record checks
    # (parse_data.py required-field validation)
    expectations: dict[str, Column] = field(default_factory=dict)


def _empty_state(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [],
        "offer_id string, price_value double, is_unpublished boolean, "
        "description string, address string, distance double",
    )


def load_state(spark: SparkSession, state_path: str | None) -> DataFrame:
    """S1: tolerant state load — missing/corrupt → empty (ref
    parse_data.py:206-211). Reads the latest versioned commit (see
    :func:`rental_data_pipeline_spark.streaming.incremental.read_state`);
    falls back to a legacy flat parquet layout."""
    if state_path:
        from rental_data_pipeline_spark.streaming.incremental import (
            read_state_or_legacy,
        )

        # NO tolerant except here: read_state_or_legacy returns None
        # for a genuinely absent state and RAISES for refuse-to-read
        # states (an interrupted rebucket's pending, a corrupt legacy
        # layout). Swallowing those would run the pipeline against an
        # empty state and commit a _FULL snapshot that permanently
        # shadows — then prunes — the real one: silent total loss of
        # the state table.
        st = read_state_or_legacy(spark, state_path)
        if st is not None:
            return st
    return _empty_state(spark)


def _next_state_version(state_path: str) -> str:
    # counter over ALL v_* dirs (committed or crashed) so a new commit
    # never reuses a garbage directory's name
    from rental_data_pipeline_spark.streaming.incremental import (
        _all_version_dirs,
        _version_counter,
    )

    vs = _all_version_dirs(state_path)
    n = _version_counter(vs[-1]) + 1 if vs else 0
    return f"{state_path}/v_{n:09d}"


def run_pipeline(
    spark: SparkSession,
    search_pages: DataFrame,
    listing_pages_for: Callable[[DataFrame], DataFrame],
    geocode_lookup: DataFrame,
    route_lookup: DataFrame,
    config: PipelineConfig | None = None,
    state_path: str | None = None,
    output_dir: str | None = None,
) -> dict:
    """Run the five steps; returns {"state": DataFrame, "metrics": {...}}.

    ``search_pages``: (page_id, html) rows. ``listing_pages_for``:
    ids DataFrame (offer_id) → (html, url) rows. ``geocode_lookup``:
    (address, lat, lon). ``route_lookup``: (lat, lon, meters).
    """
    cfg = config or PipelineConfig()
    metrics: dict[str, int] = {}

    # ---- 0: state + scope (F1/F2/A2) --------------------------------
    # versioned state (see step 4+5): this run reads v_{N-1} and will
    # commit v_{N}, so no plan ever depends on files being replaced —
    # no materialization barrier needed at load
    state = load_state(spark, state_path)
    active = state.where(~F.coalesce(F.col("is_unpublished"), F.lit(False)))
    db_active_ids = active.select("offer_id").distinct()

    # ---- 1: search phase (E2 → F5 → J7/J8 → J1) ----------------------
    cards = split_cards(search_pages)
    cards = cards.where(F.col("offer_id").isNotNull())  # F5
    # extracted records feed several branches (ids, anti-joins, batch);
    # materialize so the HTML parse runs once, not once per branch — at
    # crawl scale this is the extracted-records table the reference
    # checkpoints as parsed_listings_flattened.json (K4)
    cards = cards.persist()
    current_ids = cards.select("offer_id").distinct()   # A2

    missing = db_active_ids.join(current_ids, "offer_id", "left_anti")  # J7
    tombstones = missing.select(                                         # J8
        "offer_id", F.lit(True).alias("is_unpublished"),
        F.lit(cfg.now).cast("timestamp").alias("updated_date"),
    )
    search_batch = cards.select(
        "offer_id",
        parse_numeric_value(F.col("price_value")).alias("price_value"),  # X1
        F.col("title"),
    ).unionByName(tombstones, allowMissingColumns=True)
    state = merge_listings(
        state, search_batch, key="offer_id",
        order_cols=[F.col("updated_date").asc_nulls_first()],
        derive_status_col=True,
    )

    # ---- 2: listing phase (J9 scope → E1 → X3-X5 → J1) ---------------
    scope = spark.createDataFrame([], "offer_id string")
    if cfg.update_current_search_listings:
        scope = scope.unionByName(current_ids)
    elif cfg.should_scrape_new:
        scope = scope.unionByName(                                        # J6
            current_ids.join(db_active_ids, "offer_id", "left_anti")
        )
    if cfg.check_if_unpublished:
        scope = scope.unionByName(missing)
    if cfg.check_missing_estimations and "estimated_price" in state.columns:
        scope = scope.unionByName(                                        # F2
            state.where(
                F.col("estimated_price").isNull()
                & ~F.coalesce(F.col("is_unpublished"), F.lit(False))
            ).select("offer_id")
        )
    scope = scope.distinct()                                              # J9

    pages = listing_pages_for(scope)
    parsed = parse_listing_pages(pages).persist()  # parse once (K4)
    clean, quarantined = quarantine_split(parsed)                         # E8/F5
    listing_batch = normalize_listings(clean, now=cfg.now).drop("facts", "features")
    exp_obs = None
    exp_quarantine = None
    if cfg.expectations:
        # one map-side tagging pass; per-rule counts observed on the
        # SAME computation the merge consumes (no extra scan)
        from rental_data_pipeline_spark.operators.expectations import (
            VIOLATIONS_COL,
            validate,
        )

        exp_obs = SafeObservation("expectations")
        tagged = exp_obs.on(
            validate(listing_batch, cfg.expectations),
            F.coalesce(
                F.sum((F.size(F.col(VIOLATIONS_COL)) > 0).cast("long")),
                F.lit(0),
            ).alias("n_expectation_quarantined"),
            *[
                F.coalesce(
                    F.sum(
                        F.array_contains(F.col(VIOLATIONS_COL), name).cast(
                            "long"
                        )
                    ),
                    F.lit(0),
                ).alias(f"expectation_{name}")
                for name in sorted(cfg.expectations)
            ],
        )
        exp_quarantine = tagged.where(F.size(F.col(VIOLATIONS_COL)) > 0)
        listing_batch = tagged.where(
            F.size(F.col(VIOLATIONS_COL)) == 0
        ).drop(VIOLATIONS_COL)
    state = merge_listings(
        state, listing_batch, key="offer_id",
        order_cols=[F.col("updated_date").asc_nulls_first()],
        derive_status_col=True,
    )

    # ---- 3: distance enrichment (F3 → J11 → X16 → J10) ---------------
    # step 3 both reads the post-listing state (needs-distance scan)
    # and merges into it; the repeated subtree is deduplicated by
    # exchange reuse (measured: an explicit persist here changes
    # nothing), so no materialization barrier is needed
    need = state.where(                                                   # F3
        F.col("distance").isNull()
        & F.col("address").isNotNull()
        & (F.col("address") != "")
    ).select("offer_id", "address")                                       # P3
    routed = (
        need.join(F.broadcast(geocode_lookup), "address", "left")         # stage 1
        .where(F.col("lat").isNotNull())
        .join(F.broadcast(route_lookup), ["lat", "lon"], "left")          # stage 2
        .where(F.col("meters").isNotNull())
        .select("offer_id", km_from_meters(F.col("meters")).alias("distance"))  # P4/X16
    )
    state = merge_listings(
        state, routed, key="offer_id",
        order_cols=[F.lit(0)],
        derive_status_col=True,
    )

    # ---- 4+5: snapshots (K1/K2/K3, F4) with observed counts (A7) -----
    obs = SafeObservation("state_metrics")
    # coalesce: SUM over zero rows is NULL, and int(None) at the
    # metrics collection would crash AFTER the state commit (the
    # expectations observation coalesces for the same reason)
    state = obs.on(
        state,
        F.count(F.lit(1)).alias("n_state"),
        F.coalesce(
            F.sum(F.when(F.col("status") == "active", 1).otherwise(0)),
            F.lit(0),
        ).alias("n_active"),
        F.coalesce(
            F.sum(F.when(F.col("distance").isNotNull(), 1).otherwise(0)),
            F.lit(0),
        ).alias("n_with_distance"),
    )
    if output_dir:
        # three snapshot writes share one computation of the merged state
        state = state.persist()
        persisted_state = state  # unpersist handle (state is rebound below)
        sinks.write_state_json(state, f"{output_dir}/state_json")
        sinks.write_csv_snapshot(state, f"{output_dir}/combined_data")
        sinks.write_filtered_csv(state, f"{output_dir}/combined_data_filtered", cfg.now)
        if state_path:
            # durable state for the next run (T3): a versioned commit —
            # the write never touches the files step 0 read, so no
            # checkpoint staging, and a failed run can't corrupt the
            # previous state. The pipeline run merges the whole state,
            # so its commit is a FULL bucketed snapshot (the same
            # layout the streaming fold writes deltas into — the two
            # engines share one state table), which also lets
            # _prune_versions drop every shadowed delta beneath it.
            from rental_data_pipeline_spark.streaming.incremental import (
                BUCKET_COL,
                N_STATE_BUCKETS,
                _assert_no_pending_rebucket,
                _bucket_of,
                _ensure_meta,
                _mark_full,
                _prune_versions,
                has_part_files,
            )

            # same commit discipline as the streaming fold: refuse a
            # half-migrated table (a commit would move the version
            # counter the staged migration assumed frozen), and guard
            # the zero-row write (a partitionBy of an empty state
            # leaves a parquet-less _FULL version that wedges every
            # later read of the SHARED state table with
            # UNABLE_TO_INFER_SCHEMA)
            _assert_no_pending_rebucket(state_path)
            meta = _ensure_meta(state_path, "offer_id", N_STATE_BUCKETS)
            vdir = _next_state_version(state_path)
            state.withColumn(
                BUCKET_COL, _bucket_of("offer_id", int(meta["n_buckets"]))
            ).write.mode("overwrite").partitionBy(BUCKET_COL).parquet(vdir)
            if not has_part_files(vdir):
                state.sparkSession.createDataFrame(
                    [], state.schema
                ).write.mode("overwrite").parquet(vdir)
            _mark_full(vdir)
            _prune_versions(state_path, keep_versions=2)
            # the RETURNED frame must outlive version pruning by later
            # runs (its lineage reads v_{N-1}, which a caller holding
            # the frame across two more runs would otherwise lose);
            # cheap here — state is already persisted above
            state = state.localCheckpoint(eager=True)
        metrics.update({k: int(v) for k, v in obs.get.items()})
        metrics["n_quarantined"] = quarantined.count()
        if exp_obs is not None:
            metrics.update({k: int(v) for k, v in exp_obs.get.items()})
    # release this run's cached intermediates: a long-lived driver
    # re-running the pipeline would otherwise accumulate three cached
    # frames per run until executor storage evicts or OOMs (the
    # returned state survives independently via localCheckpoint).
    # ONLY in the sink path, where the snapshot writes above already
    # materialized them: in the lazy path (no output_dir) NO action has
    # run yet, so an unpersist here would strip the caches before the
    # caller's first action and every broadcast-exchange subjob and
    # state self-reference would re-run BOTH heavy HTML parses from
    # scratch (measured: 42 -> 26 jobs, 2x parse stages -> 1x on the
    # flagship query). The lazy caller owns the cache lifecycle via
    # spark.catalog.clearCache() or the returned handles.
    out_cached: list[DataFrame] = []
    if output_dir:
        for cached in (cards, parsed):
            cached.unpersist()
        # the PRE-checkpoint handle: the returned frame reads its own
        # localCheckpoint blocks, which an unpersist on it would drop
        persisted_state.unpersist()
    else:
        out_cached = [cards, parsed]
    out = {"state": state, "metrics": metrics, "cached": out_cached}
    if exp_quarantine is not None:
        out["expectation_quarantine"] = exp_quarantine
    return out
