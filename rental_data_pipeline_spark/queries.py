"""Query registry: every SURVEY §2 operator demonstrated as a
(spark, sf_dir) -> DataFrame callable with a DuckDB oracle-SQL twin.

Conventions (driver contract, see ``__spark_entry__.py``):
- every computed column is aliased identically in the Spark plan and
  the oracle SQL (the driver hashes values after sorting columns by
  name);
- double aggregates go through exact decimal arithmetic and a final
  cast to double so Spark's and DuckDB's float summation order can't
  produce differing bits;
- VALUES-backed scalar queries share one Python literal list between
  the Spark DataFrame and the SQL text, so both engines parse the
  same inputs.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rental_data_pipeline_spark.functions import (
    normalize_street_names,
    parse_numeric_value,
)
from rental_data_pipeline_spark.functions.text import derive_status
from rental_data_pipeline_spark.operators.merge import merge_snapshots
from rental_data_pipeline_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def literal_frame(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """Literal fixture rows as a ONE-partition DataFrame.

    ``spark.createDataFrame(rows)`` spreads even a 3-row fixture over
    defaultParallelism partitions, so every downstream job over it
    schedules ~32 near-empty tasks (measured ~2 s of pure overhead on
    the merge fixture, ~1.8x on each broadcast build). Parallelizing
    with an explicit single slice keeps the frame 1-partition with no
    exchange — the form every VALUES-backed fixture should take."""
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Event-stream → listing-snapshot mapping (FIXTURES.md §5): user_id→key,
# ts→updated_date, value→price_value, event_type='error'→is_unpublished.
# ---------------------------------------------------------------------------

def _event_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        F.col("user_id").alias("offer_id"),
        F.col("ts").alias("updated_date"),
        F.col("value").alias("price_value"),
        (F.col("event_type") == "error").alias("is_unpublished"),
        F.col("event_id"),
    )


_SNAPSHOT_CTE = """
src AS (
  SELECT user_id AS offer_id,
         ts AS updated_date,
         value AS price_value,
         (event_type = 'error') AS is_unpublished,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
  FROM events
),
flagged AS (
  SELECT *,
         last_value(price_value IGNORE NULLS) OVER w_prev AS prev_price,
         last_value(is_unpublished IGNORE NULLS) OVER w_prev AS prev_unpub
  FROM src
  WINDOW w_prev AS (
    PARTITION BY offer_id ORDER BY seq
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
ev AS (
  SELECT *,
         coalesce(updated_date IS NOT NULL AND is_unpublished
                  AND prev_unpub = false, false) AS unpub_tr,
         coalesce(updated_date IS NOT NULL
                  AND NOT coalesce(updated_date IS NOT NULL AND is_unpublished
                                   AND prev_unpub = false, false)
                  AND price_value IS NOT NULL AND prev_price IS NOT NULL
                  AND price_value <> prev_price, false) AS price_chg,
         CAST(trunc(price_value) AS BIGINT)
           - CAST(trunc(prev_price) AS BIGINT) AS diff
  FROM flagged
)
"""


@register(
    "cdc_merge_state",
    oracle=f"""
WITH {_SNAPSHOT_CTE}
SELECT offer_id,
       arg_max(price_value, CASE WHEN price_value IS NOT NULL THEN seq END) AS price_value,
       arg_max(is_unpublished, CASE WHEN is_unpublished IS NOT NULL THEN seq END) AS is_unpublished,
       arg_min(updated_date, seq) AS publication_date,
       arg_max(updated_date, CASE WHEN updated_date IS NOT NULL THEN seq END) AS last_active,
       arg_max(updated_date, CASE WHEN unpub_tr THEN seq END) AS unpublished_date,
       arg_max(diff, CASE WHEN price_chg THEN seq END) AS price_change_value,
       arg_max(updated_date, CASE WHEN price_chg THEN seq END) AS price_change_date,
       CASE WHEN count(*) FILTER (WHERE price_chg) > 0
            THEN count(*) FILTER (WHERE price_chg) END AS total_price_changes,
       string_agg(CAST(diff AS VARCHAR), ', ' ORDER BY seq)
         FILTER (WHERE price_chg) AS price_changes,
       string_agg(strftime(updated_date, '%Y-%m-%d %H:%M:%S'), ', ' ORDER BY seq)
         FILTER (WHERE price_chg) AS price_changes_dates,
       CASE WHEN coalesce(arg_max(is_unpublished,
                 CASE WHEN is_unpublished IS NOT NULL THEN seq END), false)
            THEN 'non active' ELSE 'active' END AS status
FROM ev
GROUP BY offer_id
""",
)
def cdc_merge_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: J1 upsert-with-CDC folded over the whole event stream
    (SURVEY §2.4 J1/J12, §2.6 W1-W3, §2.5 A4-A6). One shuffle on key."""
    snap = _event_snapshots(spark, sf_dir)
    merged = merge_snapshots(
        snap, key="offer_id", order_cols=["updated_date", "event_id"],
        derive_status_col=True,
    )
    return merged.select(
        "offer_id", "price_value", "is_unpublished", "publication_date",
        "last_active", "unpublished_date", "price_change_value",
        "price_change_date", "total_price_changes", "price_changes",
        "price_changes_dates", "status",
    )


# W4/J5 edge-case fixture (ref merge.py:13-18,27-28): literal target
# state + source batch exercising the two merge branches the events
# table never hits — a row with NO updated_date (fields merge, zero
# CDC) and a KEYLESS row whose offer_url matches state (adopt the key,
# force is_unpublished). Key 9002 is the in-fixture control (a normal
# price change continuing a stored change count); the keyless 'u9999'
# row matches nothing and must vanish.
_MERGE_FIX_TGT = [
    (9001, "u9001", 100.0, False, "2024-06-01 10:00:00", None),
    (9002, "u9002", 200.0, False, "2024-06-01 10:00:00", 2),
    (9003, "u9003", 300.0, False, "2024-06-01 10:00:00", None),
]
_MERGE_FIX_SRC = [
    (9001, "u9001", None, 150.0, None),
    (9002, "u9002", "2024-06-02 09:00:00", 250.0, False),
    (None, "u9003", "2024-06-02 09:30:00", None, None),
    (None, "u9999", "2024-06-02 10:00:00", 400.0, None),
]

# The oracle replays the merge semantics in SQL over the same literals
# (each fixture key has exactly one source row, so the evolving-state
# windows collapse to target-vs-source comparisons). Keep in sync with
# _MERGE_FIX_TGT/_MERGE_FIX_SRC above.
_MERGE_FIX_ORACLE = """
fx_tgt AS (
  SELECT * FROM (VALUES
    (9001, 'u9001', 100.0, false, TIMESTAMP '2024-06-01 10:00:00', CAST(NULL AS BIGINT)),
    (9002, 'u9002', 200.0, false, TIMESTAMP '2024-06-01 10:00:00', 2),
    (9003, 'u9003', 300.0, false, TIMESTAMP '2024-06-01 10:00:00', CAST(NULL AS BIGINT))
  ) t(offer_id, offer_url, price_value, is_unpublished, last_active, total_price_changes)),
fx_src AS (
  SELECT * FROM (VALUES
    (9001, 'u9001', CAST(NULL AS TIMESTAMP), 150.0, CAST(NULL AS BOOLEAN)),
    (9002, 'u9002', TIMESTAMP '2024-06-02 09:00:00', 250.0, false),
    (CAST(NULL AS BIGINT), 'u9003', TIMESTAMP '2024-06-02 09:30:00',
     CAST(NULL AS DOUBLE), CAST(NULL AS BOOLEAN)),
    (CAST(NULL AS BIGINT), 'u9999', TIMESTAMP '2024-06-02 10:00:00',
     400.0, CAST(NULL AS BOOLEAN))
  ) t(offer_id, offer_url, updated_date, price_value, is_unpublished)),
fx_adopt AS (
  SELECT coalesce(s.offer_id, t.offer_id) AS offer_id, s.updated_date, s.price_value,
         CASE WHEN s.offer_id IS NULL THEN true ELSE s.is_unpublished END AS is_unpublished
  FROM fx_src s LEFT JOIN fx_tgt t ON s.offer_id IS NULL AND s.offer_url = t.offer_url
  WHERE coalesce(s.offer_id, t.offer_id) IS NOT NULL),
fx_flag AS (
  SELECT a.offer_id, a.updated_date, a.price_value, a.is_unpublished,
         coalesce(a.updated_date IS NOT NULL AND a.is_unpublished
                  AND t.is_unpublished = false, false) AS unpub_tr,
         coalesce(a.updated_date IS NOT NULL
                  AND NOT coalesce(a.updated_date IS NOT NULL AND a.is_unpublished
                                   AND t.is_unpublished = false, false)
                  AND a.price_value IS NOT NULL AND t.price_value IS NOT NULL
                  AND a.price_value <> t.price_value, false) AS price_chg
  FROM fx_adopt a JOIN fx_tgt t USING (offer_id)),
fx_state AS (
  SELECT t.offer_id,
         coalesce(f.price_value, t.price_value) AS price_value,
         coalesce(f.is_unpublished, t.is_unpublished) AS is_unpublished,
         coalesce(f.updated_date, t.last_active) AS last_active,
         CASE WHEN f.unpub_tr THEN f.updated_date END AS unpublished_date,
         CASE WHEN f.price_chg THEN coalesce(t.total_price_changes, 0) + 1
              ELSE t.total_price_changes END AS total_price_changes
  FROM fx_tgt t LEFT JOIN fx_flag f USING (offer_id))
"""


# T5 ordering-guard fixture (SURVEY §2.8 T5): an arrival-order replay
# containing two STALE rows (updated_date older than the evolving
# last-active watermark). Both guard variants run through the real
# merge operator; guarded ≠ unguarded shows up as value differences
# the oracle independently reproduces. Key 9101: a stale price rewind
# (guarded keeps 120/1 change, unguarded rewinds to 90/2 changes).
# Key 9102: a stale row arriving after an unpublish transition
# (guarded keeps is_unpublished=true, unguarded resurrects the listing
# and books a price change off the stale price).
_GUARD_FIX_SRC = [
    (9101, 1, "2024-06-01 10:00:00", 100.0, False),
    (9101, 2, "2024-06-03 10:00:00", 120.0, False),
    (9101, 3, "2024-06-02 10:00:00", 90.0, False),
    (9102, 1, "2024-06-01 10:00:00", 200.0, False),
    (9102, 2, "2024-06-02 10:00:00", 200.0, True),
    (9102, 3, "2024-06-01 09:00:00", 210.0, False),
]

# SQL replay over the same literals: running-max watermark → stale
# filter for the guarded variant, then the identical evolving-state
# window + per-key aggregation for both variants.
_GUARD_FIX_ORACLE = """
g_src AS (
  SELECT * FROM (VALUES
    (9101, 1, TIMESTAMP '2024-06-01 10:00:00', 100.0, false),
    (9101, 2, TIMESTAMP '2024-06-03 10:00:00', 120.0, false),
    (9101, 3, TIMESTAMP '2024-06-02 10:00:00', 90.0, false),
    (9102, 1, TIMESTAMP '2024-06-01 10:00:00', 200.0, false),
    (9102, 2, TIMESTAMP '2024-06-02 10:00:00', 200.0, true),
    (9102, 3, TIMESTAMP '2024-06-01 09:00:00', 210.0, false)
  ) t(offer_id, arrival, updated_date, price_value, is_unpublished)),
g_run AS (
  SELECT *, max(updated_date) OVER (PARTITION BY offer_id ORDER BY arrival
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_la
  FROM g_src),
g_both AS (
  SELECT 'guarded' AS variant, offer_id, arrival, updated_date,
         price_value, is_unpublished
  FROM g_run WHERE NOT coalesce(updated_date < prev_la, false)
  UNION ALL
  SELECT 'unguarded', offer_id, arrival, updated_date,
         price_value, is_unpublished
  FROM g_src),
g_flag AS (
  SELECT *,
         last_value(price_value IGNORE NULLS) OVER w AS prev_price,
         last_value(is_unpublished IGNORE NULLS) OVER w AS prev_unpub
  FROM g_both
  WINDOW w AS (PARTITION BY variant, offer_id ORDER BY arrival
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
g_ev AS (
  SELECT *,
         coalesce(updated_date IS NOT NULL AND is_unpublished
                  AND prev_unpub = false, false) AS unpub_tr,
         coalesce(updated_date IS NOT NULL
                  AND NOT coalesce(updated_date IS NOT NULL AND is_unpublished
                                   AND prev_unpub = false, false)
                  AND price_value IS NOT NULL AND prev_price IS NOT NULL
                  AND price_value <> prev_price, false) AS price_chg,
         CAST(trunc(price_value) AS BIGINT)
           - CAST(trunc(prev_price) AS BIGINT) AS diff
  FROM g_flag),
g_state AS (
  SELECT variant, offer_id,
         arg_max(price_value, CASE WHEN price_value IS NOT NULL THEN arrival END)
           AS price_value,
         arg_max(is_unpublished, CASE WHEN is_unpublished IS NOT NULL THEN arrival END)
           AS is_unpublished,
         arg_max(updated_date, CASE WHEN updated_date IS NOT NULL THEN arrival END)
           AS last_active,
         arg_max(updated_date, CASE WHEN unpub_tr THEN arrival END)
           AS unpublished_date,
         arg_max(diff, CASE WHEN price_chg THEN arrival END) AS price_change_value,
         arg_max(updated_date, CASE WHEN price_chg THEN arrival END)
           AS price_change_date,
         CASE WHEN count(*) FILTER (WHERE price_chg) > 0
              THEN count(*) FILTER (WHERE price_chg) END AS total_price_changes
  FROM g_ev GROUP BY variant, offer_id)
"""


def _guard_fixture_feed(spark: SparkSession, ts_type: str) -> DataFrame:
    """T5 guard fixture through the REAL merge operator, both variants.
    Emits per variant: a '<variant>_state' row (price_diff carries
    total_price_changes, old_price carries is_unpublished as 0.0/1.0),
    a '<variant>_cdc' row for the surviving latest price change, and a
    '<variant>_unpub' row when an unpublish transition was booked."""
    from rental_data_pipeline_spark.operators.merge import merge_snapshots as _ms

    src = literal_frame(
        spark, _GUARD_FIX_SRC,
        "offer_id bigint, arrival int, updated_date string, "
        "price_value double, is_unpublished boolean",
    ).withColumn("updated_date", F.col("updated_date").cast(ts_type))
    feeds = []
    for variant, guard in (("guarded", True), ("unguarded", False)):
        state = _ms(src, key="offer_id", order_cols=["arrival"],
                    guard_out_of_order=guard)
        feeds.append(state.select(
            "offer_id",
            F.col("last_active").cast(ts_type).alias("change_date"),
            F.lit(f"{variant}_state").alias("kind"),
            F.col("total_price_changes").cast("long").alias("price_diff"),
            F.col("price_value").alias("new_price"),
            F.col("is_unpublished").cast("double").alias("old_price"),
        ))
        feeds.append(state.where(F.col("price_change_value").isNotNull()).select(
            "offer_id",
            F.col("price_change_date").cast(ts_type).alias("change_date"),
            F.lit(f"{variant}_cdc").alias("kind"),
            F.col("price_change_value").cast("long").alias("price_diff"),
            F.lit(None).cast("double").alias("new_price"),
            F.lit(None).cast("double").alias("old_price"),
        ))
        feeds.append(state.where(F.col("unpublished_date").isNotNull()).select(
            "offer_id",
            F.col("unpublished_date").cast(ts_type).alias("change_date"),
            F.lit(f"{variant}_unpub").alias("kind"),
            F.lit(None).cast("long").alias("price_diff"),
            F.lit(None).cast("double").alias("new_price"),
            F.lit(None).cast("double").alias("old_price"),
        ))
    out = feeds[0]
    for f in feeds[1:]:
        out = out.unionByName(f)
    return out


def _merge_edge_fixture_feed(spark: SparkSession, ts_type: str) -> DataFrame:
    """W4/J5 fixture run through the REAL merge operator: final state
    projected as labelled feed rows — 'fixture_state' (price_diff
    carries total_price_changes, old_price carries is_unpublished as
    0.0/1.0) plus 'fixture_unpublish' for any key the merge stamped an
    unpublished_date on (the J5 adoption must force that transition)."""
    from rental_data_pipeline_spark.operators.merge import merge_listings

    tgt = literal_frame(
        spark, _MERGE_FIX_TGT,
        "offer_id bigint, offer_url string, price_value double, "
        "is_unpublished boolean, last_active string, total_price_changes bigint",
    ).withColumn("last_active", F.col("last_active").cast(ts_type))
    src = literal_frame(
        spark, _MERGE_FIX_SRC,
        "offer_id bigint, offer_url string, updated_date string, "
        "price_value double, is_unpublished boolean",
    ).withColumn("updated_date", F.col("updated_date").cast(ts_type))
    state = merge_listings(tgt, src, key="offer_id", order_cols=["updated_date"])
    st = state.select(
        "offer_id",
        F.col("last_active").cast(ts_type).alias("change_date"),
        F.lit("fixture_state").alias("kind"),
        F.col("total_price_changes").cast("long").alias("price_diff"),
        F.col("price_value").alias("new_price"),
        F.col("is_unpublished").cast("double").alias("old_price"),
    )
    un = state.where(F.col("unpublished_date").isNotNull()).select(
        "offer_id",
        F.col("unpublished_date").cast(ts_type).alias("change_date"),
        F.lit("fixture_unpublish").alias("kind"),
        F.lit(None).cast("long").alias("price_diff"),
        F.lit(None).cast("double").alias("new_price"),
        F.lit(None).cast("double").alias("old_price"),
    )
    return st.unionByName(un)


@register(
    "cdc_change_feed",
    oracle=f"""
WITH {_SNAPSHOT_CTE},
{_MERGE_FIX_ORACLE},
{_GUARD_FIX_ORACLE}
SELECT offer_id,
       updated_date AS change_date,
       'price_change' AS kind,
       diff AS price_diff,
       price_value AS new_price,
       prev_price AS old_price
FROM ev WHERE price_chg
UNION ALL
SELECT offer_id,
       updated_date AS change_date,
       'unpublish' AS kind,
       NULL AS price_diff,
       NULL AS new_price,
       NULL AS old_price
FROM ev WHERE unpub_tr
UNION ALL
SELECT offer_id, last_active AS change_date, 'fixture_state' AS kind,
       total_price_changes AS price_diff, price_value AS new_price,
       CAST(is_unpublished AS DOUBLE) AS old_price
FROM fx_state
UNION ALL
SELECT offer_id, unpublished_date AS change_date, 'fixture_unpublish' AS kind,
       NULL AS price_diff, NULL AS new_price, NULL AS old_price
FROM fx_state WHERE unpublished_date IS NOT NULL
UNION ALL
SELECT offer_id, last_active AS change_date, variant || '_state' AS kind,
       total_price_changes AS price_diff, price_value AS new_price,
       CAST(is_unpublished AS DOUBLE) AS old_price
FROM g_state
UNION ALL
SELECT offer_id, price_change_date AS change_date, variant || '_cdc' AS kind,
       price_change_value AS price_diff, NULL AS new_price, NULL AS old_price
FROM g_state WHERE price_change_value IS NOT NULL
UNION ALL
SELECT offer_id, unpublished_date AS change_date, variant || '_unpub' AS kind,
       NULL AS price_diff, NULL AS new_price, NULL AS old_price
FROM g_state WHERE unpublished_date IS NOT NULL
""",
)
def cdc_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 + W2 as one change feed: every price-change event with its
    diff ('price_change' rows) unioned with every false→true
    is_unpublished transition ('unpublish' rows), both from the same
    per-key ordered window pass — plus the W4/J5 edge-case fixture
    ('fixture_*' rows): the no-updated_date and url-adoption merge
    branches the events table never exercises, run through the real
    merge operator against a SQL replay oracle — plus the T5
    ordering-guard fixture ('guarded_*' / 'unguarded_*' rows): an
    out-of-order replay folded through the merge with
    guard_out_of_order on and off, where stale updates are no-ops
    under the guard and overwrite without it (SURVEY §2.8 T5), both
    variants independently replayed by the oracle."""
    # ONE window pass serves both event-derived branches: an event row
    # is either a price change or an unpublish transition (the chg
    # predicate excludes unpub_tr rows by construction), so instead of
    # unioning two separately-windowed frames — two full shuffles+sorts
    # of the snapshot that column pruning keeps ReuseExchange from
    # deduplicating — flag both transitions in a single pass and
    # project kind/price fields conditionally. Row-for-row identical
    # output (the union was disjoint), half the event-table work.
    feed = _cdc_transition_feed(spark, sf_dir)
    ts_type = dict(feed.dtypes)["change_date"]
    fixture = _merge_edge_fixture_feed(spark, ts_type)
    guard = _guard_fixture_feed(spark, ts_type)
    return feed.unionByName(fixture).unionByName(guard)


def _cdc_transition_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 + W2 in one windowed pass: every event row labelled
    'price_change' (with diff/new/old) or 'unpublish' (price fields
    NULL) — the disjoint union cdc_price_changes ∪
    cdc_unpublish_transitions without computing the per-key ordered
    window twice."""
    snap = _event_snapshots(spark, sf_dir)
    w_prev = (
        Window.partitionBy("offer_id")
        .orderBy("updated_date", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_price = F.last("price_value", ignorenulls=True).over(w_prev)
    prev_unpub = F.last("is_unpublished", ignorenulls=True).over(w_prev)
    unpub_tr = (
        F.col("updated_date").isNotNull()
        & (F.col("is_unpublished") == F.lit(True))
        & (prev_unpub == F.lit(False))
    )
    chg = (
        F.col("updated_date").isNotNull()
        & ~F.coalesce(unpub_tr, F.lit(False))
        & F.col("price_value").isNotNull()
        & prev_price.isNotNull()
        & (F.col("price_value") != prev_price)
    )
    is_chg = F.coalesce(chg, F.lit(False))
    return (
        snap.select(
            "offer_id",
            F.col("updated_date").alias("change_date"),
            F.when(is_chg, F.lit("price_change"))
            .otherwise(F.lit("unpublish"))
            .alias("kind"),
            F.when(
                is_chg,
                F.col("price_value").cast("long") - prev_price.cast("long"),
            ).alias("price_diff"),
            F.when(is_chg, F.col("price_value")).alias("new_price"),
            F.when(is_chg, prev_price).alias("old_price"),
            (is_chg | F.coalesce(unpub_tr, F.lit(False))).alias("__keep"),
        )
        .where(F.col("__keep"))
        .drop("__keep")
    )


@register(
    "cdc_key_lifecycle",
    oracle="""
WITH chg AS (
  SELECT user_id, ts, event_type,
         CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_type)
                   IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS c
  FROM events),
runs AS (
  SELECT user_id, ts, event_type,
         sum(c) OVER (PARTITION BY user_id ORDER BY ts, event_type
                      ROWS UNBOUNDED PRECEDING) AS run
  FROM chg),
iv AS (
  SELECT user_id, event_type, min(ts) AS valid_from
  FROM runs GROUP BY user_id, event_type, run)
SELECT 'lifecycle' AS mode,
       user_id AS offer_id,
       min(ts) AS first_seen,
       max(ts) AS last_seen,
       CAST(count(*) AS BIGINT) AS n_snapshots,
       CASE WHEN arg_max(event_type, event_id) = 'error'
            THEN 'non active' ELSE 'active' END AS status
FROM events GROUP BY user_id
UNION ALL
SELECT 'scd2_event_type' AS mode,
       user_id AS offer_id,
       valid_from AS first_seen,
       lead(valid_from) OVER (PARTITION BY user_id
                              ORDER BY valid_from, event_type) AS last_seen,
       CAST(NULL AS BIGINT) AS n_snapshots,
       event_type AS status
FROM iv
""",
)
def cdc_key_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/A6 + X5 in one per-key aggregation: publication_date /
    last_active as min/max, snapshot count, and the derived
    active/non-active status from the last event — a single hash
    aggregation (map-side combine, one shuffle on the key).

    The 'scd2_event_type' branch promotes ``operators/scd.py`` to a
    full value-hash oracle check: type-2 slowly-changing-dimension
    intervals over each user's event_type runs (gaps-and-islands, one
    key shuffle) vs DuckDB's window-SQL twin — valid_from/valid_to land
    in the first_seen/last_seen slots, the run's attribute in status."""
    ev = load_table(spark, "events", sf_dir)
    life = (
        ev.groupBy(F.col("user_id").alias("offer_id"))
        .agg(
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
            F.count(F.lit(1)).alias("n_snapshots"),
            derive_status(F.max_by("event_type", "event_id") == "error").alias("status"),
        )
        .select(F.lit("lifecycle").alias("mode"), "*")
    )
    from rental_data_pipeline_spark.operators.scd import scd2_intervals

    scd = scd2_intervals(
        ev.select(F.col("user_id").alias("offer_id"), "ts", "event_type"),
        "offer_id", "ts", ["event_type"],
    ).select(
        F.lit("scd2_event_type").alias("mode"),
        "offer_id",
        F.col("valid_from").alias("first_seen"),
        F.col("valid_to").alias("last_seen"),
        F.lit(None).cast("long").alias("n_snapshots"),
        F.col("event_type").alias("status"),
    )
    return life.unionByName(scd)


@register(
    "dedup_last_wins",
    oracle="""
SELECT user_id AS offer_id,
       arg_max(event_id, event_id) AS last_event_id,
       arg_max(value, event_id) AS last_value,
       arg_max(event_type, event_id) AS last_event_type,
       arg_max(ts, event_id) AS last_ts
FROM events GROUP BY user_id
""",
)
def dedup_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12: last-wins dedup by key with explicit order (max_by, no
    row_number shuffle+sort — a single hash aggregation)."""
    return (
        load_table(spark, "events", sf_dir)
        .groupBy(F.col("user_id").alias("offer_id"))
        .agg(
            F.max("event_id").alias("last_event_id"),
            F.max_by("value", "event_id").alias("last_value"),
            F.max_by("event_type", "event_id").alias("last_event_type"),
            F.max_by("ts", "event_id").alias("last_ts"),
        )
    )


# ---------------------------------------------------------------------------
# Relational / TPC-H-shaped operators (joins, aggs, windows, filters).
# ---------------------------------------------------------------------------

@register(
    "pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))
                * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy-agg with pushdown filter.

    Decimal arithmetic keeps the oracle bit-exact (SURVEY §7.4#4), with
    precisions sized to the data (price < 10^10, rates < 1) so every
    intermediate stays under precision 38: a wider cast pushes the
    triple product past 38 digits and Spark drops from the compact
    long-backed decimal into a checked-overflow BigDecimal path that
    measured ~25x slower on the same scan.
    """
    li = load_table(spark, "lineitem", sf_dir)
    qty = F.col("l_quantity").cast("decimal(12,2)")
    ext = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(ext).cast("double").alias("sum_base_price"),
            F.sum(ext * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(ext * (F.lit(1) - disc) * (F.lit(1) + tax))
            .cast("double")
            .alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "top_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) t
WHERE rn <= 3
""",
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group window (deterministic tiebreak on orderkey)."""
    o = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice",
                 F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
    )


@register(
    "enrich_supplier_geo",
    oracle="""
SELECT s.s_suppkey, s.s_name, n.n_name AS nation, r.r_name AS region
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
""",
)
def enrich_supplier_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11: two-stage enrichment as chained broadcast joins (the
    geocode→route lookup chain re-expressed; dims broadcast, zero
    shuffle of the fact side)."""
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "s_suppkey", "s_name",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )


@register(
    "worklist_anti_joins",
    oracle="""
SELECT 'never_ordered' AS kind, c_custkey AS work_key, c_name AS name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT 'disappeared' AS kind, o_custkey AS work_key, NULL AS name
FROM (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_custkey NOT IN (
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'))
""",
)
def worklist_anti_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 + J7 in one feed: keys present in one set but not the other
    ('never_ordered' — customers with no orders) unioned with keys
    active historically but absent from the current batch
    ('disappeared' — tombstone candidates). Both are left-anti joins."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    never = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.lit("never_ordered").alias("kind"),
        F.col("c_custkey").alias("work_key"),
        F.col("c_name").alias("name"),
    )
    gone = disappeared_anti_join(spark, sf_dir).select(
        F.lit("disappeared").alias("kind"),
        F.col("o_custkey").alias("work_key"),
        F.lit(None).cast("string").alias("name"),
    )
    return never.unionByName(gone)


def disappeared_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: keys active historically but absent from the current batch
    (customers with no orders since 2000) → tombstone candidates."""
    o = load_table(spark, "orders", sf_dir)
    current = o.where(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    return (
        o.select("o_custkey").distinct()
        .join(current, "o_custkey", "left_anti")
    )


@register(
    "worklist_unions",
    oracle="""
SELECT 'tombstone' AS kind, o_custkey AS offer_id, false AS is_unpublished
FROM (SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
UNION ALL
SELECT 'tombstone' AS kind, o_custkey AS offer_id, true AS is_unpublished
FROM (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_custkey NOT IN (
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'))
UNION ALL
SELECT 'scope' AS kind, work_key AS offer_id, NULL AS is_unpublished
FROM (
  SELECT DISTINCT c_custkey AS work_key FROM (
    SELECT c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    UNION ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT c_custkey FROM customer WHERE c_acctbal < 0))
""",
)
def worklist_unions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 + J9 in one feed: current batch ∪ synthetic tombstones for
    disappeared keys ('tombstone' rows) plus the deduplicated work-set
    union of flag-gated key sets ('scope' rows)."""
    tomb = tombstone_union(spark, sf_dir).select(
        F.lit("tombstone").alias("kind"), "offer_id", "is_unpublished"
    )
    scope = scope_union(spark, sf_dir).select(
        F.lit("scope").alias("kind"),
        F.col("work_key").alias("offer_id"),
        F.lit(None).cast("boolean").alias("is_unpublished"),
    )
    return tomb.unionByName(scope)


def tombstone_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: current batch ∪ synthetic tombstones for disappeared keys."""
    o = load_table(spark, "orders", sf_dir)
    cutoff = F.lit("2000-01-01 00:00:00").cast("timestamp")
    current = (
        o.where(F.col("o_orderdate") >= cutoff)
        .select("o_custkey").distinct()
        .select(F.col("o_custkey").alias("offer_id"),
                F.lit(False).alias("is_unpublished"))
    )
    disappeared = (
        o.select("o_custkey").distinct()
        .join(
            o.where(F.col("o_orderdate") >= cutoff).select("o_custkey"),
            "o_custkey",
            "left_anti",
        )
        .select(F.col("o_custkey").alias("offer_id"),
                F.lit(True).alias("is_unpublished"))
    )
    return current.unionByName(disappeared)


def scope_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9: work set = ∪ of flag-gated key sets, deduplicated."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    new = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.col("c_custkey").alias("work_key")
    )
    open_orders = o.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("work_key")
    )
    negative = c.where(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("work_key")
    )
    return new.unionByName(open_orders).unionByName(negative).distinct()


@register(
    "filter_recent_or_active",
    oracle="""
WITH latest AS (
  SELECT user_id AS offer_id,
         arg_max(event_type, event_id) AS last_event_type,
         max(ts) AS last_active
  FROM events GROUP BY user_id
), bound AS (SELECT max(ts) AS max_ts FROM events)
SELECT offer_id, last_event_type, last_active,
       CASE WHEN last_event_type = 'error' THEN 'non active' ELSE 'active' END AS status
FROM latest, bound
WHERE last_active >= max_ts - INTERVAL 7 DAY
   OR last_event_type <> 'error'
""",
)
def filter_recent_or_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: recent-or-active dashboard filter over merged state (the
    'now' is the stream's max ts — injected, not wall clock)."""
    ev = load_table(spark, "events", sf_dir)
    latest = ev.groupBy(F.col("user_id").alias("offer_id")).agg(
        F.max_by("event_type", "event_id").alias("last_event_type"),
        F.max("ts").alias("last_active"),
    )
    bound = ev.agg(F.max("ts").alias("max_ts"))
    return (
        latest.crossJoin(F.broadcast(bound))
        .where(
            (F.col("last_active") >= F.col("max_ts") - F.expr("INTERVAL 7 DAYS"))
            | (F.col("last_event_type") != "error")
        )
        .select(
            "offer_id", "last_event_type", "last_active",
            F.when(F.col("last_event_type") == "error", "non active")
            .otherwise("active")
            .alias("status"),
        )
    )


def status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 + A1/A2: status derivation + counts. (Grouped to per-user
    status rows; oracle groups identically.)"""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(F.max_by("event_type", "event_id").alias("t"), F.count(F.lit(1)).alias("n"))
        .select(
            derive_status(F.col("t") == "error").alias("status"),
            F.col("n"),
        )
    )


# ---------------------------------------------------------------------------
# VALUES-backed scalar-function queries (X-series) — same literals feed
# both engines.
# ---------------------------------------------------------------------------

NUMERIC_LITERALS: list[tuple[int, str | None]] = [
    (1, "85 000 ₽/мес."),
    (2, "85000"),
    (3, "85 000,50"),
    (4, "  12.5  "),
    (5, "-3"),
    (6, "junk"),
    (7, None),
    (8, ""),
    (9, "abc 4 2 def"),
    (10, "1 234 567"),
    (11, "3,14 и ещё"),
    (12, "-0,5%"),
    # narrow NBSP (U+202F) / thin space (U+2009) thousands separators —
    # modern pages emit these; the differential must pin that BOTH
    # engines strip the full Unicode whitespace class, not just
    # ASCII+NBSP (an engine that misses them parses "85 000" as 85.0,
    # a silent 1000x corruption)
    (13, "85 000 ₽/мес."),
    (14, "1 234 567,25"),
    # U+001C file separator: NOT Unicode White_Space, and measured
    # unstripped by Java's (?U)\\s — both engines must parse this as
    # 85.0 (extract stops at the control char); the literal pins the
    # NEGATIVE case so neither oracle class nor engine regex quietly
    # grows to strip the 1C-1F control block
    (15, "85000"),
]


def _values_sql(rows, cols) -> str:
    def fmt(v):
        if v is None:
            return "NULL"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return repr(v)

    body = ", ".join("(" + ", ".join(fmt(v) for v in r) + ")" for r in rows)
    return f"(VALUES {body}) t({', '.join(cols)})"


# oracle twin for the scalar suite (queries_scalar2.scalar_suite)
NUMERIC_PARSE_ORACLE = f"""
SELECT id,
       CASE WHEN m <> '' THEN CAST(m AS DOUBLE) END AS parsed
FROM (
  SELECT id,
         regexp_extract(
           regexp_replace(replace(coalesce(v, ''), ',', '.'),
                          '[\\s\\x{{0B}}\\x{{85}}\\x{{2028}}\\x{{2029}}\\p{{Zs}}]+',
                          '', 'g'),
           '(-?\\d+(?:\\.\\d+)?)', 1) AS m
  FROM {_values_sql(NUMERIC_LITERALS, ["id", "v"])})
"""


def scalar_numeric_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 over shared literals: messy RU price strings → double."""
    df = literal_frame(spark, NUMERIC_LITERALS, "id int, v string")
    return df.select("id", parse_numeric_value(F.col("v")).alias("parsed"))


STREET_LITERALS: list[tuple[int, str | None]] = [
    (1, "улица Тверская"),
    (2, "Ленинградское шоссе"),
    (3, "проспект Мира"),
    (4, "Сивцев Вражек переулок"),
    (5, "Гоголевский бульвар"),
    (6, "Крымская набережная"),
    (7, "Большая улица и малая улица"),
    (8, "безулица"),
    (9, None),
    (10, "улицами не заменяется"),
]


STREET_NORMALIZE_ORACLE = f"""
SELECT id,
       array_to_string(list_transform(string_split(v, ' '),
         w -> CASE w WHEN 'улица' THEN 'ул.'
                     WHEN 'шоссе' THEN 'ш.'
                     WHEN 'проспект' THEN 'просп.'
                     WHEN 'переулок' THEN 'пер.'
                     WHEN 'бульвар' THEN 'бул.'
                     WHEN 'набережная' THEN 'наб.'
                     ELSE w END), ' ') AS normalized
FROM {_values_sql(STREET_LITERALS, ["id", "v"])}
WHERE v IS NOT NULL
"""


def scalar_street_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 over shared literals. (Oracle emulates the Unicode word
    boundary by whole-word matching on space-split tokens; literals are
    chosen with space/string boundaries so both formulations agree.)"""
    df = literal_frame(spark, STREET_LITERALS, "id int, v string")
    return (
        df.where(F.col("v").isNotNull())
        .select("id", normalize_street_names(F.col("v")).alias("normalized"))
    )


def queries():
    return dict(QUERIES)


def oracles():
    return dict(ORACLES)


# Registered last so `register` above is defined when the submodules
# import back into this registry (deliberate tail imports).
from rental_data_pipeline_spark import queries_training  # noqa: E402,F401
from rental_data_pipeline_spark import queries_extract  # noqa: E402,F401
from rental_data_pipeline_spark import queries_streaming  # noqa: E402,F401
from rental_data_pipeline_spark import queries_scalar2  # noqa: E402,F401
from rental_data_pipeline_spark import queries_pipeline  # noqa: E402,F401
from rental_data_pipeline_spark import queries_timeseries  # noqa: E402,F401


def prebuild_artifacts(spark, sf_dir: str, max_workers: int = 6) -> float:
    """Build every per-session prepared artifact CONCURRENTLY; returns
    the phase's wall-clock seconds.

    A cold session pays each artifact build (state folds, trained
    indexes, rendered fixtures) exactly once; built serially — the
    shape a sequential warmup pass produces — the six builds sum to
    ~20 s at sf0.1 even though they are fully independent jobs on
    independent state roots. A cluster cold-starts them the same way
    a driver submits any independent jobs: in parallel threads against
    one SparkSession (``prepared.session_artifact`` holds a per-KEY
    lock, so distinct artifacts build concurrently while duplicate
    requests coalesce). Wall-clock of this phase — not the sum of the
    per-build times, which overlap — is the honest cold-start
    surcharge, and ``bench.py`` reports it as such."""
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    builders = (
        queries_training._span_state_base,
        queries_training._simhash_idx_base,
        queries_training._cc_labels_base,
        queries_training._ann_index_artifact,
        queries_training._pq_codebooks_artifact,
        queries_scalar2.scalar_suite,
        queries_pipeline._fixtures,
    )
    t0 = _time.perf_counter()
    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        futs = [ex.submit(b, spark, sf_dir) for b in builders]
        for f in futs:
            f.result()  # surface the first build error, don't swallow
    return round(_time.perf_counter() - t0, 3)
