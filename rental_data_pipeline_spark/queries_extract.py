"""Oracle-checked queries for the extraction layer (SURVEY §2.2).

Each query renders deterministic HTML fixtures from the ``documents``
table (extract.listing_page_html — all derived fields are doc_id
arithmetic), runs the real extraction operators over them, and the
DuckDB oracle recomputes the expected output directly from the same
arithmetic — a full round-trip check of render → parse → project.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rental_data_pipeline_spark.functions.numeric import parse_numeric_value
from rental_data_pipeline_spark.functions.text import (
    extract_summary_count,
    parse_floor_info,
)
from rental_data_pipeline_spark.operators import extract as X
from rental_data_pipeline_spark.queries import register
from rental_data_pipeline_spark.sources.tables import load_table


def _rendered(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    # Fan out BEFORE rendering: the documents file is small in bytes
    # (one scan split), but each row becomes a ~75 KB page whose parse
    # dominates the query — without this the whole Arrow stage runs on
    # one core. The exchange moves only the ~1 KB pre-render rows; the
    # page markup is materialized after the shuffle, never through it.
    n = spark.sparkContext.defaultParallelism
    return docs.repartition(n, F.col("doc_id")).select(
        "doc_id",
        X.listing_page_html(F.col("doc_id"), F.col("text")).alias("html"),
        X.listing_url(F.col("doc_id")).alias("url"),
    )


@register(
    "extract_listing_fields",
    oracle="""
SELECT CAST(doc_id + 100000 AS VARCHAR) AS offer_id,
       printf('%d-комн. кв., %d м², %d/%d этаж',
              doc_id % 4 + 1, doc_id % 60 + 30, doc_id % 15 + 1,
              doc_id % 15 + 1 + doc_id % 10) AS title,
       CAST((doc_id % 100 + 20) * 1000 AS DOUBLE) AS price_num,
       '12 мая, 14:30' AS updated_date,
       'Москва, ул. Тестовая, ' || CAST(doc_id % 200 + 1 AS VARCHAR) AS address,
       'Станция' || CAST(doc_id % 12 AS VARCHAR) AS metro_station,
       doc_id % 900 + 17 AS total_views,
       doc_id % 15 + 1 AS floor,
       doc_id % 15 + 1 + doc_id % 10 AS total_floors,
       doc_id % 7 = 0 AS is_unpublished,
       doc_id % 2 = 0 AS has_fridge,
       doc_id % 3 = 0 AS has_furniture
FROM documents
WHERE doc_id % 50 <> 0
""",
)
def extract_listing_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1+E3+E5+X8: render listing pages, parse with the mini-DOM
    selector UDF, quarantine errors, widen facts/features natively."""
    parsed = X.parse_listing_pages(_rendered(spark, sf_dir))
    clean, _bad = X.quarantine_split(parsed)
    clean = X.feature_flags(clean, ["Холодильник", "Мебель"])
    floor, total = parse_floor_info(F.col("facts")["Этаж"])
    return clean.select(
        "offer_id",
        "title",
        parse_numeric_value("price_value").alias("price_num"),
        "updated_date",
        "address",
        "metro_station",
        F.col("total_views").cast("long").alias("total_views"),
        floor.cast("long").alias("floor"),
        total.cast("long").alias("total_floors"),
        "is_unpublished",
        F.col("has_холодильник").alias("has_fridge"),
        F.col("has_мебель").alias("has_furniture"),
    )


@register(
    "extract_search_cards",
    oracle="""
SELECT doc_id // 25 AS page_id,
       CAST(doc_id + 100000 AS VARCHAR) AS offer_id,
       '/rent/flat/' || CAST(doc_id + 100000 AS VARCHAR) AS offer_url,
       printf('%d-комн. кв., %d м²', doc_id % 4 + 1, doc_id % 60 + 30) AS title,
       CAST((doc_id % 100 + 20) * 1000 AS DOUBLE) AS price_num
FROM documents
""",
)
def extract_search_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: assemble card blocks into pages, split one page into N card
    rows (multi-row mapInPandas emit), parse each card."""
    docs = load_table(spark, "documents", sf_dir)
    pages = X.search_pages_from_documents(docs)
    cards = X.split_cards(pages)
    return cards.select(
        "page_id",
        "offer_id",
        "offer_url",
        "title",
        parse_numeric_value("price_value").alias("price_num"),
    )


@register(
    "extract_quarantine_pagination",
    oracle="""
SELECT 'quarantine' AS kind,
       CAST(doc_id + 100000 AS VARCHAR) AS offer_id,
       '404 Страница не найдена' AS error,
       NULL AS page_id, NULL AS summary_count, NULL AS total_pages
FROM documents
WHERE doc_id % 50 = 0
UNION ALL
SELECT 'pagination' AS kind, NULL AS offer_id, NULL AS error,
       doc_id // 25 AS page_id,
       1234567 + doc_id // 25 AS summary_count,
       CAST(ceil((1234567 + doc_id // 25) / 28.0) AS BIGINT) AS total_pages
FROM documents
GROUP BY doc_id // 25
""",
)
def extract_quarantine_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8/F5 + E6/A3 in one feed: error pages land in quarantine with
    the sniffed code ('quarantine' rows); summary headers parse to a
    count and the ceil(n/28) pagination aggregate ('pagination' rows)."""
    q = extract_error_quarantine(spark, sf_dir).select(
        F.lit("quarantine").alias("kind"), "offer_id", "error",
        F.lit(None).cast("long").alias("page_id"),
        F.lit(None).cast("long").alias("summary_count"),
        F.lit(None).cast("long").alias("total_pages"),
    )
    p = extract_summary_pagination(spark, sf_dir).select(
        F.lit("pagination").alias("kind"),
        F.lit(None).cast("string").alias("offer_id"),
        F.lit(None).cast("string").alias("error"),
        "page_id", "summary_count", "total_pages",
    )
    return q.unionByName(p)


def extract_error_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8/F5: error pages land in quarantine with the sniffed code —
    via the NATIVE regexp sniff (no Python stage): at 100 TB the cheap
    marker scan prunes error pages before any Arrow transfer, instead
    of full-parsing every page to find the 2% that are errors. The
    parse-then-split form stays exercised by the pipeline (parse-once)
    and extract_listing_fields."""
    return X.sniff_error_pages(_rendered(spark, sf_dir))


def extract_summary_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6+A3: NBSP/space-thousands summary header → count (native
    regexp, no UDF) → pagination agg ceil(n/28) (parse_data.py:309-320).
    The count is rendered with space-grouped thousands to exercise the
    reference's nbsp-aware extraction regex."""
    docs = load_table(spark, "documents", sf_dir)
    pages = docs.select((F.col("doc_id") / 25).cast("long").alias("page_id")).distinct()
    summary = pages.select(
        "page_id",
        F.concat(
            F.lit("Найдено "),
            F.translate(F.format_string("%,d", F.lit(1234567) + F.col("page_id")), ",", " "),
            F.lit(" объявлений"),
        ).alias("summary_text"),
    )
    n = extract_summary_count(F.col("summary_text"))
    return summary.select(
        "page_id",
        n.alias("summary_count"),
        F.ceil(n / F.lit(28.0)).cast("long").alias("total_pages"),
    )
