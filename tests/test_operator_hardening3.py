"""Sixth review pass regression pins: dirty scrape inputs through the
CDC merge, normalization scalars, HTML strainer and sinks — ANSI-mode
crash classes and unicode-whitespace parity with the reference."""

import pytest
from pyspark.sql import functions as F


def test_parse_russian_date_dirty_labels_null_not_crash(spark):
    """Under ANSI, the typed variant's passthrough used plain
    to_timestamp and CRASHED on any unparseable label; and an
    out-of-range HH:MM in the today/yesterday branch crashed both
    variants (the reference returns NaT)."""
    from rental_data_pipeline_spark.functions.dates import (
        parse_russian_date,
        parse_russian_date_label,
    )

    df = spark.createDataFrame(
        [("поднято в топ",), ("сегодня, 99:30",), ("",),
         ("2024-01-02 03:04:05",)],
        "s string",
    )
    now = "2026-08-16 12:00:00"
    got = df.select(
        parse_russian_date("s", now).alias("t"),
        parse_russian_date_label("s", now).alias("lbl"),
    ).collect()
    assert got[0].t is None and got[1].t is None and got[2].t is None
    assert got[3].t is not None


def test_parse_numeric_value_unicode_whitespace(spark):
    """The reference's Python \\s strips ALL unicode whitespace; the
    ASCII-only \\s left U+202F thousands separators in place and
    silently parsed '85\\u202f000 ₽' as 85.0."""
    from rental_data_pipeline_spark.functions.numeric import (
        parse_numeric_value,
    )
    from rental_data_pipeline_spark.functions.text import (
        extract_summary_count,
    )

    df = spark.createDataFrame(
        [("85 000 ₽",), ("85 000 ₽",), ("85 000 ₽",)],
        "s string",
    )
    got = [r.v for r in df.select(parse_numeric_value("s").alias("v")).collect()]
    assert got == [85000.0, 85000.0, 85000.0]

    cnt = spark.createDataFrame(
        [("Найдено 1 062 объявления",)], "s string"
    ).select(extract_summary_count("s").alias("n")).collect()
    assert cnt[0].n == 1062


def test_smart_title_split_decimal_first_number(spark):
    """A decimal first/positional number ('1,5-комнатная') used to
    crash the long cast under ANSI; it now truncates like the
    reference's int()."""
    from rental_data_pipeline_spark.functions.text import parse_title

    df = spark.createDataFrame(
        [("1,5-комн. кв., 54,2 м², 3/9 этаж",)], "s string"
    )
    cols = parse_title("s")
    got = df.select(
        *[c.alias(k) for k, c in cols.items()]
    ).collect()[0]
    assert got.room_count == 1
    assert got.total_area == 54.2
    assert got.floor == 3 and got.total_floors == 9


def test_merge_survives_overflow_scale_price(spark):
    """A price change to an overflow-scale double used to kill the
    whole state merge at the W1 diff's cast('long'); try_cast degrades
    that one row's diff to null instead."""
    from rental_data_pipeline_spark.operators.merge import (
        merge_snapshots,
    )

    snaps = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 100.0, False, 1),
            (1, "2024-01-02 10:00:00", 1e20, False, 2),
        ],
        "offer_id long, updated_date string, price_value double, "
        "is_unpublished boolean, event_id long",
    ).withColumn("updated_date", F.to_timestamp("updated_date"))
    got = merge_snapshots(
        snaps, key="offer_id", order_cols=["updated_date", "event_id"]
    ).collect()
    assert len(got) == 1
    assert got[0].price_value == 1e20
    assert got[0].total_price_changes == 1  # the change still counts


def test_normalize_overflow_int_field_nulls(spark):
    """A dirty 20+ digit count field normalizes to an overflow-scale
    double; the long coercion must null the field per-row, not crash
    the batch."""
    from rental_data_pipeline_spark.operators.normalize import (
        normalize_listings,
    )

    df = spark.createDataFrame(
        [("1", "99999999999999999999999", "85 000 ₽", "false")],
        "offer_id string, total_views string, price_value string, "
        "is_unpublished string",
    ).withColumn("is_unpublished", F.lit(False))
    got = normalize_listings(df, now="2026-08-16 12:00:00").collect()[0]
    assert got.total_views is None
    assert got.price_value == 85000.0


def test_csv_snapshot_renders_array_columns(spark, tmp_path):
    """The CSV datasource rejects array columns outright; the state
    schema carries image_urls/features arrays, so the export used to
    die — complex columns now render as JSON strings."""
    from rental_data_pipeline_spark.operators.sinks import (
        write_csv_snapshot,
    )

    df = spark.createDataFrame(
        [(1, ["http://a/1.jpg", "http://a/2.jpg"], 1.5)],
        "offer_id long, image_urls array<string>, price double",
    )
    path = str(tmp_path / "csv_out")
    write_csv_snapshot(df, path, single_file=True)
    back = spark.read.option("header", True).csv(path).collect()[0]
    assert "1.jpg" in back.image_urls  # JSON-rendered, not dropped


def test_split_cards_null_page_id(spark):
    """One NULL page_id (float64 NaN through Arrow->pandas) used to
    kill the whole task with int(NaN); it now propagates null."""
    from rental_data_pipeline_spark.operators.extract import split_cards

    card = (
        '<div data-name="CardComponent">'
        '<a data-name="LinkArea" href="http://x/offer/7/"></a>'
        '<span data-mark="OfferTitle">T</span>'
        '<span data-mark="MainPrice">85 000 ₽</span></div>'
    )
    df = spark.createDataFrame(
        [(1, card), (None, card)], "page_id long, html string"
    )
    got = split_cards(df, "html", "page_id").collect()
    assert len(got) == 2
    assert sorted((r.page_id for r in got), key=lambda x: (x is None, x)) == [
        1, None,
    ]


def test_strainer_survives_quoted_gt_and_script_cdata():
    """The depth scan must not truncate a watched region on a '>'
    inside a quoted attribute or a '</div>' inside script text — both
    verified truncations before the quote-aware/CDATA-aware scan."""
    from rental_data_pipeline_spark.operators.extract import (
        _compile_strainer,
        _strain,
    )

    watch = _compile_strainer([("data-name", "Description")])
    h1 = (
        '<div data-name="Description">alpha '
        '<div title="x/>y">inner</div> beta</div>'
    )
    h2 = (
        '<div data-name="Description">alpha '
        '<script>var a = "</div>";</script> beta</div>'
    )
    assert _strain(h1, watch) == h1
    assert _strain(h2, watch) == h2
