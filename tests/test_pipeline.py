"""End-to-end pipeline job (§3.1): fixtures → search → listings →
distance → snapshots, with tombstones, quarantine, and metrics."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from rental_data_pipeline_spark.jobs import (
    PipelineConfig,
    SearchConfig,
    construct_search_url,
    run_pipeline,
)
from rental_data_pipeline_spark.operators import extract as X


@pytest.fixture()
def outdir():
    d = tempfile.mkdtemp(prefix="pipeline_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, f"text {i}") for i in ids], "doc_id long, text string"
    )


def _fixtures(spark, ids):
    docs = _docs(spark, ids)
    search_pages = X.search_pages_from_documents(docs)

    def listing_pages_for(scope_ids):
        wanted = scope_ids.select(
            (F.col("offer_id").cast("long") - 100000).alias("doc_id")
        )
        rows = docs.join(wanted, "doc_id")
        return rows.select(
            X.listing_page_html(F.col("doc_id"), F.col("text")).alias("html"),
            X.listing_url(F.col("doc_id")).alias("url"),
        )

    # deterministic lookups keyed on the rendered address
    addr = F.concat(F.lit("Москва, ул. Тестовая, "), F.col("doc_id") % 200 + 1)
    geocode = docs.select(
        addr.alias("address"),
        (F.col("doc_id") % 200 + 1).cast("double").alias("lat"),
        F.lit(37.0).alias("lon"),
    ).dropDuplicates(["address"])
    route = geocode.select(
        "lat", "lon", (F.col("lat") * 100 + 50).alias("meters")
    ).dropDuplicates(["lat", "lon"])
    return search_pages, listing_pages_for, geocode, route


def test_full_run_builds_state_and_snapshots(spark, outdir):
    ids = list(range(1, 31))
    search_pages, listing_for, geocode, route = _fixtures(spark, ids)
    res = run_pipeline(
        spark, search_pages, listing_for, geocode, route,
        PipelineConfig(), state_path=f"{outdir}/state", output_dir=outdir,
    )
    state = {r.offer_id: r for r in res["state"].collect()}
    assert len(state) == 30
    r1 = state["100001"]  # doc_id 1
    assert r1.price_value == 21000.0  # (1 % 100 + 20) * 1000
    assert r1.address == "Москва, ул. Тестовая, 2"
    assert r1.distance == 0.25  # ((1%200+1)*100+50)/1000 = 250 m
    assert r1.status == "active"
    # doc_id 7 renders unpublished
    assert state["100007"].is_unpublished is True
    assert state["100007"].status == "non active"
    # listing-page fields survived the merge
    assert r1.metro_station == "Станция1"
    assert r1.total_views == 18  # 1 % 900 + 17
    # metrics observed in the same pass as the writes
    assert res["metrics"]["n_state"] == 30
    assert res["metrics"]["n_with_distance"] == 30
    assert res["metrics"]["n_quarantined"] == 0


def test_incremental_run_tombstones_missing(spark, outdir):
    # run 1: listings 1..20; run 2: only 1..15 remain => 16..20 tombstoned
    sp1, lf1, geo, route = _fixtures(spark, list(range(1, 21)))
    run_pipeline(
        spark, sp1, lf1, geo, route, PipelineConfig(),
        state_path=f"{outdir}/state", output_dir=outdir,
    )
    sp2, lf2, _, _ = _fixtures(spark, list(range(1, 16)))
    res = run_pipeline(
        spark, sp2, lf2, geo, route, PipelineConfig(),
        state_path=f"{outdir}/state", output_dir=outdir,
    )
    state = {r.offer_id: r for r in res["state"].collect()}
    assert len(state) == 20  # nothing is deleted (T7)
    gone = {str(100000 + i) for i in range(16, 21)}
    for k in gone:
        assert state[k].is_unpublished is True, k
        assert state[k].status == "non active"
    assert state["100001"].status == "active"


def test_quarantine_counts_error_pages(spark, outdir):
    # doc_id 50 renders a 404 page => quarantined, not merged from listing
    sp, lf, geo, route = _fixtures(spark, [49, 50, 51])
    res = run_pipeline(
        spark, sp, lf, geo, route, PipelineConfig(), output_dir=outdir,
    )
    assert res["metrics"]["n_quarantined"] == 1
    state = {r.offer_id: r for r in res["state"].collect()}
    # card data still present for the errored listing (search phase)
    assert state["100050"].price_value == 70000.0  # (50 % 100 + 20) * 1000
    assert state["100050"].metro_station is None  # listing fields missing


def test_construct_search_url_repeated_params():
    url = construct_search_url(
        SearchConfig(maxprice=90000, districts=[1, 21], metros=[4], rooms=[1, 2]),
        page=3,
    )
    assert "p=3" in url and "maxprice=90000" in url
    assert "district%5B0%5D=1" in url and "district%5B1%5D=21" in url
    assert "metro%5B0%5D=4" in url
    assert "room1=1" in url and "room2=1" in url


def test_time_travel_across_batch_pipeline_runs(spark, outdir):
    """The batch pipeline and the streaming fold share one versioned
    state table — as_of must reconstruct the state after EACH pipeline
    run (the audit read: 'the corpus as run N saw it')."""
    from rental_data_pipeline_spark.streaming.incremental import (
        read_state,
        state_version_log,
    )

    state_path = f"{outdir}/state"
    r1 = run_pipeline(
        spark, *_fixtures(spark, range(6)),
        PipelineConfig(), state_path=state_path, output_dir=outdir,
    )
    first = {
        row.offer_id: row.price_value for row in r1["state"].collect()
    }
    r2 = run_pipeline(
        spark, *_fixtures(spark, range(3, 9)),
        PipelineConfig(), state_path=state_path, output_dir=outdir,
    )
    log = state_version_log(state_path)
    assert len(log) == 2 and all(e["full"] for e in log)

    back = {
        row.offer_id: row.price_value
        for row in read_state(
            spark, state_path, as_of_version=log[0]["version"]
        ).collect()
    }
    assert back == first  # run-1 state reconstructed exactly
    now = {
        row.offer_id: row.price_value
        for row in read_state(spark, state_path).collect()
    }
    assert now == {
        row.offer_id: row.price_value for row in r2["state"].collect()
    }
    assert set(now) > set(back)  # run 2 added keys 6-8


def test_expectations_gate_listing_batch(spark, outdir):
    """Round-5 verdict item #7: declarative expectations front the
    listing merge — failing rows quarantine, per-rule counts ride the
    A7 Observation metrics, clean rows merge normally."""
    ids = list(range(1, 31))
    search_pages, listing_for, geocode, route = _fixtures(spark, ids)
    cfg = PipelineConfig(
        expectations={
            # fixture price = (doc_id % 100 + 20) * 1000 → 21k..50k;
            # docs 11..30 (price > 30k) fail
            "price_max": F.col("price_value") <= 30000,
            "key_present": F.col("offer_id").isNotNull(),
        }
    )
    res = run_pipeline(
        spark, search_pages, listing_for, geocode, route, cfg,
        state_path=f"{outdir}/state", output_dir=outdir,
    )
    m = res["metrics"]
    assert m["n_expectation_quarantined"] == 20
    assert m["expectation_price_max"] == 20
    assert m["expectation_key_present"] == 0
    # quarantined rows kept their violation tags for triage
    q = res["expectation_quarantine"].collect()
    assert len(q) == 20 and all(r._violations == ["price_max"] for r in q)
    # clean listings merged; quarantined ones contributed only their
    # search-phase fields (no listing-page enrichment)
    state = {r.offer_id: r for r in res["state"].collect()}
    assert len(state) == 30  # search phase still saw every offer
    assert state["100001"].metro_station == "Станция1"
    assert state["100011"].metro_station is None
