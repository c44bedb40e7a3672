"""End-to-end training-corpus job: stage contracts hold in composition."""

import pytest
from pyspark.sql import functions as F

from rental_data_pipeline_spark.jobs.corpus_job import CorpusConfig, build_training_corpus
from rental_data_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def result(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    # plant twins (near-dups for the dedup/split stages) and use a
    # hash-mod slice as the eval holdout
    twins = docs.where(F.col("doc_id") % 4 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    corpus = docs.unionByName(twins)
    holdout = docs.where(F.col("doc_id") % 5 == 0)
    cfg = CorpusConfig(
        languages=("en", "de", "fr", "es"), min_quality=0.0, min_tokens=1,
        max_contamination=0.5,
    )
    return corpus, holdout, build_training_corpus(corpus, holdout, cfg)


def test_stage_counts_are_consistent(result):
    corpus, holdout, r = result
    m = r["metrics"]
    assert m["n_raw"] == corpus.count()
    assert 0 < m["n_corpus"] <= m["n_curated"] <= m["n_raw"]
    assert m["n_near_dup_pairs"] > 0 and m["n_dropped_dups"] > 0
    # canonical drop removed exactly the non-canonical cluster members
    assert m["n_curated"] - m["n_dropped_dups"] - m["n_contaminated"] == m["n_corpus"]


def test_no_near_dup_pair_straddles_splits(result):
    _, _, r = result
    split_of = {row.doc_id: row.split for row in r["split"].collect()}
    for p in r["pairs"].collect():
        a, b = split_of.get(p.doc_a), split_of.get(p.doc_b)
        # a pair member may be dropped (dup/contaminated); survivors
        # of the SAME pair must never land in different splits
        if a is not None and b is not None:
            assert a == b, (p.doc_a, p.doc_b, a, b)


def test_contaminated_docs_are_out(result):
    _, _, r = result
    bad = {row.doc_id for row in r["contaminated"].collect()}
    kept = {row.doc_id for row in r["split"].collect()}
    assert bad and not (bad & kept)


def test_chunks_cover_only_train(result):
    _, _, r = result
    train_ids = {
        row.doc_id for row in r["split"].where(F.col("split") == "train").collect()
    }
    chunk_ids = {row.doc_id for row in r["chunks"].select("doc_id").distinct().collect()}
    assert chunk_ids <= train_ids and chunk_ids
    # packing is per-bin: bins must account for every train doc exactly
    packed = r["packed"].agg(
        F.sum("n_docs").alias("n"), F.min("first_doc").alias("lo"),
        F.max("last_doc").alias("hi"),
    ).collect()[0]
    assert packed.n == len(train_ids)
    assert packed.lo in train_ids and packed.hi in train_ids


def test_profile_covers_final_corpus(result):
    _, _, r = result
    prof = {row.column: row for row in r["profile"].collect()}
    assert prof["doc_id"].n_rows == r["metrics"]["n_corpus"]
    assert prof["text"].n_null == 0


def test_expectations_gate_raw_docs(spark, sf_dir):
    """Round-5 verdict item #7: row contracts on the raw docs run
    before curation; per-rule counts land in the metrics and failing
    docs can never reach the corpus or the split."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    n_raw = docs.count()
    bad_ids = {r.doc_id for r in docs.where("doc_id % 10 = 3").collect()}
    cfg = CorpusConfig(
        languages=("en", "de", "fr", "es"), min_quality=0.0, min_tokens=1,
        max_contamination=0.5,
        expectations={
            "not_mod3": F.col("doc_id") % 10 != 3,
            "has_text": F.length("text") > 0,
        },
    )
    r = build_training_corpus(docs, docs.limit(5), cfg)
    exp = r["metrics"]["expectations"]
    assert exp["_rows"] == n_raw
    assert exp["not_mod3"] == len(bad_ids) > 0
    assert exp["has_text"] == 0
    assert {x.doc_id for x in r["expectation_quarantine"].collect()} == bad_ids
    assert not bad_ids & {x.doc_id for x in r["corpus"].collect()}
    assert not bad_ids & {x.doc_id for x in r["split"].collect()}
