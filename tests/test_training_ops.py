"""Training-data operators: dedup, similarity, text stats, multimodal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rental_data_pipeline_spark.operators import dedup as D
from rental_data_pipeline_spark.operators import multimodal as M
from rental_data_pipeline_spark.operators import similarity as S
from rental_data_pipeline_spark.operators import textstats as TS
from rental_data_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, "documents", sf_dir).cache()


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return load_table(spark, "embeddings", sf_dir).cache()


def test_shingles_short_doc(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b c"), (3, "a b c d"), (4, "x")], "id int, text string"
    )
    rows = {
        r["id"]: r["sh"]
        for r in df.select("id", D.shingles("text").alias("sh")).collect()
    }
    assert rows[1] == []  # shorter than k → empty, not a descending-sequence bug
    assert rows[2] == ["a b c"]
    assert rows[3] == ["a b c", "b c d"]
    assert rows[4] == []


def test_exact_dedup_partitions_corpus(docs):
    total = docs.count()
    agg = D.exact_duplicates(docs).agg(F.sum("n_copies"), F.count(F.lit(1))).collect()[0]
    assert agg[0] == total  # every doc in exactly one group
    assert agg[1] <= total


def test_duplicated_spans_counts_and_keeper(spark):
    # docs 1 and 2 share the 10-token run "t1..t10"; doc 2 repeats it
    # internally; doc 3 is disjoint; doc 4 is shorter than the window
    run = " ".join(f"t{i}" for i in range(1, 11))
    df = spark.createDataFrame(
        [
            (1, run),
            (2, f"{run} sep {run}"),
            (3, "totally different words " * 5),
            (4, "a b c"),
        ],
        "doc_id long, text string",
    )
    rows = D.duplicated_spans(df, window=10, min_docs=2).collect()
    hit = [r for r in rows if r["n_docs"] == 2]
    assert len(hit) == 1  # only the exact shared 10-gram
    assert hit[0]["keeper_id"] == 1
    assert hit[0]["n_copies"] == 3  # once in doc 1, twice in doc 2
    # min_docs honored: doc 2's internal-only repeats don't leak through
    assert all(r["n_docs"] >= 2 for r in rows)

    # the multi-window sweep restricted to one window IS the
    # single-window operator (shared-scan form, identical semantics)
    def key(r):
        return (r["span_hash"], r["keeper_id"], r["n_copies"], r["n_docs"])

    multi = D.multi_window_duplicated_spans(df, windows=[10], min_docs=2)
    assert sorted(key(r) for r in multi.drop("window").collect()) == sorted(
        key(r) for r in rows
    )


def test_span_extents_merge_overlaps_and_split_gaps(spark):
    # shared region A (tokens 1-12 of doc 1) yields 3 overlapping
    # duplicated windows that must merge into ONE extent; region B sits
    # > window tokens later and must stay a SEPARATE extent
    a = " ".join(f"a{i}" for i in range(1, 13))  # 12 tokens
    gap = " ".join(f"g{i}" for i in range(1, 15))  # 14 unique tokens
    b = " ".join(f"b{i}" for i in range(1, 11))  # 10 tokens
    df = spark.createDataFrame(
        [(1, f"{a} {gap} {b}"), (2, a), (3, b)],
        "doc_id long, text string",
    )
    ext = {
        (r["doc_id"], r["span_start"]): r
        for r in D.duplicated_span_extents(df, window=10).collect()
    }
    assert ext[(1, 1)]["span_end"] == 12  # merged maximal extent A
    assert ext[(1, 27)]["span_end"] == 36  # extent B after the gap
    assert ext[(2, 1)]["span_end"] == 12
    assert ext[(3, 1)]["span_end"] == 10
    assert len(ext) == 4


def test_cut_duplicated_spans_keeper_keeps_others_lose(spark):
    run = " ".join(f"t{i}" for i in range(1, 11))
    df = spark.createDataFrame(
        [
            (1, run),                 # keeper: keeps its occurrence
            (2, f"{run} sep {run}"),  # loses BOTH copies
            (3, f"x {run} y"),        # loses the middle
            (4, "untouched words only here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.text
        for r in D.cut_duplicated_spans(df, window=10).collect()
    }
    assert out[1] == run
    assert out[2] == "sep"
    assert out[3] == "x y"
    assert out[4] == "untouched words only here"
    assert len(out) == 4


def test_cross_doc_span_coverage_bounds(docs):
    cov = D.cross_doc_span_coverage(docs, window=10).collect()
    assert len(cov) == docs.count()  # every doc reported
    assert all(0.0 <= r["dup_span_frac"] <= 1.0 for r in cov)
    # extent merging is what keeps the fraction ≤ 1 despite windows
    # overlapping; a raw window-hit sum would overshoot on near-dups
    assert any(r["dup_span_frac"] > 0 for r in cov)  # sf dirs have near-dups


def test_minhash_lsh_matches_bruteforce_jaccard(docs):
    brute = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.jaccard_pairs(docs, threshold=0.8).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.minhash_lsh_pairs(docs, threshold=0.8).collect()
    }
    # verified-LSH output ⊆ brute force, with identical jaccard values
    assert set(lsh) <= set(brute)
    for pair, j in lsh.items():
        assert brute[pair] == j
    # on the planted near-dups (jaccard ≥ 0.8), 16x4 LSH should have
    # essentially full recall
    assert len(lsh) >= 0.9 * len(brute)


def test_simhash_identical_docs_have_zero_hamming(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "omega psi chi phi")],
        "doc_id long, text string",
    )
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in D.simhash_near_pairs(df).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_cosine_topk_self_excluded_and_sorted(embs):
    out = S.cosine_topk(embs, [0, 1], top_k=5).collect()
    by_q: dict = {}
    for r in out:
        assert r.vec_id != r.query_id
        by_q.setdefault(r.query_id, []).append((r.rank, r.sim))
    for q, rows in by_q.items():
        rows.sort()
        assert [r[0] for r in rows] == [1, 2, 3, 4, 5]
        sims = [r[1] for r in rows]
        assert sims == sorted(sims, reverse=True)


def test_signlsh_subset_of_bruteforce_scores(embs):
    brute = {
        (r.query_id, r.vec_id): r.sim
        for r in S.cosine_topk(embs, [0], top_k=10_000).collect()
    }
    bucketed = S.signlsh_topk(embs, [0], top_k=5).collect()
    for r in bucketed:
        assert brute[(r.query_id, r.vec_id)] == r.sim


def test_ivf_trained_composition(embs):
    """Train→index→probe: kmeans_train centroids feed the IVF probe.
    Sims must be exact (verifiable against brute force) and recall vs
    the exact baseline must beat the stand-in's floor on this data."""
    brute = {
        (r.query_id, r.vec_id): r.sim
        for r in S.cosine_topk(embs, [0, 1], top_k=10_000).collect()
    }
    top5 = {}
    for (q, v), s in brute.items():
        top5.setdefault(q, []).append((-s, v))
    top5 = {q: {v for _, v in sorted(c)[:5]} for q, c in top5.items()}
    out = S.ivf_topk_trained(embs, [0, 1], top_k=5).collect()
    assert len(out) == 10
    hits = 0
    for r in out:
        assert brute[(r.query_id, r.vec_id)] == r.sim  # exact within cells
        hits += r.vec_id in top5[r.query_id]
    assert hits >= 5  # recall >= 0.5 (measured 0.92 at sf0.01)


def test_kmeans_train_returns_centroids(embs):
    cents, assign = S.kmeans_train(embs, k=4, n_iter=1)
    assert len(cents) == 4
    dim = len(cents[0])
    assert all(len(c) == dim for c in cents)
    cids = {r.cid for r in assign.select("cid").distinct().collect()}
    assert cids <= set(range(4))


def test_quality_score_bounded(docs):
    stats = TS.quality_score(docs).agg(
        F.min("quality_score"), F.max("quality_score")
    ).collect()[0]
    assert 0.0 <= stats[0] <= stats[1] <= 1.0


def test_multimodal_decode_matches_payload(docs):
    """Real BMP bytes round-trip through the distributed decode: the
    features must equal what the pure codec computes locally."""
    packed = M.pack_images(docs)
    feats = {r.doc_id: r for r in M.decode_features(packed).collect()}
    for doc_id in [r.doc_id for r in docs.limit(20).collect()]:
        w, h, (cr, cg, cb) = M._doc_geometry(doc_id)
        got = feats[doc_id]
        assert got.ok
        assert (got.width, got.height, got.n_pixels) == (w, h, w * h)
        assert got.n_bytes == 54 + h * M._bmp_stride(w)
        assert (got.mean_r, got.mean_g, got.mean_b) == (cr, cg, cb)


def test_multimodal_frames_stride(docs):
    packed = M.pack_binary(docs)
    frames = M.sample_frames(packed).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("frame_offset").alias("mx")
    )
    joined = frames.join(
        packed.select("doc_id", F.length("payload").alias("n_bytes")), "doc_id"
    )
    for r in joined.collect():
        expected = max(r.n_bytes // M.FRAME_STRIDE, 1)
        assert r.n == expected
        assert r.mx == (expected - 1) * M.FRAME_STRIDE


def test_jaccard_doc_freq_cap(spark):
    from pyspark.sql import functions as F
    from rental_data_pipeline_spark.operators.dedup import jaccard_pairs

    # two exact near-dups + a hot shingle shared by everyone
    common = "the quick brown"
    rows = [
        (1, f"{common} fox jumps over lazy dog one two"),
        (2, f"{common} fox jumps over lazy dog one three"),
        (3, f"{common} cats sit calmly beneath tall green trees"),
        (4, f"{common} dogs run wildly across wide open fields"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {(r.doc_a, r.doc_b) for r in jaccard_pairs(df, threshold=0.5).collect()}
    # cap well above any doc-frequency: identical result
    high_cap = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(df, threshold=0.5, max_doc_freq=100).collect()
    }
    assert high_cap == uncapped == {(1, 2)}
    # cap of 1 removes every shared shingle → no co-occurrence rows
    tight = jaccard_pairs(df, threshold=0.0, max_doc_freq=1).collect()
    assert tight == []


def test_minhash_lsh_recall_vs_exact_jaccard(spark, sf_dir):
    """At J >= 0.8 with 16 bands x 4 rows, band-collision probability is
    1-(1-J^4)^16 >= 0.9996 — on the test corpus LSH must recover the
    exact-Jaccard pair set (and verification keeps precision at 1)."""
    from rental_data_pipeline_spark.operators.dedup import (
        jaccard_pairs,
        minhash_lsh_pairs,
    )
    from rental_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    exact = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in jaccard_pairs(docs, threshold=0.8).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_lsh_pairs(docs, threshold=0.8).collect()
    }
    assert lsh == exact
    assert len(exact) > 0  # corpus contains planted near-dups


def test_connected_components_path_graph(spark):
    # a path 1-2-3-4-5 needs several propagation rounds (diameter 4);
    # plus a disjoint pair and everything must label to the min node
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (4, 5), (10, 11)], "doc_a long, doc_b long"
    )
    got = {
        (r.node, r.component)
        for r in D.connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (10, 10), (11, 10)}


def test_connected_components_converges_early(spark):
    # a clique converges in one round; max_iter generous but unused
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "doc_a long, doc_b long"
    )
    out = D.connected_components(pairs, max_iter=2).collect()
    assert {(r.node, r.component) for r in out} == {(1, 1), (2, 1), (3, 1)}


def test_contamination_report_flags_overlap(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps high"), (2, "totally unrelated words here now")],
        "doc_id long, text string",
    )
    holdout = spark.createDataFrame(
        [(100, "a quick brown fox appears")], "doc_id long, text string"
    )
    out = D.contamination_report(train, holdout)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1}  # only doc 1 shares the 'quick brown fox' shingle
    assert rows[1].n_overlap == 1 and rows[1].n_sh == 4
    # the eval index must broadcast: the probe join never shuffles train
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_contamination_hash_prefilter_exact_despite_collisions(spark, sf_dir):
    # a DELIBERATELY tiny modulus (16 buckets over thousands of distinct
    # shingles) floods the prefilter with hash false positives; the
    # exact verify join must strip every one — byte-identical output to
    # the exact broadcast path
    docs = load_table(spark, "documents", sf_dir)
    holdout = docs.where(F.col("doc_id") % 5 == 0)
    train = docs.where(F.col("doc_id") % 5 != 0)
    exact = D.contamination_report(train, holdout)
    pref = D.contamination_report(
        train, holdout, broadcast_index=False, hash_prefilter=True,
        prefilter_mod=16,
    )
    a = {tuple(r) for r in exact.collect()}
    b = {tuple(r) for r in pref.collect()}
    assert a == b and a, "prefilter must be lossless after exact verify"


def test_scrub_pii_counts_and_order(spark):
    df = spark.createDataFrame(
        [(1, "mail a@b.co and c.d@e.org, server 192.168.0.1, call +7 (916) 555-0199 now"),
         (2, "no pii here at all")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in TS.scrub_pii(df).collect()}
    assert (rows[1].n_email, rows[1].n_ip, rows[1].n_phone) == (2, 1, 1)
    assert "<EMAIL>" in rows[1].text_clean and "<IP>" in rows[1].text_clean
    assert "<PHONE>" in rows[1].text_clean and "555" not in rows[1].text_clean
    assert (rows[2].n_email, rows[2].n_ip, rows[2].n_phone) == (0, 0, 0)
    assert rows[2].text_clean == "no pii here at all"


def test_repetition_stats_bounds(spark):
    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "w x y z"), (3, "solo")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in TS.repetition_stats(df).collect()}
    assert rows[1].dup_token_ratio == 0.75 and rows[1].top_token_share == 1.0
    assert rows[1].dup_2gram_ratio == round(1 - 1 / 3, 6)
    assert rows[2].dup_token_ratio == 0.0 and rows[2].top_token_share == 0.25
    # single-token doc: no 2/3-grams -> ratios defined as 0
    assert rows[3].dup_2gram_ratio == 0.0 and rows[3].dup_3gram_ratio == 0.0


def test_quantize_embeddings_roundtrip_bound(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 127.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {r.vec_id: r for r in S.quantize_embeddings(df).collect()}
    assert set(rows) == {1}  # zero vector dropped (scale undefined)
    r = rows[1]
    assert r.q[3] == 127  # max element maps exactly to 127
    assert r.mae <= r.scale / 2 + 1e-12  # half-step reconstruction bound
    assert all(-127 <= x <= 127 for x in r.q)


def test_tfidf_rare_term_outranks_common(spark):
    df = spark.createDataFrame(
        [(1, "common rare"), (2, "common filler"), (3, "common filler")],
        "doc_id long, text string",
    )
    top = TS.tfidf_top_terms(df, top_k=1).collect()
    doc1 = [r for r in top if r.doc_id == 1][0]
    assert doc1.term == "rare"  # equal tf: df=1 beats the everywhere-term


def test_chunk_documents_windows_cover_all_tokens(spark):
    # 120 tokens, chunk=50, overlap=10 -> stride 40 -> ceil((120-50)/40)+1 = 3 chunks
    text = " ".join(f"t{i}" for i in range(120))
    df = spark.createDataFrame([(1, text), (2, "a b c")], "doc_id long, text string")
    rows = TS.chunk_documents(df, chunk_tokens=50, overlap=10).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 3 and len(by_doc[2]) == 1
    c = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert c[0].chunk_text.split()[0] == "t0"
    assert c[1].chunk_text.split()[0] == "t40"  # stride = 40
    assert c[2].chunk_text.split()[-1] == "t119"  # tail covered
    # consecutive chunks share exactly `overlap` tokens
    assert c[0].chunk_text.split()[-10:] == c[1].chunk_text.split()[:10]
    assert by_doc[2][0].n_chunk_tokens == 3


def test_pack_sequences_bins_conserve_tokens(spark):
    df = spark.createDataFrame(
        [(i, " ".join(["w"] * (37 * (i % 5 + 1)))) for i in range(40)],
        "doc_id long, text string",
    )
    out = TS.pack_sequences(df, token_budget=100).collect()
    total = sum(r.total_tokens for r in out)
    assert total == sum(37 * (i % 5 + 1) for i in range(40))
    assert sum(r.n_docs for r in out) == 40
    # bin ids are the dense prefix-sum bins: doc i's bin = floor(cum_before/100)
    cum, expect = 0, {}
    for i in range(40):
        n = 37 * (i % 5 + 1)
        expect.setdefault(cum // 100, 0)
        expect[cum // 100] += n
        cum += n
    got = {r.bin_id: r.total_tokens for r in out}
    assert got == expect


def test_overlap_catches_subset_jaccard_misses(spark):
    small = "alpha beta gamma delta epsilon"
    big = small + " " + " ".join(f"tok{i}" for i in range(200))
    df = spark.createDataFrame([(1, small), (2, big)], "doc_id long, text string")
    ov = D.overlap_pairs(df, threshold=0.9).collect()
    assert len(ov) == 1 and ov[0]["score"] == 1.0, "subset doc is full-overlap"
    jac = D.jaccard_pairs(df, threshold=0.8).collect()
    assert jac == [], "jaccard stays below threshold for subset-in-large"


def test_near_pair_suite_matches_standalone_ops(spark, docs):
    """The fused suite (one materialized shingle index, shared
    inverted-index self-join) must return exactly the union of the
    standalone operators it replaces."""
    suite = {
        (r.method, r.doc_a, r.doc_b, r.score)
        for r in D.near_pair_suite(
            docs, jaccard_threshold=0.8, overlap_threshold=0.9, capped_doc_freq=5
        ).collect()
    }
    expect = set()
    for r in D.jaccard_pairs(docs, threshold=0.8).collect():
        expect.add(("ngram_jaccard", r.doc_a, r.doc_b, r.jaccard))
    for r in D.jaccard_pairs(docs, threshold=0.8, max_doc_freq=5).collect():
        expect.add(("ngram_jaccard_capped", r.doc_a, r.doc_b, r.jaccard))
    for r in D.minhash_lsh_pairs(docs, threshold=0.8).collect():
        expect.add(("minhash_lsh", r.doc_a, r.doc_b, r.jaccard))
    for r in D.overlap_pairs(docs, threshold=0.9).collect():
        expect.add(("overlap", r.doc_a, r.doc_b, r.score))
    assert suite == expect


@pytest.mark.parametrize(
    "name",
    [
        "dedup_near_pairs",       # near_pair_suite: 5 internal persists
        "dedup_simhash",          # banded signature persist
        "dedup_components",       # jaccard_pairs + CC edges/labels
        "dedup_canonical_corpus", # pairs -> components -> anti-join
        "kmeans_cells",           # corpus persist across iterations
    ],
)
def test_dedup_queries_leave_no_net_cache(spark, sf_dir, name):
    """The round-4 finding: dedup/similarity entry points persisted
    index frames that were never released, relying on the session's
    clearCache between queries. Every entry point now materializes its
    result and unpersists its intermediates, so after a registered
    query's consuming action the CacheManager must be EMPTY — with no
    clearCache anywhere in the path."""
    import __spark_entry__ as entrymod

    spark.catalog.clearCache()  # isolate from other tests' session state
    qs = entrymod.queries()
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        f"{name} left persisted frames in the CacheManager"
    )


def test_table_profile_one_pass_values(spark):
    from rental_data_pipeline_spark.operators.profile import table_profile

    df = spark.createDataFrame(
        [(1, 10.0, "aa"), (2, None, "bbbb"), (3, 30.0, None), (3, 10.0, "aa")],
        "id long, x double, s string",
    )
    prof = {r.column: r for r in table_profile(df).collect()}
    assert set(prof) == {"id", "x", "s"}
    assert all(r.n_rows == 4 for r in prof.values())
    assert prof["x"].n_null == 1 and prof["x"].null_frac == 0.25
    assert prof["id"].approx_distinct == 3  # exact at tiny cardinality
    assert prof["id"].min == "1" and prof["id"].max == "3"
    assert prof["x"].mean == pytest.approx(50.0 / 3)
    assert prof["s"].avg_len == pytest.approx((2 + 4 + 2) / 3)
    assert prof["s"].mean is None and prof["id"].avg_len is None

    # ONE aggregation pass: a single pair of exchanges (partial->final),
    # no per-column jobs
    plan = table_profile(df)._jdf.queryExecution().executedPlan().toString()
    import re as _re

    assert len(_re.findall(r"\bHashAggregate|\bSortAggregate|\bObjectHashAggregate", plan)) <= 2, plan


def test_pq_codes_shape_and_determinism(embs):
    books = S.pq_train(embs, n_iter=1)
    assert len(books) == S.PQ_M and all(len(b) == S.PQ_K for b in books)
    sub = len(books[0][0])
    assert S.PQ_M * sub == 64  # full dim covered, contiguous blocks
    codes = {r.vec_id: r.codes for r in S.pq_encode(embs, books).collect()}
    assert all(len(c) == S.PQ_M for c in codes.values())
    assert all(0 <= x < S.PQ_K for c in codes.values() for x in c)
    codes2 = {r.vec_id: r.codes for r in S.pq_encode(embs, books).collect()}
    assert codes == codes2
    # the compression claim: m small ints a vector vs 8 bytes x dim
    assert S.PQ_M < 64


def test_pq_topk_recall_and_exact_rerank(embs):
    qids = [0, 1, 2, 3, 4]
    out = S.pq_topk(embs, qids, top_k=5, shortlist=50).collect()
    assert len(out) == 25
    brute = {
        (r.query_id, r.vec_id): r.sim
        for r in S.cosine_topk(embs, qids, top_k=10_000).collect()
    }
    top5: dict = {}
    for (q, v), s in brute.items():
        top5.setdefault(q, []).append((-s, v))
    top5 = {q: {v for _, v in sorted(c)[:5]} for q, c in top5.items()}
    hits = 0
    for r in out:
        assert r.vec_id != r.query_id
        # re-rank is EXACT cosine (unit-dot); only 6-dp rounding of two
        # algebraically equal forms can differ
        assert brute[(r.query_id, r.vec_id)] == pytest.approx(r.sim, abs=2e-6)
        hits += r.vec_id in top5[r.query_id]
    assert hits / 25 >= 0.6  # measured 0.80 at sf0.01, shortlist=50


def test_multimodal_resize_fixed_geometry(docs):
    packed = M.pack_images(docs)
    expected_bytes = 54 + 8 * M._bmp_stride(16)
    out = M.resize_media(packed, width=16, height=8)
    rows = out.limit(30).collect()
    assert rows
    for r in rows:
        assert len(r.payload) == expected_bytes
        assert r.media_meta.n_bytes == expected_bytes
        assert (r.media_meta.width, r.media_meta.height) == (16, 8)
        # the resized payload is a VALID bmp preserving the fill
        d = M.decode_bmp(bytes(r.payload))
        w, h, (cr, cg, cb) = M._doc_geometry(r.doc_id)
        assert (d["width"], d["height"]) == (16, 8)
        assert (d["mean_r"], d["mean_g"], d["mean_b"]) == (cr, cg, cb)
    # deterministic: same payload -> same resized bytes
    again = {r.doc_id: bytes(r.payload) for r in M.resize_media(packed, 16, 8).limit(30).collect()}
    for r in rows:
        assert bytes(r.payload) == again[r.doc_id]
    # an undecodable payload passes through as null payload + null meta
    junk = docs.sparkSession.createDataFrame(
        [(1, b"not a bmp"), (2, None)], "doc_id long, payload binary"
    )
    jr = {r.doc_id: r for r in M.resize_media(junk, 4, 4).collect()}
    assert jr[1].payload is None and jr[1].media_meta is None
    assert jr[2].payload is None and jr[2].media_meta is None


def test_pq_small_corpus_pads_codebooks(spark):
    # 3 nonzero vectors < k=16: codebooks pad by cycling; topk still works
    df = spark.createDataFrame(
        [(i, [float(i + j + 1) for j in range(8)]) for i in range(3)],
        "vec_id long, embedding array<float>",
    )
    books = S.pq_train(df, m=2, k=16, n_iter=1)
    assert all(len(b) == 16 for b in books)
    out = S.pq_topk(df, [0], top_k=2, shortlist=10, m=2, k=16, n_iter=1).collect()
    assert {r.vec_id for r in out} == {1, 2}
    with pytest.raises(ValueError):
        S.pq_train(
            spark.createDataFrame([], "vec_id long, embedding array<float>")
        )


def test_hard_negatives_exclude_self_and_positives(embs):
    from pyspark.sql import functions as F

    pos = embs.sparkSession.createDataFrame(
        [(0, 1), (0, 2), (3, 4)], "anchor_id long, positive_id long"
    )
    out = S.hard_negatives(embs, pos, top_k=5).collect()
    by_anchor: dict = {}
    for r in out:
        assert r.vec_id != r.anchor_id
        by_anchor.setdefault(r.anchor_id, []).append(r)
    assert set(by_anchor) == {0, 3}
    banned = {(0, 1), (0, 2), (3, 4)}
    for a, rows in by_anchor.items():
        assert len(rows) == 5
        assert all((a, r.vec_id) not in banned for r in rows)
        sims = [r.sim for r in sorted(rows, key=lambda x: x.rank)]
        assert sims == sorted(sims, reverse=True)
    # the negatives really are the hardest: equal to brute-force top-k
    # after removing positives
    brute = {
        (r.query_id, r.vec_id)
        for r in S.cosine_topk(embs, [0], top_k=7).collect()
    }
    expect = [v for (q, v) in sorted(brute) if (0, v) not in banned][:]
    got0 = {r.vec_id for r in by_anchor[0]}
    assert got0 <= {v for _, v in brute} - {1, 2}


def test_table_profile_handles_complex_columns(embs):
    from rental_data_pipeline_spark.operators.profile import table_profile

    prof = {r.column: r for r in table_profile(embs).collect()}
    # array columns profile too: lexicographic min/max, HLL distinct
    assert prof["embedding"].approx_distinct > 0
    assert prof["embedding"].n_null == 0
    assert prof["embedding"].mean is None  # non-numeric: no moments


def test_char_shingles_tokenizer_free(spark):
    df = spark.createDataFrame(
        [(1, "abcdefg"), (2, "ab"), (3, "東京都渋谷区神南一丁目")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r.sh
        for r in df.select("doc_id", D.char_shingles("text", 3).alias("sh")).collect()
    }
    assert rows[1] == ["abc", "bcd", "cde", "def", "efg"]
    assert rows[2] == []  # shorter than k
    assert rows[3][0] == "東京都" and len(rows[3]) == len("東京都渋谷区神南一丁目") - 2

    # slots straight into the pair machinery: two CJK near-dups found
    cjk = spark.createDataFrame(
        [(1, "東京都渋谷区神南一丁目"), (2, "東京都渋谷区神南二丁目"), (3, "大阪府大阪市北区")],
        "doc_id long, text string",
    )
    exploded = cjk.select(
        F.col("doc_id").alias("doc"), F.explode(D.char_shingles("text", 3)).alias("shingle")
    )
    sizes = cjk.select(
        F.col("doc_id").alias("doc"), F.size(D.char_shingles("text", 3)).alias("n_sh")
    )
    pairs = D._pair_counts(exploded, sizes).select(
        "doc_a", "doc_b",
        F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6).alias("j"),
    ).where(F.col("j") >= 0.5)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert got == {(1, 2)}


def test_semantic_dedup_blocks_by_cell_and_drops_dominated(spark):
    """SemDeDup shape: per-Voronoi-cell blocking, lower-id-neighbor
    domination, cross-cell dups untouched by design."""
    from pyspark.sql import functions as F

    from rental_data_pipeline_spark.operators.similarity import semantic_dedup

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),   # centroid of cell 1
        (2, [0.0, 1.0, 0.0, 0.0]),   # centroid of cell 2
        (3, [1.0, 0.01, 0.0, 0.0]),  # cell 1, ~dup of 1 -> dropped
        (4, [0.9, 0.45, 0.0, 0.0]),  # cell 1, cos(1,4)=0.894 < tau -> kept
        (5, [0.0, 1.0, 0.05, 0.0]),  # cell 2, ~dup of 2 -> dropped
        (6, [0.0, 0.0, 0.0, 1.0]),   # orthogonal; tie -> lowest cid, kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: (r.cid, r.is_kept)
        for r in semantic_dedup(df, threshold=0.95, n_cells=2).collect()
    }
    assert got == {
        1: (1, True), 2: (2, True), 3: (1, False),
        4: (1, True), 5: (2, False), 6: (1, True),
    }
    # trained-centroid form: explicit (cid, cv) frame, same machinery
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "cid int, cv array<double>",
    )
    got2 = {
        r.vec_id: r.is_kept
        for r in semantic_dedup(df, threshold=0.95, centroids=cents).collect()
    }
    assert got2 == {1: True, 2: True, 3: False, 4: True, 5: False, 6: True}


def test_semantic_dedup_drops_zero_norm_vectors(spark):
    """Regression (r7 ADVICE): a zero-norm embedding is undirectional —
    cosine is an ANSI divide-by-zero. semantic_dedup must drop it
    uniformly with the other cosine-metric paths, not crash."""
    from rental_data_pipeline_spark.operators.similarity import semantic_dedup

    rows = [
        (1, [1.0, 0.0]),
        (2, [0.0, 0.0]),  # zero-norm: silently dropped
        (3, [1.0, 0.001]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: r.is_kept
        for r in semantic_dedup(df, threshold=0.95, n_cells=1).collect()
    }
    assert got == {1: True, 3: False}


def test_connected_components_deep_path_graph_converges(spark):
    """Regression (round 7): each propagation round references the
    label frame twice, so without a per-iteration lineage barrier the
    plan doubled per round — exponential in component diameter (a
    diameter-13 path took hours inside plan-string rendering). A
    path graph needs diameter rounds; this must now complete in
    seconds with every node resolving to the path's minimum."""
    from rental_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    # diameter-199 path: plain propagation would need 199 rounds
    # (> max_iter); pointer jumping doubles the covered distance per
    # round from round 3, so this converges in ~10 of the default 25
    n = 200
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    got = {
        (r.node, r.component) for r in connected_components(pairs).collect()
    }
    assert got == {(i, 0) for i in range(n)}


def test_connected_components_raises_rather_than_wrong_labels(spark):
    """A graph deeper than max_iter propagation rounds must raise —
    the silent alternative is returning unconverged (wrong) labels."""
    import pytest as _pytest

    from rental_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    # max_iter=3 keeps pointer jumping (engaged from round 3) out of
    # the run entirely, so a diameter-29 path cannot converge
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(29)], "doc_a long, doc_b long"
    )
    with _pytest.raises(ValueError, match="not converged"):
        connected_components(pairs, max_iter=3)


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir= switches the per-round lineage barrier (and the
    pair materialization) from executor-resident localCheckpoint to a
    reliable storage checkpoint: identical labels, files actually land
    in the checkpoint dir (zero executor-resident-only state)."""
    import os

    from pyspark.sql import functions as F

    from rental_data_pipeline_spark.operators.dedup import (
        connected_components,
        jaccard_pairs,
    )

    # diameter-8 path graph: forces multiple rounds through the barrier
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "doc_a long, doc_b long"
    )
    want = {
        (r.node, r.component) for r in connected_components(pairs).collect()
    }
    ckpt = str(tmp_path / "cc_ckpt")
    got = {
        (r.node, r.component)
        for r in connected_components(pairs, checkpoint_dir=ckpt).collect()
    }
    assert got == want and got == {(i, 0) for i in range(9)}
    walked = [
        f for _, _, fs in os.walk(ckpt) for f in fs if not f.startswith(".")
    ]
    assert walked  # rounds really went through reliable storage
    # superseded rounds are deleted as the iteration advances: exactly
    # one run dir (per-call unique) holding exactly one surviving round
    # (the one backing the returned frame) — storage bounded at O(labels),
    # not O(rounds x labels)
    run_dirs = [d for d in os.listdir(ckpt) if d.startswith("cc-")]
    assert len(run_dirs) == 1
    rounds = [
        d
        for d in os.listdir(os.path.join(ckpt, run_dirs[0]))
        if d.startswith("round-")
    ]
    assert len(rounds) == 1

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "completely different words here now"),
        ],
        "doc_id long, text string",
    )
    p_ck = str(tmp_path / "pairs_ckpt")
    a = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in jaccard_pairs(docs, threshold=0.5).collect()
    }
    b = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in jaccard_pairs(docs, threshold=0.5, checkpoint_dir=p_ck).collect()
    }
    assert a == b == {(1, 2, 1.0)}


def test_bigram_lm_perplexity_semantics(spark):
    """Model-based quality score: in-distribution repetitive text
    scores LOWER perplexity than out-of-distribution word salad;
    docs with < 2 tokens produce no row; scores are a pure function
    of the data (stable under repartitioning); n_bigrams matches the
    token stream."""
    from pyspark.sql import functions as F

    from rental_data_pipeline_spark.operators.textstats import (
        bigram_lm_perplexity,
    )

    fluent = "the cat sat on the mat"
    rows = (
        [("en", i, fluent) for i in range(8)]
        + [("en", 100, "zq xv qk jw zz pq vv kx")]  # unique-bigram salad
        + [("en", 101, "single"), ("en", 102, "")]  # no bigrams
    )
    df = spark.createDataFrame(rows, "lang string, doc_id long, text string")
    out = {r.doc_id: (r.n_bigrams, float(r.ppl)) for r in
           bigram_lm_perplexity(df).collect()}
    assert 101 not in out and 102 not in out
    assert out[0][0] == 5  # "the cat sat on the mat" -> 5 bigrams
    assert out[0] == out[7]  # identical docs, identical score
    # the corpus-dominant doc is far more predictable than the salad
    assert out[0][1] < out[100][1] / 2
    again = {r.doc_id: (r.n_bigrams, float(r.ppl)) for r in
             bigram_lm_perplexity(df.repartition(7)).collect()}
    assert again == out
