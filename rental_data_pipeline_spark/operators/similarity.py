"""Similarity search over an embedding column
(``embeddings(vec_id, embedding array<float>, label)``).

Beyond-reference training-data operators. Two paths:

- **Brute-force cosine top-k** — the correctness baseline: broadcast
  the (small) query set against the corpus, exact cosine via native
  higher-order functions (``zip_with`` + ``aggregate``), per-query
  ``row_number`` top-k. At cluster scale the corpus side stays
  partitioned and never shuffles; cost is one scan x |queries|.
- **Sign-LSH bucketed search** — the scale path: a random-hyperplane
  style signature (sign bits of leading dimensions) buckets the corpus
  once; each query probes only its own bucket. At 100 TB the bucket id
  becomes the table's partition key so a query prunes to one partition
  (partition pruning replaces the full scan). Recall < 1 by design.

All arithmetic is double-precision sequential fold, matching the
DuckDB oracle's ``list_cosine_similarity`` on ``DOUBLE[]`` bit-for-bit
on this data; outputs are rounded to 6 dp and ranked on the rounded
value with a deterministic id tiebreak so both engines rank identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SIGN_LSH_BITS = 6  # 64 buckets


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _corpus(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(vec_id, v double[]) spread across the cluster. Explicit
    partition count: embeddings are small in bytes but each downstream
    pair costs a 64-dim fold — AQE's byte-based coalescing would fold
    the compute onto one core."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartition(n, F.col(id_col))
        .select(
            F.col(id_col).alias("vec_id"),
            _as_double(F.col(vec_col)).alias("v"),
        )
        # zero-norm vectors have no direction: every consumer of this
        # frame is a cosine-space operator, and under ANSI mode (the
        # Spark 4 default) a zero norm in cosine()'s denominator is a
        # DIVIDE_BY_ZERO crash, not a NaN — drop them here once
        # instead of in some callers and not others
        .where(norm(F.col("v")) > 0)
    )


def dot(a: Column, b: Column) -> Column:
    """Exact dot product: sequential left-to-right double fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    query_ids: list[int],
    top_k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force exact top-k cosine neighbors for each query id.

    The query side is tiny → broadcast; the corpus side is one scan,
    no shuffle until the per-query top-k window (partitioned by query,
    |queries| partitions).
    """
    corpus = _corpus(df, id_col, vec_col)
    queries = corpus.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    sim = F.round(cosine(F.col("qv"), F.col("v")), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        corpus.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
    )


def sign_lsh_bucket(vec: Column, bits: int = SIGN_LSH_BITS) -> Column:
    """Random-hyperplane-style bucket id: sign bits of the leading
    ``bits`` dimensions packed into an int (deterministic, portable).
    NULL vectors map to NULL (null-in/null-out, like every scalar in
    §2.7 — a missing embedding is a data condition, not a job killer);
    vectors SHORTER than ``bits`` raise a clear error (ANSI mode would
    otherwise surface an opaque INVALID_ARRAY_INDEX)."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.when(F.element_at(vec, i + 1) > 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        ).cast("long")
    # the null arm must come FIRST: size(NULL) >= bits is NULL, which
    # would fall through to the raise_error otherwise-branch and turn a
    # benign null row into a job abort for direct callers
    return F.when(vec.isNull(), F.lit(None).cast("long")).when(
        F.size(vec) >= bits, out
    ).otherwise(
        F.raise_error(
            F.format_string(
                "sign_lsh_bucket: embedding has %s dims but bits="
                + str(int(bits)) + " requires at least that many",
                F.size(vec),
            )
        )
    )


def signlsh_topk(
    df: DataFrame,
    query_ids: list[int],
    top_k: int = 5,
    bits: int = SIGN_LSH_BITS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed ANN: candidates share the query's sign-LSH bucket;
    exact cosine + top-k within the bucket only."""
    corpus = _corpus(df, id_col, vec_col).withColumn(
        "bucket", sign_lsh_bucket(F.col("v"), bits)
    )
    queries = corpus.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    sim = F.round(cosine(F.col("qv"), F.col("v")), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        corpus.join(F.broadcast(queries), F.col("bucket") == F.col("qbucket"))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
    )


N_IVF_CELLS = 8
IVF_NPROBE = 2


def _ivf_probe(
    corpus: DataFrame,
    centroids: DataFrame | None,
    query_ids: list[int],
    nprobe: int,
    top_k: int,
    cent_row: DataFrame | None = None,
) -> DataFrame:
    """Shared IVF query path: Voronoi-assign the corpus to broadcast
    ``centroids (cid, cv)``, prune each query to its ``nprobe`` nearest
    cells, exact cosine + top-k within the probed cells only.

    Assignment is a MAP-SIDE argmax over the centroid set packed into
    one broadcast array row (:func:`_assign_to_centroids`'s shape) —
    the earlier form exploded corpus×k rows and ranked them with a
    ``row_number`` window partitioned by vec_id, i.e. a full-corpus
    shuffle+sort of k·N rows just to pick each row's best cell. Same
    (csim desc, cid asc) order, same rounded cosine, so the assignment
    — and therefore every result row — is identical; the shuffle is
    simply gone (guide §2.1: remove shuffles outright).

    ``cent_row`` (one row, ``cents array<struct<cid,cv>>``) skips the
    fold-to-one-row aggregation when the caller already holds the
    centroids driver-side (the trained path)."""
    if cent_row is None:
        cent_row = centroids.agg(
            F.collect_list(F.struct(F.col("cid"), F.col("cv"))).alias("cents")
        )
    # struct(s, negcid): array_max = (csim desc, cid asc) rank 1;
    # reverse(array_sort(...)) = the same order for the nprobe slice.
    # collect_list order is nondeterministic, but both reductions are
    # order-insensitive, so the assignment stays a pure function of
    # the data.
    packed = F.transform(
        F.col("cents"),
        lambda c: F.struct(
            F.round(cosine(F.col("v"), c["cv"]), 6).alias("s"),
            (-c["cid"]).alias("negcid"),
        ),
    )
    scored = corpus.crossJoin(F.broadcast(cent_row))
    best = F.array_max(packed)
    cells = scored.select("vec_id", "v", (-best["negcid"]).alias("cid"))
    qtop = F.slice(F.reverse(F.array_sort(packed)), 1, nprobe)
    qprobe = (
        scored.where(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.explode(qtop).alias("__qc"),
        )
        .select("query_id", "qv", (-F.col("__qc.negcid")).alias("cid"))
    )
    sim = F.round(cosine(F.col("qv"), F.col("v")), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        cells.join(F.broadcast(qprobe), "cid")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
    )


def ivf_topk(
    df: DataFrame,
    query_ids: list[int],
    n_cells: int = N_IVF_CELLS,
    nprobe: int = IVF_NPROBE,
    top_k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) ANN: partition the corpus into ``n_cells``
    Voronoi cells around centroid vectors; a query probes only its
    ``nprobe`` nearest cells.

    Centroids here are the embeddings of the ``n_cells`` smallest ids —
    a deterministic stand-in isolating the *index structure and query
    path*; :func:`ivf_topk_trained` is the production composition that
    trains them with :func:`kmeans_fit` instead.
    At 100 TB the cell id is the table's partition key: assignment is a
    map-side argmin against broadcast centroids (no shuffle), and a
    query scans nprobe/n_cells of the data (partition pruning).
    Recall < 1 by design; brute-force cosine_topk is the baseline."""
    corpus = _corpus(df, id_col, vec_col)
    centroids = (
        corpus.orderBy("vec_id").limit(n_cells)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    return _ivf_probe(corpus, centroids, query_ids, nprobe, top_k)


def ivf_topk_trained(
    df: DataFrame,
    query_ids: list[int],
    n_cells: int = N_IVF_CELLS,
    n_iter: int = 3,
    nprobe: int = IVF_NPROBE,
    top_k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """The production IVF composition: train → index → probe.

    Centroids come from :func:`kmeans_train` (Lloyd's, cosine metric,
    fixed-point 6 dp), land on the driver as k·dim doubles — the same
    topology the training loop itself uses — and feed the identical
    :func:`_ivf_probe` query path as the stand-in variant. At 100 TB
    training runs offline on a sample, the final assignment becomes the
    table's partition key, and this probe prunes to nprobe cells.
    Pass ``centroids`` to reuse an already-trained set (the persisted
    index build shares one training run this way)."""
    if centroids is None:
        centroids, _ = kmeans_train(df, k=n_cells, n_iter=n_iter, id_col=id_col, vec_col=vec_col)
    corpus = _corpus(df, id_col, vec_col)
    spark = df.sparkSession
    # single-slice, single-row packed frame (see _centroid_frame): the
    # centroids are already driver-side, so hand _ivf_probe its
    # broadcast row directly instead of a (cid, cv) frame it would
    # have to fold to one row with an extra single-partition exchange
    cent_row = spark.createDataFrame(
        spark.sparkContext.parallelize([(list(enumerate(centroids)),)], 1),
        "cents array<struct<cid:int, cv:array<double>>>",
    )
    return _ivf_probe(corpus, None, query_ids, nprobe, top_k, cent_row=cent_row)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    bits: int = SIGN_LSH_BITS,
    bucketed: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    ``bucketed=True`` prunes candidates to same-sign-LSH-bucket pairs
    (the sub-quadratic scale path, recall < 1); ``False`` is the exact
    quadratic baseline for small corpora/oracle checks.
    """
    corpus = _corpus(df, id_col, vec_col)
    if bucketed:
        corpus = corpus.withColumn("bucket", sign_lsh_bucket(F.col("v"), bits))
    a = corpus.alias("a")
    b = corpus.alias("b")
    cond = F.col("a.vec_id") < F.col("b.vec_id")
    if bucketed:
        cond = cond & (F.col("a.bucket") == F.col("b.bucket"))
    sim = F.round(cosine(F.col("a.v"), F.col("b.v")), 6)
    return (
        a.join(b, cond)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            sim.alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.4,
    n_cells: int = N_IVF_CELLS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: Voronoi-partition the
    corpus into ``n_cells`` cells (the blocking unit), then within
    each cell drop every item that has a LOWER-id neighbor at cosine
    ≥ ``threshold``. Returns ``(vec_id, cid, is_kept)`` — the full
    corpus annotated, so the caller picks keepers with one filter.

    Cross-cell pairs are never compared — the approximation that makes
    semantic dedup sub-quadratic (k cells ≈ k× pair-volume cut; missed
    dups are only those straddling a Voronoi boundary, the same trade
    LSH banding makes). At 100 TB: assignment is a map-side argmax
    against broadcast centroids, the within-cell self-join shuffles
    both sides on ``cid`` (co-partitioned), and ``n_cells`` must grow
    with the corpus (~√N) to keep per-cell pair volume bounded.

    ``centroids`` is a ``(cid, cv)`` frame; ``None`` uses the
    deterministic stand-in (the ``n_cells`` smallest ids' vectors,
    :func:`ivf_topk`'s convention) — pass :func:`kmeans_train` output
    via :func:`ivf_topk_trained`'s frame shape for the trained form.
    Beyond-reference training-data operator; no reference counterpart.
    """
    # zero-norm vectors are undirectional — cosine is an ANSI
    # divide-by-zero; dropped uniformly with the other cosine paths
    # (_unit_corpus / build_ann_index contract)
    corpus = (
        _corpus(df, id_col, vec_col)
        .withColumn("_vn", norm(F.col("v")))
        .where(F.col("_vn") > 0)
        .drop("_vn")
    )
    if centroids is None:
        centroids = (
            corpus.orderBy("vec_id").limit(n_cells)
            .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
        )
    # map-side argmax assignment against the centroid set packed into
    # one broadcast array row — same (csim desc, cid asc) order as the
    # former row_number window, without the k·N-row full-corpus
    # shuffle+sort the window needed (see _ivf_probe)
    cent_row = centroids.agg(
        F.collect_list(F.struct(F.col("cid"), F.col("cv"))).alias("cents")
    )
    packed = F.transform(
        F.col("cents"),
        lambda c: F.struct(
            F.round(cosine(F.col("v"), c["cv"]), 6).alias("s"),
            (-c["cid"]).alias("negcid"),
        ),
    )
    best = F.array_max(packed)
    # the assignment feeds three consumers (both self-join sides + the
    # final annotation): persist so the crossJoin+argmax runs once —
    # at corpus scale this materialization is the cell-partitioned
    # assignment table you would write anyway (build_ann_index's shape)
    cells = (
        corpus.crossJoin(F.broadcast(cent_row))
        .select("vec_id", "v", (-best["negcid"]).alias("cid"))
        .persist()
    )
    a, b = cells.alias("a"), cells.alias("b")
    dominated = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .where(F.round(cosine(F.col("a.v"), F.col("b.v")), 6) >= threshold)
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
    )
    out = (
        cells.join(dominated.withColumn("_dup", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id", "cid",
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("is_kept"),
        )
        .localCheckpoint(eager=True)  # detach before unpersist: callers
        # get a frame with ZERO net cache entries (the shared
        # _materialize_release contract)
    )
    cells.unpersist()
    return out


def _py_norm(c: list[float]) -> float:
    """Python twin of :func:`norm`: identical left-to-right fold order,
    so the result is bit-for-bit what Spark's aggregate() would give."""
    acc = 0.0
    for x in c:
        acc += x * x
    return acc**0.5


def _centroid_frame(spark, centroids: list[list[float]]) -> DataFrame:
    """Centroids as DATA, not literals: one row, one
    ``array<struct<cid,cv,cn>>`` column, broadcast to every task.

    Embedding k·dim literal doubles in the plan forces a fresh
    whole-stage-codegen compile every iteration (literal values are
    inlined into the generated source); shipping them as a broadcast
    row keeps the generated code byte-identical across iterations, so
    Spark's codegen cache turns N compiles into 1. Norms are
    precomputed driver-side with the same left-to-right fold as
    :func:`norm` so both paths agree bit-for-bit."""
    cents = [(cid, c, _py_norm(c)) for cid, c in enumerate(centroids)]
    # single-slice parallelize: createDataFrame would spread this one
    # row over defaultParallelism partitions, costing a ~32-task
    # broadcast-build job per k-means iteration
    return spark.createDataFrame(
        spark.sparkContext.parallelize([(cents,)], 1),
        "cents array<struct<cid:int, cv:array<double>, cn:double>>",
    )


def _assign_to_centroids(corpus: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Map-side hard assignment: per row, argmax of rounded cosine sim
    (ties → lowest cell id). The centroid set arrives as one broadcast
    row (see :func:`_centroid_frame`) and the argmax is a single
    ``transform`` + ``array_max`` over it — expression size is O(1) in
    k and dim, not O(k·dim), so codegen compile cost stays flat.

    ``corpus`` must carry a precomputed ``vn = norm(v)`` column: one
    fold per centroid (the dot) instead of three."""
    cent_df = _centroid_frame(corpus.sparkSession, centroids)
    packed = F.transform(
        F.col("cents"),
        lambda c: F.struct(
            F.round(dot(F.col("v"), c["cv"]) / (F.col("vn") * c["cn"]), 6).alias("s"),
            (-c["cid"]).alias("negcid"),
        ),
    )
    best = F.array_max(packed)
    return corpus.crossJoin(F.broadcast(cent_df)).select(
        "vec_id", "v",
        (-best["negcid"]).alias("cid"),
        best["s"].alias("sim"),
    )


def kmeans_train(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], DataFrame]:
    """Lloyd's k-means (cosine metric) as an iterative DataFrame
    algorithm — the offline training step behind :func:`ivf_topk`'s
    index. Returns ``(centroids, assignment)``: the final k centroid
    vectors (driver-side, they ARE the trained index definition) and
    the final hard assignment ``(vec_id, cid, sim)``.

    Per iteration: one corpus scan with a map-side argmax against a
    broadcast centroid row (zero corpus shuffle), then one partial-agg
    shuffle of per-(cell, position) sums — k·dim rows per partition
    cross the wire, not the corpus. Centroids (k·dim doubles) live on
    the driver between iterations, the standard k-means topology (what
    MLlib's treeAggregate does). Centroids travel as broadcast DATA,
    never as plan literals, so whole-stage codegen compiles once and
    every later iteration hits the codegen cache (the round-3 bench
    regression was N recompiles of a k·dim-literal expression tree).
    Components are rounded to 6 dp after every update: that absorbs
    the ulp-level double-summation noise different partial-agg orders
    produce in practice (what keeps the Spark-vs-DuckDB differential
    green), but it is not a formal order-independence proof — a sum
    landing exactly on a rounding boundary could still tip either
    way. Deterministic init = the k lowest-id vectors. Empty cells —
    and cells whose mean rounds to the zero vector — keep their
    previous centroid.
    """
    corpus = (
        _corpus(df, id_col, vec_col)
        .withColumn("vn", norm(F.col("v")))
        # zero-norm vectors have no direction: under the cosine metric
        # they cannot be assigned (ANSI divide-by-zero) — drop them,
        # _unit_corpus's documented contract
        .where(F.col("vn") > 0)
        .persist()
    )
    init = corpus.orderBy("vec_id").limit(k).collect()
    if not init:
        raise ValueError("kmeans_train: empty corpus")
    # Fewer than k vectors: cycle the init set (pq_train's guard) so
    # the update loop's centroids[cid] never indexes past the list.
    init = [init[i % len(init)] for i in range(k)]
    # keep the raw components when 6-dp rounding would collapse a
    # tiny-norm vector to all zeros (a zero-norm centroid is an ANSI
    # divide-by-zero in the next assignment's cosine)
    centroids = [
        rc if any(x != 0.0 for x in rc) else list(r.v)
        for r in init
        for rc in [[round(x, 6) for x in r.v]]
    ]

    for _ in range(n_iter):
        assigned = _assign_to_centroids(corpus, centroids)
        # Centroid update as a (cid, pos) partial agg: posexplode runs
        # map-side and hash-aggregate combines before the exchange, so
        # only k·dim (cid,pos) rows per partition cross the wire — the
        # same shuffle volume as a k-row agg of dim-wide sums, but the
        # agg expression is O(1) wide instead of O(dim), which keeps
        # codegen compile (the bench-scale bottleneck) out of the loop.
        rows = (
            assigned.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        acc: dict[int, dict[int, float]] = {}
        for r in rows:
            acc.setdefault(r["cid"], {})[r["pos"]] = round(r["s"] / r["n"], 6)
        updated = []
        for cid in range(k):
            if cid in acc:
                cand = [acc[cid][p] for p in range(len(centroids[cid]))]
                # a zero-MEAN cell (near-antipodal members, or means
                # that all round to 0) would hand the next assignment
                # a zero-norm centroid — an ANSI divide-by-zero in
                # cosine. Treat it like an empty cell: keep the
                # previous centroid.
                if any(x != 0.0 for x in cand):
                    updated.append(cand)
                    continue
            updated.append(centroids[cid])
        centroids = updated

    final = _assign_to_centroids(corpus, centroids).select("vec_id", "cid", "sim")
    corpus.unpersist()
    return centroids, final


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`kmeans_train`'s final hard assignment only."""
    return kmeans_train(df, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col)[1]


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|x|/127``,
    ``q_i = floor(x_i/scale + 0.5)`` — 4x the embeddings per byte of
    cluster RAM, which at 100 TB decides whether the ANN corpus is
    memory-resident. Map-side only (no shuffle, no UDF); ``floor(+0.5)``
    instead of round() so both engines share one deterministic
    half-up rule (no banker's-rounding divergence). Zero vectors are
    dropped (scale undefined). Returns
    ``(vec_id, scale, q int[], mae)`` with mae = mean |x - q*scale|,
    the round-trip reconstruction error.
    """
    corpus = _corpus(df, id_col, vec_col)
    v = F.col("v")
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    out = corpus.select("vec_id", v.alias("v"), scale.alias("scale")).where(
        F.col("scale") > 0
    )
    q = F.transform(
        F.col("v"), lambda x: F.floor(x / F.col("scale") + F.lit(0.5)).cast("int")
    )
    deq_err = F.zip_with(
        F.col("v"), F.col("q"), lambda a, b: F.abs(a - b.cast("double") * F.col("scale"))
    )
    mae = (
        F.aggregate(deq_err, F.lit(0.0), lambda acc, x: acc + x) / F.size(F.col("v"))
    )
    return (
        out.withColumn("q", q)
        .select("vec_id", "scale", "q", mae.alias("mae"), "v")
        .drop("v")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-bound ANN path
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces
PQ_K = 16  # centroids per subspace codebook


def _l2(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _unit_corpus(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(vec_id, u) with u L2-normalized: cosine ordering becomes
    inner-product ordering, the form PQ's additive decomposition
    approximates. Zero vectors are dropped (undefined direction)."""
    corpus = _corpus(df, id_col, vec_col).withColumn("vn", norm(F.col("v")))
    return corpus.where(F.col("vn") > 0).select(
        "vec_id",
        F.transform(F.col("v"), lambda x: x / F.col("vn")).alias("u"),
    )


def _pq_codebook_frame(spark, codebooks: list[list[list[float]]]) -> DataFrame:
    """Codebooks as broadcast DATA (one row, nested array) — same
    rationale as :func:`_centroid_frame`: literals would recompile
    codegen per call; a broadcast row compiles once."""
    cb = [
        [(cid, c) for cid, c in enumerate(book)] for book in codebooks
    ]
    return spark.createDataFrame(
        spark.sparkContext.parallelize([(cb,)], 1),
        "cb array<array<struct<cid:int, cv:array<double>>>>",
    )


def pq_train(
    df: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train per-subspace codebooks: Lloyd's k-means on each of the
    ``m`` contiguous subvector blocks, ALL subspaces per iteration in
    ONE corpus pass (rows explode x m, assignment is a map-side argmin
    against the broadcast codebook row, update is a (m, cid, pos)
    partial agg — k*dim scalars to the driver per iteration, the same
    topology as :func:`kmeans_train`). Deterministic: init = subvectors
    of the k lowest-id unit vectors, fixed-point 6 dp per update,
    lowest-cid tiebreak. Returns ``codebooks[m][k] = subvector``."""
    unit = _unit_corpus(df, id_col, vec_col).persist()
    head = unit.select("u").head()
    if head is None:
        unit.unpersist()
        raise ValueError("pq_train: corpus has no nonzero vectors")
    dim = len(head[0])
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sub = dim // m

    init = unit.orderBy("vec_id").limit(k).collect()
    # fewer than k vectors: cycle the init set so every codebook still
    # carries exactly k entries (pq_topk's ADC lookup table is strided
    # by k; duplicate centroids are harmless — the argmin's lowest-cid
    # tiebreak picks the first copy and empty cells keep their value)
    init = [init[i % len(init)] for i in range(k)]
    codebooks = [
        [[round(x, 6) for x in r.u[mi * sub:(mi + 1) * sub]] for r in init]
        for mi in range(m)
    ]

    subrows = unit.select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda mi: F.slice(F.col("u"), mi * sub + 1, sub),
            )
        ).alias("m", "sv"),
    )
    spark = df.sparkSession
    for _ in range(n_iter):
        cb_df = _pq_codebook_frame(spark, codebooks)
        cents_m = F.element_at(F.col("cb"), F.col("m") + 1)
        best = F.array_min(
            F.transform(
                cents_m,
                lambda c: F.struct(
                    F.round(_l2(F.col("sv"), c["cv"]), 6).alias("d"),
                    c["cid"].alias("cid"),
                ),
            )
        )
        assigned = subrows.crossJoin(F.broadcast(cb_df)).select(
            "m", best["cid"].alias("cid"), "sv"
        )
        rows = (
            assigned.select("m", "cid", F.posexplode("sv").alias("pos", "x"))
            .groupBy("m", "cid", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        acc: dict[tuple[int, int], dict[int, float]] = {}
        for r in rows:
            acc.setdefault((r["m"], r["cid"]), {})[r["pos"]] = round(r["s"] / r["n"], 6)
        codebooks = [
            [
                [acc[(mi, cid)][p] for p in range(sub)]
                if (mi, cid) in acc
                else codebooks[mi][cid]
                for cid in range(k)
            ]
            for mi in range(m)
        ]
    unit.unpersist()
    return codebooks


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes int[m]): per subspace, the nearest codebook
    centroid — map-side argmin against the broadcast codebook row, no
    shuffle, no UDF. At 100 TB the codes table is the resident index:
    m bytes a vector (m=8, k<=256) against 8*dim for raw doubles —
    64x on this corpus's 64-dim embeddings."""
    m, sub = len(codebooks), len(codebooks[0][0])
    unit = _unit_corpus(df, id_col, vec_col)
    cb_df = _pq_codebook_frame(df.sparkSession, codebooks)
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda mi: F.array_min(
            F.transform(
                F.element_at(F.col("cb"), mi + 1),
                lambda c: F.struct(
                    F.round(_l2(F.slice(F.col("u"), mi * sub + 1, sub), c["cv"]), 6).alias("d"),
                    c["cid"].alias("cid"),
                ),
            )
        )["cid"],
    )
    return unit.crossJoin(F.broadcast(cb_df)).select("vec_id", codes.alias("codes"))


def pq_topk(
    df: DataFrame,
    query_ids: list[int],
    top_k: int = 5,
    shortlist: int = 50,
    m: int = PQ_M,
    k: int = PQ_K,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: "list[list[list[float]]] | None" = None,
) -> DataFrame:
    """PQ ANN: train → encode → ADC shortlist → exact re-rank.

    ``codebooks`` (from :func:`pq_train`, deterministic) makes this
    the probe half of train-once/probe-many — the same contract as
    ``ivf_topk_trained(centroids=...)``: a deployment trains offline
    and every query reuses the frozen codebooks, so callers that
    probe repeatedly (the bench, a query service) don't re-pay the
    ``n_iter`` training passes per call. Omitted, it trains inline
    (identical results either way — training is a pure function of
    the corpus).

    Asymmetric distance computation: each query precomputes a lookup
    table ``lut[mi*k + j] = <q_mi, codebook[mi][j]>`` (driver-side —
    |queries| x m x k doubles, the same bounded shape as the trained
    centroids); the approximate inner product of a corpus vector is a
    pure table lookup per subspace over its m-byte code — the scan
    never touches raw vectors. The ``shortlist`` best ADC candidates
    per query are then re-ranked with EXACT cosine over their raw
    vectors (a broadcast semi-join back to the corpus), so reported
    sims are exact and recall loss comes only from shortlist pruning.
    At 100 TB the codes table is memory-resident where raw vectors
    cannot be; this train → encode → ADC → re-rank composition is the
    standard IVF-PQ query path with nprobe = all cells."""
    if codebooks is None:
        codebooks = pq_train(
            df, m=m, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col
        )
    sub = len(codebooks[0][0])
    unit = _unit_corpus(df, id_col, vec_col)
    codes = pq_encode(df, codebooks, id_col=id_col, vec_col=vec_col)

    qvecs = {
        r.vec_id: r.u
        for r in unit.where(F.col("vec_id").isin(query_ids)).collect()
    }
    spark = df.sparkSession
    luts = [
        (
            int(qid),
            [
                round(sum(q[mi * sub + p] * c[p] for p in range(sub)), 6)
                for mi in range(m)
                for c in codebooks[mi]
            ],
        )
        for qid, q in sorted(qvecs.items())
    ]
    lut_df = spark.createDataFrame(
        spark.sparkContext.parallelize(luts, 1),
        "query_id long, lut array<double>",
    )
    adc = F.round(
        F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.lit(0.0),
            lambda acc, mi: acc
            + F.element_at(
                F.col("lut"), mi * k + F.element_at(F.col("codes"), mi + 1) + 1
            ),
        ),
        6,
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("vec_id")
    )
    short = (
        codes.crossJoin(F.broadcast(lut_df))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", adc.alias("adc"))
        .withColumn("srank", F.row_number().over(w_short))
        .where(F.col("srank") <= shortlist)
        .select("query_id", "vec_id")
    )
    # re-rank over RAW vectors with the same cosine expression form as
    # cosine_topk — bit-identical 6-dp rounding, so with a full-corpus
    # shortlist the result is byte-equal to brute force (the oracle
    # configuration); unit vectors were only ever for encode/ADC
    corpus = _corpus(df, id_col, vec_col)
    qframe = corpus.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    sim = F.round(cosine(F.col("qv"), F.col("v")), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        corpus.join(F.broadcast(short), "vec_id")
        .join(F.broadcast(qframe), "query_id")
        .select("query_id", "vec_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
    )


def hard_negatives(
    df: DataFrame,
    positives: DataFrame,
    top_k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    anchor_col: str = "anchor_id",
    positive_col: str = "positive_id",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    in ``positives (anchor_id, positive_id)``, the ``top_k`` most
    cosine-similar corpus vectors that are NOT the anchor itself and
    NOT among its known positives — the near-misses a contrastive loss
    learns the most from (random negatives are trivially separable).

    Plan: the anchor set broadcasts against one corpus scan (the
    cosine_topk shape), known positives are removed by a broadcast
    anti-join on (anchor, candidate), and the per-anchor top-k window
    ranks what survives. The corpus never shuffles; at 100 TB swap the
    scan stage for the IVF/PQ probe exactly as in :func:`ivf_topk` —
    the exclusion and ranking stages are unchanged.
    """
    corpus = _corpus(df, id_col, vec_col)
    anchors = corpus.join(
        F.broadcast(
            positives.select(F.col(anchor_col).alias("vec_id")).distinct()
        ),
        "vec_id",
    ).select(F.col("vec_id").alias("anchor_id"), F.col("v").alias("av"))
    sim = F.round(cosine(F.col("av"), F.col("v")), 6)
    scored = (
        corpus.crossJoin(F.broadcast(anchors))
        .where(F.col("vec_id") != F.col("anchor_id"))
        .select("anchor_id", "vec_id", sim.alias("sim"))
    )
    known = positives.select(
        F.col(anchor_col).alias("anchor_id"),
        F.col(positive_col).alias("vec_id"),
    )
    w = Window.partitionBy("anchor_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        scored.join(F.broadcast(known), ["anchor_id", "vec_id"], "left_anti")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
    )
