"""Deterministic (hash-mod) sampling — training-data curation primitive.

``df.sample()`` is seeded per-partition, so its output changes with
partitioning and Spark version — useless for reproducible corpus
splits. Hash-mod sampling keys the decision on the ROW (md5 of a
stable key), so the same row lands in the same split on any engine,
any cluster size, any run — and the sample composes with incremental
ingestion (new rows don't reshuffle old decisions). This is the
standard trick for train/holdout splits at 100 TB: a map-side filter,
no shuffle, fully pushdown-friendly upstream.

md5 (not xxhash64/crc32) because every engine renders it identically —
the DuckDB oracle recomputes the exact bucket arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000  # 0.01% sampling granularity


def bucket_threshold(fraction: float) -> int:
    """fraction -> bucket cutoff, ROUNDED: ``int()`` truncation turned
    0.57 into 5699/10000 (float 0.57*10000 = 5699.999...), silently
    losing a bucket that any independently written consumer computing
    "bucket < 5700" disagrees on; cumulative split boundaries drifted
    the same way."""
    return int(round(fraction * _BUCKETS))


def sample_bucket(key: Column | str, salt: str = "") -> Column:
    """Stable bucket in [0, 10000): first 8 hex chars of
    md5(salt || key) as an integer, mod 10000. Changing ``salt`` draws
    an independent sample (e.g. train vs eval splits)."""
    c = F.col(key) if isinstance(key, str) else key
    hexpart = F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8)
    return (F.conv(hexpart, 16, 10).cast("bigint") % _BUCKETS).alias("sample_bucket")


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per-row by hash bucket.
    Map-side filter: no shuffle, no RNG state, reproducible anywhere."""
    return df.where(sample_bucket(key_col, salt) < bucket_threshold(fraction))


def stratified_deterministic_sample(
    df: DataFrame, key_col: str, strata_col: str, fractions: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Per-stratum fractions (e.g. downsample 'en' to 10%, keep 'fr'
    fully). Strata absent from ``fractions`` are dropped. Still a
    map-side filter — the fraction lookup is a literal CASE chain, not
    a join."""
    threshold = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == stratum
        lim = F.lit(bucket_threshold(frac))
        threshold = F.when(cond, lim) if threshold is None else threshold.when(cond, lim)
    threshold = F.lit(0) if threshold is None else threshold.otherwise(F.lit(0))
    return df.where(sample_bucket(key_col, salt) < threshold)


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
    broadcast_components: bool = True,
) -> DataFrame:
    """Train/val/test assignment that keeps NEAR-DUPLICATES together.

    Hashing the doc id sends two 0.95-Jaccard copies of a document to
    different splits — eval contamination the decontamination gate
    can't see because it happened at split time. The fix: hash the
    near-dup CLUSTER, not the doc. ``pairs`` (doc_a, doc_b) comes from
    any pair generator (``dedup.jaccard_pairs``, ``minhash_lsh_pairs``,
    the incremental index's emitted pairs); docs in no pair are their
    own singleton cluster. One iterative components pass + one join.
    The component map covers only PAIRED docs (the dup fraction, not
    the corpus); while it fits a broadcast the corpus never shuffles
    for the assignment — set ``broadcast_components=False`` when the
    paired-node set itself is huge (the assignment then shuffles the
    corpus on id once).

    ``fractions`` maps split name → fraction, summing to ≤ 1 (the
    remainder is dropped, e.g. for a holdout you never touch).
    Returns ``docs`` + a ``split`` column; rows beyond the configured
    fractions get null.
    """
    from rental_data_pipeline_spark.operators.dedup import connected_components

    return split_from_components(
        docs,
        connected_components(pairs).withColumnRenamed("node", id_col),
        fractions,
        id_col=id_col,
        salt=salt,
        broadcast_components=broadcast_components,
    )


def split_from_components(
    docs: DataFrame,
    components: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
    broadcast_components: bool = True,
) -> DataFrame:
    """:func:`leakage_safe_split`'s assignment half, taking an
    ALREADY-COMPUTED ``(id_col, component)`` map — what lets the
    incremental corpus job assign splits from the PERSISTED label
    table (``streaming/components.py``) instead of recomputing
    connected components over the accumulated pair history. Streamed
    labels are equal to batch CC over the same pairs (the components
    equivalence tests), so both paths hash identical cluster ids →
    identical splits."""
    cc = components
    if broadcast_components:
        cc = F.broadcast(cc)
    labeled = docs.join(cc, id_col, "left").withColumn(
        "component", F.coalesce(F.col("component"), F.col(id_col))
    )
    bucket = sample_bucket("component", salt)
    expr, lo = None, 0
    for name, frac in fractions.items():
        hi = lo + bucket_threshold(frac)
        cond = (bucket >= F.lit(lo)) & (bucket < F.lit(hi))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo = hi
    return labeled.withColumn(
        "split", expr if expr is not None else F.lit(None).cast("string")
    ).drop("component")


def exact_k_sample(
    df: DataFrame,
    key_col: str,
    k: int,
    group_cols: list[str] | None = None,
    salt: str = "",
) -> DataFrame:
    """Exactly ``k`` rows (per group, when ``group_cols`` given),
    chosen by ranking a salted hash of the key — the deterministic
    stand-in for reservoir sampling: membership is a pure function of
    (key, salt), independent of partitioning and row order, and the
    selection is uniform for hash-uniform keys. One shuffle (the
    ranking window); fraction-based :func:`deterministic_sample` stays
    the map-side choice when approximate counts suffice.

    When ``key_col`` is NOT unique, same-key rows tie on (hash, key);
    the rank therefore carries a final ROW-CONTENT tiebreak (xxhash64
    over every hashable column) so the surviving physical rows are a
    pure function of the data too, not of partition layout — rows
    identical in every hashable column remain interchangeable (map
    columns can't hash and are excluded), which is the strongest
    determinism the data admits."""
    from pyspark.sql import Window
    from pyspark.sql import types as T

    h = F.xxhash64(F.concat(F.lit(salt), F.col(key_col).cast("string")))

    def _contains_map(dt: T.DataType) -> bool:
        # xxhash64 rejects MapType at ANY nesting depth (struct field,
        # array element, map value) — walk the whole type tree, not
        # just the top level
        if isinstance(dt, T.MapType):
            return True
        if isinstance(dt, T.StructType):
            return any(_contains_map(f.dataType) for f in dt.fields)
        if isinstance(dt, T.ArrayType):
            return _contains_map(dt.elementType)
        return False

    hashable = [
        f.name for f in df.schema.fields if not _contains_map(f.dataType)
    ]
    # an all-map schema leaves nothing to hash: xxhash64() with zero
    # args is a plan-time error, so fall back to a constant — same-key
    # rows are then interchangeable, the strongest determinism the
    # data admits (documented contract)
    rh = (
        F.xxhash64(*[F.col(c) for c in hashable])
        if hashable
        else F.lit(0).cast("long")
    )
    if not group_cols:
        # global exact-k: orderBy+limit plans as a distributed
        # TakeOrderedAndProject (per-partition top-k, merge on the
        # driver). The previous Window.partitionBy(lit(1)) constant-
        # folded to an UNPARTITIONED window — "Moving all data to a
        # single partition" — funneling the entire corpus through one
        # task, the exact single-task bottleneck this module warns
        # about.
        return (
            df.withColumn("__h", h)
            .withColumn("__rh", rh)
            .orderBy(F.col("__h"), F.col(key_col), F.col("__rh"))
            .limit(int(k))
            .drop("__h", "__rh")
        )
    # per-group exact-k: sharded two-level rank (operators/topk.py).
    # Spark's rank-limit pushdown already bounds the map side of the
    # plain window at k rows per partition; the shard level bounds the
    # per-stratum REDUCE task (P·k partial survivors at a 100 TB
    # scan's partition count) at max(P·k/n_shards, k·n_shards), and
    # the result is identical for any shard count. Equal keys
    # co-locate (the shard is __h, a function of the key), so the
    # __rh row-content tiebreak resolves duplicate-key ties inside
    # one shard exactly as the global order would.
    from rental_data_pipeline_spark.operators.topk import topk_per_group

    staged = df.withColumn("__h", h).withColumn("__rh", rh)
    return topk_per_group(
        staged,
        group_cols,
        [F.col("__h"), F.col(key_col), F.col("__rh")],
        int(k),
        shard_expr=F.col("__h"),
        n_shards="auto",
    ).drop("__h", "__rh")


def mix_corpora(
    sources: dict[str, DataFrame],
    weights: dict[str, float],
    total_rows: int,
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic pretraining-mixture assembly: draw
    ``total_rows * weight`` rows from each named source (hash-ranked —
    reproducible anywhere) and union them with a ``source`` label.
    A source smaller than its quota contributes everything it has
    (the shortfall is reported by the caller comparing counts, not
    silently rebalanced — mixture drift should be visible, not
    hidden). Weights need not sum to 1; they are normalized. The
    ``source`` label REPLACES an input column of the same name (the
    canonical documents table carries one — colliding used to fail the
    whole union with COLUMN_ALREADY_EXISTS)."""
    if not sources:
        raise ValueError("mix_corpora: no sources given")
    missing = [n for n in sources if n not in weights]
    if missing:
        raise ValueError(f"mix_corpora: sources missing a weight: {missing}")
    z = sum(weights[name] for name in sources)
    if z <= 0:
        raise ValueError(f"mix_corpora: weights sum to {z}; need > 0")
    out = None
    for name, df in sources.items():
        quota = int(round(total_rows * weights[name] / z))
        part = exact_k_sample(df, key_col, quota, salt=f"{salt}:{name}")
        if "source" in part.columns:
            part = part.drop("source")
        part = part.select(F.lit(name).alias("source"), "*")
        out = part if out is None else out.unionByName(part)
    return out
