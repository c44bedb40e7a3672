"""Distinct-count sketches: HyperLogLog and threshold (theta-style)
sampling, built on a cross-engine deterministic hash.

At 100 TB, ``COUNT(DISTINCT user_id)`` per group is a full shuffle of
every (group, user) pair; a sketch reduces it to a bounded per-group
state with map-side partial aggregation — the canonical trade. Both
sketches here are *deterministic* (md5-derived 60-bit hash, integer
register arithmetic), so a DuckDB oracle can replay the identical
computation and the driver's value-hash gate applies — unlike Spark's
built-in ``approx_count_distinct`` whose HLL++ state is opaque and
engine-specific.

HLL (``hll_distinct``): register index = low ``p`` hash bits, rho =
leading-zero rank of the remaining ``60-p`` bits (computed exactly via
``length(bin(w))`` — no float log2), per-register MAX, then the
standard bias-corrected harmonic mean with linear-counting fallback
for the small range. The register sum Σ 2^(62-M_j) is kept in
DECIMAL(38,0) so it is exact in both engines regardless of the
register visit order (a double accumulator would be order-sensitive
once registers span > 53 doublings).

Plan shape: groupBy(group, register) MAX — map-side combine collapses
each partition to ≤ |groups|·2^p rows before the only shuffle — then a
tiny groupBy(group) fold. This is exactly how a distributed HLL
implementation merges sketches (register-wise max is the merge op).

Threshold sketch (``theta_distinct``): keep values whose hash falls
below ``2^60 / rate``, count the survivors exactly, scale by ``rate``.
The filter is map-side, so only ~1/rate of the distinct values ever
shuffle — the KMV/theta-sketch idea with a fixed threshold, which
keeps it deterministic and mergeable (union = union of survivor sets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^62 as the fixed-point scale for the harmonic-mean sum: 2^(62-M) is
# an exact BIGINT for every M >= 0 (M <= 61 always, since rho <= 60-p+1).
_SCALE_POW = 62


def hash60(col: Column) -> Column:
    """Deterministic 60-bit non-negative hash: first 15 hex digits of
    md5 of the string form. The DuckDB twin is
    ``('0x' || substr(md5(v), 1, 15))::BIGINT`` — identical bits."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("bigint")


def _alpha(m: int) -> float:
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """The HLL sketch STATE: per-(group, register) max rho —
    ``(group_cols..., __reg, __M)``. This is the mergeable form:
    register-wise MAX is the sketch union, so states from disjoint
    slices (micro-batches, table shards) merge by
    ``groupBy(group, __reg).max(__M)`` and the merged estimate is
    EXACTLY the estimate of the concatenated input. Persist this frame
    (2^p rows per group, bounded) for incremental maintenance
    (``streaming/sketch_stream.py``)."""
    m = 1 << p
    L = 60 - p  # width of the rho word
    # COUNT DISTINCT semantics ignore NULLs — and a null value would
    # hash to a (__reg=NULL, __M=NULL) register row that the estimate's
    # present-register count includes but its rho sum excludes, pushing
    # __present past m and the empty-register term negative (measured:
    # one NULL row turned an estimate of ~100 into ~250)
    df = df.where(F.col(value_col).isNotNull())
    h = hash60(F.col(value_col))
    reg = (h % m).alias("__reg")
    # w = high 60-p bits via shiftright — exact (a float division would
    # corrupt the low bits once h exceeds 2^53)
    regs = df.select(
        *group_cols,
        reg,
        F.shiftright(h, p).alias("__w"),
    ).withColumn(
        # rho = 1-based position of the leftmost 1-bit in the L-bit word,
        # L+1 if the word is zero. length(bin(w)) = floor(log2 w)+1 —
        # integer-exact, no float log.
        "__rho",
        F.lit(L + 1)
        - F.when(F.col("__w") == 0, F.lit(0)).otherwise(
            F.length(F.bin(F.col("__w")))
        ),
    )
    return regs.groupBy(*group_cols, "__reg").agg(F.max("__rho").alias("__M"))


def hll_estimate_from_registers(
    per_reg: DataFrame, group_cols: list[str], p: int = 8
) -> DataFrame:
    """Fold sketch state (:func:`hll_registers`, possibly merged across
    slices) into the per-group estimate."""
    m = 1 << p
    folded = per_reg.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__present"),
        # SQL form: the Python shiftleft() wrapper only takes a literal
        # shift amount, not a per-row column.
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_SCALE_POW} - __M)").cast(
                "decimal(38,0)"
            )
        ).alias("__s_present"),
    )
    # empty registers contribute 2^62 each (M=0); V = zero-register count
    alpha = _alpha(m)
    s_total = (
        F.col("__s_present")
        + (F.lit(m) - F.col("__present")).cast("decimal(38,0)")
        * F.lit(1 << _SCALE_POW).cast("decimal(38,0)")
    )
    v_zero = (F.lit(m) - F.col("__present")).cast("double")
    e_raw = (
        F.lit(float(alpha * m * m))
        * F.lit(float(1 << _SCALE_POW))
        / s_total.cast("double")
    )
    estimate = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero),
    ).otherwise(e_raw)
    return folded.select(
        *group_cols,
        F.round(estimate, 4).alias("hll_estimate"),
    )


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """Per-group HLL cardinality estimate with 2^p registers.

    Returns (group_cols..., hll_estimate double). The estimate is the
    Flajolet HLL bias-corrected form with linear counting below 2.5m;
    rounded to 4 digits (the raw expression is evaluated in the same
    operation order by the oracle, but rounding removes any residual
    decimal→double conversion risk). Composition of
    :func:`hll_registers` (the mergeable state) and
    :func:`hll_estimate_from_registers` (the fold).
    """
    return hll_estimate_from_registers(
        hll_registers(df, group_cols, value_col, p), group_cols, p
    )


def hll_oracle_sql(
    table: str,
    group_cols: list[str],
    value_col: str,
    p: int = 8,
) -> str:
    """DuckDB twin of ``hll_distinct`` — the identical arithmetic,
    expressed over the same md5-derived hash, for the correctness gate."""
    m = 1 << p
    L = 60 - p
    alpha = _alpha(m)
    g = ", ".join(group_cols)
    return f"""
WITH hashed AS (
  SELECT {g},
         ('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM {table}
  WHERE {value_col} IS NOT NULL
),
regs AS (
  SELECT {g}, h % {m} AS reg, h // {m} AS w FROM hashed
),
rho AS (
  SELECT {g}, reg,
         {L + 1} - (CASE WHEN w = 0 THEN 0 ELSE length(bin(w)) END) AS rho
  FROM regs
),
per_reg AS (
  SELECT {g}, reg, max(rho) AS M FROM rho GROUP BY {g}, reg
),
folded AS (
  SELECT {g},
         count(*) AS present,
         sum(CAST(1::BIGINT << ({_SCALE_POW} - M) AS DECIMAL(38,0))) AS s_present
  FROM per_reg GROUP BY {g}
)
SELECT {g},
       round(
         CASE WHEN ({alpha * m * m!r} * {float(1 << _SCALE_POW)!r}
                    / CAST(s_present
                           + CAST({m} - present AS DECIMAL(38,0))
                             * CAST({1 << _SCALE_POW}::BIGINT AS DECIMAL(38,0))
                           AS DOUBLE)) <= {2.5 * m}
                   AND ({m} - present) > 0
              THEN {float(m)!r} * ln({float(m)!r} / CAST({m} - present AS DOUBLE))
              ELSE ({alpha * m * m!r} * {float(1 << _SCALE_POW)!r}
                    / CAST(s_present
                           + CAST({m} - present AS DECIMAL(38,0))
                             * CAST({1 << _SCALE_POW}::BIGINT AS DECIMAL(38,0))
                           AS DOUBLE))
         END, 4) AS hll_estimate
FROM folded
"""


def theta_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    rate: int = 16,
) -> DataFrame:
    """Per-group threshold-sampled distinct estimate: exact distinct
    over the ~1/rate of values whose 60-bit hash < 2^60/rate, scaled.

    Map-side filter → only survivors shuffle; the survivor set is the
    sketch state (mergeable by union). Returns
    (group_cols..., theta_estimate bigint)."""
    threshold = (1 << 60) // rate
    h = hash60(F.col(value_col))
    kept = df.select(*group_cols, h.alias("__h")).where(F.col("__h") < threshold)
    return kept.groupBy(*group_cols).agg(
        (F.count_distinct(F.col("__h")) * rate).alias("theta_estimate")
    )


# ---------------------------------------------------------------------------
# Count-min sketch — frequency estimation in bounded state
# ---------------------------------------------------------------------------


def _cm_bucket(col: Column, depth_idx: Column | int, width: int) -> Column:
    """Row-``i`` bucket of a value: the shared 60-bit hash over the
    depth-salted string form, mod width. Salt = ``i || ':' || value``
    so the d hash rows are independent and the DuckDB twin is a literal
    string concat."""
    i = F.lit(depth_idx) if isinstance(depth_idx, int) else depth_idx
    return hash60(F.concat(i.cast("string"), F.lit(":"), col.cast("string"))) % width


def countmin_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Per-group count-min sketch: ``(group_cols..., __d, __bucket,
    __cnt)`` — d hash rows of w counters. Bounded state (d·w counters a
    group, regardless of distinct values), map-side partial agg, and
    MERGEABLE by bucket-wise SUM (counter addition is the sketch
    union), the same incremental-maintenance story as
    :func:`hll_registers`. Estimates overcount only (never under):
    expected error ≤ 2N/w with probability 1-(1/2)^d.

    NULL values are excluded (COUNT semantics ignore NULLs, matching
    :func:`hll_registers`): ``_cm_bucket(NULL)`` is NULL, so a null
    row would otherwise mint d junk ``__bucket=NULL`` counters — and a
    NULL probe item's null-unsafe join would then read 0 hits and
    certify frequency 0 for rows that exist."""
    df = df.where(F.col(value_col).isNotNull())
    rows = df.select(
        *group_cols,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("__d"),
                    _cm_bucket(F.col(value_col), i, width).alias("__bucket"),
                )
                for i in range(depth)
            ])
        ).alias("__db"),
    ).select(*group_cols, "__db.__d", "__db.__bucket")
    return rows.groupBy(*group_cols, "__d", "__bucket").agg(
        F.count(F.lit(1)).alias("__cnt")
    )


def countmin_lookup(
    sketch: DataFrame,
    items: DataFrame,
    group_cols: list[str],
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch for each (group, item) row: estimate =
    MIN over the d rows' counters. ``items`` is small (the candidates
    you care about) and broadcasts; missing counters read as 0, so an
    item whose d buckets were never incremented estimates 0 (a zero
    counter proves count 0 — count-min never undercounts).

    The inner probe join can only LOSE counter rows (absent (d,bucket)
    cells), never invent them, so hits-per-probe < depth means at least
    one counter was 0: the final estimate re-bases on the distinct
    probe set and zeroes those rows rather than inflating the min over
    only the present counters."""
    # dedup the probe set FIRST: the hits-per-probe < depth zero-counter
    # proof below counts joined rows per (group, value), and a probe
    # duplicated in `items` would multiply its hit count past depth —
    # returning a positive min over only the present counters for an
    # item whose true count is provably 0
    items = items.select(*group_cols, value_col).distinct()
    probes = items.select(
        *group_cols,
        F.col(value_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("__d"),
                    _cm_bucket(F.col(value_col), i, width).alias("__bucket"),
                )
                for i in range(depth)
            ])
        ).alias("__db"),
    ).select(*group_cols, value_col, "__db.__d", "__db.__bucket")
    joined = sketch.join(F.broadcast(probes), [*group_cols, "__d", "__bucket"])
    hits = joined.groupBy(*group_cols, value_col).agg(
        F.min("__cnt").alias("__min"), F.count("__cnt").alias("__hits")
    )
    base = items  # already the distinct probe set
    return base.join(F.broadcast(hits), [*group_cols, value_col], "left").select(
        *group_cols,
        value_col,
        F.when(F.coalesce("__hits", F.lit(0)) < depth, F.lit(0))
        .otherwise(F.col("__min"))
        .cast("long")
        .alias("cm_estimate"),
    )


def heavy_hitters(df: DataFrame, value_col: str, k: int = 16) -> DataFrame:
    """Misra-Gries heavy hitters: the ε-approximate top-k frequency
    summary with BOUNDED state — k counters per partition, k·P rows
    shuffled, k rows out — regardless of how many distinct values the
    column holds. The complement to :func:`countmin_sketch`: count-min
    answers "how often is THIS item" (overcounts only), Misra-Gries
    answers "WHICH items are frequent" (undercounts only).

    Guarantees (mergeable-summaries compression, so they hold for any
    partitioning): ``est ≤ true`` and ``true - est ≤ n/(k+1)``; every
    value with true frequency > n/(k+1) is present in the output. At
    100 TB this is the only shape that finds frequent crawl domains /
    boilerplate lines without shuffling one row per distinct value.

    Plan: per-partition Arrow-batched MG fold (value_counts per batch,
    counter merge, decrement-compression to k — the one sanctioned
    Python stage), a k·P-row partial-summary shuffle summed per item,
    then one global decrement-compression driven by a bounded driver
    scalar (the (k+1)-th largest merged counter).
    """
    import pandas as pd

    dt = df.schema[value_col].dataType.simpleString()
    out_schema = f"{value_col} {dt}, __est long"

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[value_col].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                # decrement-compress: subtract the (k+1)-th largest,
                # drop non-positive — the mergeable-summaries step
                # that preserves est >= true - eps*n
                thr = sorted(counters.values(), reverse=True)[k]
                counters = {
                    v: c - thr for v, c in counters.items() if c - thr > 0
                }
        yield pd.DataFrame(
            {value_col: list(counters), "__est": list(counters.values())}
        )

    partial = df.select(value_col).mapInPandas(mg, out_schema)
    merged = partial.groupBy(value_col).agg(
        F.sum("__est").alias("__est")
    # pin ONE materialization: the MG compression inside mapInPandas
    # depends on Arrow batching, so re-executing `merged` for the
    # final select could yield counters inconsistent with the
    # collected threshold (est<=true bound silently breaks). The
    # checkpointed frame is bounded at k·P rows — tiny.
    ).localCheckpoint(eager=True)
    top = (
        merged.select("__est")
        .orderBy(F.col("__est").desc())
        .limit(k + 1)
        .collect()
    )
    thr = int(top[k]["__est"]) if len(top) > k else 0
    return merged.select(
        value_col, (F.col("__est") - thr).alias("est_count")
    ).where(F.col("est_count") > 0)


def certified_heavy_hitters(
    df: DataFrame, value_col: str, k: int = 255
) -> DataFrame:
    """The DETERMINISTIC heavy-hitter set: every value whose true
    frequency exceeds ``n/(k+1)``, found without ever shuffling one
    row per distinct value — the standard two-pass shape at scale:

    1. :func:`heavy_hitters` (Misra-Gries) produces a CANDIDATE set.
       The MG guarantee (``true - est ≤ n/(k+1)``, for any
       partitioning) means every over-threshold value survives the
       compressions with a positive counter — the candidate set is a
       superset of the answer, bounded at ~k rows.
    2. one exact recount of just the candidates: the tiny candidate
       set broadcasts, the corpus is filtered map-side, and the
       groupBy shuffles only candidate rows.

    Unlike the raw MG estimates (which depend on Arrow batching /
    partitioning), the output is a pure function of the data —
    ``(value, freq)`` with exact frequencies — so it is
    oracle-checkable: it equals ``GROUP BY value HAVING count(*) >
    n/(k+1)`` while touching k·P counters instead of every distinct
    value. ``n`` is one column-pruned count job (driver scalar)."""
    n = df.count()
    cand = heavy_hitters(df, value_col, k=k).select(value_col)
    return (
        df.join(F.broadcast(cand), value_col, "left_semi")
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.col("freq") > n / (k + 1))
    )


def _bottomk_order(key_col: str, payload_cols: list[str]) -> list[Column]:
    """The sketch's canonical total order: hash first, then the key,
    then every payload column (name-sorted) as the tiebreak. ``__h`` is
    a pure function of the key, so rows tie on (``__h``, key) exactly
    when they share a key — the payload tiebreak is what keeps the
    rank-k cut deterministic for NON-unique keys (rows identical in
    key AND every payload column are interchangeable in the state, so
    row_number's arbitrary choice among them cannot change the output
    multiset).

    Payload tiebreaks order ``asc_nulls_last``, NOT Spark's default
    asc (nulls first): DuckDB's default ASC is NULLS LAST, so a null
    payload on a duplicate key would silently pick different survivor
    rows per engine under the default — nulls-last is the one
    spelling both engines agree on (an oracle mirroring the tiebreak
    writes ``ORDER BY ..., v NULLS LAST``, which is DuckDB's default
    anyway). NaN needs no such care: both engines sort NaN above
    every number. ``__h`` and the key carry no null handling because
    null keys are excluded from the sketch entirely."""
    return [
        F.col("__h"),
        F.col(key_col),
        *[F.col(c).asc_nulls_last() for c in sorted(payload_cols)],
    ]


def _state_payload_cols(
    df: DataFrame, group_cols: list[str], key_col: str
) -> list[str]:
    """Payload columns of a bottom-k state frame: everything that is
    not a group key, the sample key, or sketch bookkeeping."""
    meta = set(group_cols) | {key_col, "__h", "__n", "__sid"}
    return [c for c in df.columns if c not in meta]


def _join_group_totals(
    rows: DataFrame, totals: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Attach per-group totals with a NULL-SAFE equi-join: a plain
    ``join(on=group_cols)`` silently drops every NULL-keyed group
    (NULL never equals NULL in an equi-join), so a null group value
    present in the state would vanish from the merge. ``eqNullSafe``
    on each group column keeps it. With no group columns (a GLOBAL
    sketch) the totals frame is one row: attach it as a cross join —
    an empty condition list has no reduce identity."""
    import functools
    import operator

    if not group_cols:
        return rows.crossJoin(totals)
    renamed = totals.select(
        *[F.col(c).alias(f"__t_{c}") for c in group_cols],
        *[c for c in totals.columns if c not in group_cols],
    )
    cond = functools.reduce(
        operator.and_,
        [rows[c].eqNullSafe(renamed[f"__t_{c}"]) for c in group_cols],
    )
    return rows.join(renamed, cond).drop(*[f"__t_{c}" for c in group_cols])


def bottomk_sample_state(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    key_col: str,
    k: int = 512,
    salt: str = "sq",
    n_shards: "int | str" = 32,
) -> DataFrame:
    """The mergeable state of the bottom-k quantile sketch: per group,
    the ``k`` rows whose ``md5(salt || key)`` sorts lowest (plus the
    group's TRUE row count). A hash-bottom-k set is a uniform sample
    that is a pure function of the data — same rows on any engine, any
    partitioning, any ``n_shards`` — and it MERGES: bottom-k of a
    union is the bottom-k of the concatenated states
    (``merge_bottomk_states``), so the sketch folds over
    batches/partitions like the HLL registers above.

    Plan shape (two-level rank, gated by
    ``tests/test_plans.py::test_bottomk_state_sharded_two_level``): no
    single task ever sorts a whole group. Stage 1 ranks within
    (group, ``__shard``) where the shard is a deterministic hash of
    the key, so a group's rows spread across ``n_shards`` even tasks
    (task volume O(group/n_shards)) and each shard keeps only its own
    bottom-k; stage 2 re-ranks the ≤ k·n_shards survivors per group —
    the straggler-free replacement for a single per-group window whose
    one task buffers O(group) rows. Two bounded shuffles; the result
    is identical for any ``n_shards`` (every globally-bottom-k row is
    bottom-k within its shard), so size ``n_shards`` ≈ max group rows
    / target task rows at scale. Per-group state is O(k), versus the
    exact percentile's O(group) value buffer — the bounded-memory
    quantile path at 100 TB. md5 (not xxhash64) so a DuckDB oracle
    replays the identical sample (module docstring).

    NULL keys are excluded from the sketch entirely — sample AND count
    (mirroring the as-of join's documented null-key semantics): a NULL
    key has no hash (null-propagating concat), would sort first under
    Spark's asc-nulls-first while DuckDB sorts it last, and ties with
    every other NULL key nondeterministically. Duplicate keys ARE
    supported: the rank order tiebreaks on the value column
    (:func:`_bottomk_order`), so the kept row set is deterministic as
    long as (key, value) pairs are; rows identical in key and value
    are interchangeable."""
    from pyspark.sql import Window

    if n_shards == "auto":
        # SCALE-ADAPTIVE shard count (guide §2.4: partitioning sized to
        # the data, not a constant): the input's planned scan
        # partitioning is a volume proxy (≈ bytes / maxPartitionBytes),
        # so a bench-scale table resolves to ONE shard — the result is
        # provably identical for any n_shards (every globally-bottom-k
        # row is bottom-k within its shard; property-tested), and with
        # one shard the stage-1 rank is pure overhead (an extra
        # exchange + window over the full input), while a 100 TB scan
        # (thousands of splits) keeps the full anti-straggler sharding.
        from rental_data_pipeline_spark.operators.planmeta import plan_partitions

        n_shards = max(1, min(32, plan_partitions(df)))
    if n_shards < 1:
        # % 0 is NULL in Spark SQL: every row would land in one NULL
        # shard cell — the single-task sort this rework removed,
        # silently restored. Refuse instead.
        raise ValueError(
            f"bottomk_sample_state: n_shards must be >= 1, got {n_shards}"
        )
    df = df.where(F.col(key_col).isNotNull())
    h = F.md5(
        F.concat(F.lit(salt), F.col(key_col).cast("string"))
    ).alias("__h")
    order = _bottomk_order(key_col, [value_col])
    if n_shards == 1:
        # one shard ≡ the plain single-shuffle per-group rank: skip the
        # stage-1 window entirely instead of running it over a
        # constant shard id (the two-level plan with n_shards=1 still
        # pays a second exchange + sort for zero pruning)
        w = Window.partitionBy(*group_cols).orderBy(*order)
        return (
            df.select(*group_cols, F.col(value_col), F.col(key_col), h)
            .withColumn(
                "__n", F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
            )
            .withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= k)
            .select(*group_cols, value_col, key_col, "__h", "__n")
        )
    staged = df.select(*group_cols, F.col(value_col), F.col(key_col), h).withColumn(
        # shard = independent hex window of the same md5 (chars 17-24),
        # a pure function of the key: duplicate keys land in ONE shard,
        # so the stage-1 cut sees every row that can tie on (__h, key)
        "__shard",
        F.conv(F.substring(F.col("__h"), 17, 8), 16, 10).cast("bigint")
        % n_shards,
    )
    w1 = Window.partitionBy(*group_cols, "__shard").orderBy(*order)
    pruned = (
        staged.withColumn(
            "__n_shard",
            F.count(F.lit(1)).over(Window.partitionBy(*group_cols, "__shard")),
        )
        .withColumn("__rk1", F.row_number().over(w1))
        .where(F.col("__rk1") <= k)
        # exactly one carrier row per non-empty (group, shard): the
        # group's true count must be summed once per shard, not once
        # per surviving row
        .withColumn(
            "__n_carry",
            F.when(F.col("__rk1") == 1, F.col("__n_shard")).otherwise(
                F.lit(0).cast("long")
            ),
        )
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        pruned.withColumn(
            "__n", F.sum("__n_carry").over(Window.partitionBy(*group_cols))
        )
        .withColumn("__rk", F.row_number().over(w2))
        .where(F.col("__rk") <= k)
        .select(*group_cols, value_col, key_col, "__h", "__n")
    )


def merge_bottomk_states(
    a: DataFrame, b: DataFrame, group_cols: list[str], key_col: str, k: int
) -> DataFrame:
    """Fold two bottom-k states over DISJOINT row sets into the state
    of their union: re-rank the concatenation on the same hash order
    and keep k; true counts are additive. Associative and
    commutative — the sketch's merge operator. Group columns may be
    NULL (the totals join is null-safe); ties between equal keys
    tiebreak on the payload columns, matching
    :func:`bottomk_sample_state`'s order exactly."""
    from pyspark.sql import Window

    u = a.unionByName(b)
    # __n repeats on every kept row WITHIN a state — sum one value per
    # (group, source state), never per row (a per-row sum over-counts
    # by up to k times). The per-side counts combine via union +
    # groupBy, NOT an outer join: groupBy treats NULL as an ordinary
    # group value, while a join on group_cols would leave a null
    # group's two sides unmatched and mint two totals rows for it.
    na = a.groupBy(*group_cols).agg(F.first("__n").alias("__n_side"))
    nb = b.groupBy(*group_cols).agg(F.first("__n").alias("__n_side"))
    totals = (
        na.unionByName(nb)
        .groupBy(*group_cols)
        .agg(F.sum("__n_side").alias("__n_total"))
    )
    order = _bottomk_order(key_col, _state_payload_cols(a, group_cols, key_col))
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        _join_group_totals(u.drop("__n"), totals, group_cols)
        .withColumnRenamed("__n_total", "__n")
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def quantiles_from_bottomk(
    state: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: list[float],
) -> DataFrame:
    """Interpolated quantile estimates + the true group count from a
    bottom-k state: ``(group_cols..., n_rows, q_<q>...)``."""
    pct = F.percentile(value_col, F.array(*[F.lit(q) for q in qs]))
    out = state.groupBy(*group_cols).agg(
        F.first("__n").alias("n_rows"), pct.alias("__p")
    )
    for i, q in enumerate(qs):
        out = out.withColumn(
            f"q_{str(q).replace('.', '_')}",
            F.round(F.element_at("__p", i + 1), 6),
        )
    return out.drop("__p")


def sampled_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    key_col: str,
    qs: list[float],
    k: int = 512,
    salt: str = "sq",
    n_shards: "int | str" = "auto",
) -> DataFrame:
    """Bounded-memory per-group quantiles from the deterministic
    bottom-k hash sample — the scale path next to the exact
    ``F.percentile`` (whose per-group value buffer is O(group)) and
    Spark's ``percentile_approx`` (whose KLL state is engine-opaque,
    so no cross-engine oracle can check it). Sample error is the
    standard order-statistic bound (~1/sqrt(k) on the rank); the
    SAMPLE itself is exact-reproducible (for any ``n_shards``), so the
    estimate is a pure function of the data and the DuckDB twin
    hash-matches it."""
    state = bottomk_sample_state(
        df, group_cols, value_col, key_col, k, salt, n_shards
    )
    return quantiles_from_bottomk(state, group_cols, value_col, qs)
