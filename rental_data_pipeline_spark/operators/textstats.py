"""Text-analysis operators for a training-data pipeline over a
``documents(doc_id, text, lang, source, n_chars)`` table: token
counting, quality scoring, language-ID heuristic, and document
fingerprinting.

The reference pipeline has no text-corpus analytics (its text ops are
the RU scraping scalars, SURVEY §2.7); these operators are the
beyond-reference training-data set the engine needs at 100 TB. All of
them are pure native Column expressions — tokenization, regex token
counts, array folds — so they run inside whole-stage codegen with full
scan pushdown: at cluster scale each is a single parquet scan with no
shuffle (per-document map) or one hash aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rental_data_pipeline_spark.functions.hashing import portable_hash64

# Marker-token sets for the language-ID heuristic. A real corpus pipeline
# uses character n-gram profiles (e.g. CLD-style); the portable heuristic
# here scores membership of high-frequency function words per language
# and takes the argmax with a fixed tie order.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
}

# Stopwords for the quality score's stopword-ratio component.
STOPWORDS: tuple[str, ...] = (
    "the", "a", "of", "and", "is", "in", "to", "it", "on", "for",
)

# BPE-ish token pattern: runs of letters, runs of digits, or any single
# non-space symbol — the shape of a byte-pair pre-tokenizer split.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def nd_barrier(col: Column) -> Column:
    """Predicate-pushdown barrier: the value of ``col``, unchanged.

    ``monotonically_increasing_id()`` is non-negative by construction
    (partition_id << 33 | row_in_partition), so the WHEN always takes
    the ``col`` branch — but the expression is flagged
    non-deterministic, and Catalyst's ``PushPredicateThroughNonJoin``
    refuses to push any filter through a Project that contains a
    non-deterministic item. This is the optimization guide's
    ``asNondeterministic()`` duplicate-evaluation fix (§4.4) applied
    to native Column expressions: without it, a filter on an
    expensive derived column is SUBSTITUTED below the projection —
    every ``__toks`` reference re-inlines ``split(regexp_replace(...))``
    (no common-subexpression elimination inside a Filter condition,
    measured ~50 inlined copies for the curation gate) — and, when a
    small corpus was fanned out by ``_with_tokens``'s repartition, the
    pushed filter lands in the single-split SCAN stage and serializes
    the whole corpus' scoring onto one core (measured 3.9-4.7 s of a
    ~3.5 s bench slot at sf0.1). With the barrier the gate evaluates
    once, above the projection, in the fanned-out stage. Trade-off:
    no predicate at all crosses this projection — callers' own
    filters on curation OUTPUT columns were never scan-pushable
    anyway (all derived), so nothing real is lost at any scale."""
    return F.when(F.monotonically_increasing_id() >= 0, col)


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (split on runs of whitespace).

    Leading/trailing whitespace strips with the full ``\\s`` class,
    not ``trim``'s ASCII-space-only rule: virtually every real text
    file ends with a newline, and a space-only trim left phantom
    empty-string tokens that skewed every downstream count, ratio,
    chunk boundary and pack budget. The DuckDB oracle twin
    (``queries_training._TOKS``) applies the identical regexp strip —
    tokenizer agreement is the equivalence linchpin."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.regexp_replace(c, r"^\s+|\s+$", ""), r"\s+")


def _with_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, text, __toks) projection, repartitioned.

    Materializing the token array in its own projection keeps Catalyst
    from inlining the split() into every downstream reference, and the
    repartition spreads a single-split corpus file across the cluster
    for the per-document compute (a small parquet arrives as ONE scan
    partition otherwise). Explicit count: AQE coalesces by byte size
    and would fold the compute back onto one core.

    Repartitions only UP (the multimodal module's discipline): a
    corpus-scale scan already arrives in far more partitions than
    defaultParallelism, and the previous unconditional repartition
    both exchanged the entire raw text over the network and COLLAPSED
    the scan to core-count partitions (~25 GB each at 100 TB).
    Per-doc aggregations downstream pay their own (much smaller)
    shuffle of map-side-combined partials instead.
    """
    from rental_data_pipeline_spark.operators.planmeta import plan_partitions

    n = df.sparkSession.sparkContext.defaultParallelism
    if plan_partitions(df) >= n:
        return df.select(
            F.col(id_col), F.col(text_col), tokens(text_col).alias("__toks")
        )
    return df.repartition(n, F.col(id_col)).select(
        F.col(id_col), F.col(text_col), tokens(text_col).alias("__toks")
    )


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting: whitespace tokens, BPE-ish regex tokens, distinct
    tokens, type-token ratio, average token length."""
    df = _with_tokens(df, text_col, id_col)
    toks = F.col("__toks")
    return df.select(
        id_col,
        F.size(toks).alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0)).alias(
            "n_bpe_tokens"
        ),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
        ).alias("type_token_ratio"),
        F.round(
            F.aggregate(
                toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
            ).cast("double")
            / F.size(toks),
            6,
        ).alias("avg_token_len"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality scoring: length, stopword ratio, type-token ratio, and a
    deterministic composite score in [0, 1].

    Mirrors the C4/Gopher-style cheap filters (length bounds, stopword
    presence, repetition) that gate web-scale corpora before training.
    """
    df = _with_tokens(df, text_col, id_col)
    toks = F.col("__toks")
    n = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    ttr = F.size(F.array_distinct(toks)).cast("double") / n
    stop_ratio = stop_hits.cast("double") / n
    len_component = F.least(n.cast("double") / F.lit(100.0), F.lit(1.0))
    # weights: length 0.4, lexical diversity 0.4, stopword presence 0.2
    score = F.round(
        F.lit(0.4) * len_component
        + F.lit(0.4) * ttr
        + F.lit(0.2) * F.least(stop_ratio * 5, F.lit(1.0)),
        6,
    )
    return df.select(
        id_col,
        n.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(ttr, 6).alias("type_token_ratio"),
        score.alias("quality_score"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Language-ID heuristic: marker-word hit counts per language,
    argmax with fixed tie order (en > de > fr > es), 'und' (undetermined)
    when no marker hits at all."""
    df = _with_tokens(df, text_col, id_col)
    toks = F.col("__toks")
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    best = None
    best_score = None
    for lang in LANG_MARKERS:  # fixed priority order on ties
        if best is None:
            best, best_score = F.lit(lang), scores[lang]
        else:
            cond = scores[lang] > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return df.select(
        id_col,
        F.when(best_score > 0, best).otherwise(F.lit("und")).alias("predicted_lang"),
        best_score.alias("marker_hits"),
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_MARKERS],
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprinting: an order-insensitive set fingerprint
    (md5 of the sorted distinct token set — catches shuffled/near-dup
    docs) and an order-sensitive rolling polynomial hash of the token
    sequence (base-31 mod 2^31-1, portable to the oracle)."""
    df = _with_tokens(df, text_col, id_col)
    toks = F.col("__toks")
    set_fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))
    rolling = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + portable_hash64(t) % 1_000_003) % 2_147_483_647,
    )
    return df.select(
        id_col,
        set_fp.alias("set_fingerprint"),
        rolling.alias("rolling_hash"),
    )


def profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """All per-document text signals in ONE pass: token counts (both
    tokenizers), type-token ratio, average token length, stopword
    ratio, the composite quality score, marker-based language ID,
    both fingerprints, and character entropy.

    Everything except entropy is a single map-side projection over one
    tokens materialization (no shuffle); entropy needs its two-level
    (doc, char) aggregation, so it joins back on the id — one shuffle
    total, versus five separate scans if each signal ran as its own
    query. This is the shape a real curation pipeline uses: compute
    every cheap signal in the same scan of the corpus.
    """
    t = _with_tokens(df, text_col, id_col)
    toks = F.col("__toks")
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    ttr = n_distinct.cast("double") / n
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    stop_ratio = stop_hits.cast("double") / n
    score = (
        F.lit(0.4) * F.least(n.cast("double") / F.lit(100.0), F.lit(1.0))
        + F.lit(0.4) * ttr
        + F.lit(0.2) * F.least(stop_ratio * 5, F.lit(1.0))
    )
    lang_scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    best, best_score = None, None
    for lang in LANG_MARKERS:  # fixed priority order on ties
        if best is None:
            best, best_score = F.lit(lang), lang_scores[lang]
        else:
            cond = lang_scores[lang] > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, lang_scores[lang]).otherwise(best_score)
    flat = t.select(
        id_col,
        n.alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0)).alias(
            "n_bpe_tokens"
        ),
        n_distinct.alias("n_distinct_tokens"),
        F.round(ttr, 6).alias("type_token_ratio"),
        F.round(
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
            .cast("double") / n,
            6,
        ).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
        F.when(best_score > 0, best).otherwise(F.lit("und")).alias("predicted_lang"),
        best_score.alias("marker_hits"),
        *[lang_scores[lang].alias(f"score_{lang}") for lang in LANG_MARKERS],
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))).alias(
            "set_fingerprint"
        ),
        F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda acc, x: (acc * 31 + portable_hash64(x) % 1_000_003) % 2_147_483_647,
        ).alias("rolling_hash"),
    )
    ent = char_entropy(df, text_col, id_col)
    return flat.join(ent, id_col, "left")


def curation_scored(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    languages: tuple[str, ...] = ("en",),
    min_tokens: int = 10,
    max_tokens: int = 5000,
    min_quality: float = 0.5,
) -> DataFrame:
    """The map-side half of :func:`curate_corpus`: per-doc language
    prediction, token count, quality score, content hash, already
    gated on the curation thresholds — everything BEFORE the exact-
    dedup shuffle. Factored out so the incremental curation fold
    (``streaming/curation_stream.py``) scores each micro-batch with
    the exact expressions the batch operator uses (one implementation,
    so streamed state ≡ batch output is a merge property, not a
    score-parity hope)."""
    df = _with_tokens(df, text_col, id_col)
    toks = F.col("__toks")
    n = F.size(toks)

    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    best, best_score = None, None
    for lang in LANG_MARKERS:
        if best is None:
            best, best_score = F.lit(lang), scores[lang]
        else:
            cond = scores[lang] > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, scores[lang]).otherwise(best_score)
    predicted = F.when(best_score > 0, best).otherwise(F.lit("und"))

    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    ttr = F.size(F.array_distinct(toks)).cast("double") / n
    quality = F.round(
        F.lit(0.4) * F.least(n.cast("double") / F.lit(100.0), F.lit(1.0))
        + F.lit(0.4) * ttr
        + F.lit(0.2) * F.least(stop_hits.cast("double") / n * 5, F.lit(1.0)),
        6,
    )

    # nd_barrier on ONE projection item blocks the curation gate below
    # from being substituted under this projection (see nd_barrier):
    # without it the whole scoring tree re-inlines per conjunct inside
    # a Filter pushed all the way into the (single-split) scan stage —
    # serial AND ~50x-duplicated per row. Values are unchanged.
    return df.select(
        F.col(id_col),
        predicted.alias("predicted_lang"),
        n.alias("n_tokens"),
        nd_barrier(quality).alias("quality_score"),
        F.md5(F.col(text_col)).alias("content_hash"),
    ).where(
        F.col("predicted_lang").isin(*languages)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("quality_score") >= min_quality)
    )


def curation_dedup(scored: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The shuffle half of :func:`curate_corpus`: exact dedup with a
    deterministic keep — lowest id wins per content hash. A pure keyed
    min-fold (associative + commutative + idempotent), which is what
    lets the incremental fold apply it per micro-batch against only
    the touched buckets' stored rows."""
    keep = F.struct(F.col(id_col), "predicted_lang", "n_tokens", "quality_score")
    return (
        scored.groupBy("content_hash")
        .agg(F.min(keep).alias("__k"))
        .select("content_hash", "__k.*")
    )


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    languages: tuple[str, ...] = ("en",),
    min_tokens: int = 10,
    max_tokens: int = 5000,
    min_quality: float = 0.5,
) -> DataFrame:
    """End-to-end corpus curation: language gate + length bounds +
    quality threshold + exact dedup (keep the lowest id per content
    hash) — the canonical pre-training filter chain, composed so the
    whole thing is ONE scan projection (tokens materialized once, all
    scores derived from it) followed by ONE shuffle (the dedup
    aggregation). Filters run before the shuffle, so only surviving
    rows are exchanged — at 100 TB the post-filter volume is what
    crosses the wire.

    The curation gate is kept ABOVE the scoring projection with
    :func:`nd_barrier` (round 13): Catalyst otherwise substitutes the
    score aliases into the filter and pushes it below — measured as
    ~50 re-inlined ``split(regexp_replace(...))`` copies per row (no
    common-subexpression elimination inside a Filter) landing in the
    single-split scan stage, i.e. the whole corpus scored serially AND
    redundantly. With the barrier each score evaluates once, in the
    fanned-out stage, and the filter runs on the computed columns.
    """
    return curation_dedup(
        curation_scored(
            df, text_col=text_col, id_col=id_col, languages=languages,
            min_tokens=min_tokens, max_tokens=max_tokens,
            min_quality=min_quality,
        ),
        id_col=id_col,
    )


# ---------------------------------------------------------------------------
# PII redaction & Gopher-style repetition signals
# ---------------------------------------------------------------------------

# Order matters: email first (its local part may contain digits), then
# IPv4 (dots would survive the phone class), then phone runs. Patterns
# stay in the Java∩RE2 common dialect so the DuckDB oracle matches.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9 ()-]{7,}[0-9]", "<PHONE>"),
)


def scrub_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails / IPv4s / phone-number runs with typed tokens and
    per-rule match counts — the pre-release scrub for a training
    corpus. Pure native ``regexp_count`` / ``regexp_replace`` chain
    (whole-stage codegen, no UDF); rules apply in ``PII_RULES`` order,
    each counting on the text as already scrubbed by earlier rules.
    Returns ``(id, n_email, n_ip, n_phone, text_clean)``.
    """
    clean = F.col(text_col)
    counts = []
    for name, pat, repl in PII_RULES:
        counts.append(F.regexp_count(clean, F.lit(pat)).cast("bigint").alias(f"n_{name}"))
        clean = F.regexp_replace(clean, pat, repl)
    return df.select(F.col(id_col), *counts, clean.alias("text_clean"))


def _ngrams_all(toks: Column, n: int) -> Column:
    """ALL k-token n-grams (duplicates kept — unlike dedup's distinct
    shingles; repetition signals need the multiset)."""
    cnt = F.size(toks)
    idx = F.sequence(F.lit(1), cnt - (n - 1))
    return F.when(
        cnt >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style intra-document repetition signals: duplicate
    token / 2-gram / 3-gram fractions and the top-token frequency
    share. All native array expressions, O(n log n) in tokens per doc
    (top-token share via sorted longest-run, never the quadratic
    distinct×filter scan). Quality gates at 100 TB filter on these
    map-side, so they push down ahead of any exchange.

    Fan-out discipline (round 13): goes through :func:`_with_tokens`
    like every other per-doc textstats operator — at corpus scale the
    conditional repartition is a no-op (scan splits ≥ cores) and the
    operator keeps its one-scan shape; on a single-split corpus file
    the previous direct-on-scan form fused the WHOLE per-doc array
    fold into one scan task (measured 4.6 s single-task broadcast
    build inside ``text_repetition``'s join, ~70% of the slot).
    """
    t = _with_tokens(df, text_col, id_col)
    toks = F.col("__toks")
    n = F.size(toks)

    def dup_ratio(arr: Column) -> Column:
        total = F.size(arr)
        return F.when(
            total > 0,
            F.round(1.0 - F.size(F.array_distinct(arr)).cast("double") / total, 6),
        ).otherwise(F.lit(0.0))

    # top token frequency = longest equal-run in the sorted array:
    # O(n log n) per doc. (The obvious distinct×filter scan is
    # O(|distinct|·|tokens|) — quadratic on long docs, measured the
    # dominant cost of this operator at realistic doc lengths.)
    def _run(acc: Column, x: Column) -> Column:
        run = (
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("bigint"))
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top_freq = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("bigint").alias("run"),
            F.lit(0).cast("bigint").alias("best"),
        ),
        _run,
        lambda acc: acc["best"],
    )
    return t.select(
        F.col(id_col),
        n.cast("bigint").alias("n_tokens"),
        dup_ratio(toks).alias("dup_token_ratio"),
        dup_ratio(_ngrams_all(toks, 2)).alias("dup_2gram_ratio"),
        dup_ratio(_ngrams_all(toks, 3)).alias("dup_3gram_ratio"),
        F.when(n > 0, F.round(top_freq.cast("double") / n, 6))
        .otherwise(F.lit(0.0))
        .alias("top_token_share"),
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 5,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF
    (``tf * (ln((N+1)/(df+1)) + 1)``) — corpus-level term weighting
    for keyword extraction / domain profiling.

    Scale shape: explode → one (doc, term) count shuffle → a term-level
    document-frequency aggregation whose result (the vocabulary)
    BROADCASTS back onto the tf side by default, so the corpus shuffles
    twice total (tf agg + per-doc top-k window); the corpus row count
    is a driver scalar (one column-pruned count job), never a cross
    join. Ties rank deterministically (tfidf desc, term asc).

    ``broadcast_vocab=False`` for web-scale corpora: a whitespace/BPE
    vocabulary there holds 10^8-10^10 distinct terms (typos, numbers,
    URLs) — tens of GB that blow the 8 GB broadcast limit; both sides
    of the join already hash on ``term``, so the plain shuffle join is
    the right shape at that scale.
    """
    n_docs = df.count()
    t = _with_tokens(df, text_col, id_col)
    pairs = t.select(F.col(id_col), F.explode("__toks").alias("term"))
    tf = pairs.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0
    df_side = F.broadcast(docfreq) if broadcast_vocab else docfreq
    scored = tf.join(df_side, "term").select(
        F.col(id_col),
        "term",
        "tf",
        "df",
        F.round(F.col("tf") * idf, 6).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= top_k
    )


def tfidf_top_terms_from_vocab(
    df: DataFrame,
    vocab: DataFrame,
    n_docs: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 5,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """:func:`tfidf_top_terms`'s probe side: score ANY document batch
    against a PERSISTED vocabulary (``(term, df)``, e.g. from
    ``streaming/df_stream.py``) and corpus size — no corpus-wide df
    recomputation, the vocabulary broadcasts onto the batch's tf.
    With a vocabulary built over the same corpus this is byte-equal to
    the batch operator; terms unseen by the vocabulary score with
    df=0 (maximum smoothed idf — the correct cold-term reading).
    ``broadcast_vocab=False`` when the persisted vocabulary exceeds
    broadcast size (see :func:`tfidf_top_terms`)."""
    t = _with_tokens(df, text_col, id_col)
    pairs = t.select(F.col(id_col), F.explode("__toks").alias("term"))
    tf = pairs.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    v = vocab.select("term", "df")
    joined = tf.join(
        F.broadcast(v) if broadcast_vocab else v, "term", "left"
    ).withColumn("df", F.coalesce("df", F.lit(0)))
    idf = F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0
    scored = joined.select(
        F.col(id_col),
        "term",
        "tf",
        "df",
        F.round(F.col("tf") * idf, 6).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= top_k
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 50,
    overlap: int = 10,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap —
    the context-window chunking step of a pretraining/RAG pipeline.
    Pure map-side explode (no shuffle): chunk starts are a computed
    ``sequence``, the text a ``slice`` over the materialized token
    array. The final window is the tail remainder (always emitted, so
    every token lands in ≥1 chunk). Returns
    ``(id, chunk_id, n_chunk_tokens, chunk_text)``.
    """
    if not 0 <= overlap < chunk_tokens:
        # a NEGATIVE overlap silently drops the tokens between
        # consecutive windows (stride > chunk width) — every token
        # landing in >= 1 chunk is the operator's contract
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < chunk_tokens "
            f"(got overlap={overlap}, chunk_tokens={chunk_tokens})"
        )
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1 (got {chunk_tokens})")
    stride = chunk_tokens - overlap
    t = _with_tokens(df, text_col, id_col)
    n = F.size("__toks")
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.ceil((n - F.lit(chunk_tokens)).cast("double") / stride).cast("int") + 1
    )
    out = t.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        F.col("__toks"),
    )
    start = F.col("chunk_id") * stride + 1
    piece = F.slice(F.col("__toks"), start, chunk_tokens)
    return out.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.size(piece).cast("bigint").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_budget: int = 512,
) -> DataFrame:
    """Assign documents to fixed-token-budget training bins by global
    cumulative token count in id order (a doc's bin =
    ``floor(tokens_before_it / budget)``) — the sequence-packing step
    that turns a ragged corpus into near-uniform training shards.

    The global running sum is computed WITHOUT a single-partition
    window (the naive ``Window.orderBy(id)`` serializes the corpus
    through one task): range-partition by id, local cumsum per
    partition, then per-partition totals — P scalars — collect to the
    driver and become literal offsets. Two scans, no global sort
    bottleneck; the classic two-phase parallel prefix sum. The result
    is invariant to partition boundaries, so the range partitioner's
    sampling cannot change it. Returns per-bin
    ``(bin_id, n_docs, total_tokens, first_doc, last_doc)``.
    """
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    t = (
        # a null id has no place in the id-ordered packing (and would
        # crash the driver-side offset sort); null text packs as 0
        # tokens instead of poisoning the running sum with NULL
        df.where(F.col(id_col).isNotNull())
        .repartitionByRange(n_parts, F.col(id_col))
        .select(
            F.col(id_col),
            F.coalesce(F.size(tokens(text_col)), F.lit(0))
            .cast("bigint")
            .alias("n_tokens"),
        )
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    part_totals = (
        t.groupBy("__pid")
        .agg(F.sum("n_tokens").alias("s"), F.min(id_col).alias("min_id"))
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(part_totals, key=lambda r: r["min_id"]):
        offsets[r["__pid"]] = acc
        acc += r["s"]
    off = (
        F.coalesce(
            *[F.when(F.col("__pid") == p, F.lit(v)) for p, v in offsets.items()],
            F.lit(0),
        )
        if offsets
        else F.lit(0)
    )
    # ROWS frame, not the default RANGE: RANGE treats duplicate ids as
    # peers and double-counts both rows' tokens into each's prefix
    w = (
        Window.partitionBy("__pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) + off - F.col("n_tokens")
    binned = t.select(
        F.col(id_col),
        "n_tokens",
        F.floor(start / F.lit(token_budget)).cast("bigint").alias("bin_id"),
    )
    out = binned.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )
    return out


def char_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Shannon entropy of the character distribution per document — a
    cheap perplexity proxy: machine-generated/repetitive text scores
    low, natural prose lands ~4 bits, random noise high. A standard
    heuristic quality filter in pretraining pipelines (the entropy
    analog of the repetition ratios in ``repetition_stats``).

    Plan: explode to one row per character, two-level hash aggregation
    ((doc, char) counts, then the entropy fold per doc). Both aggs have
    map-side partial combine; the char-level row count is bounded by
    corpus bytes, so this scans like a tokenizer pass, not a join.
    Entropy is rounded to 6 digits — the cross-engine float-sum
    contract for the oracle hash.
    """
    chars = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "")).alias("__ch"),
    )
    counts = chars.groupBy(id_col, "__ch").agg(F.count(F.lit(1)).alias("__n"))
    per_doc = counts.groupBy(id_col).agg(
        F.sum("__n").alias("__total"),
        F.sum(F.col("__n") * F.log2("__n")).alias("__sum_nlogn"),
    )
    # H = log2(N) - (1/N)·Σ n·log2(n): one pass, no per-char division.
    return per_doc.select(
        F.col(id_col),
        F.col("__total").cast("bigint").alias("n_chars_counted"),
        F.round(
            F.log2("__total") - F.col("__sum_nlogn") / F.col("__total"), 6
        ).alias("char_entropy_bits"),
    )


def bigram_model_frames(
    df: DataFrame,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The shared bigram-LM statistics: ``(doc_pairs, c2, c1, vocab)``.

    ``doc_pairs`` (lang, id, w1, w2, __c_doc) is a filter over the
    persisted finest aggregate, filled by the ONE tokenize+explode
    corpus pass, and both the corpus-level counts and the scoring read
    it. The VOCABULARY rides the same pass: each doc's distinct tokens
    explode next to its bigrams as ``w2``-NULL marker rows (a bigram
    struct can never have a NULL ``w2`` — the pair builder filters
    them), so V = distinct ``w1`` over the marker rows and the second
    full tokenize+explode pass the vocabulary used to cost is gone.
    ``c2``/``c1`` are derived from ``doc_pairs`` by exact
    re-aggregation (Σ __c_doc, then Σ __c2), never by re-scanning the
    corpus; callers needing corpus bigram frequencies (the top-bigram
    feed) should read ``c2`` rather than recount. The persisted frame
    is released by the session-level cache clear between queries
    (bench.py) — the operator itself stays lazy, so it cannot
    unpersist mid-lineage.

    The tokenize projection fans a single-split corpus file out across
    the cluster first (``_with_tokens``'s conditional-repartition
    discipline): without it every one of these statistics serializes
    its explode onto the lone scan task."""
    from rental_data_pipeline_spark.operators.planmeta import plan_partitions

    n = df.sparkSession.sparkContext.defaultParallelism
    src = df
    if plan_partitions(src) < n:
        src = src.repartition(n, F.col(id_col))
    base = src.select(
        F.col(lang_col), F.col(id_col), tokens(text_col).alias("__toks")
    )
    pairs_arr = F.filter(
        F.zip_with(
            F.col("__toks"),
            F.slice(
                F.col("__toks"),
                2,
                F.greatest(F.size("__toks") - 1, F.lit(0)),
            ),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
        # zip_with pads the shorter side with NULL: the final token's
        # struct has w2 NULL and is not a bigram
        lambda s: s["w2"].isNotNull(),
    )
    # per-doc distinct tokens as w2-NULL marker structs: the vocab
    # count re-aggregates these instead of paying its own corpus pass
    toks_arr = F.transform(
        F.array_distinct("__toks"),
        lambda t: F.struct(
            t.alias("w1"), F.lit(None).cast("string").alias("w2")
        ),
    )
    rows = base.select(
        lang_col, id_col, F.explode(F.concat(pairs_arr, toks_arr)).alias("__bg")
    ).select(
        lang_col, id_col,
        F.col("__bg.w1").alias("__w1"), F.col("__bg.w2").alias("__w2"),
    )
    finest = (
        rows.groupBy(lang_col, id_col, "__w1", "__w2")
        .agg(F.count(F.lit(1)).alias("__c_doc"))
        .persist()
    )
    # EAGER populate — the model's "train" action: the statistics feed
    # several independent consumers (the scoring stream, the top-bigram
    # feed, and the per-lang V broadcast, which executes as its own
    # concurrent subjob), and jobs planned before a lazy cache
    # materializes each re-derive the whole tokenize+explode from the
    # source (measured: 3 parallel corpus scans per run instead of 1).
    # One count() here runs the single real corpus pass and every
    # consumer reads the populated cache.
    finest.count()
    doc_pairs = finest.where(F.col("__w2").isNotNull())
    vocab = (
        finest.where(F.col("__w2").isNull())
        .groupBy(lang_col)
        .agg(F.count_distinct("__w1").alias("__V"))
    )
    c2 = doc_pairs.groupBy(lang_col, "__w1", "__w2").agg(
        F.sum("__c_doc").alias("__c2")
    )
    c1 = c2.groupBy(lang_col, "__w1").agg(F.sum("__c2").alias("__c1"))
    return doc_pairs, c2, c1, vocab


def bigram_lm_perplexity(
    df: DataFrame,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    frames: "tuple[DataFrame, DataFrame, DataFrame, DataFrame] | None" = None,
) -> DataFrame:
    """Per-document bigram-LM perplexity — the CCNet-style quality
    score: train an add-alpha-smoothed bigram model on the corpus
    itself (per language) and score every document against it; fluent
    in-distribution text scores low, boilerplate/garbage scores high.
    The reference has no model-based quality signal (SURVEY §2.7 ends
    at regex scalars); this is the training-data-curation operator the
    100 TB brief calls for next to `quality_score`'s surface ratios.

    Model: P(w2|w1) = (c(w1,w2) + alpha) / (c(w1) + alpha * V), with
    c(w1) the CONTEXT count (occurrences of w1 as a bigram's first
    token — the proper conditional denominator), V = distinct tokens
    per language. score(doc) = 10^(-mean log10 P) over the doc's
    bigram stream; docs with < 2 tokens produce no row (no bigrams to
    score — the caller's length gate owns them).

    Cross-engine determinism: each bigram's log-term rounds to 8 dp
    and is summed as DECIMAL(38,8) (exact, order-independent — the
    HLL register-sum discipline; a double sum's value depends on
    partition visit order), and the single division + pow happen once
    per doc on the exact sum. Duplicate (doc, bigram) pairs aggregate
    to a per-doc count FIRST, so the expensive count joins move
    distinct pairs, not occurrences.

    Plan: ONE corpus pass fills the per-doc distinct-pair counts
    (``doc_pairs``, persisted — the finest aggregate; the vocabulary
    rides the same pass as w2-NULL marker rows, see
    :func:`bigram_model_frames`), and the model counts the scoring
    needs are WINDOW SUMS over it: c2 = Σ __c_doc over
    (lang, w1, w2), c1 = Σ __c_doc over (lang, w1) — exact identities
    with the aggregate forms, computed in place on the rows that
    consume them, so the score pays ONE hash exchange on (lang, w1)
    (the narrower window's partitioning clusters the wider one, and
    re-joining aggregated counts back to the pair rows used to cost
    two shuffle equi-joins plus their exchanges). One broadcast of the
    per-lang V; one final (lang, doc) agg. Output:
    (lang, id, n_bigrams, ppl)."""
    from pyspark.sql import Window

    if frames is None:
        frames = bigram_model_frames(df, lang_col, id_col, text_col)
    doc_pairs, c2, c1, vocab = frames
    term = F.round(
        F.log10(
            (F.col("__c2") + F.lit(alpha))
            / (F.col("__c1") + F.lit(alpha) * F.col("__V"))
        ),
        8,
    ).cast("decimal(20,8)")
    # the (lang, w1) window FIRST (bottom of the plan): its hash
    # exchange clusters the (lang, w1, w2) window above it too, so the
    # pair of sums shares one shuffle
    w_c1 = Window.partitionBy(lang_col, "__w1")
    w_c2 = Window.partitionBy(lang_col, "__w1", "__w2")
    scored = (
        doc_pairs.withColumn("__c1", F.sum("__c_doc").over(w_c1))
        .withColumn("__c2", F.sum("__c_doc").over(w_c2))
        .join(F.broadcast(vocab), [lang_col])
        .select(
            lang_col, id_col,
            # __c_doc enters the multiply as DECIMAL(10,0), NOT long:
            # decimal(20,8) x long is decimal(20,8) x decimal(20,0) =
            # precision 41 > Spark's 38 cap, and the overflow rule
            # TRUNCATES THE SCALE to 6 — every term silently loses its
            # 7th/8th decimal while DuckDB (no such cap at this width)
            # keeps all 8, skewing the summed exponent ~1e-5 per doc.
            # At (10,0) the product is (31,8): exact in both engines.
            # c_doc is a per-doc bigram multiplicity — 10 digits is
            # unreachable (a doc would need 10^10 copies of one
            # bigram).
            (term * F.col("__c_doc").cast("decimal(10,0)")).alias("__term"),
            F.col("__c_doc"),
        )
    )
    return scored.groupBy(lang_col, id_col).agg(
        F.sum("__c_doc").alias("n_bigrams"),
        F.round(
            F.pow(
                F.lit(10.0),
                -(
                    F.sum("__term").cast("double")
                    / F.sum("__c_doc").cast("double")
                ),
            ),
            6,
        ).alias("ppl"),
    )
