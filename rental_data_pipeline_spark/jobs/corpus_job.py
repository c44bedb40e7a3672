"""End-to-end training-corpus construction — the composition the
beyond-reference layer exists for, as ONE job:

    raw docs ──> quality/language curation ──> near-dup pair discovery
      ──> canonical-corpus drop ──> eval decontamination ──>
      leakage-safe train/val/test split ──> context-window chunking ──>
      token-budget packing   (+ a one-scan profile report)

Every stage is an already-proven operator (each has its own oracle
slot or pytest); this module pins the COMPOSITION contracts the
stages rely on — the near-dup pairs that drive the canonical drop are
the SAME pairs that keep the split leakage-safe, the decontamination
runs on the post-dedup corpus (so an eval twin removed as a dup can't
resurrect), and the packing consumes only surviving train docs.

Scale shape: each stage keeps its own plan (single-shuffle dedup,
broadcast decontamination probe, map-side split/chunk); the job adds
no shuffles of its own — only the stage boundaries you would
checkpoint as tables in a production DAG.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class CorpusConfig:
    languages: tuple[str, ...] = ("en",)
    # declarative row contracts on the RAW docs (operators/
    # expectations.py): failing rows are quarantined before curation
    # and per-rule counts land in the run metrics
    expectations: dict[str, Column] = field(default_factory=dict)
    min_tokens: int = 10
    max_tokens: int = 5000
    min_quality: float = 0.5
    jaccard_threshold: float = 0.8
    max_contamination: float = 0.05
    split_fractions: dict[str, float] = field(
        default_factory=lambda: {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    chunk_tokens: int = 50
    chunk_overlap: int = 10
    token_budget: int = 512
    # SemDeDup stage (requires `embeddings` + `semantic_centroids` at
    # call time): cosine threshold above which a lower-id same-cell
    # neighbor dominates a doc
    semantic_threshold: float | None = None


def build_training_corpus(
    docs: DataFrame,
    holdout: DataFrame,
    config: CorpusConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    embeddings: DataFrame | None = None,
    semantic_centroids: DataFrame | None = None,
) -> dict:
    """Run the full chain; returns the named stage outputs:

    ``curated`` (gated + exact-deduped doc ids), ``pairs`` (near-dup
    pairs among survivors), ``corpus`` (canonical docs with text),
    ``contaminated`` (docs dropped for eval overlap), ``split``
    (doc → train/val/test, near-dup clusters kept together),
    ``chunks`` (train-split context windows), ``packed`` (chunk → bin
    assignment), ``profile`` (one-scan dataset card of the final
    corpus), ``metrics`` (row counts per stage — the run report).

    With ``embeddings`` (``(id_col, embedding)``), TRAINED
    ``semantic_centroids`` (a ``(cid, cv)`` frame — ``kmeans_train``
    output via ``similarity``'s frame shape, or better
    ``ann_index.index_centroids``: the persisted ANN index's cells,
    trained once and shared by probes and dedup) and
    ``config.semantic_threshold`` set, a SemDeDup stage runs over the
    curated survivors: corpus docs dominated by a lower-id
    same-Voronoi-cell survivor at cosine ≥ threshold are dropped
    before decontamination (``semantic_dropped`` in the outputs) —
    the trained-centroid composition replacing
    ``semantic_dedup``'s first-n-ids stand-in, in the
    incrementally-foldable form (see stage 2.5 comment).
    """
    from rental_data_pipeline_spark.operators.dedup import (
        connected_components,
        contamination_report,
        minhash_lsh_pairs,
    )
    from rental_data_pipeline_spark.operators.profile import table_profile
    from rental_data_pipeline_spark.operators.sampling import leakage_safe_split
    from rental_data_pipeline_spark.operators.textstats import (
        chunk_documents,
        curate_corpus,
        pack_sequences,
    )

    cfg = config or CorpusConfig()

    # 0. expectations gate on the raw docs: ONE tagging pass; the
    # per-rule report rides an Observation on the same computation the
    # curation consumes (no second scan — the pipeline's A7 shape)
    exp_obs = None
    quarantined = None
    if cfg.expectations:
        from rental_data_pipeline_spark.operators.expectations import (
            observed_quarantine,
        )

        docs, quarantined, exp_obs = observed_quarantine(
            docs, cfg.expectations
        )

    # 1. gate + exact dedup (one scan + one shuffle)
    curated = curate_corpus(
        docs, text_col=text_col, id_col=id_col, languages=cfg.languages,
        min_tokens=cfg.min_tokens, max_tokens=cfg.max_tokens,
        min_quality=cfg.min_quality,
    )
    survivors = docs.join(
        F.broadcast(curated.select(F.col(id_col))), id_col
    ).localCheckpoint(eager=True)  # three consumers below share one scan

    # 2. near-dup pairs once; reused for BOTH the canonical drop and
    # the leakage-safe split — using different pair sets for the two
    # would reopen the leak the split exists to close
    pairs = minhash_lsh_pairs(
        survivors, threshold=cfg.jaccard_threshold,
        text_col=text_col, id_col=id_col,
    )
    cc = connected_components(pairs)
    dups = cc.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    corpus = survivors.join(F.broadcast(dups), id_col, "left_anti")

    # 2.5 SemDeDup with trained centroids. Domination runs over ALL
    # curated survivors (not just minhash-canonical docs): the keeper
    # set is insert-only under the crawl's monotonic-id contract while
    # canonical status can be demoted by later cluster merges — using
    # survivors as the dominator side is what makes the stage
    # incrementally foldable (streaming/semantic_stream.py) with
    # batch-equal labels. Reported drops are restricted to the corpus.
    semantic_dropped = None
    if (
        cfg.semantic_threshold is not None
        and embeddings is not None
        and semantic_centroids is not None
    ):
        from rental_data_pipeline_spark.operators.similarity import (
            semantic_dedup,
        )

        eid, evec = embeddings.columns[:2]
        survivor_embs = (
            embeddings.select(
                F.col(eid).alias(id_col), F.col(evec).alias("embedding")
            )
            .join(F.broadcast(survivors.select(id_col)), id_col)
            .select(F.col(id_col).alias("vec_id"), "embedding")
        )
        semantic_dropped = (
            semantic_dedup(
                survivor_embs,
                threshold=cfg.semantic_threshold,
                centroids=semantic_centroids,
            )
            .where(~F.col("is_kept"))
            .select(F.col("vec_id").alias(id_col))
            .join(corpus.select(id_col), id_col, "left_semi")
        ).localCheckpoint(eager=True)  # two consumers: drop + metrics
        corpus = corpus.join(
            F.broadcast(semantic_dropped), id_col, "left_anti"
        )

    # 3. eval decontamination on the POST-dedup corpus
    contaminated = contamination_report(
        corpus, holdout, text_col=text_col, id_col=id_col
    ).where(F.col("contamination") > cfg.max_contamination)
    clean = corpus.join(
        F.broadcast(contaminated.select(id_col)), id_col, "left_anti"
    )

    # 4. split by near-dup cluster (pairs among dropped dups are gone,
    # but surviving canonical docs keep their cluster identity)
    split = leakage_safe_split(
        clean, pairs, cfg.split_fractions, id_col=id_col
    )

    # 5. chunk + pack the train split only
    train = split.where(F.col("split") == "train").select(id_col, text_col)
    chunks = chunk_documents(
        train, text_col=text_col, id_col=id_col,
        chunk_tokens=cfg.chunk_tokens, overlap=cfg.chunk_overlap,
    )
    packed = pack_sequences(
        train, text_col=text_col, id_col=id_col,
        token_budget=cfg.token_budget,
    )

    profile = table_profile(clean)
    metrics = {
        "n_raw": docs.count(),
        "n_curated": curated.count(),
        "n_near_dup_pairs": pairs.count(),
        "n_dropped_dups": dups.count(),
        "n_contaminated": contaminated.count(),
        "n_semantic_dropped": (
            semantic_dropped.count() if semantic_dropped is not None else 0
        ),
        "n_corpus": clean.count(),
        "n_train_chunks": chunks.count(),
    }
    if exp_obs is not None:
        # available: the survivors localCheckpoint above already ran
        # an action through the metrics node
        metrics["expectations"] = {
            k: int(v) for k, v in exp_obs.get.items()
        }
    out = {
        "curated": curated,
        "pairs": pairs,
        "corpus": corpus,
        "contaminated": contaminated,
        "split": split,
        "chunks": chunks,
        "packed": packed,
        "profile": profile,
        "metrics": metrics,
    }
    if quarantined is not None:
        out["expectation_quarantine"] = quarantined
    if semantic_dropped is not None:
        out["semantic_dropped"] = semantic_dropped
    return out
