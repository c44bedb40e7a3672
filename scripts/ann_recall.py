"""Measure ANN recall@k vs brute force across the probe knobs.

Builds one IVF+PQ index over the testdata embeddings, then sweeps the
probe-time recall knobs (``nprobe`` for IVF, ``shortlist`` for PQ)
and reports mean recall@k against exact cosine top-k — the numbers
behind the README's recall table and the operating-point defaults
frozen in the index ``_meta.json``.

Usage: python scripts/ann_recall.py [sf_dir] [n_queries]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rental_data_pipeline_spark.operators.ann_index import (
    build_ann_index,
    ivf_topk_persisted,
    pq_topk_persisted,
)
from rental_data_pipeline_spark.operators.similarity import cosine_topk
from rental_data_pipeline_spark.session import get_spark
from rental_data_pipeline_spark.sources.tables import load_table

TOP_K = 5


def _topk_sets(df) -> dict[int, set]:
    out: dict[int, set] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.vec_id)
    return out


def recall(got: dict[int, set], want: dict[int, set]) -> float:
    num = sum(len(got.get(q, set()) & want[q]) for q in want)
    den = sum(len(want[q]) for q in want)
    return num / den if den else 0.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("ann_recall")
    embs = load_table(spark, "embeddings", sf_dir)
    qids = [r.vec_id for r in embs.select("vec_id").limit(n_queries).collect()]

    truth = _topk_sets(cosine_topk(embs, qids, top_k=TOP_K))
    idx = tempfile.mkdtemp(prefix="ann_recall_")
    try:
        build_ann_index(embs, idx, n_cells=8, n_iter=3, pq=True)
        rows = []
        for nprobe in (1, 2, 4, 8):
            got = _topk_sets(
                ivf_topk_persisted(spark, idx, qids, nprobe=nprobe, top_k=TOP_K)
            )
            rows.append({"probe": "ivf", "knob": "nprobe", "value": nprobe,
                         "recall_at_5": round(recall(got, truth), 4)})
        for shortlist in (10, 20, 50, 100):
            got = _topk_sets(
                pq_topk_persisted(
                    spark, idx, qids, shortlist=shortlist, top_k=TOP_K
                )
            )
            rows.append({"probe": "pq", "knob": "shortlist",
                         "value": shortlist,
                         "recall_at_5": round(recall(got, truth), 4)})
        print(json.dumps({"sf_dir": sf_dir, "n_queries": n_queries,
                          "top_k": TOP_K, "rows": rows}))
    finally:
        shutil.rmtree(idx, ignore_errors=True)


if __name__ == "__main__":
    main()
