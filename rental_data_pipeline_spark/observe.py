"""Empty-plan-safe Observation counters (A7 metrics, corpus stream).

``DataFrame.observe`` rides a ``CollectMetrics`` node on a job the
caller runs anyway — zero extra jobs per counter, the scheduler-overhead
argument that moved every per-micro-batch metric onto Observations (at a
per-minute trigger a 1000-executor cluster pays a fixed count-job tax per
batch otherwise; see ``streaming/corpus_stream.py``). But the fast path
has a crash edge: when the observed plan collapses to an empty
``LocalRelation`` (every row of a micro-batch quarantined or
gate-rejected, or the batch itself empty), the optimizer can drop the
``CollectMetrics`` node from the executed plan, and ``Observation.get``
then dies inside ``toPyRow`` instead of returning zeros. In production
that turns a routine all-spam / all-short crawl micro-batch into a
stream-killing crash (round-10 postmortem: the ``_with_tokens``
no-shuffle fast path exposed exactly this in ``fold_corpus_batch``).

``SafeObservation`` keeps the fast path and adds the safe one: it
remembers the frame and the aggregate expressions, and when the metrics
row is unavailable it re-runs the same aggregates as ONE explicit job
over the observed frame — cheap precisely when the fast path failed,
because that is the empty/collapsed-plan case.

Usage mirrors ``Observation`` except attachment goes through ``on``::

    obs = SafeObservation("expectations")
    df = obs.on(df, F.count(F.lit(1)).alias("n"))
    ... run an action over df ...
    n = int(obs.get["n"])        # .get is a dict, like Observation.get

Contract carried over from ``Observation``: call ``.get`` only after an
action has run over the attached frame (otherwise the underlying
``Observation.get`` blocks). Aggregates should ``coalesce`` NULL-on-empty
reductions (``sum``) to 0 — ``count`` is already safe.
"""
from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Observation


class SafeObservation:
    """An ``Observation`` whose ``.get`` survives empty-plan collapse."""

    def __init__(self, name: Optional[str] = None) -> None:
        self._obs = Observation(name) if name is not None else Observation()
        self._exprs: Optional[list[Column]] = None
        self._df: Optional[DataFrame] = None

    def on(self, df: DataFrame, *exprs: Column) -> DataFrame:
        """Attach the metrics to ``df`` (once), returning the observed
        frame; the frame and expressions are kept for the fallback."""
        if self._exprs is not None:
            raise RuntimeError("SafeObservation can only be attached once")
        if not exprs:
            raise ValueError("at least one aggregate expression is required")
        self._exprs = list(exprs)
        self._df = df
        return df.observe(self._obs, *exprs)

    @property
    def get(self) -> dict:
        """The observed metrics row as a dict; falls back to one
        explicit aggregate job when the metrics row is unavailable
        (the observed node was optimized out of an empty plan)."""
        if self._exprs is None:
            raise RuntimeError("SafeObservation was never attached (use .on)")
        try:
            return dict(self._obs.get)
        except Exception as e:
            # The expressions are unresolved Column trees — reusable
            # against the remembered frame; on the collapsed/empty plan
            # this is a near-free single-row aggregate. The fallback
            # can also fire on an unrelated .get failure (a transient
            # bridge error) — the recomputed aggregate is still the
            # correct value for the deterministic frames this wraps,
            # but the swallowed error is surfaced as a warning so a
            # systemic failure (every batch falling back and paying
            # the recompute) is visible, not silent.
            import warnings

            warnings.warn(
                "SafeObservation: metrics row unavailable "
                f"({type(e).__name__}: {str(e)[:200]}); recomputing "
                "the aggregates with one explicit job",
                RuntimeWarning,
                stacklevel=2,
            )
            row = self._df.agg(*self._exprs).collect()[0]
            return row.asDict()
