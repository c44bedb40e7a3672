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
            # Fall back ONLY on the empty-plan-collapse signatures: the
            # metrics row is missing, so the JVM-side getRow()/toPyRow
            # path dies on a null row (Py4J NullPointerException /
            # assertion mentioning toPyRow or CollectMetrics) or the
            # pickle of a null row fails (EOFError / UnpicklingError /
            # NoneType TypeError). Anything else — an interrupted job,
            # a dead gateway, a real bridge bug — re-raises: silently
            # recomputing there could return a value that differs from
            # what the completed action actually observed.
            if not self._is_missing_row_error(e):
                raise
            # The expressions are unresolved Column trees — reusable
            # against the remembered frame; on the collapsed/empty plan
            # this is a near-free single-row aggregate. NOTE the
            # contract: the wrapped frame must be DETERMINISTIC (true
            # of every current site — counters over checkpointed or
            # pure-function batches); a nondeterministic frame would
            # make the recomputed value differ from what the completed
            # action observed. The fallback is surfaced as a warning so
            # a systemic failure (every batch falling back and paying
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

    @staticmethod
    def _is_missing_row_error(e: Exception) -> bool:
        """True iff ``e`` matches a known missing-metrics-row signature
        (the optimizer dropped the CollectMetrics node from an empty
        plan), as opposed to an unrelated bridge failure.

        The signatures trace ``Observation.get``'s row path
        (``self._jo.getRow()`` → ``utils.toPyRow(jrow)`` →
        ``CPickleSerializer().loads``): a null jrow dies in the JVM
        bridge (Py4J error text naming toPyRow / CollectMetrics /
        NullPointerException), a null pickle payload dies in
        ``loads`` (EOFError / UnpicklingError / a ``TypeError``
        complaining about ``NoneType``). The NoneType needle is scoped
        to TypeError — an unrelated exception that merely MENTIONS
        NoneType (e.g. an AttributeError inside a callback) must
        re-raise, and there is deliberately no blanket AssertionError
        match: the only assertion on this path (``assert self._jvm is
        not None``) signals a torn-down session, where a recompute
        would lie, not a missing row."""
        import pickle

        if isinstance(e, (EOFError, pickle.UnpicklingError)):
            return True  # CPickleSerializer().loads on a null row
        if isinstance(e, TypeError) and "NoneType" in str(e):
            return True  # loads(None): "a bytes-like object is required"
        text = f"{type(e).__name__}: {e}"
        needles = ("toPyRow", "CollectMetrics", "NullPointerException")
        return any(n in text for n in needles)
