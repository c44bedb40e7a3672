"""Live-fetch execution operator (SURVEY §2.10): distributed page
fetch with bounded retry, rate-cap delay, and a per-worker rate-limit
circuit breaker.

Mirrors the reference's fetch semantics (``scraper/base_async_processor.py:139-192``
worker loop with task re-enqueue and ``max_retries``;
``scraper/async_http_processor.py:17-27,82-116`` 429 circuit breaker)
re-expressed for Spark's execution model: each *partition* is one
worker — it owns a client, a retry queue, a rate-cap clock, and a
breaker, exactly like one member of the reference's worker pool. The
operator is ``mapInPandas`` (not ``foreachPartition``) so results come
back as a DataFrame that feeds straight into the extraction layer.

The actual HTTP call is an injected callable (the container has no
network stack, and the reference's transport — aiohttp + proxies +
cookies — is environment config, not query semantics). Production
swaps in e.g. a ``requests.Session`` closure; tests inject
deterministic fakes.

Scale notes: parallelism = partitions (``repartition(n_workers)``
upstream); per-partition sequential issue with ``min_delay`` between
calls gives a cluster-wide rate cap of ``n_workers / min_delay`` req/s;
retries stay inside the partition (no shuffle, no driver round-trip).
Kept out of ``queries()`` — no SQL oracle can check a network effect.
"""

from __future__ import annotations

import time
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

# fetcher(url) -> (status_code, body). Raise for transport errors.
Fetcher = Callable[[str], "tuple[int, str]"]

RESULT_SCHEMA = (
    "request_id string, url string, status int, body string, "
    "error string, attempts int"
)

RETRYABLE_STATUSES = frozenset({500, 502, 503, 504})


def fetch_pages(
    requests_df: DataFrame,
    make_fetcher: Callable[[], Fetcher],
    url_col: str = "url",
    id_col: str = "request_id",
    max_retries: int = 3,
    min_delay_s: float = 0.0,
    breaker_threshold: int = 5,
    backoff_base_s: float = 0.1,
) -> DataFrame:
    """Fetch every row's ``url_col``; returns one result row per request.

    Per-partition worker semantics (ref ``base_async_processor.py:139-192``):

    - transport errors / retryable 5xx re-enqueue the task until
      ``max_retries``, with exponential backoff ``backoff_base_s * 2^n``;
    - HTTP 429 is never retried and counts toward a consecutive-429
      breaker; at ``breaker_threshold`` the partition fails-fast every
      remaining task without touching the network (ref
      ``async_http_processor.py:17-27``) — a success resets the count;
    - ``min_delay_s`` spaces out network calls (worker-level rate cap).

    ``make_fetcher`` builds the client *inside* the executor (a closure
    over session/proxy config) — clients are never serialized from the
    driver.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetcher = make_fetcher()
        consecutive_429 = 0
        circuit_open = False
        last_call = 0.0

        def one(request_id: str, url: str) -> dict:
            nonlocal consecutive_429, circuit_open, last_call
            attempts = 0
            while True:
                if circuit_open:
                    return dict(
                        request_id=request_id, url=url, status=429,
                        body=None, error="circuit_open", attempts=attempts,
                    )
                wait = min_delay_s - (time.monotonic() - last_call)
                if wait > 0:
                    time.sleep(wait)
                attempts += 1
                try:
                    last_call = time.monotonic()
                    status, body = fetcher(url)
                except Exception as e:  # transport failure → retryable
                    status, body, err = None, None, f"transport: {e}"
                else:
                    err = None
                    if status == 429:
                        consecutive_429 += 1
                        if consecutive_429 >= breaker_threshold:
                            circuit_open = True
                        return dict(
                            request_id=request_id, url=url, status=429,
                            body=None, error="rate_limited", attempts=attempts,
                        )
                    if status in RETRYABLE_STATUSES:
                        err = f"http {status}"
                    else:
                        consecutive_429 = 0
                        return dict(
                            request_id=request_id, url=url, status=status,
                            body=body, error=None, attempts=attempts,
                        )
                if attempts > max_retries:
                    return dict(
                        request_id=request_id, url=url, status=status,
                        body=None, error=err, attempts=attempts,
                    )
                time.sleep(backoff_base_s * (2 ** (attempts - 1)))

        for pdf in batches:
            rows = []
            for rid, url in zip(pdf[id_col], pdf[url_col]):
                # null-safe boundary: astype(str) would stamp 'nan'
                # into request_id (silently missing every downstream
                # join), and a null url would burn max_retries
                # backoff sleeps before a misleading transport error
                rid = None if pd.isna(rid) else str(rid)
                if url is None or (isinstance(url, float) and pd.isna(url)):
                    rows.append(dict(
                        request_id=rid, url=None, status=None,
                        body=None, error="invalid: null url", attempts=0,
                    ))
                    continue
                rows.append(one(rid, url))
            if rows:
                yield pd.DataFrame(rows)

    return requests_df.select(
        requests_df[id_col].alias(id_col), requests_df[url_col].alias(url_col)
    ).mapInPandas(run, RESULT_SCHEMA)
