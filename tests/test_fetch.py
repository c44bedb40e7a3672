"""§2.10 fetch operator: bounded retry, 429 circuit breaker, rate cap.

Deterministic fake fetchers stand in for the network (the transport is
an injected boundary; semantics under test are the worker loop's).
"""

from __future__ import annotations

from rental_data_pipeline_spark.operators.fetch import fetch_pages


def _requests_df(spark, n, parts=1):
    return spark.createDataFrame(
        [(str(i), f"http://x/{i}") for i in range(n)], "request_id string, url string"
    ).repartition(parts)


def test_retry_until_success_with_bounded_attempts(spark):
    def make_fetcher():
        failures = {}

        def fetch(url):
            failures[url] = failures.get(url, 0) + 1
            if failures[url] <= 2:
                raise ConnectionError("flaky")
            return 200, f"body:{url}"

        return fetch

    out = {
        r.request_id: r
        for r in fetch_pages(
            _requests_df(spark, 3), make_fetcher, max_retries=3, backoff_base_s=0.0
        ).collect()
    }
    assert all(out[k].status == 200 and out[k].attempts == 3 for k in out)
    assert out["1"].body == "body:http://x/1"


def test_retries_exhausted_reports_error(spark):
    def make_fetcher():
        return lambda url: (503, None)

    rows = fetch_pages(
        _requests_df(spark, 2), make_fetcher, max_retries=2, backoff_base_s=0.0
    ).collect()
    assert all(r.status == 503 and r.error == "http 503" and r.attempts == 3 for r in rows)


def test_429_never_retried_and_breaker_fails_fast(spark):
    calls = []

    def make_fetcher():
        def fetch(url):
            calls.append(url)
            return 429, None

        return fetch

    rows = fetch_pages(
        _requests_df(spark, 10, parts=1),
        make_fetcher,
        max_retries=5,
        breaker_threshold=3,
        backoff_base_s=0.0,
    ).collect()
    rate_limited = [r for r in rows if r.error == "rate_limited"]
    shorted = [r for r in rows if r.error == "circuit_open"]
    assert len(rate_limited) == 3  # threshold trips, never retried
    assert len(shorted) == 7  # remaining tasks fail-fast off-network
    assert all(r.attempts == 1 for r in rate_limited)
    assert all(r.attempts == 0 for r in shorted)


def test_success_resets_breaker_count(spark):
    def make_fetcher():
        state = {"i": 0}

        def fetch(url):
            state["i"] += 1
            # 2× 429 then a success, repeating: breaker (threshold 3)
            # must never trip
            return (429, None) if state["i"] % 3 else (200, "ok")

        return fetch

    rows = fetch_pages(
        _requests_df(spark, 9, parts=1),
        make_fetcher,
        breaker_threshold=3,
        backoff_base_s=0.0,
    ).collect()
    assert not [r for r in rows if r.error == "circuit_open"]
    assert len([r for r in rows if r.status == 200]) == 3
