"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.8 note: "no mapGroupsWithState analog beyond J1" — this IS
that analog, the arbitrary-state path for semantics the built-in
windows can't express).

``price_change_stream`` keeps one number per key (last seen numeric
price) in GroupState and emits a row per observed change — the
streaming twin of the merge's W1 detection, but incremental: state is
O(|keys| × 1 value), each micro-batch touches only its own keys, and
nothing is re-folded. At 100 TB of history the foreachBatch merge
rewrites state per batch; this operator is the bounded-memory
alternative when only the *change feed* is needed downstream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("offer_id", T.LongType()),
        T.StructField("change_ts", T.TimestampType()),
        T.StructField("old_price", T.DoubleType()),
        T.StructField("new_price", T.DoubleType()),
        T.StructField("price_diff", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("last_price", T.DoubleType())])


def _detect(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    last = state.get[0] if state.exists else None
    out: list[pd.DataFrame] = []
    for pdf in pdfs:
        # event-time order within the batch (micro-batch rows arrive
        # unordered); cross-batch order is the source's file order.
        # na_position='first' mirrors the batch merge's
        # asc_nulls_first ordering (W4: undated rows fold BEFORE
        # dated ones)
        pdf = pdf.sort_values(
            ["updated_date", "event_id"], na_position="first"
        )
        # Vectorized fold (same per-chunk semantics as the former
        # iterrows loop, which cost ~1 s of Python per micro-batch):
        # NaN-price rows never update `last` nor emit, so the fold is
        # a shift over the non-NaN price subsequence seeded with the
        # carried state. W4 parity: a row without updated_date merges
        # fields (it becomes the new `last` below) but emits ZERO CDC
        # — the batch W1 predicate gates on upd.isNotNull().
        prices = pdf["price_value"].astype("float64")
        seen = prices.notna()
        if not seen.any():
            continue
        prices = prices[seen]
        upds = pdf["updated_date"][seen]
        prev = prices.shift(1)
        if last is not None:
            prev.iloc[0] = float(last)
        chg = prev.notna() & (prices != prev) & upds.notna()
        if chg.any():
            new_p = prices[chg]
            old_p = prev[chg]
            out.append(
                pd.DataFrame(
                    {
                        "offer_id": int(key[0]),
                        "change_ts": upds[chg].to_numpy(),
                        "old_price": old_p.to_numpy(),
                        "new_price": new_p.to_numpy(),
                        # int() truncates toward zero; astype int64 on
                        # float64 is the same C cast
                        "price_diff": new_p.astype("int64").to_numpy()
                        - old_p.astype("int64").to_numpy(),
                    }
                )
            )
        last = float(prices.iloc[-1])
    if last is not None:
        state.update((last,))
    if out:
        yield pd.concat(out, ignore_index=True)


def price_change_stream(snapshots: DataFrame) -> DataFrame:
    """W1 as an incremental stateful operator: one GroupState value per
    key, change rows appended as they are observed. Null keys are
    filtered like the batch merge filters them — Spark groups them
    into one (None,) group whose emit path would poison-pill the
    stream with int(None) on every restart replay."""
    from pyspark.sql import functions as F

    snapshots = snapshots.where(F.col("offer_id").isNotNull())
    return snapshots.groupBy("offer_id").applyInPandasWithState(
        _detect,
        outputStructType=CHANGE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
