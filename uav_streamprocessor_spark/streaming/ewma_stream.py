"""Streaming EWMA — the exact infinite-memory recursion behind the
batch finite-horizon screen (events_ops.ewma_deviation).

The recursion ewma_n = alpha*x_n + (1-alpha)*ewma_{n-1} is sequential
state: each output depends on every prior value, which no fixed lag()
bundle can express exactly. The batch operator truncates at horizon K
(tail weight (1-alpha)^K); this module carries the TRUE recursion as
per-user state — (ewma, n_seen), one double + one long per active user,
the smallest state in the streaming series next to packing's cumsum.

Emission contract mirrors the batch screen: every event emits with the
PRE-update smoothed value (`ewma_prev`) and |x - ewma_prev|; a user's
first event initializes state and emits a NULL deviation (the batch op
drops such rows via its den > 0 filter — the streaming feed keeps them
so downstream consumers see every event exactly once).

Reconciliation (pinned in tests): the batch operator restarts the
recursion at its oldest available lag, so it equals the true recursion
EXACTLY for events with <= horizon prior events, and differs by at most
(1-alpha)^(horizon-1) * the user's value range beyond that (<3% at the
defaults). Streaming == a sequential batch reference EXACTLY; equality
+ replay idempotence + batch-boundary invariance follow the
rate_limit_stream test pattern.

Ordering contract: same as every sequential-state module here —
per-key event-time order non-decreasing across micro-batches (log
replay); intra-batch order is sorted by the processor itself.

Scale: state is (double, long) per active user; each micro-batch
shuffles once on user_id and the per-group work is a linear scan of
that key's batch rows.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = (
    "user_id long, event_id long, ts_us long, value double, "
    "ewma_prev double, deviation double"
)
_STATE_SCHEMA = "ewma double, n_seen long"


def make_ewma_processor(alpha: float = 0.4):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ewma, n_seen = state.get if state.exists else (0.0, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts_us", "event_id"], ignore_index=True)
        prevs, devs = [], []
        for x in batch["value"]:
            x = float(x)
            if n_seen == 0:
                prevs.append(None)
                devs.append(None)
                ewma = x
            else:
                prevs.append(ewma)
                devs.append(abs(x - ewma))
                ewma = alpha * x + (1.0 - alpha) * ewma
            n_seen += 1
        state.update((float(ewma), int(n_seen)))
        yield pd.DataFrame(
            {
                "user_id": key[0],
                "event_id": batch["event_id"],
                "ts_us": batch["ts_us"],
                "value": batch["value"],
                "ewma_prev": prevs,
                "deviation": devs,
            }
        )

    return update


def _prepared(events: DataFrame) -> DataFrame:
    return events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("value").cast("double").alias("value"),
    )


def ewma_stream(events: DataFrame, alpha: float = 0.4) -> DataFrame:
    """Wire the stateful smoother onto a streaming events DataFrame."""
    return _prepared(events).groupBy("user_id").applyInPandasWithState(
        make_ewma_processor(alpha),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ewma_batch_reference(events: DataFrame, alpha: float = 0.4) -> DataFrame:
    """Exactness reference: the same sequential recursion over a bounded
    DataFrame via applyInPandas (whole history per key, no incremental
    state) — the backfill form, and the equality target for the stream."""
    proc = make_ewma_processor(alpha)

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        class _NoState:
            exists = False
            get = None

            def update(self, _):
                pass

        return next(proc(key, iter([pdf]), _NoState()))

    return _prepared(events).groupBy("user_id").applyInPandas(
        run, schema=_OUT_SCHEMA
    )
