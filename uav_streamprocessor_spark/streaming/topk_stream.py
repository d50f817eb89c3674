"""Streaming space-saving top-k — per-event-type heavy-hitter users
maintained as bounded state (Metwally et al., ICDT'05), the streaming
twin of the batch mergeable approx-top-k rollup (ev_topk_users_rollup /
operators/sketches.py).

State per key (event_type): m = `capacity` counters, each
(item, est_count, error). Update rule: a tracked item increments; an
untracked item takes over the MINIMUM counter — est_count = min+1,
error = min (the classic overestimate bound). Guarantees carried by
construction and pinned in tests:

- est_count − error ≤ true_count ≤ est_count for every tracked item;
- any item with true frequency > n/m is guaranteed tracked;
- with capacity ≥ distinct items the summary is EXACT (error 0), so the
  stream must equal a plain batch groupBy count — the exactness gate.

Determinism: eviction ties break on (est_count, error, item) — smallest
triple loses — and each key's batch rows are processed in (ts_us,
event_id) order, so the summary after any prefix of the time-ordered
feed is a pure function of that prefix: batch boundaries and intra-batch
arrival order are irrelevant, replay is idempotent (same tests pattern
as rate_limit/ewma streams).

Emission contract: after each micro-batch, a key emits its CURRENT
summary rows (event_type, user_id, est_count, error, n_seen) tagged
with a per-key update sequence — a monitoring snapshot per batch, the
shape a heavy-hitter dashboard consumes. Downstream dedup keys on the
latest update_seq per event_type.

Scale: state is m triples per event type — independent of event volume
(the point of the summary); each micro-batch shuffles once on
event_type and the per-group work is a dict-based linear scan.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = (
    "event_type string, user_id long, est_count long, error long, "
    "n_seen long, update_seq long"
)
_STATE_SCHEMA = (
    "items array<long>, counts array<long>, errors array<long>, "
    "n_seen long, update_seq long"
)

DEFAULT_CAPACITY = 8


def _evict_index(items, counts, errors):
    """Index of the counter an untracked item replaces: smallest
    (est_count, error, item) — deterministic under ties."""
    best = 0
    for i in range(1, len(items)):
        a = (counts[i], errors[i], items[i])
        if a < (counts[best], errors[best], items[best]):
            best = i
    return best


def make_topk_processor(capacity: int = DEFAULT_CAPACITY):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, errors, n_seen, seq = state.get
            items, counts, errors = list(items), list(counts), list(errors)
        else:
            items, counts, errors, n_seen, seq = [], [], [], 0, 0
        pos = {it: i for i, it in enumerate(items)}
        # r18 (guide §4.2): np.lexsort + list iteration instead of pandas
        # sort_values + Series iteration — this key's group is the whole
        # event-type partition (25k rows at bench scale), so per-row
        # Series overhead was the body. event_id is unique, so the
        # processing order (which eviction depends on) is identical.
        pdfs = list(pdfs)
        batch = pdfs[0] if len(pdfs) == 1 else pd.concat(pdfs, ignore_index=True)
        order = np.lexsort(
            (batch["event_id"].to_numpy(), batch["ts_us"].to_numpy())
        )
        for uid in batch["user_id"].to_numpy()[order].tolist():
            n_seen += 1
            i = pos.get(uid)
            if i is not None:
                counts[i] += 1
            elif len(items) < capacity:
                pos[uid] = len(items)
                items.append(uid)
                counts.append(1)
                errors.append(0)
            else:
                i = _evict_index(items, counts, errors)
                del pos[items[i]]
                pos[uid] = i
                errors[i] = counts[i]
                counts[i] += 1
                items[i] = uid
        seq += 1
        state.update((items, counts, errors, int(n_seen), int(seq)))
        order = sorted(
            range(len(items)), key=lambda i: (-counts[i], errors[i], items[i])
        )
        yield pd.DataFrame(
            {
                "event_type": key[0],
                "user_id": [items[i] for i in order],
                "est_count": [counts[i] for i in order],
                "error": [errors[i] for i in order],
                "n_seen": int(n_seen),
                "update_seq": int(seq),
            }
        )

    return update


def _prepared(events: DataFrame) -> DataFrame:
    return events.select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "user_id",
    )


def topk_stream(events: DataFrame, capacity: int = DEFAULT_CAPACITY) -> DataFrame:
    """Wire the space-saving summary onto a streaming events DataFrame."""
    return _prepared(events).groupBy("event_type").applyInPandasWithState(
        make_topk_processor(capacity),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def topk_batch_reference(
    events: DataFrame, capacity: int = DEFAULT_CAPACITY
) -> DataFrame:
    """Sequential reference: the same processor over each key's whole
    history in one pass (the backfill form; equality target for the
    final stream snapshot)."""
    proc = make_topk_processor(capacity)

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        class _NoState:
            exists = False
            get = None

            def update(self, _):
                pass

        return next(proc(key, iter([pdf]), _NoState()))

    return _prepared(events).groupBy("event_type").applyInPandas(
        run, schema=_OUT_SCHEMA
    )


def latest_snapshot(out: DataFrame) -> DataFrame:
    """The per-type summary as of the last processed batch (max
    update_seq per event_type) — what a dashboard reads. Windowed
    rather than self-joined: a self-join of a memory-sink table trips
    conflicting-attribute analysis, and the partitioned max is one
    shuffle anyway."""
    from pyspark.sql import Window

    w = Window.partitionBy("event_type")
    return (
        out.withColumn("max_seq", F.max("update_seq").over(w))
        .filter(F.col("update_seq") == F.col("max_seq"))
        .drop("max_seq")
    )
