"""Streaming sequence packing — the training-batch assembler as it runs
on an INGEST feed, completing the packing story from operators/packing.py
(batch) with the applyInPandasWithState member of the streaming-state
series (dedup/sketch/k-means/curation/ANN/rate-limit streams).

Semantics: identical to the batch packer — documents are concatenated
per hash shard in doc_id order and cut every `budget` tokens; a doc may
straddle a sequence boundary. The ONLY state is one long per shard (the
shard's cumulative token count), because a sequence assignment depends
on nothing but the tokens packed before it: seq_id = cum_before / budget,
seq_id_last = (cum_after - 1) / budget.

Ordering contract (same shape as rate_limit_stream): per-shard doc_id
order must be non-decreasing ACROSS micro-batches — the natural shape,
since ingest order IS corpus order; within a batch the processor sorts
by doc_id itself, so intra-batch arrival order and batch boundaries are
irrelevant (tests rotate both). Under that contract the streaming
assignments EQUAL the batch window form on the full feed — proven in
tests/test_packing_stream.py via the shared pack_summary roll-up — and
replay with the same checkpoint is idempotent.

Scale: one shuffle per micro-batch on the shard key (16-4096 keys, the
data-loader worker unit); per-shard work is a linear scan of that
shard's batch rows; state is O(shards) longs total — the smallest state
of any member of the series.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from uav_streamprocessor_spark.operators.packing import doc_tokens_shard

_OUT_SCHEMA = "doc_id long, shard int, n_tokens long, seq_id long, seq_id_last long"
_STATE_SCHEMA = "cum long"


def make_packer(budget: int = 512):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cum = state.get[0] if state.exists else 0
        # r18 (guide §4.2 at per-key granularity): numpy argsort + list
        # iteration instead of pandas concat/sort_values/Series walk —
        # doc_id is unique, so the packing order is identical and the
        # cumulative-token recursion is untouched.
        pdfs = list(pdfs)
        batch = pdfs[0] if len(pdfs) == 1 else pd.concat(pdfs, ignore_index=True)
        doc_ids = batch["doc_id"].to_numpy()
        order = np.argsort(doc_ids, kind="stable")
        doc_ids = doc_ids[order]
        n_tok = batch["n_tokens"].to_numpy()[order]
        seq_id, seq_last = [], []
        for n in n_tok.tolist():
            seq_id.append(cum // budget)
            cum += n
            seq_last.append((cum - 1) // budget)
        state.update((int(cum),))
        yield pd.DataFrame(
            {
                "doc_id": doc_ids,
                "shard": key[0],
                "n_tokens": n_tok,
                "seq_id": seq_id,
                "seq_id_last": seq_last,
            }
        )

    return update


def packed_stream(
    docs: DataFrame, budget: int = 512, n_shards: int = 16
) -> DataFrame:
    """Wire the stateful packer onto a streaming documents DataFrame.
    Emits one staged-assignment row per document (the same schema the
    batch packer's window stage produces); roll up with
    packing.pack_summary for the per-sequence table."""
    return (
        doc_tokens_shard(docs, n_shards)
        .groupBy("shard")
        .applyInPandasWithState(
            make_packer(budget),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
