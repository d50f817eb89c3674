"""UDTF + UDAF surface (SURVEY.md §2.2 "UDF/UDAF/UDTF").

The engine's hot paths deliberately avoid Python (built-ins and Arrow
batches everywhere — see pixel.py for the iterator-mapInPandas pattern);
these two exist to complete the extension-function API surface with the
idiomatic Spark 4 forms:

- a Python UDTF (lateral table function): per-row expansion where the
  row→rows logic is imperative. The bigram expansion here IS expressible
  with built-in transform (dedup.doc_ngram_sets does exactly that for
  the dedup hot path) — the UDTF variant demonstrates the API and is
  oracle-checked against the same semantics, so the two forms are
  provably interchangeable.
- a GROUPED_AGG pandas UDAF: a custom aggregate (quantity-weighted mean)
  that runs once per group over Arrow-delivered columns. Weighted mean
  IS also expressible as sum(x*w)/sum(w) — again deliberate: the oracle
  proves the UDAF against the relational form.

At scale: UDTF output is never wider than the built-in explode would be;
the UDAF is NOT map-side combinable (unlike built-in aggregates Spark
can't split a black-box Python aggregate into partial+merge), so a
skewed group lands whole on one executor — use built-ins when the
aggregate decomposes, reserve GROUPED_AGG for genuinely custom math.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf


class BigramExpand:
    """Lateral table function: one input text row → (position, bigram)
    rows. Plain Python generator semantics, pickled row transport.
    Decorated lazily — @udtf parses its DDL schema eagerly and needs an
    active session, so module import must stay session-free."""

    def eval(self, text: str):
        if text is None:
            return
        words = text.split(" ")
        for i in range(len(words) - 1):
            yield i, words[i] + " " + words[i + 1]


def top_bigrams_udtf(spark: SparkSession, k: int = 20) -> DataFrame:
    """Top-k bigrams via the UDTF in a LATERAL join — the Spark 4 table-
    function form of what doc_ngram_sets does with built-ins."""
    spark.udtf.register(
        "bigram_expand", udtf(BigramExpand, returnType="pos int, gram string")
    )
    return spark.sql(
        f"""
        SELECT gram, CAST(count(*) AS BIGINT) AS n
        FROM documents, LATERAL bigram_expand(text)
        GROUP BY gram
        ORDER BY n DESC, gram
        LIMIT {int(k)}
        """
    )


# DataType object, not a DDL string: string returnTypes parse eagerly at
# import and need an active session
@pandas_udf(T.DoubleType())
def _weighted_mean_price(price: pd.Series, qty: pd.Series) -> float:
    return float(np.average(price.to_numpy(), weights=qty.to_numpy()))


# Spark disallows mixing GROUPED_AGG pandas UDFs with built-in aggregates
# in one agg() ([INVALID_PANDAS_UDF_PLACEMENT]) — the companion count is a
# pandas UDAF too
@pandas_udf(T.LongType())
def _group_size(price: pd.Series) -> int:
    return len(price)


def weighted_price_by_flag(spark: SparkSession) -> DataFrame:
    """Quantity-weighted mean extended price per return flag via the
    GROUPED_AGG pandas UDAF; rounded to 4dp so the oracle's
    sum(x*w)/sum(w) (different summation order) hash-matches."""
    return (
        spark.table("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(
                _weighted_mean_price(F.col("l_extendedprice"), F.col("l_quantity")),
                4,
            ).alias("weighted_avg_price"),
            _group_size(F.col("l_extendedprice")).alias("n_items"),
        )
        .orderBy("l_returnflag")
    )
