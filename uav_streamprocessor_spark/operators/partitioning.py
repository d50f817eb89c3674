"""Scale-adaptive input spreading for CPU-heavy scan-side stages.

The optimization-guide "input skew" case (§2.5): a scan that arrives in
fewer partitions than the cluster has cores serializes every expensive
per-row projection above it — one huge unsplittable file (or a
single-row-group parquet fixture) runs the whole md5/UDF/Arrow stage on
one core while the rest of the cluster idles. The fix is to repartition
immediately after the read, BUT only when the scan is actually narrow:
a blanket repartition at production scale would add a full shuffle of
the corpus in front of inputs that already carry thousands of splits.

`spread_scan` is therefore a conditional: it inspects the physical scan
partitioning and repartitions only when the input has fewer partitions
than `spark.sparkContext.defaultParallelism`. At the 100 TB design
point the condition never fires (scans are split by
spark.sql.files.maxPartitionBytes into far more tasks than cores); on a
single-file fixture it costs one exchange of the raw rows and buys
stage-wide parallelism for everything above.

The repartition uses an EXPLICIT partition count (REPARTITION_BY_NUM),
which AQE neither coalesces nor local-read-collapses — an unpinned
repartition(col) would be coalesced right back to one partition at
fixture sizes (advisoryPartitionSizeInBytes >> input bytes). Keys are
stable input columns (never rand()-derived — retried tasks must
reproduce the same row placement, SPARK-38388).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition `df` to defaultParallelism iff its physical plan
    yields fewer partitions — a no-op on well-split production inputs.

    `keys`: stable high-cardinality columns to hash-partition by
    (avoids the local sort a round-robin repartition pays,
    spark.sql.execution.sortBeforeRepartition); pass none for
    round-robin when no natural key exists.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if keys:
        return df.repartition(target, *keys)
    return df.repartition(target)
