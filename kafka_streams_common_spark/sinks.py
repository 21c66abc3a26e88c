"""Batch corpus output: size-bounded, layout-controlled parquet shards.

The write side of a training-data pipeline (the step after
``pipeline_curate_corpus``): training jobs want shards that are (a)
row-bounded so a dataloader can budget memory, (b) balanced so no reader
straggles, and (c) deterministically keyed so a run is reproducible.

Spark-first mapping: ``repartitionByRange`` on the shard key gives
balanced, globally-ordered output partitions from sampled range boundaries
(skew-resistant where hash-mod partitioning is not), and
``maxRecordsPerFile`` bounds rows per file regardless of executor count —
both scale-independent controls: the same call shapes 100 TB on 1000
executors and a fixture on local[32].
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_corpus_shards(
    df: DataFrame,
    path: str,
    shard_col: str,
    num_shards: int,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
    shard_id_col: str | None = None,
) -> None:
    """Write ``df`` as ``num_shards`` range-partitioned parquet shards.

    ``shard_col`` orders the output globally (shard i's keys all precede
    shard i+1's); ``max_records_per_file`` additionally splits any shard
    that exceeds the row budget into multiple files.

    ``shard_id_col``, when set, persists the shard index
    (``spark_partition_id()`` evaluated AFTER the range exchange) as a
    data column — shard provenance readers can rely on, instead of
    parsing Spark's ``part-NNNNN`` file-name convention, which is naming,
    not contract. Note ``repartitionByRange`` samples its boundaries, so
    on tiny/skewed input a range can legitimately come up empty and fewer
    than ``num_shards`` distinct ids (and files) appear — consumers
    should treat ``num_shards`` as an upper bound.
    """
    out = df.repartitionByRange(num_shards, shard_col)
    if shard_id_col is not None:
        out = out.withColumn(shard_id_col, F.spark_partition_id())
    writer = out.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
