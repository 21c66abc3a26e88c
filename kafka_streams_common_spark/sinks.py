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


def write_corpus_shards(
    df: DataFrame,
    path: str,
    shard_col: str,
    num_shards: int,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``num_shards`` range-partitioned parquet shards.

    ``shard_col`` orders the output globally (shard i's keys all precede
    shard i+1's); ``max_records_per_file`` additionally splits any shard
    that exceeds the row budget into multiple files.
    """
    out = df.repartitionByRange(num_shards, shard_col)
    writer = out.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
