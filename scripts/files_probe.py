#!/usr/bin/env python3
"""Files-scaling probe (r15, VERDICT r14 next-steps #8): pin the
SMALL-FILES posture of the ``binaryFile`` ingest paths by scaling the
FILE COUNT, not just the rows — ``read_warc_shard_files`` and
``read_ocf_files`` over real shards written to disk.

Two axes per reader:

1. constant corpus, 8× more files (64 → 512 shards of the same sf0.1
   rows) — isolates per-file overhead (open/list/decode-setup); a
   healthy file-parallel plan grows far slower than 8×;
2. 8× corpus in 8× files at CONSTANT shard size (64 → 512 shards of an
   8× id-offset union) — the production growth shape; a linear kernel
   holds ratio ≈ 8 ÷ min(8, free cores) plus listing overhead.

Usage: python scripts/files_probe.py → one JSON line per case.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from kafka_streams_common_spark.operators import avro as av  # noqa: E402
from kafka_streams_common_spark.operators import warc as w  # noqa: E402
from kafka_streams_common_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def _write_warc(docs, n_shards: int, out: Path) -> int:
    out.mkdir(parents=True, exist_ok=True)
    n = 0
    for r in w.encode_warc_shards(docs, n_shards=n_shards).collect():
        (out / f"shard-{r['shard_id']}.warc.gz").write_bytes(r["payload"])
        n += 1
    return n


def _write_ocf(orders, n_containers: int, out: Path) -> int:
    out.mkdir(parents=True, exist_ok=True)
    n = 0
    for r in av.encode_orders_ocf(orders, n_containers=n_containers).collect():
        (out / f"orders-{r['container_id']}.avro").write_bytes(r["payload"])
        n += 1
    return n


def _time(reader_df_builder) -> float:
    t0 = time.perf_counter()
    reader_df_builder().write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = get_spark("files-probe")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    docs8 = docs
    for k in range(1, 8):
        docs8 = docs8.unionAll(
            docs.select(
                (F.col("doc_id") + F.lit(k * 1_000_000)).alias("doc_id"),
                "text",
                "lang",
            )
        )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus",
        "o_orderpriority",
    )
    orders8 = orders
    for k in range(1, 8):
        orders8 = orders8.unionAll(
            orders.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(k * 100_000_000)
            )
        )

    root = Path(tempfile.mkdtemp(prefix="files_probe_"))
    cases = []
    try:
        dirs = {}
        for tag, frame, nsh in (
            ("warc_1x_64f", docs, 64),
            ("warc_1x_512f", docs, 512),
            ("warc_8x_512f", docs8, 512),
        ):
            d = root / tag
            nf = _write_warc(frame, nsh, d)
            dirs[tag] = (d, nf, "warc")
        for tag, frame, nc in (
            ("ocf_1x_64f", orders, 64),
            ("ocf_1x_512f", orders, 512),
            ("ocf_8x_512f", orders8, 512),
        ):
            d = root / tag
            nf = _write_ocf(frame, nc, d)
            dirs[tag] = (d, nf, "ocf")

        # warm-up (JVM, binaryFile source init)
        w.read_warc_shard_files(spark, str(dirs["warc_1x_64f"][0])).write.format(
            "noop"
        ).mode("overwrite").save()

        for tag, (d, nf, kind) in dirs.items():
            build = (
                (lambda d=d: w.read_warc_shard_files(spark, str(d)))
                if kind == "warc"
                else (lambda d=d: av.read_ocf_files(spark, str(d)))
            )
            times = [_time(build) for _ in range(3)]
            cases.append(
                {
                    "case": tag,
                    "n_files": nf,
                    "median_sec": sorted(times)[1],
                    "runs": times,
                }
            )
            print(json.dumps(cases[-1]), flush=True)
        by = {c["case"]: c["median_sec"] for c in cases}
        print(
            json.dumps(
                {
                    "warc_files_8x_overhead_ratio": round(
                        by["warc_1x_512f"] / by["warc_1x_64f"], 2
                    ),
                    "warc_corpus_8x_ratio": round(
                        by["warc_8x_512f"] / by["warc_1x_64f"], 2
                    ),
                    "ocf_files_8x_overhead_ratio": round(
                        by["ocf_1x_512f"] / by["ocf_1x_64f"], 2
                    ),
                    "ocf_corpus_8x_ratio": round(
                        by["ocf_8x_512f"] / by["ocf_1x_64f"], 2
                    ),
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
