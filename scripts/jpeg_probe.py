#!/usr/bin/env python3
"""8x scale probe for the r15 JPEG pipelines (flat decode engine +
fan_out): gray recon, color recon (DRI restarts), progressive gate at
the registered equality_mod=4 sub-lake.

Same protocol as the wave probes recorded in SCALE.md: the 1x corpus
is the sf0.1 documents fixture; the 8x corpus unions id-offset copies
(the text column is salted per copy so every row encodes a DISTINCT
image — an id-only offset would re-encode identical payloads and
flatter the cache); timings write to the noop sink.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from kafka_streams_common_spark.operators.jpeg import (  # noqa: E402
    decode_jpeg_color_recon_report,
    decode_jpeg_recon_report,
    encode_jpeg,
    encode_jpeg_color,
    jpeg_progressive_report,
)
from kafka_streams_common_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def times_8(df):
    parts = [df]
    base = df.agg(F.max("doc_id")).collect()[0][0] + 1
    for i in range(1, 8):
        parts.append(
            df.select(
                (F.col("doc_id") + F.lit(i * base)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" copy{i}")).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def noop_time(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    spark = get_spark("jpeg-probe")
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    docs8 = times_8(docs)

    cases = {
        "jpeg_gray_recon": lambda d: decode_jpeg_recon_report(encode_jpeg(d)),
        "jpeg_color_recon": lambda d: decode_jpeg_color_recon_report(
            encode_jpeg_color(d, restart_interval=2)
        ),
        "jpeg_progressive_mod4": lambda d: jpeg_progressive_report(
            d, equality_mod=4
        ),
    }
    # warm-up
    noop_time(cases["jpeg_gray_recon"](docs))
    for name, build in cases.items():
        t1 = noop_time(build(docs))
        t8 = noop_time(build(docs8))
        print(
            json.dumps(
                {
                    "op": name,
                    "t_1x": round(t1, 2),
                    "t_8x": round(t8, 2),
                    "ratio": round(t8 / t1, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
