#!/usr/bin/env python3
"""8x scale probe for the r14 wave-3d/4 operators (msgpack, cbor,
thrift, bz2/xz text, FLAC audio frames, parquet footer walk).

Same protocol as the earlier r14 wave probes recorded in SCALE.md: the
1x corpus is the sf0.1 fixture; the 8x corpus unions id-offset copies;
timings write to the noop sink (materializes every column). The ORC
roundtrip row is not probed — it is Spark's native writer/reader with
no custom kernel. The parquet-footer probe scales the FILE count
(1 -> 8 footers), the axis that grows at warehouse scale.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from kafka_streams_common_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def times_8(df, id_col):
    parts = [df]
    base = df.agg(F.max(id_col)).collect()[0][0] + 1
    for i in range(1, 8):
        parts.append(df.withColumn(id_col, F.col(id_col) + F.lit(i * base)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def noop_time(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    spark = get_spark("wave4-probe")
    from kafka_streams_common_spark.catalog import TableCatalog

    cat = TableCatalog.for_directory(SF)
    events = cat.resolve("events").read(spark)
    docs = cat.resolve("documents").read(spark)

    from kafka_streams_common_spark.operators.archive import (
        decode_bz2_xz_text_stats,
        encode_bz2_xz_docs,
    )
    from kafka_streams_common_spark.operators.cbor import (
        decode_events_cbor,
        encode_events_cbor,
    )
    from kafka_streams_common_spark.operators.flacaudio import (
        decode_flac_audio_stats,
        encode_flac_audio_docs,
    )
    from kafka_streams_common_spark.operators.msgpack import (
        decode_events_msgpack,
        encode_events_msgpack,
    )
    from kafka_streams_common_spark.operators.thriftcompact import (
        decode_events_thrift,
        encode_events_thrift,
    )

    cases = {
        "kafka_msgpack": (
            lambda d: decode_events_msgpack(encode_events_msgpack(d)),
            events,
            "event_id",
        ),
        "kafka_cbor": (
            lambda d: decode_events_cbor(encode_events_cbor(d)),
            events,
            "event_id",
        ),
        "kafka_thrift": (
            lambda d: decode_events_thrift(encode_events_thrift(d)),
            events,
            "event_id",
        ),
        "bz2_xz_text": (
            lambda d: decode_bz2_xz_text_stats(encode_bz2_xz_docs(d)),
            docs,
            "doc_id",
        ),
        "flac_audio": (
            lambda d: decode_flac_audio_stats(encode_flac_audio_docs(d)),
            docs,
            "doc_id",
        ),
    }
    for name, (fn, base, id_col) in cases.items():
        noop_time(fn(base))  # warm
        t1 = noop_time(fn(base))
        big = times_8(base, id_col)
        t8 = noop_time(fn(big))
        print(
            json.dumps(
                {"probe": name, "t1": round(t1, 2), "t8": round(t8, 2),
                 "ratio": round(t8 / t1, 1)}
            )
        )

    # parquet footer: scale the file count 1 -> 8
    from kafka_streams_common_spark.operators.parquetmeta import (
        parquet_footer_stats,
        read_parquet_files,
    )
    import tempfile

    nation = cat.resolve("nation").read(spark).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    for nfiles in (1, 8):
        d = tempfile.mkdtemp(prefix=f"kscs_probe_pq{nfiles}_")
        nation.repartition(nfiles).write.mode("overwrite").parquet(d)
        q = parquet_footer_stats(read_parquet_files(spark, d), "n_nationkey", "n_name")
        noop_time(q)
        t = noop_time(q)
        print(json.dumps({"probe": f"parquet_footer_{nfiles}files", "t": round(t, 2)}))


if __name__ == "__main__":
    main()
