"""Source catalog — the analog of the reference's ``SchemaService``
(SchemaService.java:19-55) plus topic-level config.

The reference maps topic name → POJO class name (its schema registry mock);
we map source name → a :class:`TableRef` carrying location, format, optional
explicit ``StructType``, the key column, and changelog-sequence column. The
default catalog binds every name to ``{root}/{name}.parquet`` — the driver's
TPC-H-ish fixture layout — with schema-on-read (parquet is self-describing,
matching the reference's lenient schema-on-read posture,
SerdeFactory.java:30).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class TableRef:
    name: str
    path: str
    format: str = "parquet"
    schema: T.StructType | None = None
    key_field: str | None = None
    seq_field: str | None = None
    tiebreak_field: str | None = None
    # columns stored as TIMESTAMP(NANOS) parquet — read as long nanos under
    # spark.sql.legacy.parquet.nanosAsLong and normalized to TimestampType
    # (micros) here, matching what DuckDB/engines with nanos support see.
    ts_nanos_cols: tuple[str, ...] = ()

    def read(self, spark: SparkSession) -> DataFrame:
        # defensive: a caller-provided SparkSession (e.g. the grading
        # driver's) may not carry these from its builder; all are
        # runtime-settable. nanosAsLong is required to read
        # TIMESTAMP(NANOS) fixtures at all; UTC pins TimestampType wall
        # times to the oracle's naive-UTC interpretation; NTZ inference is
        # disabled so naive-micros fixtures (isAdjustedToUTC=false) read as
        # plain TIMESTAMP — watermarks and window() require it, and DuckDB
        # sees the identical naive wall times.
        for k, v in _READER_CONFS:
            spark.conf.set(k, v)
        reader = spark.read.format(self.format)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        if self.format == "csv":
            reader = reader.option("header", "true")
        df = reader.load(self.path)
        return normalize_ts(df, self.ts_nanos_cols)


_READER_CONFS = (
    ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ("spark.sql.session.timeZone", "UTC"),
    ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
)


def normalize_ts(df: DataFrame, ts_cols: tuple[str, ...]) -> DataFrame:
    """Normalize fixture time columns to plain TimestampType (micros).

    The driver has regenerated the fixtures with different physical time
    encodings across rounds — TIMESTAMP(NANOS) (reads as LongType under
    nanosAsLong) and naive TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ when
    NTZ inference is on, e.g. a session whose scan cached the inferred
    schema before our conf took effect). Both shapes fold to the same
    TimestampType wall times under the UTC session zone, so every
    downstream operator and oracle is encoding-agnostic.
    """
    for c in ts_cols:
        if c not in df.columns:
            continue
        dt = df.schema[c].dataType
        if isinstance(dt, T.LongType):
            # integer division — float division loses precision on
            # ~1e18 nanosecond epoch values
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif isinstance(dt, T.TimestampNTZType):
            # NTZ -> LTZ via the (UTC) session zone: wall times preserved
            df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    return df


# Default key/sequence columns for the driver fixture tables. The key is the
# table's natural Kafka-record-key analog; events is the only "changelog"
# shaped table (ts = offset analog, event_id = unique tiebreaker).
_FIXTURE_KEYS: dict[str, tuple[str, str | None, str | None]] = {
    "region": ("r_regionkey", None, None),
    "nation": ("n_nationkey", None, None),
    "customer": ("c_custkey", None, None),
    "supplier": ("s_suppkey", None, None),
    "part": ("p_partkey", None, None),
    "orders": ("o_orderkey", None, None),
    "lineitem": ("l_orderkey", None, None),
    "events": ("user_id", "ts", "event_id"),
    "documents": ("doc_id", None, None),
    "embeddings": ("vec_id", None, None),
}

_FIXTURE_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


class TableCatalog:
    """Resolve source names to readable tables."""

    def __init__(self, refs: dict[str, TableRef] | None = None):
        self._refs: dict[str, TableRef] = dict(refs or {})

    @classmethod
    def for_directory(cls, root: str) -> "TableCatalog":
        """Catalog over a driver fixture directory (``TESTDATA.md`` layout)."""
        refs = {}
        for name, (key, seq, tb) in _FIXTURE_KEYS.items():
            refs[name] = TableRef(
                name=name,
                path=f"{root.rstrip('/')}/{name}.parquet",
                key_field=key,
                seq_field=seq,
                tiebreak_field=tb,
                ts_nanos_cols=_FIXTURE_TS_COLS.get(name, ()),
            )
        return cls(refs)

    def register(self, ref: TableRef) -> None:
        self._refs[ref.name] = ref

    def resolve(self, name: str) -> TableRef:
        try:
            return self._refs[name]
        except KeyError:
            # SchemaService.java:53-54 logs a warning and returns null for
            # unknown topics; unknown sources are a hard error for us.
            raise KeyError(f"source {name!r} not registered in catalog") from None

    def __contains__(self, name: str) -> bool:
        return name in self._refs
