"""JSONL (newline-delimited JSON) corpus source and sink.

The lingua franca of training-data exchange: one JSON object per line,
gzip-compressed in shards.  Everything here is Spark-native JVM JSON —
``to_json`` / ``from_json`` / ``spark.read.json`` — so serialization
never drops into Python and the reader keeps Spark's splittable-scan +
schema-projection behavior (an explicit schema also means the reader
never pays the inference pre-pass over 100 TB).

Malformed-line policy mirrors web-scale reality: ``parse_jsonl_lines``
keeps a ``_corrupt`` column (PERMISSIVE mode) instead of failing the job
on the one truncated shard in a million.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

DOC_SCHEMA = "doc_id BIGINT, text STRING, lang STRING, source STRING"


def to_jsonl_lines(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """One JSON-object line per row over ``cols`` (single ``line`` column).
    ``to_json`` writes struct-field order, so passing the same ``cols``
    tuple gives byte-stable lines for a fixed Spark version."""
    return df.select(
        F.to_json(F.struct(*[F.col(c) for c in cols])).alias("line")
    )


def parse_jsonl_lines(
    lines: DataFrame,
    schema: str | StructType = DOC_SCHEMA,
    line_col: str = "line",
) -> DataFrame:
    """Parse JSONL lines under an explicit schema.  Unparseable lines
    yield NULL fields plus the raw line in ``_corrupt`` (the PERMISSIVE
    ``columnNameOfCorruptRecord`` contract — a malformed non-empty line
    parses to an all-null struct, NOT a null struct, so a bare
    ``isNull`` check misses it; only the corrupt-record column is
    authoritative).  Empty/whitespace lines come back as a null struct
    and are folded into ``_corrupt`` too — count them, don't crash."""
    if isinstance(schema, StructType):
        full = schema.add("_corrupt", "string")
    else:
        full = f"{schema}, _corrupt STRING"
    parsed = lines.select(
        F.from_json(
            F.col(line_col),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("r"),
        F.col(line_col),
    )
    data_fields = [f for f in parsed.select("r.*").columns if f != "_corrupt"]
    return parsed.select(
        *[F.col(f"r.{f}").alias(f) for f in data_fields],
        F.coalesce(
            F.col("r._corrupt"),
            F.when(F.col("r").isNull(), F.col(line_col)),
        ).alias("_corrupt"),
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    cols: tuple[str, ...] = ("doc_id", "text", "lang", "source"),
    compression: str = "gzip",
) -> None:
    """Sharded .jsonl(.gz) export: one file per partition, written by the
    JVM text sink (task-attempt temp names + commit rename, so job
    retries never leave torn shards).  Repartition upstream to set the
    shard count/size — e.g. ``df.repartitionByRange(n, "doc_id")`` for
    sorted shards."""
    to_jsonl_lines(df, cols).write.mode("overwrite").option(
        "compression", compression
    ).text(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | StructType = DOC_SCHEMA,
) -> DataFrame:
    """Read a JSONL shard directory under an explicit schema (PERMISSIVE;
    corrupt lines land in ``_corrupt_record`` if that column is added to
    the schema).  gzip shards are non-splittable — one task per shard —
    which is why :func:`write_jsonl` leaves shard sizing to the caller."""
    return spark.read.schema(schema).json(path)
