"""Delimited bulk load with a DECLARED schema + transform-on-ingest.

S1/S2 (SURVEY §2.1): the reference bulk-loads TSV/CSV dumps with
per-column declared types (``clickhouse-client --query 'insert into
and.SONG FORMAT TSVWithNames'``, database/and_datasets.sql:7,177;
``FORMAT CSVWithNames`` with a custom delimiter at :177-192) and
splits packed string columns into arrays as part of ingest
(e.g. splitByChar on author lists).  Spark-first: ``spark.read.csv``
with an explicit StructType — schema inference is OFF (an extra full
scan at 100 TB, and silently wrong types on dirty rows) — and
transforms expressed as Column functions applied before the first
materialization so Catalyst fuses them into the scan projection.

``mode='PERMISSIVE'`` + ``columnNameOfCorruptRecord`` mirrors the
reference's tolerance of dirty dump lines without aborting the load.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_delimited(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    delimiter: str = "\t",
    header: bool = True,
    transforms: dict[str, Callable[[Column], Column]] | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Bulk-load a delimited file/directory with a declared schema.

    ``transforms`` maps column name -> Column function, applied on
    ingest (S2): e.g. ``{"authors": split_to_array(';')}``.  When
    ``keep_corrupt`` is set, unparseable lines land in a
    ``_corrupt_record`` column instead of being dropped.
    """
    if keep_corrupt:
        schema = T.StructType(
            list(schema.fields)
            + [T.StructField("_corrupt_record", T.StringType(), True)]
        )
    df = spark.read.csv(
        path,
        schema=schema,
        sep=delimiter,
        header=header,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record" if keep_corrupt else None,
        multiLine=False,
        escape='"',
    )
    for col, fn in (transforms or {}).items():
        df = df.withColumn(col, fn(F.col(col)))
    return df


def split_to_array(sep: str) -> Callable[[Column], Column]:
    """S2 transform: packed 'a;b;c' string -> array<string>, empties
    dropped (the splitByChar-on-ingest pattern,
    database/and_datasets.sql author lists)."""
    pat = re.escape(sep)

    def fn(c: Column) -> Column:
        return F.array_remove(F.split(F.coalesce(c, F.lit("")), pat), "")

    return fn


def write_delimited(
    df: DataFrame,
    path: str,
    delimiter: str = "\t",
    header: bool = True,
) -> None:
    """S6-style file export (the reference's `INTO OUTFILE ... FORMAT
    TSV`, database/pubmed_inner_outer_feature.sql:211)."""
    df.write.mode("overwrite").csv(
        path, sep=delimiter, header=header, escape='"'
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    transforms: dict[str, Callable[[Column], Column]] | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Bulk-load newline-delimited JSON with a DECLARED schema —
    the realistic transcript-dump ingest shape (conversation logs
    arrive as JSONL with NESTED objects: tool calls, metadata), where
    the reference knows only flat TSV (and_datasets.sql:7).

    Same discipline as ``read_delimited``: schema inference is OFF
    (an extra full scan at 100 TB and silently wrong types on dirty
    rows — Spark would sample-read every file just to guess), nested
    fields are declared as StructType so Catalyst prunes the JSON
    parse to the consumed subtree, and S2 transforms fuse into the
    scan projection.  PERMISSIVE mode tolerates dirty lines; with
    ``keep_corrupt`` they land in ``_corrupt_record``.
    """
    if keep_corrupt:
        schema = T.StructType(
            list(schema.fields)
            + [T.StructField("_corrupt_record", T.StringType(), True)]
        )
    reader = spark.read.schema(schema).option("mode", "PERMISSIVE")
    if keep_corrupt:
        reader = reader.option(
            "columnNameOfCorruptRecord", "_corrupt_record"
        )
    df = reader.json(path)
    for col, fn in (transforms or {}).items():
        df = df.withColumn(col, fn(F.col(col)))
    return df


def write_jsonl(df: DataFrame, path: str) -> None:
    """Export as newline-delimited JSON (one object per line; nested
    struct columns serialize as nested objects)."""
    df.write.mode("overwrite").json(path)
