"""File-format sources beyond parquet: JSONL and CSV.

Crawl and annotation pipelines deliver JSONL; exports deliver CSV.
Always pass an explicit schema at scale — schema inference reads the
data twice and silently widens types; with a schema the read is a
single pass and malformed rows are quarantined instead of poisoning
the load (PERMISSIVE + ``_corrupt_record``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read newline-delimited JSON. ``mode``: PERMISSIVE (quarantine bad
    rows to ``_corrupt_record``), DROPMALFORMED, or FAILFAST."""
    reader = spark.read.option("mode", mode)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite", compression: str | None = "gzip") -> None:
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    delimiter: str = ",",
    mode: str = "PERMISSIVE",
    options: dict | None = None,
) -> DataFrame:
    """``options`` passes extra reader options through verbatim — for
    text corpora the load-bearing ones are ``multiLine`` (quoted
    embedded newlines; forces whole-file parsing, so pair with many
    files at scale) and ``escape='"'`` (RFC 4180 doubled quotes —
    Spark's default escape is backslash, which round-trips only with
    its own writer set the same way)."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", mode)
    )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True,
              options: dict | None = None) -> None:
    writer = df.write.mode(mode).option("header", str(header).lower())
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.csv(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """Read ORC (columnar alternative to parquet; Spark's reader does the
    same predicate pushdown + column pruning, so operators are
    format-agnostic). Pass a schema to skip footer-based inference on
    wide datasets."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_text(
    spark: SparkSession, path: str, whole_file: bool = False
) -> DataFrame:
    """Raw text corpora: one row per line (default) or per file
    (``whole_file`` — the unit crawl/annotation dumps usually need).
    Returns a single ``value`` string column; at scale pair with an
    explicit repartition — one huge text file is otherwise one
    partition (line mode splits on block boundaries, whole-file mode
    cannot split at all)."""
    return spark.read.text(path, wholetext=whole_file)


def read_parquet_evolving(spark: SparkSession, *paths: str) -> DataFrame:
    """Parquet read across schema generations (``mergeSchema``): columns
    added over time union by name, older files surface typed NULLs for
    columns they predate.

    At 100 TB schema merging footer-scans every file — expensive, so the
    steady state is a table format (Delta/Iceberg) that tracks schema in
    metadata; this reader is the raw-parquet migration path (backfills,
    one-off reads across an evolution boundary). Pair with explicit
    ``.select`` downstream so new columns don't silently widen consumers.
    """
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def read_parquet_resilient(
    spark: SparkSession, *paths: str, quarantine: str | None = None
) -> DataFrame:
    """Parquet read that survives corrupt files in the dataset.

    A 100 TB ingest directory WILL contain the occasional truncated or
    half-uploaded file; the default reader fails the whole job on the
    first bad footer. This reader sets ``ignoreCorruptFiles`` for the
    scan, and (optionally) first probes every file's footer driver-side
    via pyarrow, moving unreadable files into ``quarantine/`` so the bad
    payloads are preserved for forensics instead of silently skipped.
    The probe is metadata-only (no data pages); at cluster scale the
    same probe runs as a parallel job over the file listing.
    """
    if quarantine is not None:
        import os
        import shutil

        import pyarrow.parquet as pq

        os.makedirs(quarantine, exist_ok=True)
        for p in paths:
            for root, _dirs, files in os.walk(p):
                for f in files:
                    if not f.endswith(".parquet"):
                        continue
                    fp = os.path.join(root, f)
                    try:
                        pq.ParquetFile(fp).metadata
                    except Exception:
                        # preserve the relative path: identically-named
                        # part files under different partition dirs must
                        # not overwrite each other in quarantine — the
                        # payload exists for forensics
                        rel = os.path.relpath(fp, p)
                        dest = os.path.join(quarantine, rel)
                        os.makedirs(os.path.dirname(dest) or quarantine, exist_ok=True)
                        shutil.move(fp, dest)
    return (
        spark.read.option("ignoreCorruptFiles", "true")
        .option("mergeSchema", "true")
        .parquet(*paths)
    )
