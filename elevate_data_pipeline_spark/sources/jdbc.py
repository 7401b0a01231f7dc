"""JDBC compat source/sink — the reference's native access path.

Reference S1 runs an arbitrary SQL string on Postgres and loads the result
(``readFromPostgres``, mentoringFunction2.scala:20-28: ``dbtable =
"($query) as subquery"``); S5 appends to a sink table (ibid:269-278).

These are thin, driver-free wrappers; the local test environment has no
Postgres, so they are exercised only by unit tests that assert option
wiring, not round-trips. At scale, prefer ``partition_column`` bounds so
the read parallelizes instead of funneling through one connection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_query(
    spark: SparkSession,
    url: str,
    query: str,
    user: str,
    password: str,
    driver: str = "org.postgresql.Driver",
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
):
    """Pushed-down JDBC sub-query read (reference S1)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"({query}) as subquery")
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader


def write_jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "org.postgresql.Driver",
    schema_mode: str = "raw",
):
    """Append writer to a JDBC sink table (reference S5). Returns the
    configured writer; caller invokes ``.save()``.

    The reference appends with no schema check at all
    (mentoringFunction2.scala:269-278) — a drifted frame either errors
    deep in the JDBC layer or, worse, silently lands in the wrong
    columns. ``schema_mode`` makes the contract explicit:

    - ``"raw"`` (default): reference behavior, no check;
    - ``"strict"``: read the sink's schema first (a metadata-only JDBC
      read) and raise ``ValueError`` naming the drift before any row is
      written;
    - ``"lenient"``: project the frame onto the sink's columns — extra
      frame columns are dropped, missing sink columns fill with typed
      NULLs, types are cast to the sink's.

    A sink table that does not exist yet passes every mode (the append
    creates it).
    """
    if schema_mode not in ("raw", "strict", "lenient"):
        raise ValueError(f"schema_mode must be raw|strict|lenient, got {schema_mode!r}")
    if schema_mode != "raw":
        try:
            existing = (
                df.sparkSession.read.format("jdbc")
                .option("url", url)
                .option("dbtable", table)
                .option("user", user)
                .option("password", password)
                .option("driver", driver)
                .load()
                .schema
            )
        except Exception:
            existing = None  # first write creates the table
        if existing is not None:
            sink_types = {f.name: f.dataType for f in existing.fields}
            frame_cols = set(df.columns)
            missing = [c for c in sink_types if c not in frame_cols]
            extra = [c for c in df.columns if c not in sink_types]
            if schema_mode == "strict":
                if missing or extra:
                    raise ValueError(
                        f"schema drift appending to {table}: "
                        f"sink columns missing from frame={missing}, "
                        f"frame columns unknown to sink={extra}"
                    )
            else:
                from pyspark.sql import functions as F

                df = df.select(
                    *[
                        F.col(c).cast(t).alias(c)
                        if c in frame_cols
                        else F.lit(None).cast(t).alias(c)
                        for c, t in sink_types.items()
                    ]
                )
    return (
        df.write.format("jdbc")
        .mode("append")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
    )


import re

_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _safe_ident(name: str, kind: str = "identifier") -> str:
    """Validate a SQL identifier before it is interpolated into
    driver-side DDL/MERGE text. Config-sourced table/key names are an
    injection surface otherwise; one chokepoint keeps the rule uniform."""
    if not _IDENT_RE.match(name):
        raise ValueError(f"unsafe SQL {kind}: {name!r}")
    return name


# see write_jdbc_upsert: test-only fault-injection hook
_between_stage_and_merge = None


def write_jdbc_upsert(
    df: DataFrame,
    url: str,
    table: str,
    keys: list[str],
    user: str,
    password: str,
    driver: str = "org.postgresql.Driver",
) -> None:
    """Idempotent JDBC upsert: stage the frame, then one SQL ``MERGE``.

    The append sink (reference S5) duplicates rows when a batch is
    replayed — fatal for a streaming sink with at-least-once delivery.
    This writer is replay-safe:

    1. the frame is deduplicated per key (greatest non-key tuple wins —
       deterministic regardless of partition order);
    2. it writes a staging table with a per-invocation unique suffix
       (plain JDBC write, parallel executors) — two concurrent writers
       upserting the same target can never clobber each other's staged
       rows mid-MERGE;
    3. one driver-side ``MERGE INTO target USING stage`` statement
       updates matches and inserts the rest — transactional in the
       target database, and a no-op when re-run with the same staging
       content. The staging table is dropped afterwards (best-effort
       even when the MERGE fails).

    Table, key, and column names are validated as plain SQL identifiers
    before any interpolation (:func:`_safe_ident`) — names arriving from
    untrusted config cannot smuggle SQL into the driver-side statements.

    At scale the staging write is the only data movement (executor-
    parallel JDBC inserts); the MERGE is set-based SQL inside the sink
    database, not a row loop on the Spark driver.
    """
    import uuid

    from pyspark.sql import functions as F

    _safe_ident(table, "table name")
    for c in df.columns:
        _safe_ident(c, "column name")
    for k in keys:
        if k not in df.columns:
            raise ValueError(f"upsert key {k!r} not in frame columns {df.columns}")

    non_keys = [c for c in df.columns if c not in keys]
    if non_keys:
        picked = df.groupBy(*keys).agg(
            F.max(F.struct(*non_keys)).alias("_m")
        )
        df = picked.select(*keys, *[F.col(f"_m.{c}").alias(c) for c in non_keys])
    else:
        df = df.dropDuplicates(keys)

    stage = f"{table}_stg_{uuid.uuid4().hex[:10]}"
    writer = (
        df.write.format("jdbc")
        .mode("overwrite")
        .option("url", url)
        .option("dbtable", stage)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .option("truncate", "true")
    )
    # string columns must be VARCHAR, not the dialect's LOB default —
    # Derby (and others) cannot compare LOBs in a MERGE ON clause
    str_cols = [f.name for f in df.schema.fields if f.dataType.typeName() == "string"]
    if str_cols:
        writer = writer.option(
            "createTableColumnTypes",
            ", ".join(f"{c} VARCHAR(1024)" for c in str_cols),
        )
    writer.save()

    # Fault-injection seam: crash-recovery tests hook here to kill the
    # batch at the most dangerous point — staging rows durably written,
    # MERGE not yet run. Always None in production.
    if _between_stage_and_merge is not None:
        _between_stage_and_merge(stage)

    spark = df.sparkSession
    jvm = spark._jvm
    jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url, user, password)
    try:
        meta = conn.getMetaData()
        rs = meta.getTables(None, None, table.upper(), None)
        target_exists = rs.next()
        rs.close()
        stmt = conn.createStatement()
        try:
            if not target_exists:
                stmt.executeUpdate(
                    f'CREATE TABLE {table} AS SELECT * FROM {stage} WITH NO DATA'
                )
            qk = [f'"{k}"' for k in keys]
            qv = [f'"{c}"' for c in non_keys]
            on = " AND ".join(f"t.{k} = s.{k}" for k in qk)
            sets = ", ".join(f"{c} = s.{c}" for c in qv)
            cols = ", ".join(qk + qv)
            vals = ", ".join(f"s.{c}" for c in qk + qv)
            merge = (
                f"MERGE INTO {table} t USING {stage} s ON {on} "
                + (f"WHEN MATCHED THEN UPDATE SET {sets} " if qv else "")
                + f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
            )
            stmt.executeUpdate(merge)
        finally:
            try:
                stmt.executeUpdate(f"DROP TABLE {stage}")
            except Exception:
                pass  # best-effort cleanup; a leftover stage is inert
            stmt.close()
    finally:
        conn.close()
