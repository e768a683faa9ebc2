"""Parquet readers for the star-schema test tables, plus ingest for the
reference's two native text formats.

The reference reads line-oriented text via Hadoop ``TextInputFormat``
(``apriori_final.java:259``, ``logisticreg.java:182``) and parses each line
with ``StringTokenizer`` inside the mapper. Here ingest is declarative:
``spark.read.text`` → ``split`` → typed columns, so Catalyst can prune and
push down from the first plan node. Canonical storage is Parquet —
columnar, compressed, pushdown-capable — which the row-oriented reference
lacks entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_code_spark.sources.schemas import SCHEMAS

TABLES = tuple(SCHEMAS)


def _canonical_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to the engine's canonical TIMESTAMP type
    regardless of how the parquet writer typed it. Seen in the wild:

    - INT64 TIMESTAMP(NANOS): Spark reads long nanos under
      ``nanosAsLong`` — FLOOR to micros (matching the oracles'
      ``date_trunc('microseconds')``; plain ``div`` truncates toward
      zero and would put pre-epoch timestamps 1µs off).
    - INT64 TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
      TIMESTAMP_NTZ — interpret the naive wall-clock as UTC, which is
      how the DuckDB oracles read the same (naive) column. Done
      TZ-INDEPENDENTLY: NTZ epoch micros via ``timestampdiff`` (NTZ
      arithmetic has no zone), then ``timestamp_micros``. A plain
      ``cast('timestamp')`` resolves against the session zone at
      EXECUTION time, so a caller resetting ``spark.sql.session.timeZone``
      after load_table() would silently shift every ts by the host
      offset — the exact bug class this function exists to kill.
    - TIMESTAMP (already UTC-adjusted): passes through untouched.
    """
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("(ts - pmod(ts, 1000)) div 1000"))
        )
    elif dt == "timestamp_ntz":
        df = df.withColumn(
            "ts",
            F.timestamp_micros(
                F.expr(
                    "timestampdiff(MICROSECOND,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                )
            ),
        )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table from ``{sf_dir}/{name}.parquet``.

    ``events.ts`` has shipped as both TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS, naive) across driver testdata generations; either
    way it is normalized to microsecond TIMESTAMP under a UTC session
    zone (see :func:`_canonical_events_ts`). DuckDB oracles mirror this
    with ``date_trunc('microseconds', ts)`` over the naive column.
    """
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {sorted(SCHEMAS)}")
    # Must hold on ANY session, not just ones built by session.get_spark():
    # external harnesses construct vanilla SparkSessions and call the
    # registry directly, and without these confs (a) a nanos-typed
    # events.parquet read dies with PARQUET_TYPE_ILLEGAL (INT64
    # TIMESTAMP(NANOS)), and (b) on a non-UTC host every timestamp column
    # renders/truncates in local time while the DuckDB oracles are
    # UTC-naive — the exact class of host-environment bug round 1
    # shipped. Both are runtime-settable, so set them at the read site.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = _canonical_events_ts(df)
    return df


def load_table_stream(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of :func:`load_table`: a ``readStream`` file source
    over ``{sf_dir}/{name}.parquet`` with the table's explicit schema (a
    file stream cannot infer), the same point-of-use nanos/UTC confs, and
    the same nanos→micros ts conversion for events. The file source
    monitors the DIRECTORY; a glob filter selects just this table's file.
    """
    from pyspark.sql import types as T

    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {sorted(SCHEMAS)}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = SCHEMAS[name]
    if name == "events":
        # A file stream must declare its schema up front, and the declared
        # ts type must match the file's physical encoding (long nanos vs
        # naive micros). Probe via a batch footer read — metadata only, no
        # Spark job — then normalize exactly like the batch reader. The
        # probe needs the file to exist NOW; a stream may legitimately be
        # declared before data arrives in the monitored directory, so on
        # any probe failure fall back to the long-nanos default (the
        # driver testdata's dominant encoding, and the pre-probe
        # behavior) instead of refusing to define the stream.
        try:
            probed = dict(
                spark.read.parquet(f"{sf_dir}/{name}.parquet").dtypes
            ).get("ts")
        except Exception:
            probed = "bigint"
        ts_type = {
            "bigint": T.LongType(),
            "timestamp_ntz": T.TimestampNTZType(),
        }.get(probed, T.TimestampType())
        schema = T.StructType(
            [
                T.StructField("ts", ts_type, False) if f.name == "ts" else f
                for f in schema.fields
            ]
        )
    reader = spark.readStream.schema(schema).option(
        "pathGlobFilter", f"{name}.parquet"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(sf_dir)
    if name == "events":
        df = _canonical_events_ts(df)
    return df


def read_evolving(
    spark: SparkSession, path: str, target_schema
) -> DataFrame:
    """Read a parquet dataset whose files span SCHEMA GENERATIONS and
    normalize every row to ``target_schema`` — the standard 100 TB
    ingest reality, where years of writers left files with missing
    columns, extra columns, and widened numeric types side by side.

    The REQUESTED-schema read does all the work: Spark's parquet reader
    given an explicit schema fills columns a file predates with typed
    NULLs, silently drops columns the target doesn't name, and widens
    compatible numeric types (int32 → int64, float → double) per file —
    no ``mergeSchema`` footer-union pass (which besides costing a
    pre-scan of every footer REFUSES to merge widened types:
    CANNOT_MERGE_SCHEMAS). The result is exactly ``target_schema``
    regardless of which generations the scan touched, so downstream
    plans never vary with file vintage.

    Supported evolution is the parquet-native set: additive columns,
    dropped columns, numeric widening. An INCOMPATIBLE change (a column
    re-typed string → long) fails at scan time with the file path in
    the error — fail fast, never silently coerce. Column pruning and
    filter pushdown reach the scan as usual (the requested schema IS
    the scan schema)."""
    return spark.read.schema(target_schema).parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Read several tables at once; all tables if none named."""
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}


def read_transactions_text(
    spark: SparkSession, path: str, ordered: bool = False
) -> DataFrame:
    """Ingest the reference's apriori input: one basket per line,
    whitespace-separated item tokens (``apriori_final.java:6,51-53``).

    Returns ``(basket_id bigint, items array<string>)``. By default
    items are sorted+distinct — the engine's canonical set identity
    (documented deviation from the reference's order-sensitive strings,
    SURVEY.md §7.2). ``ordered=True`` keeps the line's token order
    (first occurrence wins) for faithful replay with
    ``AprioriConfig(ordered_identity=True)``.
    """
    # blank lines must be dropped BEFORE split — split('') yields ['']
    # (size 1), which would smuggle an empty-string item into the counts
    lines = spark.read.text(path).filter(F.trim(F.col("value")) != "")
    toks = F.array_distinct(F.split(F.trim(F.col("value")), r"\s+"))
    return lines.select(
        F.monotonically_increasing_id().alias("basket_id"),
        (toks if ordered else F.array_sort(toks)).alias("items"),
    )


def write_transactions_text(transactions: DataFrame, path: str) -> None:
    """Write baskets back to the reference's native apriori input format:
    one basket per line, items space-joined (``apriori_final.java:6``).
    Distributed text sink — one file per partition, like TextOutputFormat.
    """
    transactions.select(
        F.concat_ws(" ", F.col("items")).alias("value")
    ).write.mode("overwrite").text(path)


def write_labeled_points_text(points: DataFrame, path: str) -> None:
    """Write ``(row_id, y, features)`` to the regressions' native format:
    ``y x1 x2 ...`` per line, dropping the injected bias features[0]
    (the reference re-adds it at read, ``logisticreg.java:59-62``)."""
    points.select(
        F.concat_ws(
            " ",
            F.col("y").cast("string"),
            F.concat_ws(
                " ",
                F.transform(
                    F.slice(F.col("features"), 2, 1_000_000),
                    lambda x: x.cast("string"),
                ),
            ),
        ).alias("value")
    ).write.mode("overwrite").text(path)


def write_tsv(df: DataFrame, path: str, key_col: str, value_col: str) -> None:
    """The reference's output sink: ``key \\t value`` text lines
    (``TextOutputFormat``, ``apriori_final.java:260``)."""
    df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("string").alias("value"),
    ).write.mode("overwrite").option("sep", "\t").csv(path)


def read_tsv_counts(spark: SparkSession, path: str) -> DataFrame:
    """Re-ingest ``itemset \\t count`` TSV (job-2 output) the way the
    reference's job 3 re-parses it (``apriori_raw.java:317-333``) — except
    the schema-aware read makes the last-token-skip predicate (SURVEY P5)
    vanish: key and count arrive as real typed columns."""
    return (
        spark.read.option("sep", "\t")
        .schema("itemset string, cnt long")
        .csv(path)
    )


def read_labeled_points_text(spark: SparkSession, path: str) -> DataFrame:
    """Ingest the regressions' input: ``y x1 x2 ...`` per line with an
    implicit bias x0=1.0 prepended (``logisticreg.java:58-66``).

    Returns ``(row_id bigint, y double, features array<double>)`` where
    ``features[0] == 1.0`` (bias), matching the mapper's in-memory layout.
    """
    lines = spark.read.text(path)
    toks = F.split(F.trim(F.col("value")), r"\s+")
    parsed = lines.select(
        F.monotonically_increasing_id().alias("row_id"),
        toks.getItem(0).try_cast("double").alias("y"),
        F.concat(
            F.array(F.lit(1.0)),
            F.transform(
                F.slice(toks, 2, 1_000_000), lambda t: t.try_cast("double")
            ),
        ).alias("features"),
    )
    # Permissive-by-default (a deliberate upgrade over the reference,
    # where one malformed line throws NumberFormatException and kills the
    # whole task, logisticreg.java:60): non-numeric tokens try_cast to
    # null (ANSI-safe); drop rows with a null y or any null feature.
    return parsed.filter(
        F.col("y").isNotNull()
        & ~F.exists(F.col("features"), lambda x: x.isNull())
    )
