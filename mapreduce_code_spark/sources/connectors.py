"""External-system connectors: Avro, JDBC, Kafka — availability-gated.

The engine's canonical storage is parquet (``sources.io``), with JSON/
CSV/ORC/text round-trips tested alongside. Real deployments also pull
from Avro files, JDBC databases, and Kafka topics; Spark supports all
three natively, but each needs a component this container does not ship:

- **Avro** — the ``spark-avro`` module jar (external since Spark 2.4):
  ``--packages org.apache.spark:spark-avro_2.13:<spark-version>``.
  (The bundled ``avro-*.jar`` files are the Avro CORE library the
  metastore uses — not the datasource; ``format("avro")`` still gates.)
- **JDBC** — the database's JDBC driver jar on the executor classpath.
  Spark DOES bundle the embedded Derby driver (for the Hive metastore),
  so the JDBC path has a REAL in-container integration test
  (``tests/test_text_io.py::test_jdbc_roundtrip_embedded_derby``); for
  any external database, ship its driver jar.
- **Kafka** — the ``spark-sql-kafka-0-10`` module jar (and a broker).

Rather than pretending (a fake would corrupt a real deployment) or
crashing with Spark's raw classpath error deep inside a job, each
connector probes availability up front and raises a single actionable
``ConnectorUnavailable`` naming the exact deploy flag. When the jar IS
present (any real cluster), the code path is plain Spark and runs as-is
— the gate costs one catalog lookup, nothing else. Tests pin both the
gate message here and the pass-through call shape.

Scale notes (these matter more than the plumbing):
- JDBC reads MUST be partitioned (``partition_column``/``num_partitions``
  bounds) or Spark funnels the whole table through ONE connection — the
  classic single-task scan. The gate makes those arguments required
  rather than optional-and-forgotten.
- Kafka streams should set ``maxOffsetsPerTrigger`` so a backlogged topic
  can't produce an unboundedly large first micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class ConnectorUnavailable(RuntimeError):
    """The Spark build lacks the jar this connector needs; the message
    names the exact ``--packages``/classpath fix."""


def _probe_format(spark: SparkSession, fmt: str, deploy_hint: str) -> None:
    try:
        jvm = spark._jvm
    except Exception:
        # Spark Connect: no JVM handle to probe with. Absence can't be
        # proven, so DON'T gate — the real read runs server-side and
        # surfaces its own error if the jar is missing there.
        return
    try:
        jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            fmt, spark._jsparkSession.sessionState().conf()
        )
    except Exception as exc:  # ClassNotFound surfaces as Py4JJavaError
        raise ConnectorUnavailable(
            f"the '{fmt}' data source is not on the classpath in this "
            f"Spark build; deploy with {deploy_hint}"
        ) from exc


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro file source (schema embedded in the files; projection still
    prunes columns at the reader)."""
    _probe_format(
        spark,
        "avro",
        "--packages org.apache.spark:spark-avro_2.13:<spark-version>",
    )
    return spark.read.format("avro").load(path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    _probe_format(
        df.sparkSession,
        "avro",
        "--packages org.apache.spark:spark-avro_2.13:<spark-version>",
    )
    df.write.mode(mode).format("avro").save(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int,
    driver: str,
    **options: str,
) -> DataFrame:
    """Partitioned JDBC read. The partitioning arguments are REQUIRED:
    an unpartitioned ``spark.read.jdbc`` pulls the entire table through
    one connection in one task — at 100 TB that is not a slow path, it
    is a hang. Predicates on ``partition_column`` push down to the
    database as WHERE clauses on each partition's query."""
    try:
        jvm = spark._jvm
    except Exception:
        jvm = None  # Spark Connect — can't probe; let the read surface it
    if jvm is not None:
        try:
            jvm.java.lang.Class.forName(driver)
        except Exception as exc:
            raise ConnectorUnavailable(
                f"JDBC driver class {driver!r} is not on the classpath; "
                f"add the driver jar via --jars (and "
                f"spark.executor.extraClassPath)"
            ) from exc
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    driver: str,
    mode: str = "overwrite",
    **options: str,
) -> None:
    """JDBC sink. Each task opens one connection and batch-inserts its
    partition — parallelism is the DataFrame's partitioning, so coalesce
    first if the target database can't take one connection per task."""
    try:
        jvm = df.sparkSession._jvm
    except Exception:
        jvm = None  # Spark Connect — can't probe; let the write surface it
    if jvm is not None:
        try:
            jvm.java.lang.Class.forName(driver)
        except Exception as exc:
            raise ConnectorUnavailable(
                f"JDBC driver class {driver!r} is not on the classpath; "
                f"add the driver jar via --jars (and "
                f"spark.executor.extraClassPath)"
            ) from exc
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    max_offsets_per_trigger: int = 1_000_000,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka stream source returning the raw ``(key binary, value
    binary, topic, partition, offset, timestamp, ...)`` frame; callers
    parse ``value`` with ``from_json``/``from_avro`` downstream.
    ``maxOffsetsPerTrigger`` bounds the first micro-batch on a
    backlogged topic."""
    _probe_format(
        spark,
        "kafka",
        "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:"
        "<spark-version>",
    )
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
        .load()
    )
