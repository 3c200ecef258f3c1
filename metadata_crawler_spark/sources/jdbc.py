"""Database sources (SURVEY §2.1 S9/S10): PostgreSQL via Spark's JDBC
source, MongoDB via the mongo-spark connector.

Reference parity: the reference reads/writes its catalogue through
asyncpg pools (/root/reference/src/metadata_crawler/api/stores/
postgresql.py:446-525) and motor/pymongo bulk ops (api/stores/
mongodb.py:135-166). Spark-native, both become plain ``spark.read``
sources; the ONLY database-specific part is the options dict, so the
builders below are pure functions (unit-tested) and the readers are thin.
The sandbox ships no connector jars / live databases — on a cluster add
``org.postgresql:postgresql`` / ``org.mongodb.spark:mongo-spark-connector``
to ``spark.jars.packages`` and these paths are complete.

Scale notes: a JDBC read WITHOUT partitioning options is one task reading
the whole table through one connection — always pass
``partition_column/lower/upper`` for big tables so Spark issues
``num_partitions`` range-predicated queries in parallel. Pushed filters
(WHERE on the DataFrame) reach the database via the JDBC source's
predicate pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def postgres_options(
    host: str,
    database: str,
    table: str,
    user: str,
    password: str | None = None,
    port: int = 5432,
    partition_column: str | None = None,
    lower: int | None = None,
    upper: int | None = None,
    num_partitions: int = 8,
    fetch_size: int = 10_000,
) -> dict[str, str]:
    """JDBC options for a parallel PostgreSQL table read."""
    opts: dict[str, str] = {
        "url": f"jdbc:postgresql://{host}:{port}/{database}",
        "dbtable": table,
        "user": user,
        "driver": "org.postgresql.Driver",
        "fetchsize": str(fetch_size),
    }
    if password is not None:
        opts["password"] = password
    if partition_column is not None:
        if lower is None or upper is None:
            raise ValueError(
                "partitioned JDBC reads need lower/upper bounds for the "
                "partition column (Spark splits [lower, upper] into "
                "num_partitions range queries)"
            )
        opts.update(
            {
                "partitionColumn": partition_column,
                "lowerBound": str(lower),
                "upperBound": str(upper),
                "numPartitions": str(num_partitions),
            }
        )
    return opts


def mongo_options(uri: str, database: str, collection: str) -> dict[str, str]:
    """mongo-spark connector options (reads are split per Mongo chunk)."""
    return {
        "connection.uri": uri,
        "database": database,
        "collection": collection,
    }


def read_postgres(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    """Requires the PostgreSQL JDBC driver jar on the cluster."""
    return spark.read.format("jdbc").options(**options).load()


def read_mongo(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    """Requires the mongo-spark connector jar on the cluster."""
    return spark.read.format("mongodb").options(**options).load()
