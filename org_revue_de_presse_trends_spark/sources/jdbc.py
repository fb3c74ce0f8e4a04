"""JDBC source (S1 parity — reference reads PostgreSQL through a DSN,
trends.go:215-223, with prepared statements trends.go:414-448).

Spark-first replacement: ``spark.read.format("jdbc")`` with either a
full table (predicate pushdown handles filters) or a pushed-down
``query``.  Partitioned reads split the scan across executors on a
numeric column — the knob that matters at scale (a single-connection
JDBC read is a driver bottleneck).

No database exists in the test environment, so this module only builds
reader configs; the option-dict builders are unit-tested and the same
loader interface is satisfied by the parquet catalog.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class PostgresConfig:
    """Mirrors the reference's config.json DSN parts (trends.go:43-59)."""

    host: str
    port: int
    database: str
    user: str
    password: str
    sslmode: str = "disable"  # parity: trends.go:219

    @property
    def url(self) -> str:
        return (
            f"jdbc:postgresql://{self.host}:{self.port}/{self.database}"
            f"?sslmode={self.sslmode}"
        )


def reader_options(
    cfg: PostgresConfig,
    table: str | None = None,
    query: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    fetch_size: int = 10_000,
) -> dict[str, str]:
    """Build the option dict for a JDBC read.  Exactly one of ``table``
    / ``query``.  With ``partition_column`` (numeric PK like
    weaving_status.ust_id) the read fans out across executors."""
    if (table is None) == (query is None):
        raise ValueError("exactly one of table/query is required")
    opts: dict[str, str] = {
        "url": cfg.url,
        "user": cfg.user,
        "password": cfg.password,
        "driver": "org.postgresql.Driver",
        "fetchsize": str(fetch_size),
    }
    if table is not None:
        opts["dbtable"] = table
    else:
        opts["query"] = query  # pushdown of the whole statement
    if partition_column is not None:
        if table is None:
            raise ValueError("partitioned reads require table, not query")
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned reads require lower/upper bounds")
        opts.update(
            partitionColumn=partition_column,
            numPartitions=str(num_partitions),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
        )
    return opts


def read_jdbc(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    reader = spark.read.format("jdbc")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
