"""JDBC connectors: watermark-incremental scans and bulk sinks
(S10/S11, SURVEY.md §2.1).

The reference hand-rolls CDC loops per database — Oracle with PARALLEL
and INDEX hints + bind variables (``src/connectors/oracle_connector.py:
95-169``), Teradata with query-bands + FastLoad (``teradata_connector.py:
148-206``), a generic driver-class registry (``generic_jdbc_connector.py:
47-68``). On Spark all of that collapses into ``spark.read.jdbc`` options:
partitioned parallel reads replace PARALLEL hints, ``fetchsize`` replaces
arraysize batching, ``batchsize`` + ``df.write.jdbc`` replace executemany
retry loops.

No live databases exist in CI, so this module builds *plans and option
dicts* (pure, testable) and only touches a JDBC URL when executed.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# driver-class registry (generic_jdbc_connector.py:47-68); derby is the
# in-process engine Spark already ships (its Hive-metastore backend), so
# the write→incremental-read path is integration-testable with no server
JDBC_DRIVERS = {
    "oracle": "oracle.jdbc.OracleDriver",
    "teradata": "com.teradata.jdbc.TeraDriver",
    "postgresql": "org.postgresql.Driver",
    "mysql": "com.mysql.cj.jdbc.Driver",
    "sqlite": "org.sqlite.JDBC",
    "derby": "org.apache.derby.jdbc.EmbeddedDriver",
}


@dataclass
class IncrementalJdbcSource:
    """Watermark CDC source: ``SELECT … WHERE wm_col > :last_sync``
    (oracle_connector.py:134-140) with partitioned parallel reads."""

    url: str
    table: str
    watermark_col: str
    dialect: str = "postgresql"
    fetchsize: int = 10_000
    num_partitions: int = 8
    options: dict[str, str] = field(default_factory=dict)

    def query_for(self, last_sync: str) -> str:
        """The pushed-down dbtable subquery. ORDER BY is dropped on
        purpose: Spark reads are unordered and the watermark bound, not
        row order, carries resumability (SURVEY §2.7 O4).

        ``last_sync`` is embedded as a SQL literal (Spark's dbtable has no
        bind variables, unlike oracle_connector.py:134-140), so single
        quotes are doubled per the SQL standard to keep a quote in the
        value from breaking or injecting into the pushed query.

        The watermark column is identifier-quoted (backtick on mysql,
        ANSI double quote elsewhere): Spark's own JDBC writer creates
        quoted (case-exact) column names, which unquoted references
        would case-fold past in strict engines. The alias must not start
        with '_' — several dialects (Derby among them) reject
        leading-underscore identifiers unquoted.
        """
        lit = last_sync.replace("'", "''")
        q = "`" if self.dialect == "mysql" else '"'
        return (
            f"(SELECT * FROM {self.table} "
            f"WHERE {q}{self.watermark_col}{q} > '{lit}') AS incr_scan"
        )

    def read_options(
        self, last_sync: str, upper_bound: str | None = None
    ) -> dict[str, str]:
        """A SELF-CONSISTENT option dict: partitionColumn is only included
        together with both bounds (Spark rejects one without the others).
        num_partitions == 1, or no ``upper_bound`` yet, → one plain query
        (also needed for dialects whose type rules reject Spark's
        generated range predicates, and the right plan for small control
        tables anyway)."""
        opts = {
            "url": self.url,
            "dbtable": self.query_for(last_sync),
            "driver": JDBC_DRIVERS.get(self.dialect, self.dialect),
            "fetchsize": str(self.fetchsize),
            "numPartitions": str(self.num_partitions),
        }
        if self.num_partitions > 1 and upper_bound is not None:
            # partition on the watermark itself: each task reads a slice
            opts["partitionColumn"] = self.watermark_col
            opts["lowerBound"] = last_sync
            opts["upperBound"] = upper_bound
        opts.update(self.options)
        return opts

    def load(
        self, spark: SparkSession, last_sync: str, upper_bound: str | None = None
    ) -> DataFrame:
        if self.num_partitions > 1 and upper_bound is None:
            raise ValueError(
                "partitioned incremental read (num_partitions "
                f"{self.num_partitions} > 1) requires upper_bound; "
                "pass one or set num_partitions=1 for a single query"
            )
        opts = self.read_options(last_sync, upper_bound)
        return spark.read.format("jdbc").options(**opts).load()


def bulk_insert_options(
    url: str, table: str, dialect: str = "postgresql", batchsize: int = 10_000
) -> dict[str, str]:
    """S11 sink options: ``df.write.format('jdbc').options(**…).mode(
    'append').save()`` — batchsize replaces executemany batching
    (oracle_connector.py:171-241)."""
    return {
        "url": url,
        "dbtable": table,
        "driver": JDBC_DRIVERS.get(dialect, dialect),
        "batchsize": str(batchsize),
        "isolationLevel": "READ_COMMITTED",
    }


def bulk_insert(
    df: DataFrame,
    url: str,
    table: str,
    dialect: str = "postgresql",
    batchsize: int = 10_000,
    mode: str = "append",
    retries: int = 3,
    backoff_s: float = 1.0,
    sleep_fn=None,
    extra_options: dict[str, str] | None = None,
) -> None:
    """S11 sink EXECUTION: the reference retries its executemany loop on
    transient connection errors with linear backoff
    (oracle_connector.py:171-241). Per-task batching is Spark's
    ``batchsize``; what remains driver-side is the whole-write retry —
    ``mode='append'`` keeps a retry idempotent only if the target
    dedupes, so the last attempt's exception is re-raised for the caller
    to decide."""
    import time as _time

    sleep = sleep_fn or _time.sleep
    opts = bulk_insert_options(url, table, dialect, batchsize)
    # e.g. createTableColumnTypes="payload VARCHAR(64)": some dialects'
    # default string mapping (Derby → CLOB) can't be compared/filtered
    opts.update(extra_options or {})
    last_exc: Exception | None = None
    for attempt in range(max(1, retries)):
        try:
            df.write.format("jdbc").options(**opts).mode(mode).save()
            return
        except Exception as exc:  # transient connection/lock errors
            last_exc = exc
            if attempt < retries - 1:
                sleep(backoff_s * (attempt + 1))
    raise last_exc
