"""JDBC source: dialect registry, query synthesis, partitioned reads.

Covers S3/S4/S5 and the pushdown-mode literal rendering P12. The
reference extracted with ``numPartitions=100, fetchsize=1000`` plus six
driver threads issuing overlapping BETWEEN slices
(load_with_query.py:155-168,281-329); here a single partitioned read
(``partitionColumn/lowerBound/upperBound`` or explicit half-open
``predicates``) lets Spark schedule the parallelism with no overlap.

No live RDBMS exists in the test environment, so ``read_jdbc`` is
exercised only for option/SQL synthesis in unit tests; the synthesis
functions are pure.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from cdk_datalake_ingest_spark.specs import EndpointSpec, TableSpec


@dataclass(frozen=True)
class JdbcDialect:
    name: str
    driver: str
    url_template: str  # format(server=, port=, db=)

    def url(self, server: str, port: int, db: str) -> str:
        return self.url_template.format(server=server, port=port, db=db)


#: S5 driver/url dispatch per BD_TYPE (load_with_query.py:266-276).
DIALECTS: dict[str, JdbcDialect] = {
    "oracle": JdbcDialect(
        "oracle",
        "oracle.jdbc.driver.OracleDriver",
        "jdbc:oracle:thin:@{server}:{port}:{db}",
    ),
    "mysql": JdbcDialect(
        "mysql",
        "com.mysql.cj.jdbc.Driver",
        "jdbc:mysql://{server}:{port}/{db}",
    ),
    "mssql": JdbcDialect(
        "mssql",
        "com.microsoft.sqlserver.jdbc.SQLServerDriver",
        "jdbc:sqlserver://{server}:{port};databaseName={db}",
    ),
}


def render_date_literal(value: str, filter_type: str) -> str:
    """P12 dialect date-literal rendering (load_with_query.py:198-222):
    wraps a 'YYYY-MM-DD HH:MM:SS[.ffffff]' string in the source
    dialect's conversion function; BIGINT renders as unix seconds."""
    ft = filter_type.strip()
    if ft == "smalldatetime":
        return f"CONVERT(smalldatetime, '{value}', 120)"
    if ft == "DATE":
        return f"TO_DATE('{value[:19]}', 'YYYY-MM-DD HH24:MI:SS')"
    if ft == "TIMESTAMP(6)":
        return f"TO_TIMESTAMP('{value}', 'YYYY-MM-DD HH24:MI:SS.FF')"
    if ft == "SQL_DATETIME":
        return f"CONVERT(DATETIME, '{value}',  102)"
    if ft == "BIGINT":
        parsed = dt.datetime.strptime(value[:19], "%Y-%m-%d %H:%M:%S")
        return str(int(parsed.timestamp()))
    return f"'{value}'"


def build_incremental_query(
    table: TableSpec, start: str, end: str
) -> str:
    """get_query semantics (load_with_query.py:178-195): QUERY_BY_GLUE +
    range WHERE over one filter column, or the two-column OR form."""
    query = table.query_by_glue
    if table.filter_type:
        start = render_date_literal(start, table.filter_type)
        end = render_date_literal(end, table.filter_type)
    if "," in table.filter_column:
        c1, c2 = [c.strip() for c in table.filter_column.split(",")[:2]]
        query += (
            f" WHERE ({c1} IS NOT NULL and {c1} BETWEEN {start} AND {end})"
            f" OR ({c2} IS NOT NULL and {c2} BETWEEN {start} AND {end})"
        )
    else:
        c = table.filter_column
        query += f" WHERE {c} is not null and {c} BETWEEN {start} AND {end}"
    return query


def build_full_query(
    table: TableSpec, start: str | None = None, end: str | None = None
) -> str:
    """Full/bounded-load SELECT synthesis (load_with_query.py:306-327):
    projection list (+ ID_COLUMN as id), JOIN_EXPR passthrough, and the
    FILTER_EXP/FILTER_COLUMN predicate with {0}/{1} substitution and
    `0=0` neutral element."""
    cols = table.columns.strip() or "*"
    if table.id_column and "," not in table.id_column:
        cols = f"{cols}, {table.id_column} as id"
    q = f"select {cols} from {table.source_schema}.{table.source_table}"
    if table.join_expr.strip():
        q += f" {table.join_expr.strip()}"
    exp = (table.filter_exp or "0=0").strip() or "0=0"
    colf = (table.filter_column or "0=0").strip() or "0=0"
    where = f"({exp}) AND ({colf})"
    if start is not None:
        where = where.replace("{0}", str(start))
    if end is not None:
        where = where.replace("{1}", str(end))
    return f"{q} WHERE {where}"


def read_jdbc(
    spark: SparkSession,
    endpoint: EndpointSpec,
    query: str,
    num_partitions: int = 100,
    fetchsize: int = 1000,
    partition_column: str | None = None,
    lower_bound: str | None = None,
    upper_bound: str | None = None,
    predicates: list[str] | None = None,
) -> DataFrame:
    """S3/S4: partitioned JDBC read with dialect dispatch.

    Prefer ``partition_column`` + bounds (Spark generates non-overlapping
    strides) or explicit half-open ``predicates``; both replace the
    reference's driver-thread fan-out and its duplicate-producing
    inclusive slice edges.
    """
    dialect = DIALECTS[endpoint.bd_type.strip().lower().replace("sqlserver", "mssql")]
    reader = (
        spark.read.format("jdbc")
        .option("url", dialect.url(endpoint.server, endpoint.port, endpoint.db_name))
        .option("user", endpoint.username)
        .option("password", endpoint.password)
        .option("driver", dialect.driver)
        .option("fetchsize", fetchsize)
    )
    if dialect.name == "oracle":  # S4 session init
        reader = reader.option(
            "sessionInitStatement",
            "ALTER SESSION SET NLS_TIMESTAMP_FORMAT = 'YYYY-MM-DD HH24:MI:SS.FF'",
        ).option("oracle.jdbc.mapDateToTimestamp", "true")
    if predicates:
        return reader.option("dbtable", f"({query}) src").load()
    reader = reader.option("query", query)
    if partition_column:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
            .option("numPartitions", num_partitions)
        )
    else:
        reader = reader.option("numPartitions", num_partitions)
    return reader.load()
