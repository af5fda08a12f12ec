"""JDBC source: dialect registry, query synthesis, partitioned reads.

Covers S3/S4/S5 and the pushdown-mode literal rendering P12. The
reference extracted with ``numPartitions=100, fetchsize=1000`` plus six
driver threads issuing overlapping BETWEEN slices
(load_with_query.py:155-168,281-329); here a single partitioned read
(``partitionColumn/lowerBound/upperBound`` or explicit half-open
``predicates``) lets Spark schedule the parallelism with no overlap.

``read_jdbc`` is exercised end-to-end against embedded Apache Derby
(bundled with Spark's JVM — tests/test_jdbc_derby.py); the dialect URL
templates for oracle/mysql/mssql are synthesis-only, as in round 1.

Trust model: query synthesis interpolates catalog-config values
(FILTER_COLUMN, FILTER_EXP, watermarks) into SQL text, exactly as the
reference does (load_with_query.py:178-195). The config store is
trusted; defensively, identifier-shaped fields are validated against an
allowlist regex and date literals escape embedded quotes, so a
malformed config row fails fast instead of reaching the source RDBMS.
"""

from __future__ import annotations

import datetime as dt
import re
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
    # Embedded Derby ships in Spark's JVM (derby*.jar) — not a reference
    # dialect, but the only way to e2e-test the partitioned/predicate
    # read paths without a network database. {db} is a filesystem path.
    "derby": JdbcDialect(
        "derby",
        "org.apache.derby.jdbc.EmbeddedDriver",
        "jdbc:derby:{db}",
    ),
}


#: SQL identifier allowlist: bare or schema-qualified column names only
#: (covers Oracle's $/# identifier chars). Anything else in an
#: identifier-position config field is a config error, not SQL.
_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_$#]*(\.[A-Za-z_][A-Za-z0-9_$#]*)?$")


def validate_identifier(name: str, field: str = "identifier") -> str:
    """Fail fast on non-identifier text in an identifier-position config
    field (defense against a compromised/typo'd catalog row)."""
    if not isinstance(name, str):
        raise ValueError(f"{field} must be a string, got {type(name).__name__}")
    name = name.strip()
    if not _IDENT_RE.match(name):
        raise ValueError(f"{field} is not a valid SQL identifier: {name!r}")
    return name


def render_date_literal(value: str, filter_type: str) -> str:
    """P12 dialect date-literal rendering (load_with_query.py:198-222):
    wraps a 'YYYY-MM-DD HH:MM:SS[.ffffff]' string in the source
    dialect's conversion function; BIGINT renders as unix seconds.
    Embedded single quotes are doubled so the value cannot terminate
    the SQL literal."""
    value = value.replace("'", "''")
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
        c1, c2 = [
            validate_identifier(c, "filter_column")
            for c in table.filter_column.split(",")[:2]
        ]
        query += (
            f" WHERE ({c1} IS NOT NULL and {c1} BETWEEN {start} AND {end})"
            f" OR ({c2} IS NOT NULL and {c2} BETWEEN {start} AND {end})"
        )
    else:
        c = validate_identifier(table.filter_column, "filter_column")
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
    url = dialect.url(endpoint.server, endpoint.port, endpoint.db_name)
    props = {
        "user": endpoint.username,
        "password": endpoint.password,
        "driver": dialect.driver,
        "fetchsize": str(fetchsize),
    }
    if dialect.name == "oracle":  # S4 session init
        props["sessionInitStatement"] = (
            "ALTER SESSION SET NLS_TIMESTAMP_FORMAT = 'YYYY-MM-DD HH24:MI:SS.FF'"
        )
        props["oracle.jdbc.mapDateToTimestamp"] = "true"
    # `(query) src` subquery alias works on every dialect here (Oracle
    # forbids AS on FROM-clause aliases, so no AS).
    table = f"({query}) src"
    if predicates:
        # One partition per predicate. Only DataFrameReader.jdbc() takes
        # predicates — there is no `predicates` DataSource option; round
        # 1 silently dropped the list and did a single-connection read.
        return spark.read.jdbc(
            url=url, table=table, predicates=list(predicates), properties=props
        )
    reader = spark.read.format("jdbc").option("url", url)
    for k, v in props.items():
        reader = reader.option(k, v)
    if partition_column:
        # partitionColumn is incompatible with the `query` option; the
        # subquery-alias dbtable form is required for a partitioned read.
        reader = (
            reader.option("dbtable", table)
            .option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
            .option("numPartitions", num_partitions)
        )
    else:
        reader = reader.option("query", query).option(
            "numPartitions", num_partitions
        )
    return reader.load()
