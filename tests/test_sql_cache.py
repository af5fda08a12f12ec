"""run_sql view-registration cache: stays correct when temp views are
dropped or replaced outside register_tables (round-8 ADVICE, sql.py)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from cdk_datalake_ingest_spark.sql import register_tables, run_sql

SF = "/root/testdata/sf0.001"


def test_dropped_view_is_reregistered(spark):
    assert run_sql(spark, SF, "SELECT count(*) AS n FROM region").collect()[0].n == 5
    spark.catalog.dropTempView("region")
    # Cache still claims region -> SF; tableExists validation must
    # re-register instead of querying a missing relation.
    assert run_sql(spark, SF, "SELECT count(*) AS n FROM region").collect()[0].n == 5


def test_replaced_view_via_managed_register_is_reregistered(spark, tmp_path):
    from cdk_datalake_ingest_spark.operators.table import ManagedTable

    register_tables(spark, SF, ["nation"])
    t = ManagedTable(spark, tmp_path / "njunk")
    t.write(spark.range(3).toDF("n_nationkey"))
    t.register("nation")  # shadows the fixture view
    assert spark.table("nation").count() == 3
    # run_sql must notice the collision (register() invalidated the
    # cache entry) and point nation back at the fixture parquet.
    n = run_sql(spark, SF, "SELECT count(*) AS n FROM nation").collect()[0].n
    assert n == 25
