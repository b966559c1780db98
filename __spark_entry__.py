"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` maps every implemented operator from SURVEY.md §2 to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the
DuckDB-equivalent SQL the driver cross-checks against at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nasa_asteroid_data_lakehouse_spark.plans import (
    analytics_queries,
    llm_queries,
    operator_queries,
    tpch_queries,
)
from nasa_asteroid_data_lakehouse_spark.plans import queries as plans

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return plans.q1_pricing_summary(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out = {
        "q1_pricing_summary": plans.q1_pricing_summary,
        "q3_top_unshipped_orders": plans.q3_top_unshipped_orders,
        "q5_revenue_by_nation": plans.q5_revenue_by_nation,
    }
    out.update(operator_queries.QUERIES)
    out.update(llm_queries.QUERIES)
    out.update(analytics_queries.QUERIES)
    out.update(tpch_queries.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per queries() key."""
    out = {
        "q1_pricing_summary": plans.Q1_SQL,
        "q3_top_unshipped_orders": plans.Q3_SQL,
        "q5_revenue_by_nation": plans.Q5_SQL,
    }
    out.update(operator_queries.ORACLES)
    out.update(llm_queries.ORACLES)
    out.update(analytics_queries.ORACLES)
    out.update(tpch_queries.ORACLES)
    return out
