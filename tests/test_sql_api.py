"""Spark SQL API parity: the engine's plans are DataFrame-built, but the
same surface must be reachable through ``spark.sql`` (temp views + ANSI
SQL) — a user migrating SQL text, not code, gets identical results.

These are representative twins, not a second full surface: a scan-agg
(Q1), a tumbling-window rollup (B7), and the flagship wordcount (A1,
via explode + lateral view semantics).
"""

from __future__ import annotations

import mapreduceimplementation_spark as eng
from tests.conftest import _norm_rows

eng.load_all_operators()


def _register_views(spark, sf_dir):
    from mapreduceimplementation_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def _same(df_a, df_b):
    pa, pb = df_a.toPandas(), df_b.toPandas()
    assert sorted(pa.columns) == sorted(pb.columns)
    cols = sorted(pa.columns)
    assert _norm_rows(pa[cols]) == _norm_rows(pb[cols])


def test_sql_twin_q1(spark, sf_dir):
    _register_views(spark, sf_dir)
    sql = spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(27,6))) AS DOUBLE) AS sum_charge,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) / COUNT(l_quantity), 6) AS avg_qty,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) / COUNT(l_extendedprice), 6) AS avg_price,
               ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(27,6))) AS DOUBLE) / COUNT(l_discount), 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """)
    _same(sql, eng.QUERIES["q1_pricing_summary"](spark, sf_dir))


def test_sql_twin_events_minutely(spark, sf_dir):
    _register_views(spark, sf_dir)
    sql = spark.sql("""
        SELECT date_trunc('minute', ts) AS minute, event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2
    """)
    _same(sql, eng.QUERIES["events_minutely"](spark, sf_dir))


def test_sql_twin_wordcount(spark, sf_dir):
    _register_views(spark, sf_dir)
    sql = spark.sql("""
        SELECT word, COUNT(*) AS cnt
        FROM (
            SELECT explode(filter(split(text, '[^A-Za-z]+'), x -> x != '')) AS word
            FROM documents
        )
        GROUP BY word
    """)
    _same(sql, eng.QUERIES["mr_wordcount"](spark, sf_dir))
