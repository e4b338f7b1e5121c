"""Salted-join / two-phase-agg equivalence tests (operators/skew.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_lite_spark.operators.skew import salted_join, two_phase_agg


def test_salted_join_equals_plain_join(spark, tables):
    orders = tables["orders"]
    customer = tables["customer"]
    plain = orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        "o_orderkey", "c_name"
    )
    salted = salted_join(
        orders.withColumnRenamed("o_custkey", "k"),
        customer.withColumnRenamed("c_custkey", "k"),
        ["k"],
        n_salts=4,
    ).select("o_orderkey", "c_name")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0


def test_two_phase_agg_equals_direct(spark, tables):
    ev = tables["events"]
    direct = {
        r["event_type"]: (r["n"], round(r["total"], 6))
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    two = {
        r["event_type"]: (r["n"], round(r["total"], 6))
        for r in two_phase_agg(
            ev,
            ["event_type"],
            {
                "n": (F.count("*"), F.sum("n")),
                "total": (F.sum("value"), F.sum("total")),
            },
            n_salts=4,
        ).collect()
    }
    assert direct == two
