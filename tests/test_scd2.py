"""SCD2 historization tests (operators/scd2.py)."""

from __future__ import annotations

from datetime import datetime

from cdc_lite_spark.operators.scd2 import scd2_as_of, scd2_history


def _changes(spark):
    t = lambda s: datetime(2024, 1, s)  # noqa: E731
    rows = [
        (1, "ann@a.com", "INSERT", t(1)),
        (1, "ann@b.com", "UPDATE", t(5)),
        (1, "ann@c.com", "UPDATE", t(9)),
        (2, "bob@a.com", "INSERT", t(2)),
        (2, None, "DELETE", t(7)),
    ]
    return spark.createDataFrame(rows, "id long, email string, operation string, ts timestamp")


def test_scd2_intervals(spark):
    hist = scd2_history(_changes(spark), ["id"]).collect()
    by_version = {(r["id"], r["email"]): r for r in hist}
    v1 = by_version[(1, "ann@a.com")]
    assert v1["valid_to"] == datetime(2024, 1, 5) and not v1["is_current"]
    v3 = by_version[(1, "ann@c.com")]
    assert v3["valid_to"] is None and v3["is_current"]
    # deleted key: tombstone open but never current
    tomb = by_version[(2, None)]
    assert tomb["operation"] == "DELETE" and not tomb["is_current"]
    assert by_version[(2, "bob@a.com")]["valid_to"] == datetime(2024, 1, 7)


def test_scd2_point_in_time(spark):
    hist = scd2_history(_changes(spark), ["id"])
    at = {
        r["id"]: r["email"]
        for r in scd2_as_of(hist, datetime(2024, 1, 6)).collect()
    }
    # on Jan 6: ann has her second email, bob still exists
    assert at == {1: "ann@b.com", 2: "bob@a.com"}
    later = {
        r["id"]: r["email"]
        for r in scd2_as_of(hist, datetime(2024, 1, 8)).collect()
    }
    assert later == {1: "ann@b.com"}  # bob deleted on the 7th
