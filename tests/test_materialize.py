"""Log compaction: CdcEngine.materialize reconstructs current state from the
accumulated change log (snapshot + diff records mixed)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from cdc_lite_spark import CdcEngine


def test_materialize_after_snapshot_polls(spark, tables, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "log"), str(tmp_path / "state"))
    nation = tables["nation"]
    eng.poll_once({"nation": nation})
    time.sleep(0.01)  # distinct capture timestamps across polls
    mutated = nation.withColumn(
        "n_name",
        F.when(F.col("n_nationkey") == 5, F.lit("RENAMED")).otherwise(F.col("n_name")),
    )
    eng.poll_once({"nation": mutated})

    out = eng.materialize("nation", ["n_nationkey"], nation.schema)
    assert out.count() == nation.count()
    assert out.exceptAll(mutated).count() == 0
    assert mutated.exceptAll(out).count() == 0


def test_materialize_with_diff_mode_deletes(spark, tables, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "log"), str(tmp_path / "state"))
    region = tables["region"]
    keys = {"region": ["r_regionkey"]}
    eng.poll_once({"region": region}, mode="diff", keys=keys)
    time.sleep(0.01)
    shrunk = region.filter(F.col("r_regionkey") != 2)
    eng.poll_once({"region": shrunk}, mode="diff", keys=keys)

    out = eng.materialize("region", ["r_regionkey"], region.schema)
    assert out.count() == shrunk.count()
    assert {r["r_regionkey"] for r in out.collect()} == {
        r["r_regionkey"] for r in shrunk.collect()
    }
