"""Custom stateful streaming operators — ``applyInPandasWithState``
(SURVEY §2.9: absent from the reference; this is the escape hatch for
semantics Spark's built-in stateful operators can't express).

Design rule for oracle-checkable custom state: emit MONOTONIC per-key
values. Each micro-batch emits the key's running value; because the value
only grows, ``max`` over all emissions equals the final state no matter
how the input was split into batches — which makes a bounded streaming
replay exactly comparable to a batch aggregate, without needing "last
emission" semantics the memory sink can't provide.

Scale: state is one struct per key in the state store (RocksDB-ready);
the Python worker sees Arrow batches per key group — no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _count_per_key(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (cnt,) = state.get if state.exists else (0,)
    for pdf in pdfs:
        cnt += len(pdf)
    state.update((cnt,))
    yield pd.DataFrame({"user_id": [key[0]], "n_errors": [cnt]})


def stateful_event_counts(
    stream: DataFrame,
    key_col: str = "user_id",
    where: str = "event_type = 'error'",
) -> DataFrame:
    """Running per-key event counts with explicit cross-batch state.

    Emits (key, running_count) every micro-batch the key appears in;
    the running count is monotonic, so max-over-emissions = final count.
    """
    return (
        stream.where(where)
        .groupBy(key_col)
        .applyInPandasWithState(
            _count_per_key,
            outputStructType="user_id long, n_errors long",
            stateStructType="cnt long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def final_counts(emissions: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Collapse the emission log to the final per-key state (valid because
    emissions are monotonic)."""
    return emissions.groupBy(key_col).agg(F.max("n_errors").alias("n_errors"))


def tws_event_counts(
    stream: DataFrame,
    key_col: str = "user_id",
    where: str = "event_type = 'error'",
) -> DataFrame:
    """Running per-key counts on the ``transformWithStateInPandas`` API —
    the Spark 4 successor to applyInPandasWithState: typed state variables
    (ValueState/ListState/MapState), timers, TTL, and composite state per
    key instead of one opaque tuple. Same monotonic-emission contract as
    :func:`stateful_event_counts`, so the same max-over-emissions oracle
    applies.

    Requires the RocksDB state-store provider (the API is built on its
    column families) — callers set
    ``spark.sql.streaming.stateStore.providerClass`` before starting the
    query; that is the 100 TB configuration anyway (SURVEY §4.2).

    ENVIRONMENT NOTE: the transformWithState worker imports
    ``google.protobuf``; containers without a protobuf wheel get it from
    ``_compat.ensure_protobuf`` (pure-python runtime discovered on the
    machine, PYTHONPATH extended before session start — build_session does
    this). The parity test
    (tests/test_streaming.py::test_tws_event_counts_parity) runs wherever
    a runtime is found and only skips when none exists. NOT a registry
    entry: the driver owns its own (plain) session, whose workers may
    predate the shimmed PYTHONPATH.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._cnt = handle.getValueState("cnt", "cnt long")

        def handleInputRows(self, key, rows, timerValues):
            cnt = self._cnt.get()[0] if self._cnt.exists() else 0
            for pdf in rows:
                cnt += len(pdf)
            self._cnt.update((cnt,))
            yield pd.DataFrame({key_col: [key[0]], "n_errors": [cnt]})

        def close(self) -> None:
            pass

    return (
        stream.where(where)
        .groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=_RunningCount(),
            outputStructType=f"{key_col} long, n_errors long",
            outputMode="Update",
            timeMode="None",
        )
    )
