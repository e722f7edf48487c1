"""Structured Streaming variant of the politeness gate (SURVEY.md §7.6).

The batch BSP engine is the primary execution mode; this module shows the
same per-host politeness semantics as a continuous pipeline: a stream of
candidate jobs → stateful per-host budget enforcement via
applyInPandasWithState (state = jobs admitted per host per window), plus a
watermarked tumbling-window per-host admission metric (the streaming twin of
the engine's per-wave metrics table).

Drive pattern for tests/local smoke: parquet source dir + availableNow
trigger + memory sink (pyspark_guide.md Structured Streaming section).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ADMIT_SCHEMA = (
    "host string, job_id string, priority int, seq long, admitted boolean"
)
STATE_SCHEMA = "used int"


def admit_with_budget(budget_per_host: int):
    """Stateful admission: first `budget_per_host` jobs per host (by arrival
    batch, (priority, seq) within a batch) pass; the rest are deferred.
    State survives across micro-batches — the streaming analog of the
    engine's per-wave per-host top-k window."""

    def fn(key, pdfs, state: GroupState):
        (host,) = key
        used = state.get[0] if state.exists else 0
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["priority", "seq"])
            for _, r in pdf.iterrows():
                ok = used < budget_per_host
                if ok:
                    used += 1
                rows.append((host, r["job_id"], int(r["priority"]), int(r["seq"]), ok))
        state.update((used,))
        yield pd.DataFrame(
            rows, columns=["host", "job_id", "priority", "seq", "admitted"]
        )

    return fn


def politeness_stream(jobs_stream: DataFrame, budget_per_host: int) -> DataFrame:
    """jobs_stream: streaming frame with (host, job_id, priority, seq)."""
    return (
        jobs_stream.groupBy("host")
        .applyInPandasWithState(
            admit_with_budget(budget_per_host),
            outputStructType=ADMIT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def admission_rate_stream(jobs_stream: DataFrame, window: str = "1 minute") -> DataFrame:
    """Watermarked tumbling-window per-host admission counts — the streaming
    twin of the engine's metrics table (M-1/M-2)."""
    return (
        jobs_stream.withWatermark("ts", "2 minutes")
        .groupBy(F.window("ts", window), "host")
        .agg(F.count("*").alias("n_jobs"), F.min("seq").alias("first_seq"))
    )
