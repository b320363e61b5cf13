"""Custom stateful streaming operator via applyInPandasWithState.

The brief's "custom stateful operator" slot: arbitrary per-key state
(beyond built-in windows/dedup) maintained across micro-batches with
`applyInPandasWithState` — here a per-user running profile (event
count, value sum, last event time). The final emitted state must equal
the batch aggregate, which is what the oracle checks.
"""

from __future__ import annotations

import shutil
import tempfile
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from snapshot_s3_util_spark.io import load_table
from snapshot_s3_util_spark.registry import register
from snapshot_s3_util_spark.sql_helpers import EVENTS_REL

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)
_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _update_profile(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold each micro-batch's rows for this user into the state and
    emit the updated profile (update-mode semantics: latest row per
    key wins downstream)."""
    if state.exists:
        n, s, last = state.get
    else:
        n, s, last = 0, 0.0, None
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last = batch_max if last is None else max(last, batch_max)
    state.update((n, s, last))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [s],
            "last_ts": [last],
        }
    )


@register(
    "stream_stateful_profile",
    oracle=f"""
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value,
           MAX(ts) AS last_ts
    FROM {EVENTS_REL} e
    GROUP BY user_id
    """,
    category="streaming",
)
def stream_stateful_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running profile via applyInPandasWithState.

    State is a (count, sum, last_ts) triple per user — the template for
    any custom accumulator the built-in aggregations can't express
    (model features, anomaly flags, decayed counters). NoTimeout here
    because the source is bounded; production uses event-time timeout
    + watermark so state ages out. Final state == batch GROUP BY,
    which the oracle asserts.
    """
    tmp = tempfile.mkdtemp(prefix="s3u_stream_state_")
    try:
        ev = load_table(spark, sf_dir, "events")
        src = f"{tmp}/src"
        ev.write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        profiled = (
            stream.select("user_id", "ts", "value")
            .groupBy("user_id")
            .applyInPandasWithState(
                _update_profile,
                outputStructType=_OUTPUT_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
        from snapshot_s3_util_spark.streaming.stream_ops import _counter

        name = f"s3u_stream_{next(_counter)}"
        q = (
            profiled.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        # update mode may emit a row per micro-batch per key; keep the
        # final (max n_events) emission per user
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
        return (
            spark.table(name)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "user_id",
                "n_events",
                F.round("sum_value", 4).alias("sum_value"),
                "last_ts",
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
