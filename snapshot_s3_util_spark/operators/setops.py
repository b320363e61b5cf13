"""Set operators (SURVEY.md §2B "Set operations").

The distinct variants are the manifest-diff primitives of the
reference's verify step (SURVEY §2A A7): EXCEPT finds files missing
from the export, INTERSECT the common ones.

Two deterministic event slices with genuine overlap:
  slice_a = events in [2024-01-01, 2024-01-20)
  slice_b = events in [2024-01-10, 2024-01-30]
projected to (user_id, event_type) so bag-vs-set semantics differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snapshot_s3_util_spark.io import load_table
from snapshot_s3_util_spark.registry import register
from snapshot_s3_util_spark.sql_helpers import EVENTS_REL

_A_HI = "2024-01-20 00:00:00"
_B_LO = "2024-01-10 00:00:00"

_A_SQL = f"SELECT user_id, event_type FROM {EVENTS_REL} e WHERE ts < TIMESTAMP '{_A_HI}'"
_B_SQL = f"SELECT user_id, event_type FROM {EVENTS_REL} e WHERE ts >= TIMESTAMP '{_B_LO}'"


def _slices(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("ts") < F.lit(_A_HI).cast("timestamp"))
    b = ev.filter(F.col("ts") >= F.lit(_B_LO).cast("timestamp"))
    cols = ["user_id", "event_type"]
    return a.select(cols), b.select(cols)


@register("set_union_all", oracle=f"{_A_SQL} UNION ALL {_B_SQL}", category="setop")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (duplicates preserved) — pure narrow op, no shuffle."""
    a, b = _slices(spark, sf_dir)
    return a.unionByName(b)


@register("set_union_distinct", oracle=f"{_A_SQL} UNION {_B_SQL}", category="setop")
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union — one hash-distinct shuffle on all columns."""
    a, b = _slices(spark, sf_dir)
    return a.unionByName(b).distinct()


@register("set_intersect", oracle=f"{_A_SQL} INTERSECT {_B_SQL}", category="setop")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (distinct semantics, like SQL INTERSECT)."""
    a, b = _slices(spark, sf_dir)
    return a.intersect(b)


@register("set_except", oracle=f"{_A_SQL} EXCEPT ALL {_B_SQL}", category="setop")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL) — the manifest-diff analog."""
    a, b = _slices(spark, sf_dir)
    return a.exceptAll(b)


@register(
    "set_intersect_all", oracle=f"{_A_SQL} INTERSECT ALL {_B_SQL}", category="setop"
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (INTERSECT ALL): each common row kept
    min(count_a, count_b) times — the semantics for reconciling
    manifests that legitimately carry duplicate entries, where the
    distinct variant would hide a count mismatch."""
    a, b = _slices(spark, sf_dir)
    return a.intersectAll(b)


_AD_SQL = (
    f"SELECT user_id, CAST(ts AS DATE) AS day FROM {EVENTS_REL} e "
    f"WHERE ts < TIMESTAMP '{_A_HI}'"
)
_BD_SQL = (
    f"SELECT user_id, CAST(ts AS DATE) AS day FROM {EVENTS_REL} e "
    f"WHERE ts >= TIMESTAMP '{_B_LO}'"
)


@register(
    "set_except_distinct", oracle=f"{_AD_SQL} EXCEPT {_BD_SQL}", category="setop"
)
def set_except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (EXCEPT, distinct semantics) over (user, active
    day): the activity pairs present only in the early slice — i.e.
    days before the overlap window.  Projected to days (not the
    low-cardinality (user, event_type) pairs, where every A-row also
    appears in B and the difference is vacuously empty — checked
    non-empty in tests)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("ts") < F.lit(_A_HI).cast("timestamp"))
    b = ev.filter(F.col("ts") >= F.lit(_B_LO).cast("timestamp"))
    cols = [F.col("user_id"), F.to_date("ts").alias("day")]
    return a.select(cols).subtract(b.select(cols))


_SYMDIFF_ORACLE = """
WITH clickers AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM {EVENTS_REL} e WHERE event_type = 'click'
),
buyers AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM {EVENTS_REL} e WHERE event_type = 'purchase'
)
SELECT c.user_id, c.day, 'click_only' AS side FROM clickers c
WHERE NOT EXISTS (SELECT 1 FROM buyers b
                  WHERE b.user_id = c.user_id AND b.day = c.day)
UNION ALL
SELECT b.user_id, b.day, 'purchase_only' FROM buyers b
WHERE NOT EXISTS (SELECT 1 FROM clickers c
                  WHERE c.user_id = b.user_id AND c.day = b.day)
"""


@register(
    "set_symmetric_diff",
    oracle=_SYMDIFF_ORACLE.format(EVENTS_REL=EVENTS_REL),
    category="setop",
)
def set_symmetric_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference with side attribution: keys in exactly one
    of two sets, labeled by which — the audience-overlap complement
    (clicked-but-didn't-buy vs bought-without-clicking) that plain
    EXCEPT/INTERSECT can't express in one result.

    Keys are (user, active day) — at every test SF each user emits
    every event type SOMEWHERE in the month, so a per-user XOR is
    structurally empty and would make the oracle check vacuous (the
    r5 verdict's finding); day-scoping leaves ~1k rows per side at
    sf0.01 while keeping the op's shape identical.

    Two anti-joins over the deduplicated key sets, unioned; both sides
    reduce to distinct keys BEFORE joining, so the anti-join probes
    carry |user-days|, not |events|, and AQE broadcasts the smaller
    side.  The side label makes the op a partition of the XOR set —
    `set_intersect`-style overlap + this op's two halves tile the
    union exactly (asserted in tests).
    """
    ev = load_table(spark, sf_dir, "events")
    key = [F.col("user_id"), F.to_date("ts").alias("day")]
    clickers = (
        ev.filter(F.col("event_type") == "click").select(key).distinct()
    )
    buyers = (
        ev.filter(F.col("event_type") == "purchase").select(key).distinct()
    )
    click_only = clickers.join(
        buyers, ["user_id", "day"], "left_anti"
    ).select("user_id", "day", F.lit("click_only").alias("side"))
    buy_only = buyers.join(
        clickers, ["user_id", "day"], "left_anti"
    ).select("user_id", "day", F.lit("purchase_only").alias("side"))
    return click_only.unionByName(buy_only)
