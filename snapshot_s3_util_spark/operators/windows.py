"""Window-function operators (SURVEY.md §2B "Window functions").

One shuffle on the partition key per distinct (partitionBy, orderBy)
pair; Spark evaluates sibling window expressions over the same spec in
a single Window physical node. Every orderBy carries a unique
tiebreaker (event_id / orderkey) so results are value-deterministic on
both engines (SURVEY §7 "Nondeterminism").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from snapshot_s3_util_spark.io import load_table
from snapshot_s3_util_spark.params import TOPK_PER_GROUP
from snapshot_s3_util_spark.registry import register
from snapshot_s3_util_spark.sql_helpers import EVENTS_REL

_ORDER = "ORDER BY ts DESC, event_id DESC"


@register(
    "win_rank",
    oracle=f"""
    SELECT event_id, user_id, ts,
           ROW_NUMBER()  OVER (PARTITION BY user_id {_ORDER}) AS rn,
           RANK()        OVER (PARTITION BY user_id ORDER BY value DESC) AS rnk,
           DENSE_RANK()  OVER (PARTITION BY user_id ORDER BY value DESC) AS drnk,
           NTILE(4)      OVER (PARTITION BY user_id {_ORDER}) AS quartile
    FROM {EVENTS_REL} e
    """,
    category="window",
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile per user partition."""
    ev = load_table(spark, sf_dir, "events")
    w_ts = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    w_val = Window.partitionBy("user_id").orderBy(F.col("value").desc())
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.row_number().over(w_ts).alias("rn"),
        F.rank().over(w_val).alias("rnk"),
        F.dense_rank().over(w_val).alias("drnk"),
        F.ntile(4).over(w_ts).alias("quartile"),
    )


@register(
    "win_analytic",
    oracle=f"""
    SELECT event_id, user_id, ts,
           LAG(ts)  OVER w AS prev_ts,
           LEAD(ts) OVER w AS next_ts,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
    FROM {EVENTS_REL} e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    category="window",
)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead / first_value / last_value per user timeline."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w_full).alias("last_type"),
    )


@register(
    "win_frame_rows",
    oracle=f"""
    SELECT event_id, user_id, ts,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS moving_avg,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS moving_sum
    FROM {EVENTS_REL} e
    """,
    category="window",
)
def win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving avg/sum over a 4-row sliding frame."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.avg("value").over(w), 6).alias("moving_avg"),
        F.round(F.sum("value").over(w), 6).alias("moving_sum"),
    )


@register(
    "win_frame_range",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                 RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_near,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                 RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW), 4) AS sum_near
    FROM orders
    """,
    category="window",
)
def win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric offset (value-based, not row-based)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 0)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_near"),
        F.round(F.sum("o_totalprice").over(w), 4).alias("sum_near"),
    )


@register(
    "topk_per_group",
    oracle=f"""
    SELECT user_id, event_id, ts, value
    FROM (SELECT user_id, event_id, ts, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY value DESC, event_id) AS rn
          FROM {EVENTS_REL} e)
    WHERE rn <= {TOPK_PER_GROUP}
    """,
    category="window",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events per user — the HBase "keep N newest versions" analog.

    Window rank + filter; Spark pushes the rn<=k limit into the sort as
    a per-partition top-k (WindowGroupLimit in the physical plan), so
    each group never fully sorts at scale.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK_PER_GROUP)
        .select("user_id", "event_id", "ts", "value")
    )


_FF_ORACLE = f"""
WITH g AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS reading
  FROM {EVENTS_REL} e
)
SELECT event_id, user_id,
       ROUND(COALESCE(LAST_VALUE(reading IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING), -1.0), 6) AS filled
FROM g
"""


@register("win_fill_forward", oracle=_FF_ORACLE, category="window")
def win_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill (LOCF): carry each user's last valid reading forward
    over NULLed-out rows — the telemetry/sensor resampling primitive.

    NULLs are planted deterministically (error events lose their
    reading, same rule both engines).  `last(..., ignorenulls=True)`
    over a (user, time)-ordered running frame is the whole operator:
    one keyed exchange, no self-join, no driver loop — the plan a
    100 TB fill must have (per-key sequential scan within partitions).
    Leading NULLs (no prior reading) fill with the -1 sentinel on both
    engines so the output stays scalar and comparable.
    """
    ev = load_table(spark, sf_dir, "events")
    g = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.col("value"))
        .alias("reading"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return g.select(
        "event_id",
        "user_id",
        F.round(
            F.coalesce(
                F.last("reading", ignorenulls=True).over(w), F.lit(-1.0)
            ),
            6,
        ).alias("filled"),
    )


# Segment width for the skew-bounded window variants below: the
# chunked timeline is a Spark-side execution detail (the OUTPUT is
# bit-identical to the unsegmented op, so the oracle is shared), so
# the constant needs no SQL twin.  1 day over the 30-day events span
# gives ~30 chunks per user — a 30%-of-corpus celebrity key's
# sequential window work drops to 1/30th per task.
_SEG_CHUNK_US = 86_400_000_000


@register("win_fill_forward_segmented", oracle=_FF_ORACLE, category="window")
def win_fill_forward_segmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-bounded LOCF: identical output to `win_fill_forward`
    (same oracle), but the per-key sequential scan is SEGMENTED — the
    classic parallel-prefix decomposition (r11 verdict ask #7; SKEW.md
    measured the single-window LOCF at 2.01x under a 30%-hot key
    because one task owns the whole hot timeline).

    Two passes:
    1. window over (user_id, chunk) — chunk = 1-day bucket of ts —
       fills within each segment; the hot key's timeline now spreads
       over ~30 parallel tasks instead of one.
    2. per-chunk LAST non-null reading (a map-side-combinable agg on
       the same keys) -> a per-user window over the ~30 chunk-summary
       rows computes each chunk's carry-in -> one co-partitioned join
       back (the big side is already hashed on (user_id, chunk) from
       pass 1, so only the summary frame exchanges).

    filled = coalesce(within-segment fill, carry-in, sentinel) — exact
    associativity of LOCF, no approximation.  Cost vs the base op: one
    extra tiny aggregate + summary window; the data-sized work is
    unchanged but its longest sequential run is bounded by the chunk
    width, which is the property a 100 TB celebrity key needs.
    """
    ev = load_table(spark, sf_dir, "events")
    g = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.col("value"))
        .alias("reading"),
    ).withColumn(
        "chunk", F.floor(F.unix_micros(F.col("ts")) / _SEG_CHUNK_US)
    )
    wc = (
        Window.partitionBy("user_id", "chunk")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = g.withColumn(
        "local_fill", F.last("reading", ignorenulls=True).over(wc)
    )
    # ONE map-side-combined aggregate covers both the per-chunk last
    # non-null reading AND chunk presence (max_by skips NULL-reading
    # rows but the group row survives, so all-null chunks still get a
    # summary row and inherit a carry-in) — a separate distinct() for
    # the chunk list would be a second event-sized shuffle.
    chunk_last = g.groupBy("user_id", "chunk").agg(
        F.expr(
            "max_by(reading, CASE WHEN reading IS NOT NULL"
            " THEN struct(ts, event_id) END)"
        ).alias("chunk_last")
    )
    wu = (
        Window.partitionBy("user_id")
        .orderBy("chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = chunk_last.withColumn(
        "carry_in", F.last("chunk_last", ignorenulls=True).over(wu)
    ).select("user_id", "chunk", "carry_in")
    return local.join(carry, ["user_id", "chunk"]).select(
        "event_id",
        "user_id",
        F.round(
            F.coalesce("local_fill", "carry_in", F.lit(-1.0)), 6
        ).alias("filled"),
    )


# The funnel state machine as ONE higher-order fold over a (ts,
# event_id)-sorted `evs` array of struct<ts, event_id, et>. Module-level
# so the property test (tests/test_properties.py) exercises THIS text
# against a Python reference, not a copy that could drift.
FUNNEL_FOLD_EXPR = """
aggregate(
  evs,
  named_struct('v', CAST(NULL AS TIMESTAMP),
               'c', CAST(NULL AS TIMESTAMP),
               'p', CAST(NULL AS TIMESTAMP)),
  (s, e) -> named_struct(
    'v', CASE WHEN e.et = 'view' AND s.v IS NULL
              THEN e.ts ELSE s.v END,
    'c', CASE WHEN e.et = 'click' AND s.v IS NOT NULL
                   AND e.ts > s.v AND s.c IS NULL
              THEN e.ts ELSE s.c END,
    'p', CASE WHEN e.et = 'purchase' AND s.c IS NOT NULL
                   AND e.ts > s.c AND s.p IS NULL
              THEN e.ts ELSE s.p END))
"""


@register(
    "win_pattern_funnel",
    oracle=f"""
    WITH v AS (
      SELECT user_id, MIN(ts) AS v
      FROM {EVENTS_REL} e WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS c
      FROM {EVENTS_REL} e JOIN v ON e.user_id = v.user_id AND e.ts > v.v
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS p
      FROM {EVENTS_REL} e JOIN c ON e.user_id = c.user_id AND e.ts > c.c
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    u AS (SELECT DISTINCT user_id FROM {EVENTS_REL} e)
    SELECT u.user_id,
           v.v AS first_view, c.c AS first_click, p.p AS first_purchase,
           CAST(CASE WHEN v.v IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN c.c IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN p.p IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
             AS stage
    FROM u
    LEFT JOIN v ON u.user_id = v.user_id
    LEFT JOIN c ON u.user_id = c.user_id
    LEFT JOIN p ON u.user_id = p.user_id
    """,
    category="window",
)
def win_pattern_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel per user: first view, first click
    STRICTLY AFTER that view, first purchase strictly after that click
    (MATCH_RECOGNIZE-shaped product analytics).

    The naive SQL is three self-joins, each re-shuffling the events
    table. Here the whole pattern runs in ONE shuffle: sort each
    user's events (collect_list + sort_array — (ts, event_id) order
    makes ties deterministic), then a single `aggregate` fold walks
    the timeline once carrying the (view, click, purchase) state —
    per-user linear, whole-stage-codegen'd, no Python. At 100 TB the
    fold's state is 3 timestamps regardless of history length; a hot
    user's array is the only skew point (cap or salt the collect at
    ingest if a key can exceed memory). The oracle IS the three-join
    formulation, so the fold is verified against the quadratic-shuffle
    plan it replaces.
    """
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", F.col("event_type").alias("et")))
        ).alias("evs")
    )
    folded = g.select("user_id", F.expr(FUNNEL_FOLD_EXPR).alias("f"))
    stage = (
        F.when(F.col("f.v").isNotNull(), 1).otherwise(0)
        + F.when(F.col("f.c").isNotNull(), 1).otherwise(0)
        + F.when(F.col("f.p").isNotNull(), 1).otherwise(0)
    )
    return folded.select(
        "user_id",
        F.col("f.v").alias("first_view"),
        F.col("f.c").alias("first_click"),
        F.col("f.p").alias("first_purchase"),
        stage.cast("bigint").alias("stage"),
    )


# EWMA smoothing factor. alpha = 0.5 is deliberate: every weight is an
# exact power of two (POWER(0.5, k) is correctly rounded to 2^-k in any
# IEEE libm), so Spark and DuckDB compute identical per-row terms and
# only the summation order can drift (handled by ROUND like every other
# float aggregate in the registry).
_EWMA_ORACLE = f"""
WITH r AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rd,
         COUNT(*) OVER (PARTITION BY user_id) AS cnt
  FROM {EVENTS_REL} e
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(MAX(CASE WHEN rd = 1 THEN value END), 6) AS last_value,
       ROUND(SUM(CASE WHEN rd = cnt THEN POWER(0.5, cnt - 1)
                      ELSE POWER(0.5, rd) END * value), 6) AS ewma
FROM r GROUP BY user_id
"""


@register("win_ewma", oracle=_EWMA_ORACLE, category="window")
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per key — the smoothed
    "current state" a telemetry pipeline keeps per sensor/user.

    The recursion ewma_t = a*x_t + (1-a)*ewma_{t-1} is rewritten in
    closed form over the REVERSE rank rd (1 = newest): the rd-th newest
    reading weighs a*(1-a)^(rd-1), the oldest weighs (1-a)^(n-1). That
    turns a sequential fold into one window pass + one aggregate that
    SHARE the user_id partitioning — a single shuffle, no per-row
    Python, no recursive self-join. The per-row closed form is used
    instead of a running forward cumsum because the forward rewrite
    needs 2^i scale factors that overflow past ~1000 rows; the reverse
    form only ever multiplies by 2^-k, which underflows to an exact 0
    and stays correct. Weights are exact powers of two (see note above)
    so both engines agree term-for-term.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    wp = Window.partitionBy("user_id")
    r = ev.select(
        "user_id",
        "value",
        F.row_number().over(w).alias("rd"),
        F.count(F.lit(1)).over(wp).alias("cnt"),
    )
    weight = F.when(
        F.col("rd") == F.col("cnt"), F.pow(F.lit(0.5), F.col("cnt") - 1)
    ).otherwise(F.pow(F.lit(0.5), F.col("rd")))
    return r.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.round(F.max(F.when(F.col("rd") == 1, F.col("value"))), 6).alias(
            "last_value"
        ),
        F.round(F.sum(weight * F.col("value")), 6).alias("ewma"),
    )


_ZS_FRAME = 10     # trailing window length (rows, excluding current)
_ZS_MIN_PREV = 5   # minimum history before scoring
_ZS_THRESH = 3.0   # |z| above this flags an anomaly

_ZSCORE_ORACLE = f"""
WITH w AS (
  SELECT event_id, user_id, value, ts,
         COUNT(*)     OVER fr AS n_prev,
         AVG(value)   OVER fr AS mu,
         STDDEV_SAMP(value) OVER fr AS sd
  FROM {EVENTS_REL} e
  WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN {_ZS_FRAME} PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, ROUND(value, 6) AS value,
       CAST(n_prev AS BIGINT) AS n_prev,
       ROUND((value - mu) / sd, 6) AS z,
       ABS(ROUND((value - mu) / sd, 6)) > {_ZS_THRESH} AS is_anomaly
FROM w
WHERE n_prev >= {_ZS_MIN_PREV} AND sd > 0
"""


@register("win_anomaly_zscore", oracle=_ZSCORE_ORACLE, category="window")
def win_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each reading scored against
    the mean/stddev of its own trailing {_ZS_FRAME} readings — the
    self-calibrating telemetry monitor (no global thresholds, adapts
    per key as its baseline drifts).

    One user_id exchange serves all three frame aggregates (count,
    avg, stddev share the WINDOW spec); rows with under {_ZS_MIN_PREV}
    observations of history are withheld rather than scored against
    noise. The anomaly verdict compares the ROUNDED z on both engines,
    so the float boundary is decided identically. At 100 TB this is a
    pure streaming-friendly shape: the frame state is O(window) per
    key and the same logic runs under Structured Streaming with
    `applyInPandasWithState` if continuous scoring is needed.
    """
    ev = load_table(spark, sf_dir, "events")
    fr = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-_ZS_FRAME, -1)
    )
    w = ev.select(
        "event_id",
        "user_id",
        "value",
        F.count("value").over(fr).alias("n_prev"),
        F.avg("value").over(fr).alias("mu"),
        F.stddev_samp("value").over(fr).alias("sd"),
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sd"), 6)
    return (
        w.filter((F.col("n_prev") >= _ZS_MIN_PREV) & (F.col("sd") > 0))
        .select(
            "event_id",
            "user_id",
            F.round("value", 6).alias("value"),
            F.col("n_prev").cast("bigint").alias("n_prev"),
            z.alias("z"),
            (F.abs(z) > _ZS_THRESH).alias("is_anomaly"),
        )
    )


_RMED_N = 10  # trailing window width (readings)

_RMED_ORACLE = f"""
WITH s AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value
  FROM {EVENTS_REL} e
),
w AS (
  SELECT user_id, event_id, us, value,
         MEDIAN(value) OVER (PARTITION BY user_id ORDER BY us, event_id
                             ROWS BETWEEN {_RMED_N - 1} PRECEDING
                             AND CURRENT ROW) AS med,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
  FROM s
)
SELECT user_id, event_id,
       ROUND(med, 6) AS rolling_median,
       ROUND(ABS(value - med), 6) AS abs_dev
FROM w WHERE rn > {_RMED_N - 1}
"""


@register("win_rolling_median", oracle=_RMED_ORACLE, category="window")
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling MEDIAN over the trailing {_RMED_N} readings per user —
    the robust centre line `win_anomaly_zscore`'s mean/stddev can't
    give (one outlier drags a mean; the median shrugs).  Rows before
    a full window are suppressed, so every output row summarizes
    exactly {_RMED_N} readings.

    Plan: ONE user_id exchange; Spark disallows `median()` over a
    window FRAME, so the frame's {_RMED_N} values collect into a
    bounded array and the midpoint computes array-locally
    (sort + (el[k-1]+el[k])/2 — the same even-count interpolation
    DuckDB's windowed MEDIAN applies, on the identical elements).
    At 100 TB this is the same partitioned-sort shape as every
    per-key window here — no self-join row explosion (the naive
    rolling-median rewrite), and the per-row state is bounded by the
    frame width.
    """
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), "event_id")
        .rowsBetween(-(_RMED_N - 1), Window.currentRow)
    )
    wrn = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    mid_lo = (_RMED_N - 2) // 2  # 0-indexed lower middle for even N
    med = F.expr(
        "aggregate(slice(array_sort(vals), {lo} + 1, 2), 0D,"
        " (a, v) -> a + v) / 2".format(lo=mid_lo)
    )
    out = (
        e.withColumn("vals", F.collect_list("value").over(w))
        .withColumn("med", med)
        .withColumn("rn", F.row_number().over(wrn))
        .filter(F.col("rn") > _RMED_N - 1)
    )
    return out.select(
        "user_id",
        "event_id",
        F.round("med", 6).alias("rolling_median"),
        F.round(F.abs(F.col("value") - F.col("med")), 6).alias("abs_dev"),
    )


_MAD_K = 1.4826      # normal-consistency constant
_MAD_THRESH = 3.0

_MAD_ORACLE = f"""
WITH med AS (
  SELECT user_id, MEDIAN(value) AS med
  FROM (SELECT user_id, value FROM events) GROUP BY user_id
),
dev AS (
  SELECT e.user_id, e.value, m.med, ABS(e.value - m.med) AS adev
  FROM (SELECT user_id, value FROM events) e
  JOIN med m ON m.user_id = e.user_id
),
mad AS (
  SELECT user_id, MEDIAN(adev) AS mad FROM dev GROUP BY user_id
)
SELECT d.user_id,
       ROUND(MAX(d.med), 6) AS med,
       ROUND(MAX(a.mad), 6) AS mad,
       CAST(COUNT(*) AS BIGINT) AS n_readings,
       CAST(SUM(CASE WHEN a.mad > 0
                     AND ABS(d.value - d.med)
                         > {_MAD_THRESH} * {_MAD_K} * a.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM dev d JOIN mad a ON a.user_id = d.user_id
GROUP BY d.user_id
"""


@register("win_anomaly_mad", oracle=_MAD_ORACLE, category="window")
def win_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection via Median Absolute Deviation: per
    user, flag readings with |x - median| > {_MAD_THRESH} x {_MAD_K}
    x MAD — the robust twin of `win_anomaly_zscore` (a single wild
    outlier inflates a stddev enough to hide itself; it barely moves
    the MAD).

    Plan: two median aggregates per user (median, then median of
    absolute deviations — MAD is inherently two-pass) with the
    deviation join broadcast-free on the shared user_id partitioning;
    the anomaly count folds into the second pass.  Both engines use
    the same even-count median interpolation on identical element
    sets, and the verdict compares against the same product, so the
    boundary decides identically.
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "value")
    med = e.groupBy("user_id").agg(F.expr("median(value)").alias("med"))
    dev = e.join(med, "user_id").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("user_id").agg(F.expr("median(adev)").alias("mad"))
    full = dev.join(mad, "user_id")
    return full.groupBy("user_id").agg(
        F.round(F.max("med"), 6).alias("med"),
        F.round(F.max("mad"), 6).alias("mad"),
        F.count(F.lit(1)).cast("bigint").alias("n_readings"),
        F.sum(
            F.when(
                (F.col("mad") > 0)
                & (
                    F.abs(F.col("value") - F.col("med"))
                    > _MAD_THRESH * _MAD_K * F.col("mad")
                ),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_anomalies"),
    )


_DRAWDOWN_ORACLE = f"""
WITH s AS (
  SELECT user_id, event_id,
         epoch_us(ts) AS us,
         CAST(ROUND(value * 10000) AS BIGINT) - 200000 AS step
  FROM {EVENTS_REL} e
),
eqs AS (
  SELECT user_id, event_id, us,
         SUM(step) OVER (PARTITION BY user_id ORDER BY us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS eq
  FROM s
),
dd AS (
  SELECT user_id, event_id, us, eq,
         MAX(eq) OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - eq AS d
  FROM eqs
),
agg AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(MAX(d) AS BIGINT) AS max_dd_i
  FROM dd GROUP BY user_id
),
fin AS (
  SELECT user_id, CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT) - 200000)
                       AS BIGINT) AS final_i
  FROM {EVENTS_REL} e GROUP BY user_id
),
sel AS (
  SELECT user_id, us AS dd_us FROM (
    SELECT d.user_id, d.us,
           ROW_NUMBER() OVER (PARTITION BY d.user_id
                              ORDER BY d.us, d.event_id) AS rn
    FROM dd d JOIN agg a USING (user_id)
    WHERE d.d = a.max_dd_i
  ) WHERE rn = 1
)
SELECT a.user_id, a.n_events,
       ROUND(f.final_i / 10000.0, 4) AS final_pnl,
       ROUND(a.max_dd_i / 10000.0, 4) AS max_drawdown,
       CAST(s.dd_us AS BIGINT) AS dd_ts_us
FROM agg a JOIN fin f USING (user_id) JOIN sel s USING (user_id)
"""


@register("win_drawdown", oracle=_DRAWDOWN_ORACLE, category="window")
def win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user over the signed running P&L curve
    (each event contributes value−20): running peak minus running
    equity, the risk statistic every trading / capacity / error-budget
    dashboard wants next to the mean.

    All curve arithmetic runs in exact integer 1e-4 units (`value` has
    ≤4 decimals), so cumulative sums, the running peak, and the argmax
    tie-break (earliest µs, then event_id) are bit-identical across
    engines — no float accumulation-order hazard.  The drawdown
    INSTANT comes from a single `max(struct(dd, -us, -event_id))`
    aggregate, not a second windowed pass.

    Plan: ONE user_id exchange serves the cumsum window, the running
    peak, and the final per-user aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        (F.round(F.col("value") * 10000).cast("bigint") - 200000).alias(
            "step"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = (
        s.withColumn("eq", F.sum("step").over(w))
        .withColumn("peak", F.max(F.col("eq")).over(w))
        .withColumn("d", F.col("peak") - F.col("eq"))
    )
    m = runs.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("step").cast("bigint").alias("final_i"),
        F.max("d").cast("bigint").alias("max_dd_i"),
        F.max(
            F.struct(
                F.col("d").alias("d"),
                (-F.col("us")).alias("nus"),
                (-F.col("event_id")).alias("nid"),
            )
        ).alias("arg"),
    )
    return m.select(
        "user_id",
        "n_events",
        F.round(F.col("final_i") / 10000.0, 4).alias("final_pnl"),
        F.round(F.col("max_dd_i") / 10000.0, 4).alias("max_drawdown"),
        (-F.col("arg.nus")).cast("bigint").alias("dd_ts_us"),
    )


_VELOCITY_ORACLE = f"""
WITH s AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(ROUND(value * 10000) AS BIGINT) AS x
  FROM {EVENTS_REL} e
),
d AS (
  SELECT user_id, event_id, us, x,
         x - LAG(x) OVER w AS dx,
         us - LAG(us) OVER w AS dt_us,
         x - 2 * LAG(x) OVER w + LAG(x, 2) OVER w AS d2x
  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
)
SELECT user_id, event_id, dx, dt_us, d2x,
       ROUND(dx * 360.0 / dt_us, 6) AS rate_per_hour
FROM d WHERE dt_us IS NOT NULL
"""


@register("win_velocity_accel", oracle=_VELOCITY_ORACLE, category="window")
def win_velocity_accel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete first and second differences over each user's
    irregular time series: Δvalue, Δt, the per-hour rate, and the
    second difference (acceleration sign) — the change-velocity
    telemetry behind burn-rate alerts and trend-break triage, on RAW
    irregular timestamps (no resample-first requirement like
    `ts_resample_interpolate`).

    Δx and the second difference stay exact 1e-4-scaled BIGINTs; the
    single rate division (dx·3600e6 / dt / 1e4 = dx·360/dt) happens
    on identical integer operands.  One user exchange serves all
    three lag windows.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 10000).cast("bigint").alias("x"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    d = (
        s.withColumn("dx", F.col("x") - F.lag("x").over(w))
        .withColumn("dt_us", F.col("us") - F.lag("us").over(w))
        .withColumn(
            "d2x",
            F.col("x") - 2 * F.lag("x").over(w) + F.lag("x", 2).over(w),
        )
    )
    return d.filter(F.col("dt_us").isNotNull()).select(
        "user_id",
        "event_id",
        "dx",
        "dt_us",
        "d2x",
        # try_divide: two events at the same instant (dt=0) rate NULL,
        # matching DuckDB's x/0 -> NULL, instead of an ANSI error.
        F.round(F.try_divide(F.col("dx") * 360.0, F.col("dt_us")), 6).alias(
            "rate_per_hour"
        ),
    )


_CUMDIST_ORACLE = f"""
WITH flagged AS (
  SELECT event_id, user_id, ts,
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM {EVENTS_REL} e
)
SELECT event_id, user_id,
       CAST(SUM(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS distinct_types_so_far,
       first_seen = 1 AS is_discovery
FROM flagged
"""


@register(
    "win_cumulative_distinct", oracle=_CUMDIST_ORACLE, category="window"
)
def win_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count per user timeline (how many distinct
    event types has this user touched so far?) — the discovery/
    feature-adoption curve.  `COUNT(DISTINCT) OVER (ORDER BY …)` is
    unsupported/quadratic in SQL engines; the scalable identity is
    first-occurrence flagging (rank 1 within (user, type)) + a
    running SUM of flags — two windows, exact, linear.

    Plan: TWO exchanges — hashpartitioning(user, type) for the rank,
    then hashpartitioning(user) for the running sum (Spark does not
    treat the finer partitioning as satisfying the coarser window's
    requirement).  Both shuffles carry the corpus once; collapsing to
    one would need the flag computed via a per-user sort on a single
    exchange, which costs the same sort anyway.
    """
    ev = load_table(spark, sf_dir, "events")
    w1 = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    flagged = ev.withColumn(
        "first_seen",
        F.when(F.row_number().over(w1) == 1, 1).otherwise(0),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return flagged.select(
        "event_id",
        "user_id",
        F.sum("first_seen").over(w2).cast("bigint").alias(
            "distinct_types_so_far"
        ),
        (F.col("first_seen") == 1).alias("is_discovery"),
    )
