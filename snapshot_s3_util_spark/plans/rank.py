"""Scale-safe global order statistics (two-pass range-partitioned form).

`Window.partitionBy()` (empty spec) moves the ENTIRE input to one task —
the single-partition WindowExec Spark itself warns about, and the one
plan shape that cannot survive a 100x scale-up no matter what the data
is. `sort_multi` (operators/sorts.py) replaced its global row_number
with a two-pass range-partitioned rank in round 6; this module extracts
that pattern so every op whose global-ORDER-BY frame grows with the
data (|rows|, |users|, |docs|, |vocabulary|) shares one audited
implementation. plans/audit.py + tools/plan_audit.py flag any remaining
unpartitioned window registry-wide.

The shape:

  1. `repartitionByRange(npart, *keys)` — partition i holds strictly
     smaller sort keys than partition i+1; each partition ~|rows|/npart.
  2. LOCAL row numbers / running sums per range partition. Two forms:
     - FAST (no running sums requested): `sortWithinPartitions(keys)`
       + `monotonically_increasing_id()` — the local 0-based index is
       the mid's low 33 bits, assigned in sorted row order. No window
       over the data AT ALL, and critically no second exchange: a
       window partitioned by pid would demand
       ClusteredDistribution(pid), which the range layout does not
       satisfy, so Catalyst would insert a full hashpartitioning(pid)
       shuffle (and hash(0..npart-1) into npart buckets leaves ~1/e of
       the tasks empty while piling 2-3 range partitions onto others).
     - CUMSUM: running sums need sequential per-partition scans, so the
       window partitioned by `spark_partition_id()` remains (bounded
       frame, no warning) and pays that second exchange.
  3. Global value = local value + the partition's count/sum prefix
     offset: `groupBy(pid).agg(...)` (npart rows), prefix-summed by a
     window over those npart rows, broadcast back. Grand totals ride
     the same npart-row ledger for free.

CORRECTNESS-CRITICAL: the offsets ledger and the rank/cumsum side must
observe the SAME partition boundaries. RangePartitioner samples its
boundaries per physical exchange, so two separately-planned exchanges
over the same data can split boundary keys differently — the offsets
would then be computed against one layout and applied to another
(observed: a constant rank shift after the first boundary). Spark's
ReuseExchange dedupes the two subtrees ONLY while they stay canonically
identical, and ColumnPruning breaks that the moment the frame carries a
payload column the ledger doesn't aggregate (it prunes the ledger's
copy, the subtrees diverge, reuse silently vanishes). The helper
therefore pins the boundary decision structurally: the range-exchanged
spine is `localCheckpoint(eager=False)`-ed, so both consumers read one
materialized RDD with one partitioner. Cost: one extra in-memory pass
over the frame — the standard price of a multi-consumer exact-rank
pipeline, amortized across every statistic the call computes.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]

# Internal column names; prefixed to avoid colliding with caller schemas.
_PID = "_grn_pid"
_MID = "_grn_mid"

# --- scale-adaptive npart (r15, guide §2: partitioning must derive from
# input size / cores, not a constant tuned for one deployment). When the
# caller does not pin npart, it is max(cores, est_bytes / target) capped:
#   - cores floor keeps every core busy at any size (local[8] gets 8,
#     local[32] gets 32 — the r14 constant 32 was the local[32] value
#     hard-coded);
#   - est_bytes / _RANK_PART_BYTES keeps each range partition's sort at
#     ~256 MB of input as the frame grows, so a 100 TB spine gets ~400k
#     partitions instead of 32 x 3 TB tasks;
#   - _RANK_MAX_NPART bounds the offsets ledger (npart rows, broadcast)
#     and the mid-based local index far under its 2**33-row bound.
# The estimate is Catalyst's planning-time sizeInBytes (file-size-based
# for scans, propagated through projections/filters); frames with no
# usable estimate (post-checkpoint RDDs report the defaultSizeInBytes
# sentinel) fall back to the cores floor — exactly the r14 behavior at
# local[32]. Override per session with the conf key below (documented
# in OPTIMIZATION_r15.md; the local default keeps the bench comparable).
_RANK_PART_BYTES = 256 << 20
_RANK_MAX_NPART = 65536
_RANK_PART_BYTES_CONF = "spark.snapshot_s3_util.rank.targetPartitionBytes"
_STATS_UNKNOWN = 1 << 62  # >= this = missing-stats sentinel, not a size

# r15 (r14 verdict ask #7, boundary-exchange fusion): when the ledger
# is small, its prefix sums are computed ON THE DRIVER (one collect of
# npart rows over the already-checkpointed spine) and re-attached as
# literal maps — removing the ledger's hash exchange, its 1-task window
# re-exchange AND the BroadcastExchange/join from the plan. Measured on
# sort_multi (interleaved min-of-7, construction+collect): fused won
# 7/7 pairs, min 1.98 vs 2.56 s. Above the bound the r14 distributed
# ledger (window + broadcast join) remains: a create_map literal with
# 2*npart children is plan bloat at large npart, and the whole point of
# the distributed form is that it never moves the ledger through the
# driver. npart rows are bounded by construction, so the collect is
# O(npart) forever.
_RANK_FUSE_MAX_NPART = 4096


def _derive_npart(df: DataFrame) -> int:
    """Range-partition count for `df`'s spine: max(cores, bytes/target),
    capped. See the constants block above for the derivation."""
    sess = df.sparkSession
    cores = sess.sparkContext.defaultParallelism
    try:
        target = int(sess.conf.get(_RANK_PART_BYTES_CONF, str(_RANK_PART_BYTES)))
    except Exception:
        target = _RANK_PART_BYTES
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        est = 0
    if est <= 0 or est >= _STATS_UNKNOWN:
        return cores
    return max(cores, min(-(-est // target), _RANK_MAX_NPART))

# monotonically_increasing_id() = partition_id * 2**33 + row index
# within the partition, assigned in row iteration order.
_MID_PART_BITS = 33


def global_order_stats(
    df: DataFrame,
    keys: Sequence[ColumnOrName],
    *,
    rn: Optional[str] = None,
    cumsum: Optional[Mapping[str, str]] = None,
    totals: Optional[Mapping[str, str]] = None,
    ntotal: Optional[str] = None,
    npart: Optional[int] = None,
) -> DataFrame:
    """`df` + exact global order statistics under ORDER BY `keys`,
    without a single-partition window.

    rn      -> name of a 1-based global row_number column
    cumsum  -> {src: out}: INCLUSIVE global prefix sum of `src`
    totals  -> {src: out}: grand total of `src` on every row
    ntotal  -> name of a grand row-count column

    NULL handling for `cumsum`: NULL source rows contribute 0 and the
    running sum starts at 0 — i.e. a leading all-NULL prefix yields 0,
    where `SUM(src) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)` would
    yield NULL until the first non-NULL value. Every current caller
    feeds non-null counts, where the two semantics coincide; pre-filter
    or pre-coalesce the source if you need the SQL NULL-prefix shape.

    `keys` must be a total order for `rn`/`cumsum` to be deterministic
    (add a unique tiebreaker as the last key, exactly as you would
    under `ROW_NUMBER() OVER (ORDER BY ...)`). `npart` bounds the
    per-task frame at ~|rows|/npart; the offsets side stays npart rows
    and is broadcast regardless. npart=None (the default) derives it
    from the input-size estimate with a cores floor (`_derive_npart`)
    — rank/cumsum values are exact for ANY npart, so the choice is
    pure performance.
    """
    if npart is None:
        npart = _derive_npart(df)
    cumsum = dict(cumsum or {})
    totals = dict(totals or {})
    keys = [F.col(k) if isinstance(k, str) else k for k in keys]

    # The checkpointed spine: ONE range exchange, ONE partitioner —
    # see the module docstring for why this must not rely on
    # ReuseExchange.
    #
    # FAST PATH (no running sums requested): the local row number comes
    # from `monotonically_increasing_id()` assigned ABOVE a
    # `sortWithinPartitions`, not from a window.  A window partitioned
    # by pid requires ClusteredDistribution(pid), which the
    # range-partitioned spine does not satisfy, so Catalyst inserts a
    # SECOND full hashpartitioning(pid) exchange — and hash(0..npart-1)
    # into npart buckets leaves ~1/e of the tasks empty and piles 2-3
    # range partitions onto others (measured: the dominant cost of
    # sort_multi's 30x stress wall).  The mid form keeps the plan at
    # exactly one data-sized exchange + one local sort, both in the
    # same stage; the nondeterministic mid is frozen by the
    # localCheckpoint, so the ledger and the rank side read identical
    # values.  Local index < 2**33 bounds a range partition at 8.5e9
    # rows — size npart so partitions stay far under that (they must
    # fit an executor anyway).
    fast = not cumsum
    if fast:
        part = (
            df.repartitionByRange(npart, *keys)
            .sortWithinPartitions(*keys)
            .withColumn(_MID, F.monotonically_increasing_id())
            .localCheckpoint(eager=False)
            .withColumn(
                _PID,
                F.shiftrightunsigned(F.col(_MID), _MID_PART_BITS).cast("int"),
            )
        )
    else:
        part = (
            df.repartitionByRange(npart, *keys)
            .withColumn(_PID, F.spark_partition_id())
            .localCheckpoint(eager=False)
        )

    # npart-row ledger: per-partition row count + per-source sums.
    srcs = sorted(set(cumsum) | set(totals))
    ledger = part.groupBy(_PID).agg(
        F.count("*").alias("_grn_cnt"),
        *[F.sum(s).alias(f"_grn_sum_{s}") for s in srcs],
    )
    fuse = npart <= _RANK_FUSE_MAX_NPART
    if fuse:
        # Driver-side ledger (see _RANK_FUSE_MAX_NPART above): collect
        # the npart rows, prefix-sum in Python in pid order — exactly
        # the window's ROWS UNBOUNDED PRECEDING ... -1 frame, with SQL
        # SUM's NULL-skipping reproduced by treating a NULL partition
        # sum as +0 (and an all-NULL source's grand total as NULL).
        sum_ty = {
            f.name: f.dataType.simpleString() for f in ledger.schema.fields
        }
        lrows = sorted(ledger.collect(), key=lambda r: r[_PID])
        cnt_prefix: dict = {}
        acc = 0
        for r in lrows:
            cnt_prefix[r[_PID]] = acc
            acc += r["_grn_cnt"]
        ntotal_val = acc
        soff_maps: dict = {}
        stot_vals: dict = {}
        for s in srcs:
            pref: dict = {}
            sacc = None
            for r in lrows:
                pref[r[_PID]] = 0 if sacc is None else sacc
                v = r[f"_grn_sum_{s}"]
                if v is not None:
                    sacc = v if sacc is None else sacc + v
            soff_maps[s] = pref
            stot_vals[s] = sacc

        def _lit_map(d: dict, vtype: str) -> Column:
            items = [
                x
                for k, v in sorted(d.items())
                for x in (F.lit(k), F.lit(v).cast(vtype))
            ]
            # empty frame -> empty ledger; any placeholder typechecks,
            # no row ever evaluates it
            return (
                F.create_map(*items)
                if items
                else F.create_map(F.lit(0), F.lit(None).cast(vtype))
            )
    else:
        # Distributed ledger (the r14 form): prefix-sum via a window.
        # Partition by a NON-FOLDABLE constant (`pid % 1` = 0): a
        # foldable literal is optimized out of the partition spec,
        # re-triggering the no-partition WindowExec warning this helper
        # exists to remove. The frame is npart rows.
        w_prefix = (
            Window.partitionBy(F.col(_PID) % 1)
            .orderBy(_PID)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        w_ledger = Window.partitionBy(F.col(_PID) % 1)
        off_cols = [F.col(_PID)]
        if rn is not None or ntotal is not None:
            off_cols.append(
                F.coalesce(F.sum("_grn_cnt").over(w_prefix), F.lit(0)).alias(
                    "_grn_off"
                )
            )
        if ntotal is not None:
            off_cols.append(F.sum("_grn_cnt").over(w_ledger).alias(ntotal))
        for s in srcs:
            if s in cumsum:
                off_cols.append(
                    F.coalesce(
                        F.sum(f"_grn_sum_{s}").over(w_prefix), F.lit(0)
                    ).alias(f"_grn_soff_{s}")
                )
            if s in totals:
                off_cols.append(
                    F.sum(f"_grn_sum_{s}").over(w_ledger).alias(totals[s])
                )
        offsets = ledger.select(*off_cols)

    out = part
    drop = [_PID]
    if fast:
        if rn is not None:
            # 1-based local row number straight from the frozen mid.
            out = out.withColumn(
                "_grn_lrn",
                F.col(_MID).bitwiseAND(F.lit((1 << _MID_PART_BITS) - 1))
                + F.lit(1),
            )
            drop.append("_grn_lrn")
        drop.append(_MID)
    else:
        w_local = Window.partitionBy(_PID).orderBy(*keys)
        w_run = w_local.rowsBetween(Window.unboundedPreceding, 0)
        if rn is not None:
            out = out.withColumn("_grn_lrn", F.row_number().over(w_local))
            drop.append("_grn_lrn")
        for s in cumsum:
            out = out.withColumn(f"_grn_lcs_{s}", F.sum(s).over(w_run))
            drop.append(f"_grn_lcs_{s}")
    if fuse:
        pid_col = F.col(_PID)
        if rn is not None:
            out = out.withColumn(
                rn,
                (
                    _lit_map(cnt_prefix, "bigint")[pid_col]
                    + F.col("_grn_lrn")
                ).cast("bigint"),
            )
        if ntotal is not None:
            out = out.withColumn(ntotal, F.lit(ntotal_val).cast("bigint"))
        for s, name in cumsum.items():
            # coalesce: a partition whose leading rows are NULL would
            # otherwise poison soff + NULL -> NULL (see NULL handling
            # above)
            out = out.withColumn(
                name,
                _lit_map(soff_maps[s], sum_ty[f"_grn_sum_{s}"])[pid_col]
                + F.coalesce(F.col(f"_grn_lcs_{s}"), F.lit(0)),
            )
        for s, name in totals.items():
            out = out.withColumn(
                name, F.lit(stot_vals[s]).cast(sum_ty[f"_grn_sum_{s}"])
            )
        return out.drop(*drop)
    out = out.join(F.broadcast(offsets), _PID)
    if rn is not None:
        out = out.withColumn(
            rn, (F.col("_grn_off") + F.col("_grn_lrn")).cast("bigint")
        )
    if rn is not None or ntotal is not None:
        drop.append("_grn_off")
    for s, name in cumsum.items():
        # coalesce: a partition whose leading rows are NULL would
        # otherwise poison soff + NULL -> NULL (see NULL handling above)
        out = out.withColumn(
            name,
            F.col(f"_grn_soff_{s}") + F.coalesce(F.col(f"_grn_lcs_{s}"), F.lit(0)),
        )
        drop.append(f"_grn_soff_{s}")
    return out.drop(*drop)


def global_row_number(
    df: DataFrame,
    keys: Sequence[ColumnOrName],
    out: str = "rn",
    npart: Optional[int] = None,
) -> DataFrame:
    """`df` + column `out` = exact 1-based global row_number under
    ORDER BY `keys` (see :func:`global_order_stats`)."""
    return global_order_stats(df, keys, rn=out, npart=npart)
