"""Measured scale stress for the heavy-op set (r7 verdict ask #4).

No sf1 testdata exists in the sandbox, so this tool BUILDS a ~N x sf0.1
tier by unioning sf0.1 N times with id offsets, then measures the six
heaviest registry ops at sf0.1 and at the stress tier and reports wall
time and shuffle-write bytes growth. "Survives 100x" stops being a
plan-shape argument and becomes a measurement: every op below is
designed to grow ~linearly, and the report calls out anything
super-linear.

Replica construction keeps per-replica WORKLOAD DENSITY identical to
sf0.1 (the property that makes growth-factor ~N the pass bar):

- documents: replica k > 0 suffixes every token with the replica id, so
  within-replica duplicate/shingle structure is bit-identical to sf0.1
  while NOTHING matches across replicas — duplicate rate, gram
  frequencies (substring-span cap!), and cluster sizes stay constant
  instead of clusters growing x N (which would quadratically inflate
  LSH bucket pair mass and measure a different workload). The suffix is
  FIXED-WIDTH (zero-padded to 3 digits, good to 1000x): a variable-width
  suffix (rounds 8-9a) made salted replicas at the 30x tier wider than
  at the 10x tier, which inflated the shuffle-byte lever arm for every
  shingle-string exchange (~4.7x where linear reads 3.0x) and needed a
  footnote. With a fixed width, per-replica bytes are tier-invariant:
  tier shuffle = s_base + (mult-1) * s_salted, affine-linear in mult.
- embeddings: id offset only; probes are id-bounded (vec_id <
  N_PROBES), so probe count stays fixed and ANN candidate work grows
  ~linearly with the corpus.
- orders/lineitem: o_orderkey/l_orderkey offset in lockstep so the
  order<->lineitem join keys stay consistent; dimension tables
  (customer/supplier/nation/region/part) are copied as-is — dims stay
  catalog-sized at 100 TB, that's the design point.
- events: event_id/user_id offset per replica — disjoint user
  populations with identical per-user session structure, so
  sessionization work grows ~linearly.

Shuffle bytes come from the Spark UI REST API (the stress session runs
with the UI enabled on a fixed port; the engine's normal sessions keep
it off), snapshotted around the timed runs.

Usage:
    python tools/stress.py [--mult 10] [--base /root/testdata/sf0.1]
                           [--out .stress] [--report] [op ...]

--report writes STRESS.md. The stress tier is built once and reused;
--rebuild forces a fresh build. The output dir is gitignored.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STRESS_OPS = (
    # the six heaviest registry ops (r7 verdict ask #4) ...
    "llm_dedup_near_minhash",
    "llm_dedup_components",
    # r14: the merge-safe twin — same candidates plus the exact-Jaccard
    # verify pass; its rows price the verify stage's growth next to the
    # unverified base
    "llm_dedup_components_verified",
    "llm_dedup_substring_spans",
    "llm_sim_ann_lsh",
    "llm_sim_ann_ivf",
    "llm_sim_ann_ivf_kmeans",  # r10: learned-quantizer IVF
    # r14 (SCALE.md r13 note): the cluster-partitioned IVF probe joins
    # the canonical set — its interim subset series showed wall
    # dominated by the fixed index-build machinery; the full-cache rows
    # make that growth evidence first-class
    "llm_sim_ann_ivf_partitioned",
    "stream_foreach_batch_export",  # r10: first streaming op measured (r9 ask #5)
    "sort_multi",
    "graph_label_propagation",
    # ... r14 (r13 verdict ask #6): the keyed-frontier twins — same
    # oracles as their broadcast-frontier bases, no |V| broadcast per
    # round (plan-asserted); their rows here price the keyed-shuffle
    # insurance on these small graphs, next to the base rows
    "graph_label_propagation_keyed",
    "graph_bfs_hops",
    "graph_bfs_hops_keyed",
    # ... plus the BASELINE.md flagship set, so the vs-baseline grade
    # and the measured-growth evidence cover the same queries
    "agg_hash_groupby",
    "join_3way_topk",
    "llm_dedup_exact",
    "llm_sim_topk_brute",
    "sessionize_batch",
    # ... r13 (r12 verdict ask #7): the skew-mitigation twins join the
    # 3-tier matrix — their chunk-summary stitch has its own growth
    # axis (chunks x users) that SKEW.md's single-tier rows can't see
    "sessionize_segmented",
    "win_fill_forward_segmented",
    # ... r10: the REST of the bench flagship set, so every query the
    # driver benches carries measured 10x/30x/100x growth evidence, not
    # just a plan-shape argument
    "topk_per_group",
    "join_range_bucketed",
    "join_bloom_prefilter",
    "hb_wal_replay_merge",
    "graph_pagerank",
    "agg_ks_test",
    "agg_gini_coefficient",
    "llm_kmeans_iter",
    "llm_bm25_retrieval",
    "llm_contamination_ngram",
    "llm_doc_chunking",
    "llm_line_dedup",
    "llm_url_dedup",
    "llm_pipeline_curate",
    "llm_pipeline_export",
    "multimodal_ahash_dedup",
    # ... r10: the banded perceptual-hash siblings — ahash's uncapped
    # band join measured QUADRATIC here (1.14 B candidate pairs / 76 GB
    # spill at 30x, killed the run) and earned _BAND_BUCKET_CAP; these
    # rows prove the capped formulation linear and watch the siblings
    "multimodal_phash_dedup",
    "llm_dedup_simhash",
    # ... r10: the op the 60-bit widening fixed — 16-bit fingerprints
    # banded into 4-bit keys measured 3.2 B candidate pairs at 30x
    # (DuckDB bucket histogram); these rows prove the widened+capped
    # formulation linear
    "llm_dedup_simhash_pairs",
)

_COPY_TABLES = ("customer", "supplier", "nation", "region", "part")
_UI_PORT = 4055
_TIMED_RUNS = 3


def _get_spark_with_ui():
    """The engine's canonical conf, plus the UI (REST metrics source).

    Must run before any other get_spark() in this process so
    getOrCreate() yields THIS session.
    """
    from pyspark.sql import SparkSession

    from snapshot_s3_util_spark.session import _RUNTIME_CONFS, ensure_conf

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stress")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(_UI_PORT))
        .config("spark.sql.files.maxPartitionBytes", "256m")
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return ensure_conf(spark)


def build_tier(spark, base: str, out: str, mult: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out, exist_ok=True)

    def replicate(table: str, transform):
        # One plan regardless of mult (a 100-way union of per-replica
        # transforms bloats Catalyst): broadcast-crossJoin a replica-id
        # range and express the per-replica transform over the _rk
        # column. Each source row appears once per replica, exactly as
        # the old union did.
        src = spark.read.parquet(os.path.join(base, f"{table}.parquet"))
        reps = spark.range(mult).select(F.col("id").alias("_rk"))
        # One output file per replica (what the old union's write tasks
        # produced): without this the narrow crossJoin plan writes ONE
        # file per table and the measured scans lose their parallelism.
        # Before transform() — some table transforms select _rk away.
        wide = src.crossJoin(F.broadcast(reps)).repartitionByRange(mult, "_rk")
        df = transform(wide).drop("_rk")
        dst = os.path.join(out, f"{table}.parquet")
        df.write.mode("overwrite").parquet(dst + ".dir")
        # load_table expects a single-path parquet layout; a directory
        # of part files reads fine via spark.read.parquet/duckdb glob,
        # and the engine's load_table passes the path straight through,
        # so keep the directory but name it <table>.parquet.
        if os.path.exists(dst):
            shutil.rmtree(dst) if os.path.isdir(dst) else os.remove(dst)
        os.rename(dst + ".dir", dst)

    rk = F.col("_rk")

    def offset(col: str, stride: int, schema):
        # Keep the tier schema byte-identical to sf0.1 (int arithmetic
        # with the bigint _rk promotes; cast back — no id overflows
        # int32 below mult=1000 at sf0.1 cardinalities).
        return (F.col(col) + rk * F.lit(stride)).cast(schema[col].dataType).alias(col)

    # Fixed-width salt: tier-invariant per-replica bytes (see module
    # docstring). Replica 0 stays byte-identical to sf0.1.
    salt = F.lpad(rk.cast("string"), 3, "0")

    docs = spark.read.parquet(os.path.join(base, "documents.parquet"))
    n_docs = docs.count()
    replicate(
        "documents",
        lambda d: d.select(
            offset("doc_id", n_docs, docs.schema),
            F.when(rk == 0, F.col("text"))
            .otherwise(
                F.array_join(
                    F.transform(F.split("text", " "), lambda x: F.concat(x, salt)),
                    " ",
                )
            )
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        ),
    )
    emb = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
    n_vec = emb.count()
    replicate(
        "embeddings",
        lambda d: d.select(
            offset("vec_id", n_vec, emb.schema),
            "embedding",
            "label",
        ),
    )
    ords = spark.read.parquet(os.path.join(base, "orders.parquet"))
    n_ord = ords.agg(F.max("o_orderkey")).collect()[0][0] + 1
    li = spark.read.parquet(os.path.join(base, "lineitem.parquet"))
    replicate(
        "orders",
        lambda d: d.withColumn(
            "o_orderkey", offset("o_orderkey", n_ord, ords.schema)
        ),
    )
    replicate(
        "lineitem",
        lambda d: d.withColumn(
            "l_orderkey", offset("l_orderkey", n_ord, li.schema)
        ),
    )
    # events: offset both ids so each replica is a disjoint user
    # population with an identical per-user session/arrival structure;
    # ts passes through untouched (bigint-nanos or ntz-micros, either
    # parquet generation — load_table normalizes at read time).
    ev = spark.read.parquet(os.path.join(base, "events.parquet"))
    n_evt = ev.agg(F.max("event_id")).collect()[0][0] + 1
    n_usr = ev.agg(F.max("user_id")).collect()[0][0] + 1
    replicate(
        "events",
        lambda d: d.withColumn(
            "event_id", offset("event_id", n_evt, ev.schema)
        ).withColumn("user_id", offset("user_id", n_usr, ev.schema)),
    )
    for t in _COPY_TABLES:
        shutil.copy(
            os.path.join(base, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        )


def _shuffle_snapshot(app_id: str) -> dict[tuple[int, int], int]:
    """{(stageId, attemptId): shuffleWriteBytes} over completed stages."""
    url = (
        f"http://localhost:{_UI_PORT}/api/v1/applications/{app_id}"
        f"/stages?status=complete"
    )
    with urllib.request.urlopen(url, timeout=10) as resp:
        stages = json.load(resp)
    return {
        (s["stageId"], s.get("attemptId", 0)): s.get("shuffleWriteBytes", 0)
        for s in stages
    }


def measure_snapshot_pruning(spark, label: str, sf_dir: str, mult: int) -> dict:
    """Planning-time split pruning of the DSv2 snapshot source at a
    stress tier (r10 verdict ask #6).

    Layout discipline: span count scales WITH the tier (8 * mult range
    partitions on event_id) — the region analog, where region SIZE is
    constant and region COUNT grows with the table.  A fixed
    `key_range` scan then overlaps a ~constant number of spans, so the
    proof of "pruning holds at 100x" is planned-file count staying
    flat while total files grow ~mult (planned fraction -> 0), decided
    from KB-sized footer stats alone — no data pages are opened for a
    skipped split.  Walls compare the pruned read against the
    full-snapshot read through the same DataSource."""
    from snapshot_s3_util_spark.io import load_table
    from snapshot_s3_util_spark.sources.sinks import _SNAP_KR_HI, _SNAP_KR_LO
    from snapshot_s3_util_spark.sources.snapshot_source import (
        SnapshotReader,
        register_snapshot_source,
    )

    out = os.path.join("/tmp", f"s3u_spark_snapprune_{label}")
    shutil.rmtree(out, ignore_errors=True)
    ev = load_table(spark, sf_dir, "events")
    (
        ev.repartitionByRange(8 * mult, "event_id")
        .sortWithinPartitions("event_id")
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(out)
    )
    try:
        schema = spark.createDataFrame(
            [], "event_id bigint, ts timestamp, user_id bigint, "
            "value double, props string, event_type string"
        ).schema
        kr = f"{_SNAP_KR_LO}:{_SNAP_KR_HI}"
        t0 = time.perf_counter()
        planned = sum(
            len(p.files)
            for p in SnapshotReader(schema, {"path": out, "key_range": kr}).partitions()
        )
        plan_wall = time.perf_counter() - t0
        total = sum(
            len(p.files) for p in SnapshotReader(schema, {"path": out}).partitions()
        )
        register_snapshot_source(spark)

        def read_wall(opts: dict) -> float:
            reader = spark.read.format("hbase_snapshot").option("path", out)
            for k, v in opts.items():
                reader = reader.option(k, v)
            reader.load().count()  # warm-up
            t0 = time.perf_counter()
            reader.load().count()
            return time.perf_counter() - t0

        pruned_wall = read_wall({"key_range": kr})
        full_wall = read_wall({})
        res = {
            "total_files": total,
            "planned_files": planned,
            "planned_frac": round(planned / total, 4) if total else None,
            "planning_wall_sec": round(plan_wall, 3),
            "pruned_read_wall_sec": round(pruned_wall, 3),
            "full_read_wall_sec": round(full_wall, 3),
        }
        print(
            f"{label:>10s} snapshot-pruning planned={planned}/{total} "
            f"files ({res['planned_frac']}) pruned-read "
            f"{pruned_wall:.2f}s vs full {full_wall:.2f}s",
            flush=True,
        )
        return res
    finally:
        shutil.rmtree(out, ignore_errors=True)


def _snap_prune_section(snap: dict) -> list:
    lines = [
        "\n## Snapshot DataSource planning-time pruning "
        "(key_range 150:449)\n",
        "\nThe DSv2 snapshot source's region analog: range-partitioned "
        "spans of constant SIZE, so span count grows with the tier "
        "(8 per sf0.1-equivalent). A fixed rowkey scan range must then "
        "keep planned-file count ~flat while total files grow ~mult — "
        "the footer-stat split skip (`snapshot_source.py`) deciding "
        "from KB-sized metadata only. `planning wall` is the whole "
        "driver-side partition-planning pass including footer reads.\n",
        "\n| tier | total files | planned files | planned frac | "
        "planning wall | pruned read | full read |\n"
        "|---|---:|---:|---:|---:|---:|---:|\n",
    ]
    for label, r in snap.items():
        lines.append(
            f"| {label} | {r['total_files']} | {r['planned_files']} | "
            f"{r['planned_frac']} | {r['planning_wall_sec']}s | "
            f"{r['pruned_read_wall_sec']}s | {r['full_read_wall_sec']}s |\n"
        )
    return lines


def measure_simhash_capfill(spark, base: str) -> dict:
    """Bucket-saturation curve for the capped simhash band join (r10
    verdict ask #4: the 100x shuffle second-difference read 6.7 —
    transitional bucket FILLING, not the at-cap regime; this measures
    the regime directly).

    Construction: compute sf0.1 fingerprints ONCE, then union
    UNSALTED replicas with doc_id offsets — identical fingerprints per
    replica, so (band, key) bucket occupancy grows ∝ mult, crossing
    _SIMHASH_BUCKET_CAP without paying the (expensive, and for this
    question irrelevant) token-voting pipeline per tier.  The salted
    stress tiers hold occupancy constant by design; this is the
    complementary axis.

    Expected shape (the law the cap exists to enforce): below cap,
    candidates/doc grows with occupancy; once buckets saturate, the
    md5-ordered sample pins per-bucket candidates at C(cap,2), so
    TOTAL candidates plateau toward bands·n_keys·C(cap,2) — growth
    flattens to ~0 regardless of corpus size."""
    from pyspark.sql import functions as F

    from snapshot_s3_util_spark.llm.dedup import (
        _SIMHASH_BUCKET_CAP,
        _simhash_bands,
        _simhash_blk,
        _simhash_cand,
        llm_dedup_simhash,
    )

    fp0 = llm_dedup_simhash(spark, base).localCheckpoint(eager=True)
    n0 = fp0.count()
    stride = 10_000_000
    out: dict[str, dict] = {}
    for mult in (1, 2, 4, 8, 16, 32):
        fp = fp0
        for k in range(1, mult):
            fp = fp.union(
                fp0.select(
                    (F.col("doc_id") + k * stride).alias("doc_id"), "simhash"
                )
            )
        fp = fp.localCheckpoint(eager=True)
        bands = _simhash_bands(fp).localCheckpoint(eager=True)
        occ = bands.groupBy("band", "key").agg(F.count(F.lit(1)).alias("bn"))
        stats = occ.agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.round(F.avg("bn"), 1).alias("mean_occ"),
            F.max("bn").alias("max_occ"),
            F.sum(
                F.when(F.col("bn") > _SIMHASH_BUCKET_CAP, 1).otherwise(0)
            ).alias("n_overcap"),
        ).collect()[0]
        t0 = time.perf_counter()
        n_cand = _simhash_cand(_simhash_blk(bands)).count()
        wall = time.perf_counter() - t0
        row = {
            "docs": n0 * mult,
            "n_buckets": int(stats["n_buckets"]),
            "mean_occupancy": float(stats["mean_occ"]),
            "max_occupancy": int(stats["max_occ"]),
            "overcap_buckets": int(stats["n_overcap"]),
            "candidates": int(n_cand),
            "cand_per_doc": round(n_cand / (n0 * mult), 2),
            "wall_sec": round(wall, 2),
        }
        out[f"{mult}x"] = row
        print(
            f"capfill {mult:>3d}x docs={row['docs']:>7,d} "
            f"mean_occ={row['mean_occupancy']:>6.1f} "
            f"overcap={row['overcap_buckets']:>6,d} "
            f"cand={row['candidates']:>12,d} "
            f"cand/doc={row['cand_per_doc']:>8.2f}",
            flush=True,
        )
    return out


def _capfill_section(capfill: dict) -> list:
    from snapshot_s3_util_spark.llm.dedup import _SIMHASH_BUCKET_CAP

    lines = [
        "\n## SimHash bucket-cap saturation curve (unsalted replicas)\n",
        "\nThe salted tiers above hold bucket occupancy constant (the "
        "honest per-replica-density construction), so they can only "
        "show the transitional FILLING regime (the 6.7 second-"
        "difference at 100x). This section replicates sf0.1 "
        "fingerprints UNSALTED with doc_id offsets, growing (band, "
        "key) occupancy ∝ mult straight through the cap "
        f"({_SIMHASH_BUCKET_CAP}): once buckets saturate, the "
        "md5-ordered sample pins per-bucket candidates at C(cap,2) "
        "and TOTAL candidate growth flattens — candidates/doc FALLS. "
        "That is the at-cap plateau the capped design guarantees at "
        "any corpus size.\n",
        "\n| mult | docs | mean bucket occ | max occ | over-cap "
        "buckets | candidates | cand/doc | cand wall |\n"
        "|---|---:|---:|---:|---:|---:|---:|---:|\n",
    ]
    for label, r in capfill.items():
        lines.append(
            f"| {label} | {r['docs']:,d} | {r['mean_occupancy']} | "
            f"{r['max_occupancy']:,d} | {r['overcap_buckets']:,d} | "
            f"{r['candidates']:,d} | {r['cand_per_doc']} | "
            f"{r['wall_sec']}s |\n"
        )
    return lines


def measure_streaming_rate(spark, label: str, sf_dir: str) -> dict:
    """Micro-batch latency/throughput of the streaming export path
    (r10 verdict ask #7: the streaming surface was verified
    batch-equivalent but carried no measured rate).

    Drives `stream_foreach_batch_export`'s exact pipeline shape —
    file-source readStream -> foreachBatch partitioned parquet sink —
    but staged into MANY source files with maxFilesPerTrigger, so the
    run is a genuine multi-batch stream, then reads the engine's own
    StreamingQueryProgress: per-trigger input rows and execution
    times.  Throughput = total rows / sum(trigger walls); latency =
    median trigger execution.  At 100 TB/day these numbers scale with
    executor count (each micro-batch is an ordinary partitioned batch
    write); the per-trigger fixed overhead measured here is the
    driver-side floor that sets the minimum useful trigger interval."""
    import tempfile

    from snapshot_s3_util_spark.io import load_table

    tmp = tempfile.mkdtemp(prefix="s3u_stream_rate_")
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    try:
        ev = load_table(spark, sf_dir, "events")
        ev.repartition(16).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )

        def write_batch(batch_df, epoch_id):
            (
                batch_df.write.mode("append")
                .partitionBy("event_type")
                .parquet(out)
            )

        q = (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        progress = []
        for p in q.recentProgress:
            progress.append(json.loads(p.json) if hasattr(p, "json") else p)
        q.stop()
        rows = [p for p in progress if p.get("numInputRows", 0) > 0]
        total = sum(p["numInputRows"] for p in rows)
        walls_ms = [p["durationMs"]["triggerExecution"] for p in rows]
        res = {
            "events": total,
            "micro_batches": len(rows),
            "median_trigger_ms": int(statistics.median(walls_ms)),
            "p_max_trigger_ms": max(walls_ms),
            "events_per_sec": int(total / (sum(walls_ms) / 1000.0)),
        }
        print(
            f"{label:>10s} streaming-rate {total:,d} events / "
            f"{len(rows)} batches, median trigger "
            f"{res['median_trigger_ms']} ms, "
            f"{res['events_per_sec']:,d} events/s",
            flush=True,
        )
        return res
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _stream_rate_section(rate: dict) -> list:
    lines = [
        "\n## Streaming micro-batch rate (stream_foreach_batch_export "
        "shape)\n",
        "\nA genuine multi-batch run (16 source files, "
        "maxFilesPerTrigger=2 → 8 triggers) of the streaming export "
        "pipeline, measured from the engine's own "
        "StreamingQueryProgress. Throughput = rows / Σ trigger "
        "execution; the median trigger is the per-micro-batch latency "
        "floor on this hardware — at cluster scale each trigger is an "
        "ordinary partitioned parquet write and scales with "
        "executors.\n",
        "\n| tier | events | micro-batches | median trigger | max "
        "trigger | throughput |\n|---|---:|---:|---:|---:|---:|\n",
    ]
    for label, r in rate.items():
        lines.append(
            f"| {label} | {r['events']:,d} | {r['micro_batches']} | "
            f"{r['median_trigger_ms']} ms | {r['p_max_trigger_ms']} ms "
            f"| {r['events_per_sec']:,d} events/s |\n"
        )
    return lines


def measure_minhash_precision(spark, label: str, sf_dir: str) -> dict:
    """Recall/precision of the MinHash banding + est prefilter at one
    tier (r11 verdict ask #1: the audit measured banding precision
    decaying 0.93 -> 0.76 from sf0.01 -> sf0.1 — show the round-12
    est-Jaccard prefilter ARRESTS the decay at a >= 10x tier).

    Same construction as llm_minhash_recall_audit (exact set-Jaccard
    truth over the df-capped shingle universe via shared-shingle
    blocking — no |docs|^2 anywhere), measured twice: against the
    banding-only candidate set (the counterfactual pre-round-12
    policy, whose precision keeps decaying) and against the shipped
    prefiltered set."""
    from pyspark.sql import functions as F

    from snapshot_s3_util_spark.llm.dedup import (
        _JACCARD_THRESHOLD,
        _mh_pair_frames,
        _minhash_band_sigs,
        _minhash_cand,
        _minhash_cand_raw,
        _minhash_kept,
        _minhash_minhashes,
    )

    t0 = time.perf_counter()
    kept = _minhash_kept(spark, sf_dir).localCheckpoint(eager=True)
    minhashes = _minhash_minhashes(kept).localCheckpoint(eager=True)
    band_sigs = _minhash_band_sigs(minhashes)
    cand_raw = _minhash_cand_raw(band_sigs).localCheckpoint(eager=True)
    cand = _minhash_cand(
        band_sigs, minhashes, cand_raw=cand_raw
    ).localCheckpoint(eager=True)

    ksets = kept.distinct()
    sizes = ksets.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = ksets.select(F.col("doc_id").alias("doc_a"), "sh")
    b = ksets.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    truth = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(
            F.col("shared").cast("double")
            / (F.col("na") + F.col("nb") - F.col("shared"))
            >= _JACCARD_THRESHOLD
        )
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    n_docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).count()
    n_true = truth.count()
    n_raw = cand_raw.count()
    n_pref = cand.count()
    hits_raw = truth.join(cand_raw, ["doc_a", "doc_b"]).count()
    hits_pref = truth.join(cand, ["doc_a", "doc_b"]).count()
    # the prefilter's separation margin at this tier (the audit op's
    # margin columns, measured against corpus growth): fewest matching
    # minima among TRUE pairs vs most among sub-threshold candidates
    ma, mb, nmatch = _mh_pair_frames(minhashes)
    nm_true = (
        truth.join(ma, "doc_a").join(mb, "doc_b")
        .agg(F.coalesce(F.min(nmatch), F.lit(-1)).alias("v"))
        .collect()[0]["v"]
    )
    nm_false = (
        cand_raw.join(truth, ["doc_a", "doc_b"], "left_anti")
        .join(ma, "doc_a").join(mb, "doc_b")
        .agg(F.coalesce(F.max(nmatch), F.lit(-1)).alias("v"))
        .collect()[0]["v"]
    )

    # Cutoff-minus-one counterfactual (r13 verdict ask #5): would
    # shipping est_min - 1 — trading one minima of prefilter
    # precision for one more minima of recall-margin slack — hold up
    # once the exact-Jaccard verify stage absorbs the extra
    # candidates? Measure the extra candidate volume, the lo-cutoff
    # set's own precision, and the TIMED exact-verify wall over both
    # candidate sets (the same shingle-join construction a deployment
    # runs before acting on a pair).
    from snapshot_s3_util_spark.llm.dedup import _MINHASH_EST_MIN

    cand_lo = (
        cand_raw.join(ma, "doc_a").join(mb, "doc_b")
        .filter(nmatch >= _MINHASH_EST_MIN - 1)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    n_lo = cand_lo.count()
    hits_lo = truth.join(cand_lo, ["doc_a", "doc_b"]).count()

    def _verify_wall(cpairs) -> float:
        """Exact set-Jaccard verify of a candidate pair frame against
        the kept shingle sets (join to doc_a's shingles, match doc_b's,
        size-join, threshold) — timed median-free single shot; the
        sets differ only in the pair frame, so the delta IS the extra
        candidates' verify cost."""
        t0 = time.perf_counter()
        shared_c = (
            cpairs.join(a, "doc_a")
            .join(b, ["doc_b", "sh"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("shared"))
        )
        (
            shared_c.join(sa, "doc_a")
            .join(sb, "doc_b")
            .filter(
                F.col("shared").cast("double")
                / (F.col("na") + F.col("nb") - F.col("shared"))
                >= _JACCARD_THRESHOLD
            )
            .count()
        )
        return round(time.perf_counter() - t0, 2)

    verify_hi = _verify_wall(cand)
    verify_lo = _verify_wall(cand_lo)

    row = {
        "docs": n_docs,
        "true_pairs": n_true,
        "cand_banding": n_raw,
        "cand_prefiltered": n_pref,
        "recall_banding": round(hits_raw / n_true, 4) if n_true else 1.0,
        "recall": round(hits_pref / n_true, 4) if n_true else 1.0,
        "precision_banding": round(hits_raw / n_raw, 4) if n_raw else 1.0,
        "precision": round(hits_pref / n_pref, 4) if n_pref else 1.0,
        "min_true_nmatch": int(nm_true),
        "max_false_nmatch": int(nm_false),
        "est_min": int(_MINHASH_EST_MIN),
        "cand_prefiltered_lo": n_lo,
        "recall_lo": round(hits_lo / n_true, 4) if n_true else 1.0,
        "precision_lo": round(hits_lo / n_lo, 4) if n_lo else 1.0,
        "verify_wall_sec": verify_hi,
        "verify_wall_sec_lo": verify_lo,
        "wall_sec": round(time.perf_counter() - t0, 2),
    }
    print(
        f"minhash-precision {label}: docs={n_docs:,d} true={n_true:,d} "
        f"cand {n_raw:,d}->{n_pref:,d} recall={row['recall']} "
        f"precision {row['precision_banding']}->{row['precision']} "
        f"margin {nm_true}>{nm_false}; lo-cutoff "
        f"{_MINHASH_EST_MIN - 1}: cand={n_lo:,d} "
        f"prec={row['precision_lo']} verify {verify_hi}s vs "
        f"{verify_lo}s",
        flush=True,
    )
    return row


def _minhash_precision_section(prec: dict) -> list:
    from snapshot_s3_util_spark.llm.dedup import (
        _MINHASH_EST_MIN,
    )
    from snapshot_s3_util_spark.params import MINHASH_BANDS, MINHASH_K

    lines = [
        "\n## MinHash banding precision vs corpus size (est-Jaccard "
        "prefilter)\n",
        "\nThe r11 audit measured banding-only precision DECAYING with "
        "corpus (0.93 at sf0.01 -> 0.76 at sf0.1): low-J pairs that "
        "collide in one band grow with N and become wasted verify "
        "work. Round 12 split the two jobs: the banding is now tuned "
        f"for RECALL alone ({MINHASH_BANDS} bands x "
        f"{MINHASH_K // MINHASH_BANDS} rows — pigeonhole-guaranteed "
        f"capture for any pair with <= {MINHASH_BANDS - 1} mismatching "
        "minima, plus the "
        "affine per-k rehash family that fixed the KM correlated-run "
        "misses this tool caught at J 0.92-0.99), and a new "
        "est-Jaccard prefilter carries PRECISION (candidates must "
        f"agree on >= {_MINHASH_EST_MIN}/{MINHASH_K} minima — the "
        "estimate the signatures already paid for, K integer compares "
        "per candidate). This table measures both stages against "
        "exact set-Jaccard truth at each tier: the recall-stage "
        "candidates are deliberately loose (precision ~0.25, bounded "
        "by the df-cap and the prefilter's O(K) per-pair cost), and "
        "the shipped prefiltered set holds recall AND precision at "
        "1.0 flat across a 100x corpus range — the decay is "
        "arrested.\n",
        "\n| tier | docs | true pairs | banding cand | prefiltered "
        "cand | recall | precision (banding only) | precision "
        "(shipped) | margin (min-true / cutoff / max-false) |\n"
        "|---|---:|---:|---:|---:|---:|---:|---:|---:|\n",
    ]
    for label, r in prec.items():
        margin = (
            f"{r['min_true_nmatch']} / {_MINHASH_EST_MIN} / "
            f"{r['max_false_nmatch']}"
            if "min_true_nmatch" in r
            else "—"
        )
        lines.append(
            f"| {label} | {r['docs']:,d} | {r['true_pairs']:,d} | "
            f"{r['cand_banding']:,d} | {r['cand_prefiltered']:,d} | "
            f"{r['recall']} | {r['precision_banding']} | "
            f"{r['precision']} | {margin} |\n"
        )
    # r13 verdict ask #5: the cutoff-minus-one counterfactual — what
    # shipping est_min - 1 would cost (extra candidates + their timed
    # exact-verify wall) and buy (margin slack 2 instead of 1) at each
    # tier. Rendered only when the cache rows carry the measurement.
    lo_rows = {
        label: r for label, r in prec.items() if "cand_prefiltered_lo" in r
    }
    if lo_rows:
        lines += [
            f"\nCutoff-minus-one counterfactual (est_min "
            f"{_MINHASH_EST_MIN - 1} instead of {_MINHASH_EST_MIN}; "
            "r13 verdict ask #5). One more minima of recall-margin "
            "slack (min-true sits 2 over the cutoff instead of 1) "
            "against the pairs the looser prefilter passes through "
            "to the exact-Jaccard verify stage, with the verify wall "
            "TIMED over both candidate sets (same shingle-join "
            "construction either way):\n",
            "\n| tier | prefiltered cand (lo) | vs shipped | precision "
            "(lo, pre-verify) | recall (lo) | verify wall shipped | "
            "verify wall lo |\n"
            "|---|---:|---:|---:|---:|---:|---:|\n",
        ]
        for label, r in lo_rows.items():
            lines.append(
                f"| {label} | {r['cand_prefiltered_lo']:,d} | "
                f"{r['cand_prefiltered_lo'] - r['cand_prefiltered']:+,d} "
                f"| {r['precision_lo']} | {r['recall_lo']} | "
                f"{r['verify_wall_sec']}s | {r['verify_wall_sec_lo']}s "
                f"|\n"
            )
        lines.append(
            f"\n**Decision (r14): the shipped cutoff stays "
            f"{_MINHASH_EST_MIN} = ceil(K x J*).** The nmatch "
            "distribution is strongly bimodal, so the lo cutoff is "
            "nearly free on the cost side (+1 candidate at 30x, +4 at "
            "100x; verify-wall delta inside host noise) — but the "
            "sub-threshold pairs it admits are not: "
            "`llm_dedup_components` consumes the prefiltered set "
            "UNVERIFIED as connected-component edges, where one "
            "J < 0.5 edge merges two whole clusters — the shipped "
            "set's measured precision 1.0 is load-bearing, not "
            "cosmetic. The slack the lo cutoff would buy (min-true 2 "
            "over the cutoff instead of 1) is already protected by "
            "the hard margin gates (suite + stress FAIL at equality) "
            "whose documented remedy is raising K (the K=12 -> 16 "
            "precedent), which restores slack WITHOUT admitting "
            "false edges.\n"
        )
    return lines


def measure_perceptual_capfill(spark, base: str) -> dict:
    """aHash/pHash bucket-saturation curves (r11 verdict stretch ask:
    replicate the simhash unsalted-replica methodology for the
    perceptual family, so all three banded families have measured
    at-cap plateaus).

    Same construction as measure_simhash_capfill: compute the sf0.1
    band frames ONCE, union UNSALTED replicas with doc_id offsets so
    (band, sig) occupancy grows ∝ mult through each family's cap, and
    count capped candidates.  Expected shape: candidates/doc rises
    while buckets fill, then FALLS once the md5-ordered sample pins
    per-bucket candidates at C(cap,2) — the plateau that bounds any
    corpus size.  aHash runs at its widened r12 sample
    (params.AHASH_BUCKET_SAMPLE); pHash at the shared cap."""
    from pyspark.sql import functions as F

    from snapshot_s3_util_spark.llm.multimodal import (
        _AHASH_MAX_HAMMING,
        _AHASH_SAMPLE,
        _BAND_BUCKET_CAP,
        _PHASH_MAX_HAMMING,
        _ahash_band_frame,
        _capped_banded_pairs,
        _phash_band_frame,
    )

    stride = 10_000_000
    out: dict[str, dict] = {}
    for fam, frame_fn, cap, max_ham in (
        ("ahash", _ahash_band_frame, _AHASH_SAMPLE, _AHASH_MAX_HAMMING),
        ("phash", _phash_band_frame, _BAND_BUCKET_CAP, _PHASH_MAX_HAMMING),
    ):
        b0 = frame_fn(spark, base).localCheckpoint(eager=True)
        n0 = b0.select("doc_id").distinct().count()
        rows: dict[str, dict] = {}
        # deeper tiers than the simhash section: the perceptual
        # signatures spread wider (pHash mean occupancy is only 37 at
        # 32x, still under the cap), so the at-cap plateau only
        # becomes visible past ~64x
        for mult in (1, 4, 16, 64, 128):
            b = b0
            for k in range(1, mult):
                b = b.union(
                    b0.select(
                        (F.col("doc_id") + k * stride).alias("doc_id"),
                        "band",
                        "sig",
                    )
                )
            b = b.localCheckpoint(eager=True)
            occ = b.groupBy("band", "sig").agg(
                F.count(F.lit(1)).alias("bn")
            )
            stats = occ.agg(
                F.count(F.lit(1)).alias("n_buckets"),
                F.round(F.avg("bn"), 1).alias("mean_occ"),
                F.max("bn").alias("max_occ"),
                F.sum(F.when(F.col("bn") > cap, 1).otherwise(0)).alias(
                    "n_overcap"
                ),
            ).collect()[0]
            t0 = time.perf_counter()
            n_cand = _capped_banded_pairs(b, max_ham, cap=cap).count()
            wall = time.perf_counter() - t0
            row = {
                "docs": n0 * mult,
                "n_buckets": int(stats["n_buckets"]),
                "mean_occupancy": float(stats["mean_occ"]),
                "max_occupancy": int(stats["max_occ"]),
                "overcap_buckets": int(stats["n_overcap"]),
                "candidates": int(n_cand),
                "cand_per_doc": round(n_cand / (n0 * mult), 2),
                "wall_sec": round(wall, 2),
            }
            rows[f"{mult}x"] = row
            print(
                f"{fam}-capfill {mult:>3d}x docs={row['docs']:>7,d} "
                f"mean_occ={row['mean_occupancy']:>6.1f} "
                f"overcap={row['overcap_buckets']:>6,d} "
                f"cand={row['candidates']:>12,d} "
                f"cand/doc={row['cand_per_doc']:>8.2f}",
                flush=True,
            )
        out[fam] = rows
    # the aHash margin dial (r12 ask #4): read the oracle-checked
    # audit row at the base SF so the report can show the local
    # recall-vs-width curve next to the saturation tiers
    from snapshot_s3_util_spark.registry import REGISTRY

    mrow = (
        REGISTRY["multimodal_ahash_recall_bucket_cap"]
        .fn(spark, base)
        .collect()[0]
        .asDict()
    )
    out["_ahash_margins"] = {
        k: mrow[k]
        for k in ("true_pairs", "recall", "cap_lo", "recall_lo",
                  "cap_hi", "recall_hi")
    }
    print(f"ahash margin dial: {out['_ahash_margins']}", flush=True)
    return out


def _perceptual_capfill_section(capfill: dict) -> list:
    from snapshot_s3_util_spark.llm.multimodal import (
        _AHASH_SAMPLE,
        _BAND_BUCKET_CAP,
    )

    lines = [
        "\n## Perceptual-hash bucket-cap saturation curves (unsalted "
        "replicas)\n",
        "\nThe simhash section above measures its family's at-cap "
        "plateau; these are the aHash/pHash twins (same unsalted "
        "doc_id-offset replica construction, occupancy ∝ mult). "
        f"aHash samples over-cap buckets to {_AHASH_SAMPLE} (its "
        "widened r12 sample), pHash to the shared cap "
        f"{_BAND_BUCKET_CAP}. Note the capped candidate verify here "
        "counts Hamming-verified pairs, so the column tracks the "
        "candidate JOIN's bound; cand/doc flattening (or falling) "
        "past the cap is the plateau the design guarantees.\n",
    ]
    for fam, rows in capfill.items():
        if fam.startswith("_"):
            continue  # side-channel entries (margin dial below)
        lines += [
            f"\n### {fam}\n",
            "\n| mult | docs | mean bucket occ | max occ | over-cap "
            "buckets | verified pairs | pairs/doc | wall |\n"
            "|---|---:|---:|---:|---:|---:|---:|---:|\n",
        ]
        for label, r in rows.items():
            lines.append(
                f"| {label} | {r['docs']:,d} | {r['mean_occupancy']} | "
                f"{r['max_occupancy']:,d} | {r['overcap_buckets']:,d} | "
                f"{r['candidates']:,d} | {r['cand_per_doc']} | "
                f"{r['wall_sec']}s |\n"
            )
    m = capfill.get("_ahash_margins")
    if m:
        lines.append(
            f"\naHash margin dial (r12 ask #4, read from the "
            f"oracle-checked audit row at sf0.1): recall "
            f"{m['recall_lo']} at width {m['cap_lo']} -> "
            f"{m['recall']} at the shipped {_AHASH_SAMPLE} -> "
            f"{m['recall_hi']} at {m['cap_hi']}, over "
            f"{m['true_pairs']:,d} true pairs. The lo->shipped gap "
            "is what the r12 widening bought; the shipped->hi gap is "
            "what the NEXT doubling would buy — when the lo gap "
            "widens tier-over-tier the family is saturating and the "
            "width (or a second band family) needs revisiting BEFORE "
            "recall moves.\n"
        )
    return lines


def _materialize(df) -> None:
    """Full JVM-side materialization: every output row is computed and
    delivered to the sink, but nothing crosses into the Python driver.

    The old sink was `.collect()`, and at stress scale it measured the
    HARNESS, not the engine: cPickle-ing millions of result rows into
    one Python process dominated the wall (sort_multi at 30x: ~47 s
    collect vs ~10 s full materialization; sessionize_batch: ~26 s vs
    ~1.6 s). A cluster delivers results to a distributed sink — the
    noop writer is that sink minus the I/O, which is exactly the
    engine wall the growth factor is supposed to measure."""
    df.write.format("noop").mode("overwrite").save()


def measure(spark, ops, sf_dir: str) -> dict[str, dict]:
    import snapshot_s3_util_spark as engine

    from snapshot_s3_util_spark.session import clear_persistent_rdds

    app_id = spark.sparkContext.applicationId
    out: dict[str, dict] = {}
    for name in ops:
        clear_persistent_rdds(spark)  # previous op's checkpoint spines
        fn = engine.REGISTRY[name].fn
        for _ in range(2):  # two warm-ups: Arrow worker-pool ramp (bench.py note)
            _materialize(fn(spark, sf_dir))
        before = _shuffle_snapshot(app_id)
        samples = []
        for _ in range(_TIMED_RUNS):
            t0 = time.perf_counter()
            _materialize(fn(spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        after = _shuffle_snapshot(app_id)
        own = {k: v for k, v in after.items() if k not in before}
        out[name] = {
            "wall_sec": round(statistics.median(samples), 3),
            "shuffle_write_bytes_per_run": int(sum(own.values()) / _TIMED_RUNS),
            "max_stage_shuffle_write_bytes": max(own.values(), default=0),
        }
        print(
            f"{sf_dir.rstrip('/').rsplit('/', 1)[-1]:>10s} {name:28s} "
            f"{out[name]['wall_sec']:7.2f}s "
            f"shuffle/run={out[name]['shuffle_write_bytes_per_run']:>12,d}B",
            flush=True,
        )
    return out


def _tier_section(base_r, stress_r, mult: int):
    """Markdown lines for one tier's table + its footnotes."""
    lines = [
        f"\n## {mult}x tier\n",
        "\n| op | wall sf0.1 | wall stress | growth | shuffle/run sf0.1 "
        "| shuffle/run stress | growth | max stage shuffle (stress) |\n"
        "|---|---:|---:|---:|---:|---:|---:|---:|\n",
    ]
    flagged = []
    salted = []
    for name in base_r:
        b, s = base_r[name], stress_r[name]
        wg = s["wall_sec"] / b["wall_sec"] if b["wall_sec"] else float("inf")
        bs, ss = b["shuffle_write_bytes_per_run"], s["shuffle_write_bytes_per_run"]
        if bs:
            sg_txt = f"{ss / bs:.1f}x"
            if (
                name.startswith("llm_dedup")
                and wg <= mult
                and mult * 1.5 < ss / bs <= mult * 3
            ):
                # known construction artifact of the replica token salt
                # (checked before [^flip]: the salted shingle exchanges
                # overshoot up to the measured string-width constant
                # and must not be misread as a strategy flip). BOUNDED
                # at 3x-per-unit and gated on flat wall so a genuinely
                # super-linear dedup regression is NOT explained away —
                # it falls through and stands out as a raw factor.
                sg_txt += " [^salt]"
                salted.append(name)
            elif ss / bs > mult * 2 and wg <= mult:
                sg_txt += " [^flip]"
                flagged.append(name)
        else:
            sg_txt = "— (0 B both)" if not ss else f"0 → {ss:,d} B"
        lines.append(
            f"| `{name}` | {b['wall_sec']:.2f}s | {s['wall_sec']:.2f}s "
            f"| {wg:.1f}x | {bs:,d} B | {ss:,d} B | {sg_txt} "
            f"| {s['max_stage_shuffle_write_bytes']:,d} B |\n"
        )
    if flagged:
        lines.append(
            "\n[^flip]: shuffle-growth factor >> mult with FLAT wall = a "
            "join-strategy flip, not super-linear work: at sf0.1 the "
            "fact side fits the broadcast threshold (near-zero shuffle), "
            "at the stress tier Spark correctly plans a shuffle join — "
            "one linear pass of each side, the 100 TB plan. The sf0.1 "
            "denominator is what's artificially small. Verified by "
            "explain() diff; see SCALE.md 'Round 8'.\n"
        )
    if salted:
        lines.append(
            "\n[^salt]: the replica token salt (a fixed-width 3-char "
            "suffix on every token of replicas k>0 — the construction "
            "that holds duplicate structure constant across replicas) "
            "widens shingle STRINGS by a constant factor vs unsalted "
            "sf0.1, so shuffle growth vs the sf0.1 BASE overshoots mult "
            "by that same constant for ops that exchange shingle "
            "strings. The row COUNT series is exactly linear, and the "
            "tier-to-tier tables below (lever arm, second difference) "
            "cancel the constant: they read ~linear for these ops.\n"
        )
    return lines


def _write_report(
    base_r,
    tier_results,
    base: str,
    snap: dict | None = None,
    capfill: dict | None = None,
    stream_rate: dict | None = None,
    minhash_prec: dict | None = None,
    perceptual_cf: dict | None = None,
) -> None:
    """tier_results: list of (mult, results) ascending by mult."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "STRESS.md"
    )
    mults = [m for m, _ in tier_results]
    lines = [
        "# STRESS — measured scale growth of the heavy-op set\n",
        f"\nGenerated by `python tools/stress.py --tiers "
        f"{','.join(map(str, mults))} --report`: sf0.1 (`{base}`) vs "
        "tiers built by replica union with id offsets and per-replica "
        "token salting (constant workload density — see the tool "
        "docstring for why that is the honest construction).\n",
        "\nPass bar per tier: wall and shuffle growth ≈ mult "
        "(linear). `max stage shuffle` bounds the biggest single "
        "exchange.\n",
        "\nWall = full JVM-side materialization through the noop sink "
        "(round-9 methodology fix). Rounds 7-8 timed `.collect()`, "
        "which at stress scale measured the harness — cPickle of "
        "millions of result rows into one Python driver process — not "
        "the engine (sort_multi 30x: ~47 s collect vs ~10 s noop; "
        "sessionize_batch: ~26 s vs ~1.6 s). Do not compare wall "
        "columns across that boundary; shuffle bytes are unaffected.\n",
        "\nResidual per-op drift at the top tier (a mid→top "
        "broadcast→shuffle strategy flip, shuffle-compression framing) "
        "is adjudicated with shuffle-RECORDS-series evidence in "
        "SCALE.md's round-9 three-tier stress note — records are "
        "compression-independent, so they separate real work growth "
        "from byte-level framing.\n",
    ]
    for mult, res in tier_results:
        lines += _tier_section(base_r, res, mult)
    if len(tier_results) >= 2:
        (m_lo, r_lo), (m_hi, r_hi) = tier_results[0], tier_results[-1]
        ratio = m_hi / m_lo
        lines += [
            f"\n## Lever-arm linearity ({m_lo}x → {m_hi}x)\n",
            "\nThe second lever arm separates linear from quadratic "
            "growth that a single tier cannot: if shuffle were "
            "quadratic in data size, this column would read "
            f"~{ratio * ratio:.0f}x; linear plans read ~{ratio:.0f}x. "
            "Ops whose small tier rounds to 0 B (broadcast regime) are "
            "marked n/a.\n",
            f"\n| op | shuffle/run {m_lo}x | shuffle/run {m_hi}x | "
            f"ratio (linear ≈ {ratio:.0f}x) |\n|---|---:|---:|---:|\n",
        ]
        for name in r_lo:
            lo = r_lo[name]["shuffle_write_bytes_per_run"]
            hi = r_hi[name]["shuffle_write_bytes_per_run"]
            if max(lo, hi) < 1_000_000:
                rt = "n/a (sub-MB shuffle at every tier — broadcast/scalar/probe-bounded regime; byte ratios are framing noise, the wall column is the evidence)"
            elif not lo:
                rt = "n/a (broadcast at small tier)"
            else:
                rt = f"{hi / lo:.1f}x"
                if hi / lo > ratio * 10:
                    rt += " (strategy flip between tiers — see [^flip])"
                elif hi / lo > ratio * 1.25 and name.startswith("llm_dedup"):
                    rt += " (unsalted-replica-0 intercept — see [^salt])"
            lines.append(f"| `{name}` | {lo:,d} B | {hi:,d} B | {rt} |\n")
    if len(tier_results) >= 3:
        # top three tiers (widest lever with the least broadcast-regime
        # contamination); lower tiers still appear in their own tables
        (m1, r1), (m2, r2), (m3, r3) = tier_results[-3:]
        expect = (m3 - m2) / (m2 - m1)
        quad = (m3 * m3 - m2 * m2) / (m2 * m2 - m1 * m1)
        lines += [
            f"\n## Second-difference linearity ({m1}x, {m2}x, {m3}x)\n",
            "\nThree tiers allow the sharpest test: the second "
            f"difference (s{m3} - s{m2}) / (s{m2} - s{m1}) cancels any "
            "constant intercept (e.g. the unsalted replica 0, or a "
            "broadcast-regime floor) that the raw growth ratios carry. "
            f"Linear plans read exactly {expect:.1f}; quadratic plans "
            f"would read ~{quad:.1f}.\n",
            f"\n| op | Δ shuffle {m1}x→{m2}x | Δ shuffle {m2}x→{m3}x | "
            f"second difference (linear = {expect:.1f}) |\n"
            "|---|---:|---:|---:|\n",
        ]
        if len(tier_results) > 3:
            lines.insert(
                -1,
                f"\n(Computed over the top three tiers "
                f"{m1}x/{m2}x/{m3}x; lower tiers appear in their own "
                "sections and the lever-arm table.)\n",
            )
        for name in r1:
            s1 = r1[name]["shuffle_write_bytes_per_run"]
            s2 = r2[name]["shuffle_write_bytes_per_run"]
            s3 = r3[name]["shuffle_write_bytes_per_run"]
            d_lo, d_hi = s2 - s1, s3 - s2
            if max(s1, s2, s3) < 1_000_000:
                rt = "n/a (sub-MB shuffle at every tier — broadcast/scalar/probe-bounded regime; byte deltas are framing noise, the wall column is the evidence)"
            elif d_lo <= 0:
                rt = "n/a (no growth below the mid tier)"
            elif s1 * m2 < 0.1 * s2 * m1:
                # per-unit shuffle at the low tier is <10% of the mid
                # tier's: the low tier sat in a different plan regime
                # (broadcast), so the low delta is not a linear sample
                rt = (
                    f"{d_hi / d_lo:.1f} (low tier pre-flip — linear "
                    f"segment is {m2}x→{m3}x: "
                    f"{s3 / s2:.1f}x for {m3 / m2:.1f}x data)"
                )
            else:
                rt = f"{d_hi / d_lo:.1f}"
            lines.append(f"| `{name}` | {d_lo:,d} B | {d_hi:,d} B | {rt} |\n")
    if snap:
        lines += _snap_prune_section(snap)
    if capfill:
        lines += _capfill_section(capfill)
    if stream_rate:
        lines += _stream_rate_section(stream_rate)
    if minhash_prec:
        lines += _minhash_precision_section(minhash_prec)
    if perceptual_cf:
        lines += _perceptual_capfill_section(perceptual_cf)
    with open(path, "w") as fh:
        fh.writelines(lines)
    print(f"wrote {path}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".stress"
        ),
    )
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--report", action="store_true", help="write STRESS.md")
    ap.add_argument(
        "--tiers",
        default=None,
        help="comma-separated tier multipliers (e.g. 10,30); each tier "
        "lives at <out><mult>/ and the report carries one section per "
        "tier plus the lever-arm linearity table. Overrides --mult.",
    )
    ap.add_argument(
        "--snapshot-pruning",
        action="store_true",
        help="measure the DSv2 snapshot source's planning-time split "
        "pruning (planned vs total files) at base + each tier instead "
        "of the op set; merges into the cache and (with --report) "
        "renders its STRESS.md section",
    )
    ap.add_argument(
        "--simhash-capfill",
        action="store_true",
        help="measure the simhash bucket-cap saturation curve "
        "(unsalted fingerprint replicas, occupancy grows through the "
        "cap) instead of the op set; merges into the cache and (with "
        "--report) renders its STRESS.md section",
    )
    ap.add_argument(
        "--streaming-rate",
        action="store_true",
        help="measure micro-batch latency/throughput of the streaming "
        "export pipeline at base + each tier instead of the op set; "
        "merges into the cache and (with --report) renders its "
        "STRESS.md section",
    )
    ap.add_argument(
        "--perceptual-capfill",
        action="store_true",
        help="measure the aHash/pHash bucket-cap saturation curves "
        "(unsalted band-frame replicas, occupancy grows through each "
        "family's cap) instead of the op set; merges into the cache "
        "and (with --report) renders its STRESS.md section",
    )
    ap.add_argument(
        "--minhash-precision",
        action="store_true",
        help="measure MinHash banding recall/precision vs exact "
        "set-Jaccard truth at sf0.01 + base + each tier, for BOTH the "
        "banding-only and the shipped est-prefiltered candidate "
        "policies (r11 ask #1: show the precision decay arrested); "
        "merges into the cache and (with --report) renders its "
        "STRESS.md section",
    )
    ap.add_argument(
        "--report-only",
        action="store_true",
        help="re-render STRESS.md from the cached measurements of the "
        "last full run (.stress_results.json) without re-measuring",
    )
    ap.add_argument("ops", nargs="*")
    args = ap.parse_args()

    cache_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".stress_results.json",
    )
    if args.report_only:
        if not os.path.exists(cache_path):
            print(
                f"no cached measurements at {cache_path}; run a full "
                "measurement first (e.g. --tiers 10,30,100 --report)"
            )
            return 2
        with open(cache_path) as fh:
            cached = json.load(fh)
        if "base" not in cached or "tiers" not in cached:
            print(
                f"{cache_path} has an unexpected format; re-run a full "
                "measurement to regenerate it"
            )
            return 2
        _write_report(
            cached["base"],
            [(m, r) for m, r in cached["tiers"]],
            cached["base_dir"],
            cached.get("snapshot_pruning"),
            cached.get("simhash_capfill"),
            cached.get("streaming_rate"),
            cached.get("minhash_precision"),
            cached.get("perceptual_capfill"),
        )
        return 0

    spark = _get_spark_with_ui()
    import snapshot_s3_util_spark as engine

    engine.load_all_operators()
    ops = args.ops or list(STRESS_OPS)

    if args.tiers:
        mults = sorted({int(m) for m in args.tiers.split(",")})
        tier_dirs = [(m, f"{args.out}{m}") for m in mults]
    else:
        tier_dirs = [(args.mult, args.out)]

    for mult, out in tier_dirs:
        if args.rebuild and os.path.exists(out):
            shutil.rmtree(out)
        if not os.path.exists(os.path.join(out, "documents.parquet")):
            print(f"building {mult}x tier at {out} ...", flush=True)
            build_tier(spark, args.base, out, mult)

    prev_snap = prev_capfill = prev_rate = prev_mh = prev_pcf = None
    if os.path.exists(cache_path):
        try:
            with open(cache_path) as fh:
                _c = json.load(fh)
            prev_snap = _c.get("snapshot_pruning")
            prev_capfill = _c.get("simhash_capfill")
            prev_rate = _c.get("streaming_rate")
            prev_mh = _c.get("minhash_precision")
            prev_pcf = _c.get("perceptual_capfill")
        except (OSError, ValueError):
            prev_snap = prev_capfill = prev_rate = prev_mh = prev_pcf = None

    def _merge_section(key: str, value) -> dict:
        """Merge ONE standalone-section measurement into the cache.

        When no cache exists (a first standalone run), create it with
        empty base/tiers placeholders instead of discarding the fresh
        measurement (r11 ADVICE: the old guard printed the numbers and
        silently dropped them, making the run unreproducible from the
        cache). A later full multi-tier run fills base/tiers and keeps
        the section via the prev_* carry-over.
        """
        if os.path.exists(cache_path):
            with open(cache_path) as fh:
                cached = json.load(fh)
        else:
            print(
                f"no op-table cache at {cache_path}; creating one with "
                "empty base/tiers placeholders — run the full "
                "multi-tier measurement to fill the op tables",
                flush=True,
            )
            cached = {
                "base": {},
                "tiers": [],
                "base_dir": args.base,
                "snapshot_pruning": None,
                "simhash_capfill": None,
                "streaming_rate": None,
                "minhash_precision": None,
                "perceptual_capfill": None,
            }
        cached[key] = value
        with open(cache_path, "w") as fh:
            json.dump(cached, fh)
        return cached

    def _report_if_complete(cached: dict) -> None:
        """Render STRESS.md only when the op tables exist — rendering
        from placeholders would overwrite the committed report with an
        empty shell."""
        if not args.report:
            return
        if not cached.get("base") or not cached.get("tiers"):
            print(
                "--report skipped: cache has no base/tier op tables "
                "yet (section measurement was cached and will render "
                "after a full multi-tier run)",
                flush=True,
            )
            return
        _write_report(
            cached["base"],
            [(m, r) for m, r in cached["tiers"]],
            cached["base_dir"],
            cached.get("snapshot_pruning"),
            cached.get("simhash_capfill"),
            cached.get("streaming_rate"),
            cached.get("minhash_precision"),
            cached.get("perceptual_capfill"),
        )

    if args.streaming_rate:
        rate = {"1x (sf0.1)": measure_streaming_rate(spark, "base", args.base)}
        for mult, out in tier_dirs:
            rate[f"{mult}x"] = measure_streaming_rate(spark, str(mult), out)
        _report_if_complete(_merge_section("streaming_rate", rate))
        return 0

    if args.simhash_capfill:
        capfill = measure_simhash_capfill(spark, args.base)
        _report_if_complete(_merge_section("simhash_capfill", capfill))
        return 0

    if args.perceptual_capfill:
        pcf = measure_perceptual_capfill(spark, args.base)
        _report_if_complete(_merge_section("perceptual_capfill", pcf))
        return 0

    if args.snapshot_pruning:
        # standalone planning-time-pruning measurement over base + the
        # (already built) tiers; merges into the cache so --report-only
        # keeps rendering it alongside the op tables
        snap = {"1x (sf0.1)": measure_snapshot_pruning(spark, "base", args.base, 1)}
        for mult, out in tier_dirs:
            snap[f"{mult}x"] = measure_snapshot_pruning(spark, str(mult), out, mult)
        _report_if_complete(_merge_section("snapshot_pruning", snap))
        return 0

    if args.minhash_precision:
        # label the base row by its actual directory name — a
        # non-default --base must not be reported as sf0.1 (r12 review)
        base_name = os.path.basename(args.base.rstrip("/"))
        prec = {
            f"1x ({base_name})": measure_minhash_precision(
                spark, f"1x ({base_name})", args.base
            )
        }
        # the sf0.01 point anchors the decay curve's left end — only
        # for the default sf0.1 base (deriving an anchor by substring
        # surgery on an arbitrary path mislabels what was measured)
        if base_name == "sf0.1":
            sf001 = os.path.join(os.path.dirname(args.base.rstrip("/")),
                                 "sf0.01")
            if os.path.exists(sf001):
                prec = {
                    "0.1x (sf0.01)": measure_minhash_precision(
                        spark, "0.1x (sf0.01)", sf001
                    ),
                    **prec,
                }
        for mult, out in tier_dirs:
            prec[f"{mult}x"] = measure_minhash_precision(spark, f"{mult}x", out)
        _report_if_complete(_merge_section("minhash_precision", prec))
        # r12 ADVICE gate: the prefilter cutoff must sit strictly
        # BELOW every tier's weakest true pair — recall has no verify
        # backstop past the prefilter, so a tier measuring
        # min_true_nmatch <= est_min means a true pair is one
        # estimator-sample from being dropped. Fail the run loudly;
        # the fix is raising MINHASH_K (the K=12->16 raise is the
        # precedent), never shipping the collapsed margin.
        from snapshot_s3_util_spark.llm.dedup import _MINHASH_EST_MIN

        collapsed = {
            label: r["min_true_nmatch"]
            for label, r in prec.items()
            if r.get("true_pairs") and r["min_true_nmatch"] <= _MINHASH_EST_MIN
        }
        if collapsed:
            print(
                f"MARGIN GATE FAILED: min_true_nmatch <= est_min "
                f"({_MINHASH_EST_MIN}) at {collapsed} — raise MINHASH_K "
                "before shipping (see params.MINHASH_K history)",
                flush=True,
            )
            return 1
        print(
            f"margin gate OK: min true nmatch > est_min "
            f"({_MINHASH_EST_MIN}) at every measured tier", flush=True,
        )
        return 0

    base_r = measure(spark, ops, args.base)
    tier_results = [(mult, measure(spark, ops, out)) for mult, out in tier_dirs]
    # only a full multi-tier run of the canonical set may replace the
    # cache: a subset/single-tier run silently degrading a later
    # --report-only render is worse than no cache update
    if set(ops) == set(STRESS_OPS) and len(tier_dirs) >= 2:
        with open(cache_path, "w") as fh:
            json.dump(
                {
                    "base": base_r,
                    "tiers": tier_results,
                    "base_dir": args.base,
                    "snapshot_pruning": prev_snap,
                    "simhash_capfill": prev_capfill,
                    "streaming_rate": prev_rate,
                    "minhash_precision": prev_mh,
                    "perceptual_capfill": prev_pcf,
                },
                fh,
            )
    if args.report:
        _write_report(
            base_r, tier_results, args.base, prev_snap, prev_capfill,
            prev_rate, prev_mh, prev_pcf,
        )

    rc = 0
    for mult, res in tier_results:
        bad = [
            n
            for n in ops
            if res[n]["wall_sec"] > base_r[n]["wall_sec"] * mult * 1.5
        ]
        if bad:
            print(f"SUPER-LINEAR growth at {mult}x (> {mult}x * 1.5): {bad}")
            rc = 1
    if rc == 0:
        print("all ops within the linear-growth bar")
    return rc


if __name__ == "__main__":
    sys.exit(main())
