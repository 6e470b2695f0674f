"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32).

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Modes:
  python bench.py             # headline bench (driver contract)
  python bench.py --scaling   # same image-validation job at local[8] vs
                              # local[32] → throughput + scaling efficiency
                              # (north-rule two-cluster-size evidence)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "100000"))


def _host_busy_seconds() -> float:
    """Total non-idle CPU seconds across all cores since boot (/proc/stat)."""
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    idle = vals[3] + vals[4]  # idle + iowait
    return (sum(vals) - idle) / os.sysconf("SC_CLK_TCK")


def _tree_cpu_seconds() -> float:
    """CPU seconds of this process tree (python + the local-mode JVM child):
    live descendants from /proc plus already-reaped children (os.times)."""
    import glob

    children: dict[int, list[int]] = {}
    times: dict[int, int] = {}
    for st in glob.glob("/proc/[0-9]*/stat"):
        try:
            with open(st) as f:
                s = f.read()
        except OSError:
            continue  # raced a process exit
        pid = int(s[: s.index(" ")])
        rest = s[s.rindex(")") + 2 :].split()
        children.setdefault(int(rest[1]), []).append(pid)
        times[pid] = int(rest[11]) + int(rest[12])  # utime + stime
    total, stack = 0, [os.getpid()]
    while stack:
        p = stack.pop()
        total += times.get(p, 0)
        stack.extend(children.get(p, []))
    t = os.times()
    return total / os.sysconf("SC_CLK_TCK") + t.children_user + t.children_system


def _bw_copy_worker(mib: int, seconds: float) -> float:
    """Steady-state copy bandwidth in GiB/s (read+write), self-timed:
    src/dst preallocated and touched before the clock starts so allocator
    and first-touch page faults stay out of the measurement."""
    import numpy as np

    src = np.ones(mib * 131072, dtype=np.float64)  # mib MiB
    dst = np.empty_like(src)
    np.copyto(dst, src)  # warm dst pages
    t0 = time.time()
    passes = 0
    while time.time() - t0 < seconds:
        np.copyto(dst, src)
        passes += 1
    return passes * 2 * mib / 1024.0 / (time.time() - t0)


def _mem_bandwidth_probe(workers: int = 16) -> dict[str, float]:
    """Effective memory-copy bandwidth, 1 process vs `workers` concurrent
    processes (GiB/s, read+write). The scaling bench's wide leg is
    bandwidth-bound on this single box, and hypervisor-neighbor bandwidth
    pressure is invisible to /proc/stat — this probe makes each capture
    carry the hardware ceiling it actually ran under. The aggregate/worker
    ratio vs the 1-process figure bounds the parallel efficiency ANY
    memory-bound job can show on this box at that moment."""
    import multiprocessing as mp

    # best-of-2 windows per leg: an external burst caught by one window
    # would otherwise understate a leg and skew the ratio either way
    one = max(_bw_copy_worker(512, 3.0) for _ in range(2))
    ctx = mp.get_context("fork")
    with ctx.Pool(workers) as pool:
        # each worker self-times its steady-state loop, so pool startup
        # skew stays out; aggregate = sum of concurrent per-worker rates
        agg = max(
            sum(pool.starmap(_bw_copy_worker, [(256, 3.0)] * workers))
            for _ in range(2)
        )
    return {
        "mem_bw_gibps_1p": round(one, 1),
        f"mem_bw_gibps_{workers}p": round(agg, 1),
        "mem_bw_parallel_ratio": round(agg / one / workers, 3),
    }


class _ExternalLoadMeter:
    """External (non-bench) CPU pressure during the run, in average busy
    cores: (host busy Δ − own process-tree busy Δ) / wall. This is what the
    loadavg fields can't show once the bench's own threads saturate them —
    call stop() BEFORE spark.stop() so the JVM's time is still in /proc."""

    def start(self) -> None:
        self._t0 = time.time()
        self._host0 = _host_busy_seconds()
        self._tree0 = _tree_cpu_seconds()

    def stop(self) -> float:
        wall = time.time() - self._t0
        ext = (_host_busy_seconds() - self._host0) - (
            _tree_cpu_seconds() - self._tree0
        )
        return round(max(0.0, ext) / max(wall, 1e-9), 2)


def make_spark(cores: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("ges-bench")
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def _suite_lineitem():
    from great_expectations_spark.core.config import ExpectationSuite

    s = ExpectationSuite(name="bench_lineitem")
    s.add("expect_column_values_to_not_be_null", column="l_orderkey")
    s.add("expect_column_values_to_be_between", column="l_quantity", min_value=1, max_value=50)
    s.add("expect_column_values_to_be_between", column="l_discount", min_value=0, max_value=0.2)
    s.add("expect_column_values_to_be_in_set", column="l_returnflag", value_set=["A", "N", "R"])
    s.add("expect_column_values_to_be_in_set", column="l_linestatus", value_set=["O", "F"])
    s.add("expect_column_values_to_match_regex", column="l_returnflag", regex="^[ANR]$")
    s.add("expect_column_pair_values_a_to_be_greater_than_b", column_A="l_extendedprice", column_B="l_discount")
    s.add("expect_multicolumn_sum_to_equal", column_list=["l_quantity", "l_linenumber"], sum_total=30, mostly=0.001)
    s.add("expect_column_min_to_be_between", column="l_quantity", min_value=0, max_value=5)
    s.add("expect_column_max_to_be_between", column="l_quantity", min_value=45, max_value=55)
    s.add("expect_column_mean_to_be_between", column="l_extendedprice", min_value=0, max_value=1e9)
    s.add("expect_column_stdev_to_be_between", column="l_extendedprice", min_value=0, max_value=1e9)
    s.add("expect_column_sum_to_be_between", column="l_quantity", min_value=0, max_value=1e15)
    s.add("expect_column_unique_value_count_to_be_between", column="l_partkey", min_value=1, max_value=10**9)
    s.add(
        "expect_column_kl_divergence_to_be_less_than",
        column="l_quantity",
        partition_object={"bins": [1.0, 11.0, 21.0, 31.0, 41.0, 51.0], "weights": [0.2] * 5},
        threshold=0.1,
    )
    s.add(
        "expect_column_psi_to_be_less_than",
        column="l_extendedprice",
        partition_object={"bins": [0.0, 2e4, 4e4, 6e4, 1e7], "weights": [0.25] * 4},
        threshold=1.0,
    )
    s.add("expect_column_value_z_scores_to_be_less_than", column="l_extendedprice", threshold=4.0, mostly=0.99)
    s.add("expect_table_row_count_to_be_between", min_value=1, max_value=10**12)
    return s


def _image_suite():
    from great_expectations_spark.core.config import ExpectationSuite

    s = ExpectationSuite(name="bench_images")
    s.add("expect_image_bytes_to_be_decodable", column="bytes", mostly=0.98)
    s.add("expect_image_dims_to_match_metadata", mostly=0.95)
    s.add("expect_image_fmt_to_match_metadata", mostly=0.95)
    s.add("expect_image_phash_to_match", max_hamming_distance=0, mostly=0.9)
    s.add("expect_column_values_to_not_be_null", column="caption", mostly=0.95)
    s.add("expect_column_values_to_be_in_set", column="fmt", value_set=["png", "jpeg", "webp"])
    s.add("expect_table_row_count_to_be_between", min_value=1, max_value=10**12)
    return s


def _images_path(spark, n_images: int) -> str:
    """Materialize the deterministic image table once (parquet, executor-side
    generation) — benchmark input, analogous to the Iceberg table of the
    north rule. Generation is NOT part of the timed region."""
    path = f"/tmp/ges_bench_images_{n_images}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from great_expectations_spark.testing.images import distributed_images_df

        distributed_images_df(spark, n_images, partitions=max(CPUS * 2, 16)).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def bench_images(spark, n_images: int) -> dict:
    """North-star workload: image-payload validation throughput over a stored
    table — Arrow pandas_udf decode + bundled rollup aggregation."""
    from great_expectations_spark.operators.images import validate_images

    df = spark.read.parquet(_images_path(spark, n_images))
    t0 = time.time()
    result = validate_images(df, _image_suite(), partition_by=["fmt"], persist=True)
    dt = time.time() - t0
    assert result.results, "no results"
    return {"sec": dt, "rows": n_images, "rows_per_sec": n_images / dt}


def run_headline(spark) -> dict[str, float]:
    from great_expectations_spark.engine import SparkValidationEngine
    from great_expectations_spark.operators import dedup as dd
    from great_expectations_spark.operators import similarity as sim
    from great_expectations_spark.operators import text as tx

    engine = SparkValidationEngine(spark)
    queries: list[tuple[str, object]] = []
    raw_trials: dict[str, list[float]] = {}
    trial_ext: dict[str, list[float]] = {}

    def timed(name, fn):
        # registration only — execution happens in interleaved passes below
        queries.append((name, fn))

    run_headline.raw_trials = raw_trials  # exposed for the JSON record
    run_headline.trial_ext = trial_ext

    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    embeddings = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    # warm JVM codegen + python worker pool once so timings measure the
    # engine, not first-query compilation
    engine.validate(
        lineitem.limit(2000), _suite_lineitem(), result_format="BASIC",
        partition_by=["l_returnflag"],
    )
    bench_images(spark, 5000)

    timed(
        "suite_lineitem",
        lambda: engine.validate(
            lineitem, _suite_lineitem(), result_format="BASIC", partition_by=["l_returnflag"]
        ),
    )

    def ref_and_unique():
        from great_expectations_spark.core.config import ExpectationSuite

        s = ExpectationSuite(name="bench_orders")
        s.add("expect_column_values_to_be_unique", column="o_orderkey")
        s.add(
            "expect_column_values_to_exist_in",
            column="o_custkey",
            ref=customer,
            ref_column="c_custkey",
            broadcast=True,
        )
        engine.validate(orders, s, result_format="BASIC")

    timed("orders_unique_referential", ref_and_unique)

    timed(
        "text_stats",
        lambda: tx.analyze_documents(documents).agg(
            F.sum("n_tokens"), F.sum(F.length("fp"))
        ).collect(),
    )
    # bands=8 × rows_per_band=8: P(collide) ≈ 99% at jaccard 0.9 but 3% at
    # 0.5 — candidate volume stays near the true-pair count even on corpora
    # where most pairs are moderately similar
    timed(
        "dedup_minhash",
        lambda: dd.minhash_dedup_pairs(documents, threshold=0.9, bands=8).count(),
    )
    timed(
        "dedup_simhash",
        lambda: dd.simhash_near_pairs(dd.simhash_signatures(documents), max_hamming=8).count(),
    )
    # added for round 2: substring-span dedup (headline sum gains one ~2-3s
    # query vs round 1 — noted in BENCH.md when comparing totals)
    timed(
        "dedup_spans",
        lambda: dd.duplicate_ngram_spans(documents, k=8).count(),
    )
    timed(
        "sim_lsh_pairs",
        lambda: sim.embedding_near_duplicate_pairs(
            embeddings, threshold=0.2, n_planes=8
        ).count(),
    )
    timed("images_validate", lambda: bench_images(spark, N_IMAGES))

    # Input bytes must be in page cache before the clock starts: the first
    # scan of each parquet file reads the shared/contended virtual disk and
    # has been measured 45x slower than the same warm scan (a 0.6 s
    # documents scan read 27.6 s cold). The benchmark measures the engine,
    # not the VM's disk neighbor — warm untimed, like _images_path.
    for path in [
        f"{SF_DIR}/lineitem.parquet",
        f"{SF_DIR}/orders.parquet",
        f"{SF_DIR}/customer.parquet",
        f"{SF_DIR}/documents.parquet",
        f"{SF_DIR}/embeddings.parquet",
        _images_path(spark, N_IMAGES),
    ]:
        targets = (
            [os.path.join(path, f) for f in os.listdir(path)]
            if os.path.isdir(path)
            else [path]
        )
        for f in targets:
            with open(f, "rb") as fh:
                while fh.read(1 << 24):
                    pass

    # The host is shared: external bursts (often 30 s - few min) swing single
    # timings 3x, and a fresh JVM's first execution of each query family is
    # JIT-cold. Back-to-back per-query trials let ONE burst contaminate
    # both trials of whichever query it lands on (observed: a 3.2 s query
    # reading 17-20 s in both trials while its standalone time was unchanged).
    # Interleaving full PASSES over the query list spreads each query's
    # trials minutes apart, so a burst costs each query at most one trial and
    # min() still has a clean candidate. Each trial carries its own
    # external-cores meter reading so the record is auditable per trial.
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    for _ in range(passes):
        for name, fn in queries:
            meter = _ExternalLoadMeter()
            meter.start()
            t0 = time.time()
            fn()
            raw_trials.setdefault(name, []).append(round(time.time() - t0, 3))
            trial_ext.setdefault(name, []).append(meter.stop())
            # drop persisted intermediates (e.g. minhash signatures) so one
            # run's cache doesn't pressure the next run's memory
            spark.catalog.clearCache()
    return {name: min(raw_trials[name]) for name, _ in queries}


def bench_dedup(spark, n_docs: int) -> dict:
    """MinHash+LSH near-dup detection throughput over a stored corpus."""
    from great_expectations_spark.operators.dedup import minhash_dedup_pairs

    path = f"/tmp/ges_bench_docs_{n_docs}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from great_expectations_spark.testing.documents import distributed_documents_df

        distributed_documents_df(spark, n_docs, partitions=max(CPUS * 2, 16)).write.mode(
            "overwrite"
        ).parquet(path)
    df = spark.read.parquet(path)
    t0 = time.time()
    n_pairs = minhash_dedup_pairs(df, threshold=0.8, bands=8).count()
    dt = time.time() - t0
    spark.catalog.clearCache()
    return {"sec": dt, "rows": n_docs, "rows_per_sec": n_docs / dt, "pairs": n_pairs}


def bench_streaming(spark) -> dict:
    """Streaming evidence (VERDICT r3 #5): (1) per-micro-batch image-suite
    validation throughput through validate_stream — the planner auto-wires
    the Arrow decode for the un-enriched suite inside every micro-batch;
    (2) streaming_dedup state behavior over a multi-phase run — within-TTL
    suppression, state size vs live-key bound, processing-time expiry
    (no-data micro-batches fire the timeouts), and re-emission after
    expiry."""
    import math
    import shutil
    import tempfile

    from great_expectations_spark.streaming.validate_stream import (
        streaming_dedup,
        validate_stream,
    )

    out: dict = {}

    # ---- (1) image suite per micro-batch --------------------------------
    n = int(os.environ.get("SPARK_GRAFT_STREAM_IMAGES", "400000"))
    target_batches = 8
    path = _images_path(spark, n)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    per_trigger = max(1, math.ceil(len(files) / target_batches))
    schema = spark.read.parquet(path).schema
    ck = tempfile.mkdtemp(prefix="ges_stream_ck_")
    seen: list = []
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", per_trigger)
        .parquet(path)
    )
    t0 = time.time()
    q = validate_stream(
        stream,
        _image_suite(),
        checkpoint_location=ck,
        trigger={"availableNow": True},
        on_result=lambda res, bid: seen.append(bool(res.success)),
    )
    q.awaitTermination()
    wall = time.time() - t0
    prog = [p for p in q.recentProgress if p["numInputRows"] > 0]
    batch_ms = sorted(p["durationMs"]["triggerExecution"] for p in prog)
    out["image_suite_stream"] = {
        "rows": n,
        "micro_batches": len(seen),
        "suites_green": all(seen),
        "wall_s": round(wall, 2),
        "rows_per_sec": int(n / wall),
        "median_batch_ms": batch_ms[len(batch_ms) // 2] if batch_ms else None,
    }
    shutil.rmtree(ck, ignore_errors=True)

    # ---- (2) stateful dedup: suppression, state bound, TTL expiry -------
    # TTL must comfortably span phases 1-2 (micro-batch latency on a loaded
    # host) while keeping the expiry wait before phase 3 short. Timeouts
    # are processed by micro-batches: the single no-data batch after phase 2
    # runs BEFORE expiry, so the removal lands in phase 3's own batch —
    # state_rows_final reflects it (expired keys dropped, phase-3 keys in).
    K = int(os.environ.get("SPARK_GRAFT_STREAM_KEYS", "50000"))
    ttl_s = 20
    src = tempfile.mkdtemp(prefix="ges_stream_dedup_src_")
    ck2 = tempfile.mkdtemp(prefix="ges_stream_dedup_ck_")

    def write_keys(lo: int, hi: int) -> None:
        spark.range(lo, hi).select(
            F.concat(F.lit("k"), F.col("id").cast("string")).alias("key"),
            F.col("id").alias("v"),
        ).coalesce(1).write.mode("append").parquet(src)

    def sink_count() -> int:
        return spark.sql("SELECT count(*) FROM ges_dedup_bench").collect()[0][0]

    def wait_rows(want: int, timeout: float = 180.0) -> int:
        t0 = time.time()
        while time.time() - t0 < timeout:
            if sink_count() >= want:
                time.sleep(2.0)  # settle: catch over-emission too
                return sink_count()
            time.sleep(0.25)
        raise TimeoutError(f"sink stuck below {want} rows ({sink_count()})")

    def last_state_rows() -> int | None:
        for p in reversed(q2.recentProgress):
            if p.get("stateOperators"):
                return p["stateOperators"][0]["numRowsTotal"]
        return None

    write_keys(0, K)  # phase 1: all new
    stream2 = (
        spark.readStream.schema("key string, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t0 = time.time()
    q2 = (
        streaming_dedup(stream2, "key", state_ttl=f"{ttl_s} seconds")
        .writeStream.format("memory")
        .queryName("ges_dedup_bench")
        .outputMode("append")
        .option("checkpointLocation", ck2)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        wait_rows(K)
        write_keys(K // 2, 3 * K // 2)  # phase 2: half dup-in-TTL, half new
        after_p2 = wait_rows(3 * K // 2)
        phase2_s = time.time() - t0
        suppressed = 2 * K - after_p2
        state_peak = max(
            (p["stateOperators"][0]["numRowsTotal"] for p in q2.recentProgress
             if p.get("stateOperators")),
            default=None,
        )
        time.sleep(ttl_s + 6)  # let every key's TTL lapse
        write_keys(0, K)  # phase 3: keys whose state expired must RE-emit
        final = wait_rows(after_p2 + K)
        total_wall = time.time() - t0
        state_final = last_state_rows()
    finally:
        # a wait_rows timeout (loaded host) must not leave the 500ms-trigger
        # query running and the temp dirs/sink behind for the next attempt
        q2.stop()
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ck2, ignore_errors=True)
    out["stateful_dedup_stream"] = {
        "keys_per_phase": K,
        "input_rows": 3 * K,
        "emitted_rows": final,
        "dup_suppressed_within_ttl": suppressed,
        "reemitted_after_ttl_expiry": final - after_p2,
        "state_rows_peak": state_peak,
        "state_rows_after_expiry_batch": state_final,
        "state_ttl_s": ttl_s,
        "phase12_rows_per_sec": int(2 * K / phase2_s),
        "wall_s": round(total_wall, 2),
        "ok": bool(
            suppressed == K // 2          # within-TTL dups suppressed
            and final == 5 * K // 2       # expired keys re-emitted, exactly
            and state_peak is not None
            and state_peak <= 3 * K // 2  # state bounded by live keys
            and (state_final or 0) <= 3 * K // 2  # expiry removed dead keys
        ),
    }
    return out


def main() -> None:
    if "--streaming" in sys.argv:
        spark = make_spark(CPUS)
        spark.sparkContext.setLogLevel("ERROR")
        load_start = [round(x, 2) for x in os.getloadavg()]
        bench_images(spark, 5000)  # warm codegen + python workers
        out = bench_streaming(spark)
        out["loadavg_start"] = load_start
        out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
        print(json.dumps(out))
        spark.stop()
        return

    if "--scaling-dedup" in sys.argv:
        n = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "480000"))
        out = {}
        load_start = [round(x, 2) for x in os.getloadavg()]
        raw: dict[str, list[float]] = {}
        for cores in (8, 32):
            spark = make_spark(cores)
            spark.sparkContext.setLogLevel("ERROR")
            bench_dedup(spark, 20000)  # warm codegen + python workers
            times = [round(bench_dedup(spark, n)["sec"], 2) for _ in range(2)]
            raw[f"local[{cores}]"] = times
            best = min(times)
            out[f"local[{cores}]"] = {
                "sec": round(best, 2),
                "rows_per_sec": round(n / best, 1),
            }
            spark.stop()
        speedup = out["local[32]"]["rows_per_sec"] / out["local[8]"]["rows_per_sec"]
        out["speedup_8_to_32"] = round(speedup, 3)
        out["scaling_efficiency"] = round(speedup / 4.0, 3)
        out["n_docs"] = n
        out["raw_trials"] = raw
        out["loadavg_start"] = load_start
        out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
        print(json.dumps(out))
        return

    if "--scaling" in sys.argv:
        n = max(N_IMAGES, int(os.environ.get("SPARK_GRAFT_SCALING_IMAGES", "8000000")))
        rounds = int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", "2"))
        # cluster sizes N and 4N; default 4→16 so the measurement stays below
        # the single-box memory-bandwidth ceiling (at 32 threads the shared
        # bus, not the engine, is the bottleneck — a real 4N-executor cluster
        # scales its bandwidth with the executors)
        small = int(os.environ.get("SPARK_GRAFT_SCALING_N", "4"))
        sizes = (small, small * 4)
        # the host is shared/noisy — interleave cluster sizes across rounds
        # so a contention burst hits both sizes, then take each size's best
        # (least-contended) time
        load_start = [round(x, 2) for x in os.getloadavg()]
        bw_start = _mem_bandwidth_probe(sizes[1])
        # materialize AND page-cache-warm the input before any timed leg:
        # the per-trial warm only touches 20k images, so on a reboot-cold
        # host the first legs pay the shared virtual disk for the full
        # table (t38: 135.6 s and 87.7 s first trials decaying to 14.9 s
        # as the cache filled — a warming curve, not a scaling signal)
        warm_spark = make_spark(sizes[1])
        try:
            warm_spark.sparkContext.setLogLevel("ERROR")
            images_dir = _images_path(warm_spark, n)
        finally:
            warm_spark.stop()
        for fname in os.listdir(images_dir):
            with open(os.path.join(images_dir, fname), "rb") as fh:
                while fh.read(1 << 24):
                    pass
        trials: dict[int, list[float]] = {c: [] for c in sizes}
        ext_cores: dict[int, list[float]] = {c: [] for c in sizes}

        def one_trial(cores: int) -> None:
            spark = make_spark(cores)
            try:
                spark.sparkContext.setLogLevel("ERROR")
                _images_path(spark, n)  # materialize input outside timing
                bench_images(spark, 20000)  # warm JVM codegen + python workers
                meter = _ExternalLoadMeter()
                meter.start()
                sec = round(bench_images(spark, n)["sec"], 2)
                ext = meter.stop()  # before spark.stop(): JVM time still in /proc
                # append as a pair so a failed trial never desyncs the lists
                trials[cores].append(sec)
                ext_cores[cores].append(ext)
            finally:
                spark.stop()

        for r in range(rounds):
            for cores in sizes:
                one_trial(cores)
        # contamination-aware retry: if EVERY trial of a size was squeezed by
        # external load (per-trial meter >= CLEAN_EXT cores), min() has no
        # clean trial to pick — t29's two wide trials ate 4.3- and 1.8-core
        # bursts and the capture was unusable. Re-run that size (bounded) until
        # one machine-verified-clean trial exists; every attempt stays in
        # raw_trials/external_cpu_cores_per_trial, so the record shows exactly
        # which trials were externally squeezed and which were clean.
        clean_ext = float(os.environ.get("SPARK_GRAFT_SCALING_CLEAN_EXT", "0.3"))
        max_extra = int(os.environ.get("SPARK_GRAFT_SCALING_MAX_EXTRA", "3"))
        extra_used: dict[int, int] = {c: 0 for c in sizes}
        for cores in sizes:
            while (
                extra_used[cores] < max_extra
                and not any(e < clean_ext for e in ext_cores[cores])
            ):
                extra_used[cores] += 1
                one_trial(cores)
        # min over ALL trials: external contention only ever INFLATES a
        # trial's wall time, so the fastest trial is the least-contaminated
        # estimate even when its meter reading is above clean_ext (a burst can
        # land in a phase that isn't the bottleneck — t30's winner did exactly
        # that). The retry's job was only to guarantee a fair candidate
        # exists; which trial actually won, and whether a clean one existed,
        # is recorded per size so the selection is auditable from the JSON.
        best = {c: min(trials[c]) for c in sizes}
        out = {
            f"local[{c}]": {
                "sec": round(best[c], 2),
                "rows_per_sec": round(n / best[c], 1),
                "best_trial_ext_cores": ext_cores[c][trials[c].index(best[c])],
                "clean_trial_exists": any(e < clean_ext for e in ext_cores[c]),
            }
            for c in sizes
        }
        speedup = best[sizes[0]] / best[sizes[1]]
        out[f"speedup_{sizes[0]}_to_{sizes[1]}"] = round(speedup, 3)
        out["scaling_efficiency"] = round(speedup / 4.0, 3)
        out["n_images"] = n
        out["rounds"] = rounds
        out["raw_trials"] = {f"local[{c}]": trials[c] for c in sizes}
        out["external_cpu_cores_per_trial"] = {
            f"local[{c}]": ext_cores[c] for c in sizes
        }
        out["contamination_retries"] = {
            f"local[{c}]": extra_used[c] for c in sizes
        }
        out["clean_ext_threshold_cores"] = clean_ext
        out["mem_bw_start"] = bw_start
        out["mem_bw_end"] = _mem_bandwidth_probe(sizes[1])
        out["loadavg_start"] = load_start
        out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
        print(json.dumps(out))
        return

    spark = make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    # self-annotating record (VERDICT r4 #4): host load at start/end plus the
    # raw per-trial times, so a contended capture is identifiable from the
    # JSON alone (this host's external load swings timings 3x)
    load_start = [round(x, 2) for x in os.getloadavg()]
    meter = _ExternalLoadMeter()
    meter.start()
    timings = run_headline(spark)
    external_cores = meter.stop()
    load_end = [round(x, 2) for x in os.getloadavg()]
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline validation+pipeline suite wall seconds (sum of per-query best across passes)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "per_query": "best per query across interleaved full passes (shared noisy host)",
                "raw_trials": run_headline.raw_trials,
                "external_cpu_cores_per_trial": run_headline.trial_ext,
                "loadavg_start": load_start,
                "loadavg_end": load_end,
                "external_cpu_cores_avg": external_cores,
                "idle_reference_sec": 13.069,
                "sf": SF_DIR,
                "cpus": CPUS,
                "n_images": N_IMAGES,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
