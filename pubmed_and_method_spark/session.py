"""SparkSession factory with scale-oriented defaults.

The reference hand-tunes a single ClickHouse node (e.g. sequential
two-way joins because "32G RAM insufficient" for a 3-way join,
database/link_pubmed_to_aminer_amg_s2.sql:515).  In Spark the same
concerns are handled declaratively: AQE for runtime re-planning +
skew-join splitting, Arrow for the Python boundary, and a shuffle
partition count sized to the cluster rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def _mem_available_gib() -> float:
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) / (1024 * 1024)
    except OSError:
        pass
    return 8.0


def _master_total_cores(master: str) -> int:
    """Total task slots of a local[N] / local-cluster[n,c,m] master."""
    inner = master[master.index("[") + 1 : master.rindex("]")]
    parts = inner.split(",")
    if len(parts) >= 2:  # local-cluster[n,cores,memMB]
        return int(parts[0]) * int(parts[1])
    return (os.cpu_count() or 8) if parts[0] == "*" else int(parts[0])


def get_spark(
    app_name: str = "pubmed_and_method_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``cores``: int N -> ``local[N]``, "*" -> ``local[*]``, None ->
    $SPARK_GRAFT_CPUS or all cores.  ``"submit"`` -> do NOT set a
    master (or any launch-time JVM option): the job was started by
    ``spark-submit``, which already owns --master / --driver-memory /
    --py-files; the session only layers the engine's SQL/AQE/Arrow
    defaults on top (tools/and_submit_job.py is the launcher).
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    submit_mode = cores == "submit"
    if submit_mode:
        master, total = None, DEFAULT_SHUFFLE_PARTITIONS
    elif isinstance(cores, str) and cores.startswith(("local-cluster[", "local[")):
        # Full master spec passthrough: local-cluster[n,cores,memMB]
        # runs n REAL executor JVMs (own heap/GC per process) inside
        # this sandbox — the faithful small-scale model of an
        # n-executor cluster for the north rule's N-vs-4N criterion.
        master = cores
        total = _master_total_cores(cores)
    else:
        master = f"local[{cores}]"
        total = os.cpu_count() or 8 if cores == "*" else int(cores)
    if shuffle_partitions is None:
        env_sp = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
        if env_sp:
            shuffle_partitions = int(env_sp)
    if shuffle_partitions is None:
        # One partition per task slot (scale-adaptive, never a
        # constant).  An r06 A/B re-tested the r05 BENCH.md suggestion
        # of 4x slots (=128 here, the scale_ab sort-spill setting) on
        # the 33M-turn spine: 128 was SLOWER on every stage (lean
        # total 256.6 s vs 166.3 s; content pair stage 157 s vs ~95 s)
        # — at this working set the extra task/shuffle-block overhead
        # outweighs the smaller sorts, and the content run completes
        # spill-free at 1x with the zstd shuffle codec.  Scale runs
        # that do hit per-task sort spill opt in via
        # $SPARK_GRAFT_SHUFFLE_PARTITIONS (supervised_scale/scale_ab
        # pass 128 explicitly).
        shuffle_partitions = max(DEFAULT_SHUFFLE_PARTITIONS, total)
    is_cluster = bool(master) and master.startswith("local-cluster[")
    driver_mem = os.environ.get("SPARK_DRIVER_MEM")
    if driver_mem is None and is_cluster:
        # Executors own the data in cluster mode; the driver only
        # plans/coordinates — plus AQE broadcast-relation builds, which
        # acquire from the driver's unified memory pool and need real
        # headroom (a ~8m-compressed sketch-row side deserializes to
        # hundreds of MB).  14g keeps those builds comfortably inside
        # the pool without pre-touching a 48g heap out of the
        # executors' budget.
        driver_mem = "14g"
    if driver_mem is None:
        # 48g (the measured sweet spot for this workload) unless the
        # host can't back it: the -Xms pre-touch below commits the full
        # heap at JVM start, so never ask for more than ~75% of
        # MemAvailable (a fixed default OOM-kills smaller hosts).
        driver_mem = f"{max(2, min(48, int(_mem_available_gib() * 0.75)))}g"

    builder = SparkSession.builder
    if master is not None:
        builder = builder.master(master)
    builder = (
        builder.appName(app_name)
        # AQE: runtime partition coalescing + skew-join splitting — the
        # declarative replacement for the reference's manual shard loops
        # (src/help/specifal_name_transformer.py:33-44).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow transfer for every pandas UDF / toPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # AQE's own promotion threshold is kept far BELOW the static
        # one.  Static planning sizes a side from column-pruned file
        # stats (conservative); AQE promotes from the side's COMPRESSED
        # shuffle bytes at runtime, and the deserialized row relation
        # the DRIVER must then build is 10-20x that — a 64m-compressed
        # promotion is a ~1g driver-side collect + hash-relation build.
        # That killed the 33M-turn pipeline in local-cluster mode three
        # times (maxResultSize abort at 1g; driver-heap OOM in
        # BroadcastExchangeExec.relationFuture at 12g; "not enough
        # memory to build and broadcast" at 16m-compressed/8g-driver —
        # array<long> sketch rows compress ~50-100x, so 16m compressed
        # deserialized to GBs).  local[N] only survives it because the
        # shared 48g+ JVM absorbs the build.  8m compressed is safe on
        # any production driver while still letting AQE rescue
        # genuinely small runtime sides.
        .config(
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            str(8 * 1024 * 1024),
        )
        # Row-serialized task results for driver-side relation builds
        # can exceed the 1g default even at 16m compressed; 4g is the
        # standard setting for AQE-broadcast-heavy pipelines and the
        # driver heap (>=8g) has the headroom.
        .config("spark.driver.maxResultSize", "4g")
        # r06 (guide §3.1): let AQE rewrite sort-merge to shuffled-hash
        # at runtime when every build-side partition is small — the
        # pair double-join then skips two full sorts of the 43M-row
        # pair table.  This is NOT the r05 SHUFFLE_HASH hint that
        # measured 86 GB/994 s: the static hint suppressed AQE's
        # broadcast conversions; the AQE rewrite runs AFTER them and
        # only where broadcast was already rejected.  128m compressed
        # per partition (~32 per-task hash builds of a few hundred MB
        # deserialized) fits both the local 48g JVM and a 20g
        # local-cluster executor at 8 tasks.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            "128m",
        )
    )
    if not submit_mode:
        # Launch-time JVM options: settable only when THIS process
        # spawns the driver JVM (local / local-cluster modes).  Under
        # spark-submit the JVM already exists — pass --driver-memory /
        # --driver-java-options on the submit command line instead.
        # Fix the heap at its max and fault every page in at JVM
        # start: without -Xms + AlwaysPreTouch, high-allocation stages
        # (collect_list, per-pair array building) grow the heap lazily
        # and stall in kernel page-fault storms — measured 60-90%
        # *system* CPU and a 4-5x wall-time penalty at local[32].
        builder = builder.config("spark.driver.memory", driver_mem).config(
            "spark.driver.extraJavaOptions",
            f"-Xms{driver_mem} -XX:+AlwaysPreTouch",
        )
    if is_cluster:
        # Mirror the driver heap discipline on each executor JVM: the
        # master spec's memMB is the worker's budget; give the executor
        # the same amount pre-touched so allocation-heavy stages don't
        # stall in page faults (same measured pathology as the driver).
        inner = master[master.index("[") + 1 : master.rindex("]")]
        mem_mb = int(inner.split(",")[2])
        # Executor python workers don't inherit the driver's sys.path
        # (unlike local[N]); ship the package root the way
        # spark-submit --py-files would on a real cluster.
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        exec_pp = ":".join(
            p for p in (pkg_root, os.environ.get("PYTHONPATH")) if p
        )
        builder = (
            builder.config("spark.executor.memory", f"{mem_mb}m")
            .config(
                "spark.executor.extraJavaOptions",
                f"-Xms{mem_mb}m -XX:+AlwaysPreTouch",
            )
            .config("spark.executorEnv.PYTHONPATH", exec_pp)
        )
    if not submit_mode:
        # r05 disk budget (sandbox-level; a real cluster sets these at
        # the platform layer).  /tmp here backs only ~80 GB — less
        # than the lz4 live shuffle set of a 33M-turn content run
        # (measured: "No space left on device" aborts in the pair
        # stage), so:
        # - 120 s periodic context-cleaner GC: the 30 min default
        #   lets DEAD stages' shuffle files pile up for the whole run
        #   (observed 35 GB reclaimed by one GC at 98% disk);
        # - tmpfs local-dir split is OPT-IN via SPARK_GRAFT_SHM=1:
        #   it halves the per-device footprint but tmpfs pages are
        #   unevictable RAM — alongside the pre-touched 48g heap the
        #   kernel OOM-killed two 33M runs — so it is only for runs
        #   that set a smaller SPARK_DRIVER_MEM.
        if os.environ.get("SPARK_GRAFT_SHM") and os.path.isdir("/dev/shm"):
            shm = "/dev/shm/spark_graft_local"
            try:
                os.makedirs(shm, exist_ok=True)
                builder = builder.config("spark.local.dir", f"{shm},/tmp")
            except OSError:
                pass
        builder = builder.config(
            "spark.cleaner.periodicGC.interval", "120s"
        )
        # zstd for shuffle/spill/broadcast blocks: ~1.5-2.5x smaller
        # than lz4 on this text-heavy data — the third leg of the
        # same disk budget (the 33M content run's live set measured
        # ~100 GB under lz4, over even the split-device capacity).
        # CPU cost is within noise for these workloads; on a real
        # cluster this is a standard large-shuffle setting.
        builder = builder.config("spark.io.compression.codec", "zstd")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one of the driver-generated parquet tables.

    Small single-file tables (one parquet row group) arrive as ONE
    scan task, so every pre-exchange row-local projection — tokenize,
    regex language-ID, fingerprints, k-gram winnowing — runs serially
    in that task while the rest of the cluster idles (guide §2.5
    "input skew: one huge unsplittable file ... repartition
    immediately after the read"; measured: q57's curation verdicts
    spent ~20 s in sequential 1-task stages at local[32]).  Inputs at
    or below one scan split (spark.sql.files.maxPartitionBytes,
    default 128 MB) are therefore rebalanced to the cluster's default
    parallelism — the shuffle moves at most one split's bytes, a
    negligible price for restoring parallel row work.  Larger tables
    keep their native multi-split scan layout and are never
    reshuffled.  Row placement only; no query's result depends on it
    (filters/pruning still push through the exchange to the scan).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    try:
        n_bytes = os.path.getsize(path)
    except OSError:
        return df
    if n_bytes <= 128 * 1024 * 1024:  # one default scan split
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df
