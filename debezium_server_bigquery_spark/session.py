"""SparkSession factory with scale-oriented defaults.

The reference tunes throughput with batch-size waits and bounded parallel
uploads (BaseChangeConsumer.java:83-86, batchsizewait/*); on Spark the
equivalent levers are AQE, shuffle-partition sizing, and broadcast
thresholds, set once here so every entry point (tests, bench, driver)
gets the same envelope.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _host_mem_gb() -> float:
    """MemTotal in GiB, 0.0 when unreadable (non-Linux)."""
    try:
        with open("/proc/meminfo") as fh:
            for ln in fh:
                if ln.startswith("MemTotal"):
                    return int(ln.split()[1]) / (1024 * 1024)
    except Exception:
        pass
    return 0.0


def get_spark(
    app_name: str = "debezium-server-bigquery-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's tuned defaults.

    Defaults are chosen for correctness at small SF and sanity at scale:

    - AQE on (runtime coalesce + skew-join splitting): at 100 TB the static
      shuffle-partition count is always wrong somewhere; AQE re-plans.
    - ``partitionOverwriteMode=dynamic``: the upsert MERGE rewrites only the
      partitions a micro-batch touches (operators/merge.py).
    - session timezone UTC: epoch-ms coercions (F7) and the DuckDB oracle
      agree on instants.
    - Arrow enabled: any unavoidable Python stage is Arrow-batched.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    # Pin the heap (-Xms = heap size + AlwaysPreTouch) only when the host
    # can actually back it: committing the full default 16g at startup on
    # a small-RAM host would fail the JVM launch where the lazily-grown
    # heap worked (ADVICE r13).  An explicit SPARK_GRAFT_DRIVER_MEM is
    # the operator's statement that the RAM exists; for the default we
    # require MemTotal comfortably above the heap.
    pin_heap = "SPARK_GRAFT_DRIVER_MEM" in os.environ or _host_mem_gb() >= 24
    exec_mem = os.environ.get("SPARK_GRAFT_EXECUTOR_MEM", "")
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst stays at its default (true): size-based
        # coalescing (parallelismFirst=false) was measured 15% slower
        # end-to-end here — byte counts underestimate CPU-heavy stages
        # (decimal aggregation, shingle hashing) at small SF, and AQE
        # coalesced away exactly the parallelism the spread scans add.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(cpus, 8)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Round-robin repartition (the load_table(spread=True) fan-out)
        # sorts every row locally before the shuffle write by default, as a
        # guard against task-retry nondeterminism.  The spread sits directly
        # on a deterministic parquet scan whose replay order is stable, so
        # the sort buys nothing and runs serially on exactly the single hot
        # scan task the spread exists to relieve (~0.5 s of q1 at sf0.1).
        # Expression-based repartitions elsewhere (bucket salt, inverted
        # index) are unaffected — they never sort.
        .config("spark.sql.execution.sortBeforeRepartition", "false")
        # The driver's events.parquet stores ts as TIMESTAMP(NANOS); Spark
        # has no nanos timestamp — read as long, converted in sources/tables.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", driver_mem)
        # Wide codegen'd plans (60-col simhash votes, 12-hash minhash) churn
        # the default 100-entry generated-class cache and the JVM's JIT code
        # cache; a workload of ~20 distinct plans then re-compiles classes it
        # just ran (observed as a random query paying 5-9 s).  A bigger class
        # cache + a 1 GiB reserved code cache keep steady-state plans hot.
        # CICompilerCount=16: the workload's ~20 wide plans outnumber
        # HotSpot's default compiler pool on a 32-core box, and queued C2
        # compilations surfaced as random 5-20 s spikes on sub-second
        # queries; a deeper pool drains the queue alongside execution
        # (measured: headline bench 17.5 s -> 13.4 s, spike tail gone).
        .config("spark.sql.codegen.cache.maxEntries", "1000")
        # -Xms = -Xmx + AlwaysPreTouch: allocation-heavy stages (interpreted
        # higher-order array expressions, wide aggregation buffers) drive the
        # young gen at 10+ GB/s, and a heap the JVM grows/shrinks on demand
        # re-faults pages through the hypervisor constantly — measured on the
        # round-13 host (Firecracker VM) as identical back-to-back HOF-heavy
        # jobs swinging 2.3 s <-> 78 s with GC pauses accounting for <10% of
        # it (the rest is page-fault stalls inside allocation).  Pre-touching
        # a fixed heap once at startup made the same workload a stable 2.1-
        # 2.4 s (docs/OPTIMIZATION_r13 §Inherited state).  Same reasoning as
        # production: long-running executors run steadiest with Xms=Xmx, at
        # the cost of ~1 s extra startup to fault the heap in.
        .config(
            "spark.driver.extraJavaOptions",
            (f"-Xms{driver_mem} -XX:+AlwaysPreTouch " if pin_heap else "")
            + "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing -XX:CICompilerCount=16",
        )
        # Same pin on the EXECUTOR side (round 14, VERDICT r13 ask #6): in
        # local mode executors live inside the driver JVM so this line is
        # inert here, but in cluster mode the allocation-heavy stages (the
        # interpreted-HOF hot loops that exposed the commit-churn pathology)
        # run in executor JVMs — they need the same steady heap.
        # AlwaysPreTouch pre-faults the INITIAL heap, so the full pin needs
        # -Xms = spark.executor.memory; that value is deployment-specific,
        # so it rides the optional SPARK_GRAFT_EXECUTOR_MEM env var (set it
        # to the same value as spark.executor.memory in cluster mode).
        .config(
            "spark.executor.extraJavaOptions",
            (
                (f"-Xms{exec_mem} " if exec_mem else "")
                + ("-XX:+AlwaysPreTouch " if pin_heap else "")
                + "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing"
            ),
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
