"""SparkSession factory tuned for the engine.

Local test mode runs ``local[N]`` (single JVM); the same config block is what
we'd ship to a 1000-executor cluster — AQE owns runtime re-planning (partition
coalescing, skew-join splitting), shuffle partitions default to a
cluster-appropriate count, and Arrow is on for the few Pandas-UDF operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "core_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config.

    Settings that matter at 100 TB and are harmless at sf0.001:

    - AQE + coalesce + skew-join: runtime re-plan fixes both over- and
      under-partitioned shuffles and splits skewed join partitions.
    - ``spark.sql.session.timeZone=UTC``: deterministic timestamp semantics
      (and parity with the DuckDB oracle, which is UTC-naive).
    - Arrow for Pandas UDF transfer (the minhash/ANN/multimodal slow paths).
    - autoBroadcastJoinThreshold raised to 64 MB: every dim table in the
      star schema (region/nation/customer/supplier/part at per-executor
      scale) should broadcast rather than shuffle.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # SPARK_GRAFT_MASTER lets the soak harnesses run the same code under
    # ``local-cluster[W,C,MB]`` (real executor JVMs + network shuffle +
    # serialization boundaries — the closest a single box gets to cluster
    # behavior) without editing call sites. Explicit ``master=`` wins.
    env_master = os.environ.get("SPARK_GRAFT_MASTER")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or env_master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst stays at Spark's TRUE default, by measurement
        # (r16 session 4, interleaved ABAB at fixed host conditions —
        # single-leg bench magnitudes were host-confounded and are
        # superseded): flipping it false (the Spark docs' production
        # suggestion, with advisory=64m) coalesces every sf0.1 shuffle to
        # ~1 partition and costs the dedup family +30-40% (l06 2.6→3.6-3.9,
        # l06x 2.4→3.2-3.7 min-of-3, two interleaved pairs); the middle
        # ground minPartitionSize=8m ("never schedule a sub-8MB reduce
        # task") costs +46-57% (l06 2.52→3.94, l06x 2.37→3.47) — the
        # ~40 MB shingle index collapsing to ~5 post-shuffle partitions
        # starves the window valve and verify joins. Post-shuffle stages
        # here carry real compute at small shuffle sizes, and fewer tasks
        # lose more compute parallelism than they save in dispatch; the
        # r16 8-core evidence (8 tasks beat 32) does not extrapolate
        # below ~8. Relational g01/g03 are flat under both flips (their
        # apparent regressions in the single-leg benches were host
        # noise). At 100 TB the settings converge (shuffles ≫ advisory ×
        # cores), so the default costs nothing there either. Full legs in
        # OPTIMIZATION_r16.md "session 4".
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # The driver's events.parquet carries TIMESTAMP(NANOS); Spark reads
        # it as long nanos under this flag and io.load_tables converts back
        # to a proper TimestampType (micros).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # zstd over Spark's lz4 default for shuffle/broadcast blocks:
        # measured on the sf10 relational soak under local-cluster[4,8,8g]
        # (real serialized shuffle — scripts in /tmp replicated in
        # PROGRESS.md r10.8): g02 6.0 → 3.8 s, g03 7.7 → 6.0 s with ~25%
        # fewer shuffled bytes. At 100 TB the byte reduction is network
        # headroom; zstd's extra CPU is already paid for by the win here.
        .config("spark.io.compression.codec", "zstd")
        # zstd for PARQUET writes too (r16, guide §6): the session never set
        # this, so every lake/index write used Spark's snappy default.
        # Measured on the o1 ingest pipeline (6 interleaved legs, fresh
        # warehouse each): 529 KB vs 955 KB = 1.80× smaller on disk, wall
        # time within run-to-run noise (min 2.42 s vs 2.25 s, overlapping
        # spreads). At 100 TB the ratio is read-side I/O headroom for every
        # warehouse scan; values are codec-independent. Env-overridable for
        # A/B comparability.
        .config(
            "spark.sql.parquet.compression.codec",
            os.environ.get("SPARK_GRAFT_PARQUET_CODEC", "zstd"),
        )
        .config("spark.ui.enabled", "false")
        # Scan split size, env-parameterised (r16, guide §6/§2.2): the
        # 128m Spark default is right for the local bench (test files are
        # KB-MB; a bigger split changes nothing here), but at 100 TB
        # larger splits (512m-1g) cut task-scheduling overhead and shrink
        # the map-task count feeding every shuffle — set
        # SPARK_GRAFT_MAX_PARTITION_BYTES=1g on the cluster profile.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Only meaningful off local[*]: under local-cluster each executor
        # JVM gets this heap (must fit the worker's memory-per-worker MB).
        .config(
            "spark.executor.memory",
            os.environ.get("SPARK_GRAFT_EXECUTOR_MEM", "6g"),
        )
    )
    resolved_master = master or env_master or f"local[{cpus}]"
    if resolved_master.startswith("local-cluster"):
        # local-cluster executors are SEPARATE JVMs whose Python workers
        # don't inherit the driver's sys.path, so any UDF closure that
        # references a module-level helper (pickled by reference —
        # the multimodal decoders, _frame, ...) dies with
        # ModuleNotFoundError on the executor. On a real cluster the
        # package ships via --py-files / a pip install; the single-box
        # analogue is pointing the executor workers at the same repo
        # checkout. Pure-column specs never notice either way.
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        existing = os.environ.get("PYTHONPATH", "")
        builder = builder.config(
            "spark.executorEnv.PYTHONPATH",
            f"{repo_root}:{existing}" if existing else repo_root,
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


ROCKSDB_STATE_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb_state(spark: SparkSession, changelog: bool = True) -> None:
    """Switch stateful streaming to the RocksDB state store — the
    production choice for large state (continuous-ingest dedup horizons,
    per-key counters over millions of keys): the default provider keeps
    all state in executor heap, RocksDB spills to local disk and, with
    changelog checkpointing, uploads only per-batch deltas instead of
    full snapshots. Runtime-settable; applies to queries started after
    the call (existing checkpoints keep their original provider)."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                   ROCKSDB_STATE_PROVIDER)
    if changelog:
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
