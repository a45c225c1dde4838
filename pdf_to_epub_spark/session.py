"""SparkSession factory with scale-appropriate defaults.

Targets a multi-executor cluster; on this sandbox it runs ``local[N]``.
All knobs here matter at 100 TB: AQE for runtime re-planning and skew-join
splitting, Arrow for the pandas-UDF extraction path, and bounded Arrow batch
sizes so one heavy-tailed document batch can't blow executor memory.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pdf_to_epub_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # UTC everywhere: testdata timestamps are NTZ, but pinning the
        # session TZ keeps any tz-aware casts aligned with DuckDB oracles.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        # Coalescing OFF, skew-join ON: this engine sizes shuffle partitions
        # explicitly (≈cores), and AQE's size-based coalescing underestimates
        # wide block/text rows — measured on the 20k-doc assembly shuffle it
        # collapses the agg to ~3 active cores (2-3× wall).  Re-enable with a
        # tuned advisoryPartitionSizeInBytes when partition counts are not
        # explicitly managed.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Documents are large; keep Arrow batches small so a batch of
        # heavy-tailed docs stays within executor memory.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        # 24g on this 128 GiB box: 8g GC-thrashes the 32-thread text
        # workloads (quality_filters measured 16.7 s at 8g vs 13.2 s at
        # 32g cold); on a real cluster executor memory is set per-node in
        # spark-submit (DEPLOYMENT.md)
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
