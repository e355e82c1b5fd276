"""Unsplittable-input guard (spark_optimization_guide section 2.5).

Parquet scans cannot split a row group: a table written as one file with
one row group (the driver's testdata layout) yields exactly ONE non-empty
scan task no matter how many splits `spark.sql.files.maxPartitionBytes` /
`minPartitionNum` plan - so every map-side stage fused into that scan
(shingling, hashing, partial aggregation) runs single-threaded on a
32-core session.  The guide's fix for unsplittable input is to
"repartition immediately after the read"; `spread_input` does that, but
ONLY after probing that the scan is actually starved:

* many input files (>= session parallelism) -> splittable, no-op;
* local parquet footers report >= parallelism row groups -> no-op;
* non-file inputs or unreadable/remote footers -> no-op (fail open: a
  wrong repartition at 100 TB costs a full-corpus shuffle, a missed one
  costs nothing on well-laid-out data);
* otherwise round-robin repartition, sized by the data (>= 64 KiB of
  compressed input per partition) and capped at parallelism x
  `multiplier` (2 waves for straggler smoothing).

At production scale inputs arrive as thousands of multi-row-group files
and the probe short-circuits on the file count without touching any
footer, so this guard is free exactly where it is unnecessary.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def input_bytes(df: DataFrame) -> int | None:
    """Total on-disk bytes of a frame's (local) input files, or None when
    unknowable cheaply (no files / remote scheme).  Used for cost-based
    plan choices (e.g. bounded-vs-bucketed vocabulary ranking) the same
    way Spark's own size estimates gate broadcast joins - the choice
    must never change results, only the plan."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for f in files:
        if f.startswith("file:"):
            path = f.split(":", 1)[1]
        elif ":" in f.split("/", 1)[0]:
            return None
        else:
            path = f
        try:
            total += os.path.getsize(path)
        except OSError:
            return None
    return total


def spread_input(df: DataFrame, multiplier: int = 2) -> DataFrame:
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        # idempotence: a frame that already repartitions (e.g. an operator
        # composing another operator that spread its own input) must not
        # pay a second round-robin exchange
        if "Repartition" in df._jdf.queryExecution().analyzed().toString():
            return df
        files = df.inputFiles()
    except Exception:
        return df
    if not files or len(files) >= target:
        return df
    row_groups = 0
    total_bytes = 0
    try:
        import pyarrow.parquet as pq

        for f in files:
            if f.startswith("file:"):
                path = f.split(":", 1)[1]
            elif ":" in f.split("/", 1)[0]:
                return df  # remote scheme: cannot probe footers cheaply
            else:
                path = f
            if not os.path.exists(path) or not path.endswith(".parquet"):
                return df
            total_bytes += os.path.getsize(path)
            row_groups += pq.ParquetFile(path).num_row_groups
            if row_groups >= target:
                return df
    except Exception:
        return df
    # partition count scales with DATA (>=64 KiB of compressed input per
    # partition), capped at 2 waves of the session's cores - a tiny table
    # gets a few real partitions instead of cores x 2 near-empty ones
    n = max(8, min(target * multiplier, (total_bytes >> 16) + 1))
    return df.repartition(n)
