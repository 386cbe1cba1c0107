"""Scale-adaptive scan widening for row-group-limited parquet inputs.

A parquet scan's decode parallelism is bounded by ROW GROUPS, not by
split bytes: Spark assigns a row group to the one task whose byte range
contains its midpoint, so a single-row-group file is decoded by exactly
one task no matter how small `spark.sql.files.maxPartitionBytes` is.
When the first stage also carries real per-row compute — partial
aggregation over exact decimals, Expand for multi-distinct, broadcast
hash probes, tokenization — that whole pipeline runs on ONE core while
the rest of the cluster idles (guide §2.5 "input skew: one huge
unsplittable file … repartition immediately after the read").

`scan_spread(df, *keys)` inserts a pinned-width hash repartition after
the scan ONLY when the measured effective scan parallelism (per file:
min(row groups, byte splits), summed) is far below the cores. The gate
makes it scale-adaptive, not a local tuning constant:

- at bench scale (one 1-row-group file per table — verified with
  pyarrow this round) the gate fires and the serial first stage turns
  into decode + shuffle-write on one core, compute on all cores;
- at production scale (hundreds of files × many 128 MB row groups)
  effective parallelism exceeds the cores, the gate never fires, and
  the plan is untouched — no repartition of a 100 TB fact table ever.

The repartition uses an EXPLICIT partition count (REPARTITION_BY_NUM)
so AQE's bytes-blind coalescing cannot fold the small local shuffle
back onto one core, and a caller-supplied high-cardinality column so
the exchange is deterministic hash partitioning (round-robin would pay
the sort-before-repartition pass and is only used when no key column
is available). Row-group counts are read from parquet footers on the
driver (pyarrow, cached by (path, mtime, size)) — never a Spark job.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (path, mtime_ns, size) → row-group count; parquet footers are
#: immutable for a given file version, so this never goes stale.
_RG_CACHE: dict[tuple[str, int, int], int] = {}

#: don't even probe footers past this many files: effective
#: parallelism is already >= the file count, which is >= cores on any
#: real deployment this gate cares about.
_MAX_PROBE_FILES = 64

#: widen only when the scan is at most 1/_GATE_RATIO as wide as the
#: cores — a nearly-wide scan isn't worth an extra exchange.
_GATE_RATIO = 4


def _local_paths(df: DataFrame) -> list[str] | None:
    """Local filesystem paths feeding df's scan, or None when unknown
    (non-file source, remote scheme). Driver-side metadata only."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:  # non-file source (range, memory, stream): unknown
        return None
    out: list[str] = []
    for uri in files:
        p = uri
        if p.startswith("file://"):
            p = p[len("file://"):]
        elif p.startswith("file:"):
            p = p[len("file:"):]
        elif "://" in p:
            return None
        out.append(p)
    return out


def _row_groups(path: str) -> int | None:
    """Row-group count from the parquet footer (cached); None if the
    footer can't be read (non-parquet input, concurrent rewrite)."""
    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        return None
    if key not in _RG_CACHE:
        try:
            import pyarrow.parquet as pq

            _RG_CACHE[key] = pq.ParquetFile(path).metadata.num_row_groups
        except Exception:
            return None
    return _RG_CACHE[key]


def effective_scan_parallelism(df: DataFrame) -> int | None:
    """Decode-parallelism estimate for df's file scan: per file,
    min(row groups, byte splits at maxPartitionBytes); summed. None
    when the source files can't be inspected from the driver."""
    paths = _local_paths(df)
    if paths is None:
        return None
    if len(paths) >= _MAX_PROBE_FILES:
        return len(paths)
    spark = df.sparkSession
    try:
        mpb = int(
            str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
            .lower()
            .removesuffix("b")
        )
    except ValueError:
        mpb = 134_217_728
    total = 0
    for p in paths:
        rg = _row_groups(p)
        if rg is None:
            return None
        try:
            splits = -(-os.path.getsize(p) // mpb) or 1
        except OSError:
            return None
        total += max(1, min(rg, splits))
    return total


def scan_spread(df: DataFrame, *keys: str | Column) -> DataFrame:
    """Widen a row-group-limited scan so first-stage compute
    parallelizes; identity when the scan is already wide (production
    file layouts) or can't be measured. See module docstring."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    eff = effective_scan_parallelism(df)
    if eff is None or eff * _GATE_RATIO > par:
        return df
    if keys:
        cols = [F.col(k) if isinstance(k, str) else k for k in keys]
        return df.repartition(par, *cols)
    return df.repartition(par)
