"""Local replica of the driver's DuckDB-oracle correctness check.

Usage:
    python tools/parity.py [--sf /root/testdata/sf0.01] [key ...]

For every registered query (or the given keys): run the PySpark
implementation and the oracle SQL side-by-side, compare row count,
sorted column names, and order-insensitive values (columns sorted by
name, rows sorted by canonical string, exact cell equality with a
float-diff report on mismatch). Exit 1 if anything diverges.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_to_hyper_app_spark.catalog import TABLE_NAMES  # noqa: E402
from parquet_to_hyper_app_spark.registry import load_all  # noqa: E402
from parquet_to_hyper_app_spark.session import build_session  # noqa: E402
from tools.greens import LEDGER_PATH, fingerprint  # noqa: E402

#: LEDGER_PATH (defined in tools.greens so the writer here and the
#: round-boundary expirer in greens.record can never point at
#: different files): key → fingerprint that passed a hash-green LOCAL
#: parity run at the driver's correctness scale (sf0.01). When the
#: hot-key count exceeds the driver's 50-row budget, the tripwire
#: (tests/test_green_tripwire.py) accepts the overflow ONLY for keys
#: whose CURRENT fingerprint has a recorded pass — "verified locally,
#: driver row deferred one round" instead of "unverified".


def record_local_passes(passed: dict[str, str], sf_dir: str) -> None:
    """Fold hash-green passes into the ledger (driver-scale runs only)."""
    if os.path.basename(sf_dir.rstrip("/")) != "sf0.01":
        # say so OUT LOUD (advisor r4): a symlinked or renamed copy of
        # driver-scale data would otherwise make the waiver workflow
        # look like it succeeded while the tripwire still fails
        if passed:
            print(
                f"NOTE: {len(passed)} hash-green pass(es) NOT recorded in the "
                f"local-parity ledger — waivers require the driver-scale "
                f"directory itself (basename 'sf0.01'), got {sf_dir!r}",
                file=sys.stderr,
            )
        return
    ledger = {}
    if os.path.exists(LEDGER_PATH):
        with open(LEDGER_PATH) as f:
            ledger = json.load(f)
    ledger.update(passed)
    with open(LEDGER_PATH, "w") as f:
        json.dump(dict(sorted(ledger.items())), f, indent=1)
        f.write("\n")


def canon_cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_frame(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = []
    for row in df[cols].itertuples(index=False, name=None):
        rows.append(tuple(canon_cell(v) for v in row))
    rows.sort()
    return rows


def nonscalar_cells(pdf: pd.DataFrame) -> list[str]:
    """Columns whose cells the driver's canonicalizer cannot hash/sort.

    The driver does a plain pandas sort over every output column; a
    list/ndarray/dict cell raises `TypeError: unhashable type` there
    (seen in CORRECTNESS_r01 for agg_approx_percentile). Flag them
    locally so they never reach the driver.
    """
    bad = []
    for col in pdf.columns:
        # check the first NON-NULL value of every column over ALL rows:
        # a nullable array column whose early rows are null would slip
        # past any fixed-size head sample
        s = pdf[col]
        nn = s[s.notna()] if s.dtype == object else s.head(0)
        v = nn.iloc[0] if len(nn) else None
        if isinstance(v, (list, tuple, dict, set)) or type(v).__name__ == "ndarray":
            bad.append(col)
    return bad


def compare(key: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        errs.append(f"rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        errs.append(f"columns spark={sc} oracle={oc}")
        return errs
    a, b = canon_frame(spark_pdf), canon_frame(oracle_pdf)
    if a != b:
        n_bad = sum(1 for x, y in zip(a, b) if x != y) + abs(len(a) - len(b))
        errs.append(f"values differ in ~{n_bad}/{max(len(a), len(b))} rows")
        for x, y in zip(a, b):
            if x != y:
                errs.append(f"  first diff:\n    spark : {x}\n    oracle: {y}")
                break
    return errs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--cluster-defaults",
        action="store_true",
        help="conf-sensitivity sweep (VERDICT r4 item 7): run with the "
        "cluster-default tuning confs — shuffle.partitions=200, "
        "maxPartitionBytes=128m, streaming state partitions=200 (makes "
        "stream_shuffle_scope a no-op) — instead of the local-bench "
        "sizing, proving no correctness result depends on local tuning. "
        "Semantics confs (REQUIRED_SQL_CONFS) always apply: they define "
        "engine behavior, not placement.",
    )
    ap.add_argument(
        "--oracle-sf",
        default=None,
        help="read the DuckDB oracle tables from THIS directory while the "
        "engine reads --sf: physical-layout sweeps (e.g. each table "
        "rewritten as a directory of many part files, which DuckDB 1.0 "
        "cannot glob) point the oracle at the value-identical canonical "
        "single-file copy. Ledger waivers are never recorded in this "
        "mode — the pass proves the layout, not the driver-scale data.",
    )
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    if args.cluster_defaults:
        # the env var governs streaming.source's import-time constant;
        # nothing has imported it yet (registry only pulls streaming
        # inside load_all(), which runs below), so setting the env here
        # is the load-bearing path. The attribute patch is belt and
        # braces for a future top-level import creeping in ahead of
        # main() — in that case the env var would arrive too late and
        # only the patch would apply the override.
        os.environ["SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS"] = "200"
        os.environ["SPARK_GRAFT_MAX_PARTITION_BYTES"] = "128m"
        import parquet_to_hyper_app_spark.streaming.source as _stream_src

        _stream_src.STREAM_SHUFFLE_PARTITIONS = 200

    specs = load_all()
    keys = args.keys or list(specs)
    unknown = [k for k in keys if k not in specs]
    if unknown:
        print(f"unknown keys: {unknown}")
        return 2

    spark = build_session(
        "parity", shuffle_partitions=200 if args.cluster_defaults else None
    )
    con = duckdb.connect()
    oracle_sf = args.oracle_sf or args.sf
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{oracle_sf}/{t}.parquet')"
        )

    failures = 0
    local_passes: dict[str, str] = {}
    for key in keys:
        spec = specs[key]
        t0 = time.time()
        try:
            spark_pdf = spec.fn(spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {key}: spark error: {type(e).__name__}: {str(e)[:400]}")
            failures += 1
            continue
        bad_cols = nonscalar_cells(spark_pdf)
        if bad_cols:
            print(f"FAIL {key}: non-scalar output columns {bad_cols} would crash the driver")
            failures += 1
            continue
        if spec.oracle is None:
            print(f"weak {key}: rows={len(spark_pdf)} ({time.time() - t0:.1f}s, no oracle)")
            if len(spark_pdf) == 0 and key not in ("stream_watermark_late",):
                print(f"  WARNING {key}: 0 rows from a rows-only query")
            continue
        try:
            oracle_pdf = con.execute(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {key}: oracle error: {type(e).__name__}: {str(e)[:400]}")
            failures += 1
            continue
        errs = compare(key, spark_pdf, oracle_pdf)
        if errs:
            failures += 1
            print(f"FAIL {key} ({time.time() - t0:.1f}s)")
            for e in errs:
                print(f"  {e}")
        else:
            print(f"ok   {key}: rows={len(spark_pdf)} ({time.time() - t0:.1f}s)")
            local_passes[key] = fingerprint(spec)

    if args.oracle_sf is None:
        record_local_passes(local_passes, args.sf)
    print(f"\n{len(keys) - failures}/{len(keys)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
