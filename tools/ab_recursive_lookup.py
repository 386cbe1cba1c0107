"""A/B probe: attribute the r6 `stream_stream_join` bench regression.

VERDICT r6 item 2: `stream_stream_join` moved 2.033 → 2.586 s between
r5 and r6 with disjoint spreads; the only r6 edit on its path is the
`recursiveFileLookup` correctness fix in `streaming/source.py`
(a directory-shaped events table silently streamed 0 rows). This
script measures the option's cost WITHOUT editing package source:
arm B monkeypatches `DataStreamReader.option` to drop exactly that
key, and reps interleave A/B/A/B so ambient session drift hits both
arms equally.

    python tools/ab_recursive_lookup.py [--reps 5] [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import DataStreamReader  # noqa: E402

from parquet_to_hyper_app_spark.registry import load_all  # noqa: E402
from parquet_to_hyper_app_spark.session import build_session  # noqa: E402

_ORIG_OPTION = DataStreamReader.option


def _option_sans_recursive(self, key, value):
    if key == "recursiveFileLookup":
        return self
    return _ORIG_OPTION(self, key, value)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--key", default="stream_stream_join")
    args = ap.parse_args()

    specs = load_all()
    fn = specs[args.key].fn
    spark = build_session("ab_recursive_lookup")
    # same logger silencing as bench.py — the streaming AQE warn floods
    jvm = spark.sparkContext._jvm
    for logger in (
        "org.apache.spark.sql.execution.streaming.runtime.MicroBatchExecution",
        "org.apache.spark.sql.execution.streaming.runtime.ResolveWriteToStream",
    ):
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            logger, jvm.org.apache.logging.log4j.Level.ERROR
        )

    def run_once() -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # one warmup per arm (listing + codegen + state-store spin-up paths)
    for patched in (False, True):
        DataStreamReader.option = _option_sans_recursive if patched else _ORIG_OPTION
        run_once()

    arms: dict[str, list[float]] = {"with_option": [], "without_option": []}
    for _ in range(args.reps):
        for patched in (False, True):
            DataStreamReader.option = _option_sans_recursive if patched else _ORIG_OPTION
            arms["without_option" if patched else "with_option"].append(run_once())
    DataStreamReader.option = _ORIG_OPTION

    out = {
        "key": args.key,
        "sf": args.sf,
        "reps": args.reps,
    }
    for arm, reps in arms.items():
        reps.sort()
        out[arm] = {
            "min": round(reps[0], 3),
            "median": round(reps[len(reps) // 2], 3),
            "max": round(reps[-1], 3),
            "all": [round(r, 3) for r in reps],
        }
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
