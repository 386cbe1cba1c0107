"""One-shot timing sweep over EVERY registered query (noop sink).

    python tools/time_all.py [--sf /root/testdata/sf0.1] [--reps 1] [key...]

Purpose: find expensive NON-headline keys the bench set doesn't time.
One warm rep (plan+codegen+listing) then `--reps` timed reps; prints
one JSON line {key: best_sec} sorted slowest-first. Not a benchmark —
a triage sweep; attribution still goes through tools/ab_code_version.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_to_hyper_app_spark.registry import load_all  # noqa: E402
from parquet_to_hyper_app_spark.session import build_session  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()
    specs = load_all()
    keys = args.keys or list(specs)
    spark = build_session("time_all")
    out: dict[str, float] = {}
    for key in keys:
        fn = specs[key].fn
        try:
            spark.sparkContext.setJobDescription(f"time_all:{key}")
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()  # warm
            best = float("inf")
            for _ in range(args.reps):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            out[key] = round(best, 3)
            print(f"{key}: {out[key]:.2f}s", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"{key}: ERROR {type(e).__name__}: {str(e)[:160]}", file=sys.stderr)
            out[key] = -1.0
    spark.stop()
    ranked = dict(sorted(out.items(), key=lambda kv: -kv[1]))
    print(json.dumps(ranked))
    return 0


if __name__ == "__main__":
    sys.exit(main())
