"""Dump .explain("formatted") for declared queries to plans/<round>/.

    python tools/explain_dump.py --tag before [--round r16] \
        [--sf /root/testdata/sf0.1] key...

For each key writes plans/<round>/<key>_<tag>.txt containing:
- the formatted plan BEFORE execution (AQE initial), and
- the executed plan AFTER a noop-sink run (AQE-final: real join
  strategies, AQEShuffleRead coalescing, codegen star markers),
so a reader can check both the static shape and what AQE resolved it
to. Streaming/side-effecting keys run their action first and dump the
batch plan of the returned frame.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_to_hyper_app_spark.plans.inspect import physical_plan  # noqa: E402
from parquet_to_hyper_app_spark.registry import load_all  # noqa: E402
from parquet_to_hyper_app_spark.session import build_session  # noqa: E402

PLANS_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans")


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--round", default="r16")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("keys", nargs="+")
    args = ap.parse_args()
    out_dir = os.path.join(PLANS_ROOT, args.round)
    os.makedirs(out_dir, exist_ok=True)
    specs = load_all()
    spark = build_session("explain_dump")
    rc = 0
    for key in args.keys:
        try:
            spark.sparkContext.setJobDescription(f"explain_dump:{key}")
            df = specs[key].fn(spark, args.sf)
            pre = formatted_plan(df)
            df.write.format("noop").mode("overwrite").save()
            post = physical_plan(df)
            path = os.path.join(out_dir, f"{key}_{args.tag}.txt")
            with open(path, "w") as f:
                f.write(f"== {key} @ {args.sf} ({args.tag}) ==\n\n")
                f.write("== explain(formatted), pre-execution ==\n")
                f.write(pre)
                f.write("\n\n== executed plan (AQE-final) ==\n")
                f.write(post)
                f.write("\n")
            print(f"{key}: wrote {path}")
        except Exception as e:  # noqa: BLE001
            rc = 1
            print(f"{key}: ERROR {type(e).__name__}: {str(e)[:200]}")
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
