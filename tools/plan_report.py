"""Print the physical-plan quality matrix for every declared query.

    python tools/plan_report.py [--sf /root/testdata/sf0.01]

Columns: shuffle count, broadcast/sort-merge/nested-loop join counts,
whole-stage-codegen stage count, parquet pushdown flag, scan count.
Use it after adding an operator: if a dimension join isn't broadcast or
a filter didn't push down, fix the query, not the report.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_to_hyper_app_spark.plans.inspect import plan_stats  # noqa: E402
from parquet_to_hyper_app_spark.registry import load_all  # noqa: E402
from parquet_to_hyper_app_spark.session import build_session  # noqa: E402

# streaming/side-effecting queries whose plan is not a pure batch plan
SKIP = {"stream_watermark_late", "convert_sink", "convert_sink_events"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()
    specs = load_all()
    spark = build_session("plan_report")
    keys = args.keys or [k for k in specs if k not in SKIP]
    print(f"{'key':28} {'shuf':>4} {'bhj':>3} {'smj':>3} {'bnlj':>4} {'wscg':>4} {'push':>5} {'scan':>4}")
    for key in keys:
        try:
            df = specs[key].fn(spark, args.sf)
            # execute so AQE finalizes the plan (codegen markers and the
            # actual join strategies only appear in the final plan)
            df.foreachPartition(lambda _it: None)
            s = plan_stats(df)
            print(
                f"{key:28} {s.shuffles:>4} {s.broadcast_joins:>3} {s.sortmerge_joins:>3} "
                f"{s.nested_loop_joins:>4} {s.codegen_stages:>4} {str(s.pushed_filters):>5} {s.scans:>4}"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{key:28} ERROR {type(e).__name__}: {str(e)[:120]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
