"""A/B probe: attribute a cross-round bench delta to CODE vs AMBIENT.

The ambient-drift protocol (docs/SCALE.md round-7 attribution; memory:
cross-round bench deltas are environment-dominated) requires an
INTERLEAVED measurement before blaming an edit: this script runs the
same keys against two git checkouts — arm A (a pre-edit worktree) and
arm B (the current repo) — in alternating subprocess batches, so
slow ambient drift (page cache, thermal, background load) hits both
arms equally. Each batch is a fresh SparkSession; only query reps are
timed (never session startup). Controls (keys untouched by the edit)
ride along in every batch: if a touched key's A/B ratio matches the
control's, the delta is ambient, not the edit.

    git worktree add /tmp/ab_pre <pre-edit-commit>
    python tools/ab_code_version.py --a /tmp/ab_pre --b /root/repo \
        --keys dedup_ngram_jaccard similarity_topk \
        --controls join_inner sort_limit [--batches 4] [--reps 3]

Prints one JSON line: per key, per arm, the per-rep timings and the
min/median summary with the B/A ratio.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

_BATCH_SRC = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
os_keys = json.loads(sys.argv[2])
sf_dir = sys.argv[3]
reps = int(sys.argv[4])
from parquet_to_hyper_app_spark.registry import load_all
from parquet_to_hyper_app_spark.session import build_session
specs = load_all()
spark = build_session("ab_code_version")
out = {}
for key in os_keys:
    fn = specs[key].fn
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    times = []
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    out[key] = times
print("ABRESULT " + json.dumps(out))
spark.stop()
"""


def run_batch(checkout: str, keys: list[str], sf_dir: str, reps: int) -> dict:
    # prepend, don't replace: a clobbered PYTHONPATH silently drops
    # dependency paths on environments that rely on it (ADVICE r8)
    prior = os.environ.get("PYTHONPATH", "")
    env = dict(
        os.environ, PYTHONPATH=checkout + (os.pathsep + prior if prior else "")
    )
    proc = subprocess.run(
        [sys.executable, "-c", _BATCH_SRC, checkout, json.dumps(keys), sf_dir, str(reps)],
        capture_output=True,
        text=True,
        cwd=checkout,
        env=env,
        check=False,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"batch in {checkout} produced no result:\n{proc.stderr[-2000:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="pre-edit checkout (worktree)")
    ap.add_argument("--b", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--keys", nargs="+", required=True)
    ap.add_argument("--controls", nargs="*", default=[])
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    keys = list(args.keys) + list(args.controls)
    acc: dict[str, dict[str, list[float]]] = {k: {"A": [], "B": []} for k in keys}
    for i in range(args.batches):
        # alternate which arm goes first so order effects cancel too
        order = ("A", "B") if i % 2 == 0 else ("B", "A")
        for arm in order:
            checkout = args.a if arm == "A" else args.b
            res = run_batch(checkout, keys, args.sf, args.reps)
            for k, times in res.items():
                acc[k][arm].extend(times)
            print(f"batch {i + 1}/{args.batches} arm {arm} done", file=sys.stderr)

    summary = {}
    for k in keys:
        a, b = acc[k]["A"], acc[k]["B"]
        summary[k] = {
            "A_min": round(min(a), 3),
            "A_med": round(statistics.median(a), 3),
            "B_min": round(min(b), 3),
            "B_med": round(statistics.median(b), 3),
            "ratio_min": round(min(b) / min(a), 3),
            "ratio_med": round(statistics.median(b) / statistics.median(a), 3),
            "control": k in args.controls,
        }
    print(json.dumps({"sf": args.sf, "batches": args.batches, "reps": args.reps,
                      "summary": summary, "raw": acc}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
