"""Measure SemDeDup's production scale-k claim instead of asserting it.

    python tools/semdedup_k_probe.py [--scales 1 32 64]

docs/SCALE.md's ANN x64 row reads `dedup_semantic`'s 16x growth as the
fixed-k(=16) worst case and states that production SemDeDup grows
k ∝ n (Abbas et al. 2023 §3) to hold expected cluster size n/k
constant, restoring the flat curve. This probe runs BOTH modes of
`semdedup_frame` over the same replicated corpora:

- fixed:  k = _KM_K at every scale (the registered, oracle-replayable
  shape — cluster populations grow K×, the within-cluster cosine term
  quadratically);
- scaled: k = _KM_K · K at replication K (the production rule; the
  pandas-UDF assignment path, since a k·dim-literal Catalyst
  expression stops being sane near k ≈ 10²).

Replication is structure-preserving (scale_probe's dimension-rotated
copies: cross-copy cosines ~random, within-copy geometry untouched).
Training stays the bounded ordered _KM_SAMPLE collect in both modes —
at k·K > sample the quantizer is deliberately underfit (2 vectors per
centroid at x64), which only UNDERSTATES the scaled mode's advantage:
coarser real centroids would balance clusters better, not worse. The
probe measures runtime growth, not recall.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_to_hyper_app_spark.session import build_session  # noqa: E402
from tools.scale_probe import _replicate  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--scales", nargs="*", type=int, default=[1, 32, 64])
    args = ap.parse_args()

    from parquet_to_hyper_app_spark.operators.llm.features import _KM_K, semdedup_frame

    spark = build_session("semdedup_k_probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    base = os.path.join(tempfile.gettempdir(), "p2h_semdedup_k_probe")
    results: list[tuple[int, str, int, float, int, int]] = []

    for K in args.scales:
        probe_dir = os.path.join(base, f"x{K}")
        _replicate(spark, args.sf, probe_dir, K, tables={"embeddings": ["vec_id"]})
        for mode, k in (("fixed", None), ("scaled", _KM_K * K)):
            df = semdedup_frame(spark, probe_dir, k=k)
            df.count()  # warm: file listing, codegen, UDF fork
            best, n = float("inf"), 0
            for _ in range(3):
                t0 = time.time()
                n = df.count()
                best = min(best, time.time() - t0)
            dropped = df.filter("NOT kept").count()
            results.append((K, mode, k or _KM_K, best, n, dropped))

    print(f"\nsemdedup scale-k probe over {args.sf} (seconds, warm best-of-3)")
    hdr = f"{'scale':>6} {'mode':>8} {'k':>6} {'time':>9} {'rows':>10} {'dropped':>9}"
    print(hdr)
    print("-" * len(hdr))
    for K, mode, k, best, n, dropped in results:
        print(f"{'x' + str(K):>6} {mode:>8} {k:>6} {best:>8.2f}s {n:>10} {dropped:>9}")

    shutil.rmtree(base, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
