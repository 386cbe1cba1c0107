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
    ap.add_argument("--unclamped", action="store_true",
                    help="r11 regime: past n = _KM_SAMPLE * 32 compare the old "
                         "saturated clamp (k pinned at _KM_SAMPLE, sample-trained) "
                         "against k='auto' (distributed MLlib trainer) — measures "
                         "time AND the max/mean cluster population the n/k rule "
                         "exists to bound")
    ap.add_argument("--hier", action="store_true",
                    help="r12 regime (VERDICT r11 item 7): at k='auto', compare "
                         "flat assignment (n·k matmul — quadratic when k ∝ n) "
                         "against assign='hier' (coarse √k cells, nprobe refine "
                         "— O(n·√k)); reports the drop-set symmetric difference "
                         "between the two (0 wherever routing is exact; a small "
                         "count on rotated-replica geometry is the documented "
                         "IVF recall trade, not an error)")
    args = ap.parse_args()

    import pyspark.sql.functions as F

    from parquet_to_hyper_app_spark.operators.llm.features import (
        _KM_K,
        _KM_SAMPLE,
        semdedup_frame,
    )

    spark = build_session("semdedup_k_probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    base = os.path.join(tempfile.gettempdir(), "p2h_semdedup_k_probe")
    results: list[tuple] = []

    for K in args.scales:
        probe_dir = os.path.join(base, f"x{K}")
        _replicate(spark, args.sf, probe_dir, K, tables={"embeddings": ["vec_id"]})
        if args.hier:
            modes = (("flat", "auto"), ("hier", "auto"))
        elif args.unclamped:
            modes = (("saturated", _KM_SAMPLE), ("auto", "auto"))
        else:
            modes = (("fixed", None), ("scaled", _KM_K * K))
        drop_sets: dict[str, set] = {}
        for mode, k in modes:
            df = semdedup_frame(spark, probe_dir, k=k,
                                assign="hier" if mode == "hier" else "flat")
            df.count()  # warm: file listing, codegen, UDF fork
            best, n = float("inf"), 0
            for _ in range(3):
                t0 = time.time()
                n = df.count()
                best = min(best, time.time() - t0)
            dropped = df.filter("NOT kept").count()
            pops = df.groupBy("cluster_id").count()
            stats = pops.agg(
                F.count("*").alias("k_used"),
                F.max("count").alias("cmax"),
                F.round(F.avg("count"), 1).alias("cavg"),
            ).first()
            results.append((K, mode, k, best, n, dropped,
                            stats["k_used"], stats["cmax"], stats["cavg"]))
            if args.hier:
                drop_sets[mode] = {
                    r.vec_id for r in df.filter("NOT kept").select("vec_id").collect()
                }
        if args.hier and len(drop_sets) == 2:
            sym = drop_sets["flat"] ^ drop_sets["hier"]
            print(f"x{K}: flat-vs-hier drop-set symmetric difference = "
                  f"{len(sym)} of {len(drop_sets['flat'])} flat drops")

    print(f"\nsemdedup scale-k probe over {args.sf} (seconds, warm best-of-3)")
    hdr = (f"{'scale':>6} {'mode':>10} {'k':>6} {'time':>9} {'rows':>9} "
           f"{'dropped':>8} {'k_used':>7} {'max_cl':>7} {'avg_cl':>7}")
    print(hdr)
    print("-" * len(hdr))
    for K, mode, k, best, n, dropped, k_used, cmax, cavg in results:
        kdisp = "auto" if k == "auto" else str(k or _KM_K)
        print(f"{'x' + str(K):>6} {mode:>10} {kdisp:>6} {best:>8.2f}s {n:>9} "
              f"{dropped:>8} {k_used:>7} {cmax:>7} {cavg:>7}")

    shutil.rmtree(base, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
