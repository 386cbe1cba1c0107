"""Measured scaling probe for the scale-sensitive operators.

    python tools/scale_probe.py [--scales 1 2 4] [--sf /root/testdata/sf0.1]

The sf0.1 testdata verifies correctness; this tool measures how runtime
GROWS as the same data is replicated K× — the empirical check behind
docs/SCALE.md's complexity claims. A bucketed/blocked operator should
scale ~linearly in rows; an accidental all-pairs would go quadratic and
is immediately visible in the ratio column.

Replication preserves the workload's *structure* instead of creating a
pathological one:
- documents: every token is prefixed with a per-copy tag, so each copy
  keeps its internal near-dup structure but shares no shingles across
  copies (a K× corpus with the same dup-rate — NOT K² cross-copy dups);
- embeddings: each copy's vectors are dimension-rotated by the copy
  index, so cross-copy cosines are ~random while within-copy geometry
  is untouched;
- events/orders: entity keys shift by copy, preserving per-user
  densities for the as-of join.

Probed keys (the ones whose scale posture is non-trivial):
dedup_exact, dedup_minhash_lsh, dedup_ngram_jaccard,
dedup_embedding_lsh, join_asof, sessionize — plus the relational
headline path (tpch_q1, tpch_q9, join_multiway, events_funnel,
text_ngram_lm): the whole TPC-H star is replicated with every join
key shifted by the same per-copy offset, so each copy is a disjoint
coherent sub-database (joins never cross copies) and nation/region
stay fixed, exactly as bounded dims do at real scale.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from parquet_to_hyper_app_spark.registry import load_all  # noqa: E402
from parquet_to_hyper_app_spark.session import build_session  # noqa: E402

PROBE_KEYS = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_embedding_lsh",
    "join_asof",
    "sessionize",
    "tpch_q1",
    "tpch_q9",
    "tpch_q18",
    "join_multiway",
    "events_funnel",
    "text_ngram_lm",
    # round-6 additions: the new curation surface. dedup_semantic runs
    # with the FIXED test k=16 while production SemDeDup grows k ∝ n —
    # its probe curve therefore measures the fixed-k worst case (cluster
    # population grows K×, the in-cluster sweep quadratically) and is
    # read against that caveat in docs/SCALE.md, not as a defect.
    "dedup_substring",
    "dedup_incremental",
    "dedup_semantic",
    "text_winnowing",
    "text_perplexity_bucket",
    "stream_quality_gate",
    "join_asof_nearest",
    "pipeline_curation_report",
    # round-7 additions: the stateful streaming family's scale posture
    # was only probed via the gate — the interval join (state bounded
    # by watermark x rate) and the session-gap window (state per open
    # session) are the two whose state growth could misbehave
    "stream_stream_join",
    "stream_session_window",
]

#: tables the probed keys read; value = entity-key columns shifted by
#: copy*1M so each replica is a coherent, join-disjoint sub-database
#: (None = replicate unshifted). nation/region are NOT replicated —
#: they are bounded dims (25/5 rows at any real scale factor) and are
#: copied through once.
TABLES: dict[str, list[str] | None] = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "nation": None,
    "region": None,
}


def _replicate(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    k: int,
    tables: dict[str, list[str] | None] | None = None,
) -> None:
    """Write k disjoint copies of each probe table into out_dir.

    ``tables`` restricts the set (same name → shift-columns mapping as
    TABLES) for single-family probes — tools/semdedup_k_probe.py
    replicates only embeddings."""
    os.makedirs(out_dir, exist_ok=True)
    for name, shift_cols in (tables if tables is not None else TABLES).items():
        src = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if shift_cols is None:  # bounded dim: pass through once
            src.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
            continue
        copies = []
        for c in range(k):
            df = src
            shift = F.lit(c) * F.lit(1_000_000)
            for col in shift_cols:
                df = df.withColumn(col, F.col(col) + shift)
            if name == "documents" and c > 0:
                df = df.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", f"c{c}_$1")
                )
            elif name == "embeddings" and c > 0:
                d = len(src.select("embedding").first()[0])
                r = c % d
                df = df.withColumn(
                    "embedding",
                    F.concat(
                        F.slice("embedding", r + 1, d - r), F.slice("embedding", 1, r)
                    ),
                )
            copies.append(df)
        out = copies[0]
        for df in copies[1:]:
            out = out.unionByName(df)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--scales", nargs="*", type=int, default=[1, 2, 4])
    ap.add_argument("--keys", nargs="*", default=PROBE_KEYS)
    args = ap.parse_args()

    spark = build_session("scale_probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    base = os.path.join(tempfile.gettempdir(), "p2h_scale_probe")
    specs = load_all()
    times: dict[str, dict[int, float]] = {k: {} for k in args.keys}
    rows: dict[str, dict[int, int]] = {k: {} for k in args.keys}

    for k in args.scales:
        probe_dir = os.path.join(base, f"x{k}")
        _replicate(spark, args.sf, probe_dir, k)
        for key in args.keys:
            fn = specs[key].fn
            fn(spark, probe_dir).count()  # warm (codegen, file listing)
            # best-of-3: a single timed run let one GC/broadcast-build
            # straggler masquerade as a 6x scale blow-up (tpch_q9 at x4
            # probed 5.0 s once, 1.1-1.6 s on every manual re-run)
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                n = fn(spark, probe_dir).count()
                best = min(best, time.time() - t0)
            times[key][k] = best
            rows[key][k] = n

    s0 = args.scales[0]
    print(f"\nscale probe over {args.sf} (seconds, warm; ratio vs x{s0})")
    hdr = "key".ljust(24) + "".join(f"x{k}".rjust(10) for k in args.scales) + "   growth"
    print(hdr)
    print("-" * len(hdr))
    for key in args.keys:
        t = times[key]
        growth = t[args.scales[-1]] / t[s0] if t[s0] > 0 else float("inf")
        line = key.ljust(24) + "".join(f"{t[k]:9.2f}s" for k in args.scales)
        print(line + f"   {growth:5.1f}x over {args.scales[-1] // s0}x data")
    print("\nresult rows per scale (sanity: structure preserved, not exploded)")
    for key in args.keys:
        print(f"  {key}: " + ", ".join(f"x{k}={rows[key][k]}" for k in args.scales))

    shutil.rmtree(base, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
