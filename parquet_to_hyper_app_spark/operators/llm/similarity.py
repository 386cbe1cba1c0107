"""Vector similarity search over the embeddings table.

- similarity_topk: exact brute-force cosine top-k — broadcast the
  (always small) query set against the (arbitrarily large) candidate
  set, per-query window top-k. The shuffle is only on query_id for the
  final top-k; candidates never shuffle. This is the exactness
  baseline.
- similarity_ivf: the scale path — deterministic random-hyperplane LSH
  coarse quantizer; probing only the query's bucket cuts the scanned
  candidates by ~2^bits at a recall cost. Approximate ⇒ rows-only
  check; recall vs brute force is unit-tested.

Cosine is computed with JVM higher-order functions (zip_with +
ordered double fold) — no UDF, bitwise-matching the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from parquet_to_hyper_app_spark.catalog import load_table
from parquet_to_hyper_app_spark.registry import query

_N_QUERIES = 10
_TOP_K = 3


def cosine(ea: Column, eb: Column) -> Column:
    """Ordered-fold cosine similarity between two double arrays."""
    dot = F.aggregate(F.zip_with(ea, eb, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    sq = lambda c: F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x)  # noqa: E731
    return dot / (F.sqrt(sq(ea)) * F.sqrt(sq(eb)))


def brute_force_topk(
    emb: DataFrame, queries: DataFrame, k: int = _TOP_K
) -> DataFrame:
    """Exact top-k neighbors per query vector (self excluded)."""
    cand = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("eb"),
    )
    q = queries.select(
        F.col("vec_id").alias("q_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("ea"),
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", cosine(F.col("ea"), F.col("eb")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "neighbor_id", "cos_sim", F.col("rn").alias("rank"))
    )


@query(
    "similarity_topk",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
               list_sum(list_transform(range(1, len(q.e) + 1), i -> q.e[i] * c.e[i]))
               / (sqrt(list_sum(list_transform(q.e, x -> x * x)))
                  * sqrt(list_sum(list_transform(c.e, x -> x * x)))) AS cos_sim
        FROM v q JOIN v c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {_N_QUERIES}
    )
    SELECT q_id, neighbor_id, cos_sim, rank FROM (
        SELECT q_id, neighbor_id, cos_sim,
               CAST(row_number() OVER (PARTITION BY q_id
                                       ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= {_TOP_K}
    """,
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S32: exact cosine top-3 neighbors for query vectors vec_id<10."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    out = brute_force_topk(emb, queries)
    return out.withColumn("rank", F.col("rank").cast("long"))


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes for the LSH quantizer."""
    rng = np.random.default_rng(seed)
    return [[float(x) for x in rng.standard_normal(dim)] for _ in range(bits)]


def embedding_dim(emb: DataFrame) -> int:
    """Actual embedding dimensionality (one-row lookup). Hardcoding a
    dim that mismatches the data would NULL every hyperplane dot
    product and silently collapse all vectors into one bucket."""
    row = emb.select(F.size("embedding").alias("d")).first()
    if row is None or not row["d"]:
        raise ValueError("embeddings table is empty or has empty vectors")
    return int(row["d"])


#: sf_dir → dim / row count; the lookups are one tiny job each but
#: every LSH/IVF query would otherwise re-run them per invocation
_DIM_CACHE: dict[str, int] = {}
_COUNT_CACHE: dict[str, int] = {}


def embedding_dim_for(spark: SparkSession, sf_dir: str) -> int:
    """Cached embedding dimensionality of a testdata directory."""
    if sf_dir not in _DIM_CACHE:
        _DIM_CACHE[sf_dir] = embedding_dim(load_table(spark, sf_dir, "embeddings"))
    return _DIM_CACHE[sf_dir]


def embedding_count_for(spark: SparkSession, sf_dir: str) -> int:
    """Cached row count of the embeddings table (sizes LSH tables)."""
    if sf_dir not in _COUNT_CACHE:
        _COUNT_CACHE[sf_dir] = load_table(spark, sf_dir, "embeddings").count()
    return _COUNT_CACHE[sf_dir]


def bucket_topk(cand: DataFrame, q: DataFrame, bucket_col: str, k: int = _TOP_K) -> DataFrame:
    """Shared inverted-list search: join candidates to broadcast
    queries on the bucket key, exact cosine, per-query top-k.
    Used by both the LSH (similarity_ivf) and KMeans (features.py)
    quantizers so ranking/tie-break semantics cannot diverge."""
    w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        cand.join(F.broadcast(q), bucket_col)
        .filter(F.col("q_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", cosine(F.col("ea"), F.col("eb")))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cos_sim", "rank")
    )


def with_recall_audit(
    approx: DataFrame, emb: DataFrame, queries: DataFrame, k: int = _TOP_K
) -> DataFrame:
    """Attach per-query ``recall_at_k`` (|approx ∩ exact| / k vs the
    brute-force top-k) to an approximate search result.

    The audit pins the ANN path's quality NUMERICALLY in every run —
    a rows-only driver check still records the recall values in the
    hashed frame, and tests assert the floor. Cost: one extra exact
    pass over the candidates for the (always small) query set — the
    same O(|queries|·n) the exactness baseline costs, so the audit is
    affordable wherever the baseline itself is; on a 100 TB serving
    index, run it on a sampled query panel instead of every request.
    """
    exact = brute_force_topk(emb, queries, k).select("q_id", "neighbor_id")
    hits = approx.join(exact, ["q_id", "neighbor_id"], "left_semi")
    recall = hits.groupBy("q_id").agg(
        (F.count(F.lit(1)) / F.lit(float(k))).alias("recall_at_k")
    )
    return (
        approx.join(recall, "q_id", "left")
        .fillna({"recall_at_k": 0.0})
        .select("q_id", "neighbor_id", "cos_sim", "rank", "recall_at_k")
    )


#: minimum mean recall@k an ANN path must deliver; below it the query
#: returns ZERO rows so even a rows-only driver check turns red
RECALL_FLOOR = 0.1


def enforce_recall_floor(
    audited: DataFrame, queries: DataFrame, floor: float = RECALL_FLOOR
) -> DataFrame:
    """Fail LOUDLY when an approximate search degrades: if the mean
    per-query ``recall_at_k`` falls below ``floor``, emit an EMPTY
    frame instead of plausible-looking garbage. The rows-only driver
    check can't value-check an ANN result, but it does record the row
    count — an empty result is a visible red, a quietly-wrong top-k is
    not.

    The mean is taken over the FULL query panel (``queries``), with
    queries that produced no result rows counted as recall 0 — the
    dominant ANN degradation mode is a bucket/centroid matching no
    candidates at all, and a mean over only the answered queries would
    let a quantizer that answers 1 of 10 queries perfectly sail past
    the floor. Both the recall sum and the panel count are 1-row
    broadcasts onto the (tiny, ≤ queries·k) result."""
    n_q = queries.groupBy().agg(F.count(F.lit(1)).alias("__n_q"))
    tot = (
        audited.select("q_id", "recall_at_k")
        .distinct()
        .groupBy()
        .agg(F.sum("recall_at_k").alias("__sum_recall"))
    )
    mean = (
        tot.crossJoin(F.broadcast(n_q))
        .select(
            (
                F.coalesce(F.col("__sum_recall"), F.lit(0.0)) / F.col("__n_q")
            ).alias("__mean_recall")
        )
    )
    return (
        audited.crossJoin(F.broadcast(mean))
        .filter(F.col("__mean_recall") >= floor)
        .drop("__mean_recall")
    )


def lsh_bucket(e: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id of a double-array column against fixed planes."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(w) for w in p])
        dot = F.aggregate(F.zip_with(e, arr, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
        bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


@query("similarity_ivf")
def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S32b (rows-only): approximate top-k — 4-bit random-hyperplane
    LSH coarse quantizer, search restricted to the query's bucket
    (≈1/16 of candidates scanned). Approximate by construction, so no
    SQL oracle; instead every output row carries its query's
    ``recall_at_k`` vs the exact brute-force top-k (audited in-query,
    floor asserted in tests AND enforced in-query: mean recall below
    RECALL_FLOOR empties the result, so the driver's row count reds),
    and the bucketing is deterministic (seeded planes)."""
    emb = load_table(spark, sf_dir, "embeddings")
    bits = 4
    planes = _hyperplanes(embedding_dim_for(spark, sf_dir), bits=bits)
    v = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    ).withColumn("bucket", lsh_bucket(F.col("e"), planes))
    # multi-probe: each query also probes every Hamming-1 bucket, the
    # standard recall/scan trade (scans (bits+1)/2^bits of candidates)
    probes = F.array(F.col("bucket"), *[
        F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(bits)
    ])
    q = (
        v.filter(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("q_id"), F.col("e").alias("ea"), probes.alias("probes"))
        .select("q_id", "ea", F.explode("probes").alias("bucket"))
    )
    cand = v.select(
        F.col("vec_id").alias("neighbor_id"), F.col("e").alias("eb"), F.col("bucket")
    )
    approx = bucket_topk(cand, q, "bucket")
    panel = emb.filter(F.col("vec_id") < _N_QUERIES)
    audited = with_recall_audit(approx, emb, panel)
    return enforce_recall_floor(audited, panel)
