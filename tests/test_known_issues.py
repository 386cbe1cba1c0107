"""Executable acceptance criteria for the round-8 batch (ADVICE r6).

Round 7 is an edit freeze (docs/ROUND8_PLAN.md): package fixes are
queued, not applied. These tests pin the queued behaviors so the batch
has a mechanical definition of done — the xfail flips to XPASS (and
fails the suite, strict=True) the moment the fix lands, forcing the
r8 author to promote it to a plain assertion in the same commit.
"""

from __future__ import annotations

import os

import numpy as np
import pytest


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_containment_single_token_semantics(spark, tmp_path):
    """ADVICE r6 #3 triage (measured, round 7): the claimed 'two
    unrelated single-token docs score containment 1.0' does NOT
    reproduce — distinct single tokens produce distinct pseudo-bigrams
    ('tok ' + coalesced empty) and never become candidates. Identical
    single-token docs DO pair at 1.0, which is true containment
    (the doc is fully contained in its duplicate). This pins the
    current, correct-in-practice behavior; the r8 `size >= 2` guard, if
    adopted during the tokenize-block extraction, changes the identical
    case from 'pair at 1.0' to 'no bigrams, no pair' and must update
    this test AND both engine sides in the same commit."""
    from parquet_to_hyper_app_spark.operators.llm.corpus import dedup_containment

    filler = "the quick brown fox jumps over the lazy dog again and again"
    _write_docs(
        spark,
        tmp_path,
        [
            (1, "solo", "en", "s", 4),
            (2, "solo", "en", "s", 4),
            (3, "alpha", "en", "s", 5),
            (4, "omega", "en", "s", 5),
            (5, filler, "en", "s", len(filler)),
        ],
    )
    pairs = {
        (r.doc_src, r.doc_dst): r.containment
        for r in dedup_containment(spark, str(tmp_path)).collect()
    }
    # identical single-token docs: containment 1.0 both directions
    assert pairs.get((1, 2)) == 1.0 and pairs.get((2, 1)) == 1.0
    # distinct single-token docs never pair (distinct pseudo-bigrams),
    # in either direction — no exemptions (ADVICE r7)
    assert not any({a, b} & {3, 4} for (a, b) in pairs)


def test_semdedup_threshold_stays_synchronized():
    """ADVICE r6 #1, closed by the r8 batch: the cosine near-dup
    threshold is single-sourced as dedup.COSINE_T — the Spark verify
    (_exact_pairs_block) references the constant, features imports it
    (never redeclares), and every oracle interpolates it. The source
    scan guards against a literal creeping back into the verify."""
    import inspect
    import re

    from parquet_to_hyper_app_spark.operators.llm import dedup, features
    from parquet_to_hyper_app_spark.registry import load_all

    t = dedup.COSINE_T
    assert features._SEMDEDUP_T is t
    src = inspect.getsource(dedup._exact_pairs_block)
    assert "COSINE_T - 1e-6" in src and "cos >= COSINE_T" in src, src
    assert not re.search(r"(sims|cos) >= [0-9]", src), src
    for key in ("dedup_embedding", "dedup_embedding_lsh", "dedup_semantic"):
        oracle = load_all()[key].oracle
        hits = re.findall(r">= ?([0-9.]+)\b", oracle)
        assert str(t) in hits, (key, hits)


def test_dedup_semantic_survives_ragged_embeddings(spark, tmp_path):
    """ADVICE r6 #4, closed by the r8 batch (was a strict xfail): a
    ragged shorter vector is EXCLUDED by the shared quantizer (corpus
    max dimensionality, both engines) instead of crashing np.stack
    inside applyInPandas — and instead of silently NULL-poisoning the
    Spark assignment fold while DuckDB's list ops skip the missing
    tail."""
    from parquet_to_hyper_app_spark.operators.llm.features import dedup_semantic

    rows = [
        (i + 1, [float(x) for x in np.random.default_rng(i).normal(0, 1, 8)], i % 3)
        for i in range(40)
    ]
    rows[5] = (6, rows[5][1][:7], 2)  # 7-dim vector among 8-dim ones
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = dedup_semantic(spark, str(tmp_path))
    ids = {r.vec_id for r in out.collect()}
    # the ragged vector is out of scope; every uniform vector is scored
    assert 6 not in ids and len(ids) == 39


def test_embedding_family_survives_ragged_embeddings(spark, tmp_path):
    """Round-8 family-wide ragged contract (queued in
    docs/ROUND8_PLAN.md 'Not in the batch'): every search/near-dup
    consumer of the embeddings table — not just the KMeans quantizer —
    excludes non-corpus-dimensionality vectors via
    `similarity.uniform_vectors` ↔ `UNIFORM_VEC_CTES` instead of
    crashing np.stack (block/bucket pandas UDFs) or silently
    NULL-poisoning JVM folds. The ragged vector is a truncation of a
    vector that WOULD pair / rank were it uniform."""
    from parquet_to_hyper_app_spark.operators.llm.dedup import (
        dedup_embedding,
        dedup_embedding_lsh,
    )
    from parquet_to_hyper_app_spark.operators.llm.similarity import (
        similarity_ivf,
        similarity_topk,
    )

    rng = np.random.default_rng(8)
    vecs = [[float(x) for x in rng.normal(0, 1, 8)] for _ in range(40)]
    vecs[1] = vecs[0]  # exact duplicate: the miners must emit (1, 2)
    vecs[5] = vecs[0][:7]  # ragged truncation of the duplicated vector
    spark.createDataFrame(
        [(i + 1, v, i % 3) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    for op in (dedup_embedding, dedup_embedding_lsh):
        pairs = op(spark, str(tmp_path)).collect()
        assert (1, 2) in {(r.vec_a, r.vec_b) for r in pairs}, op.__name__
        assert all(6 not in (r.vec_a, r.vec_b) for r in pairs), op.__name__
    for op in (similarity_topk, similarity_ivf):
        out = op(spark, str(tmp_path)).collect()
        assert out, op.__name__
        assert all(6 != r.q_id and 6 != r.neighbor_id for r in out), op.__name__


def test_embedding_family_excludes_non_finite_vectors(spark, tmp_path):
    """Round-9 finite half of the well-formed-vector contract: a
    vector with a ±Inf or NaN component has a real-NaN cosine against
    everything, and real-NaN threshold comparisons diverge across
    engines in OPPOSITE directions (numpy IEEE: NaN >= t false;
    DuckDB total order: TRUE — the Inf fuzz plant made an Inf vector
    near-dup the entire corpus in the oracle and nothing in the
    engine). Exclusion on both engines is the only agreeable
    contract. The non-finite vectors are copies of the duplicated
    vector with one poisoned component, so inclusion WOULD pair them."""
    from parquet_to_hyper_app_spark.operators.llm.dedup import (
        dedup_embedding,
        dedup_embedding_lsh,
    )
    from parquet_to_hyper_app_spark.operators.llm.features import (
        dedup_semantic,
        embedding_quantize,
        similarity_kmeans_ivf,
    )
    from parquet_to_hyper_app_spark.operators.llm.similarity import similarity_topk

    rng = np.random.default_rng(9)
    vecs = [[float(x) for x in rng.normal(0, 1, 8)] for _ in range(40)]
    vecs[1] = vecs[0]  # exact duplicate: miners must still emit (1, 2)
    vecs[5] = [float("inf")] + vecs[0][1:]  # +Inf component
    vecs[6] = [float("nan")] + vecs[0][1:]  # NaN component
    vecs[7] = [float("-inf")] * 8  # all -Inf
    vecs[8] = [None] + vecs[0][1:]  # NULL component, right length
    bad = {6, 7, 8, 9}  # vec_ids of the poisoned rows (1-based)
    spark.createDataFrame(
        [(i + 1, v, i % 3) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    for op in (dedup_embedding, dedup_embedding_lsh):
        pairs = op(spark, str(tmp_path)).collect()
        assert (1, 2) in {(r.vec_a, r.vec_b) for r in pairs}, op.__name__
        assert all(
            r.vec_a not in bad and r.vec_b not in bad for r in pairs
        ), op.__name__
    out = {r.vec_id for r in dedup_semantic(spark, str(tmp_path)).collect()}
    assert out.isdisjoint(bad) and len(out) == 36
    for op in (similarity_topk, similarity_kmeans_ivf):
        res = op(spark, str(tmp_path)).collect()
        assert res, op.__name__
        assert all(
            r.q_id not in bad and r.neighbor_id not in bad for r in res
        ), op.__name__
    # quantize keeps the rows but NULLs every digest of a poisoned one
    q = {r.vec_id: r for r in embedding_quantize(spark, str(tmp_path)).collect()}
    assert len(q) == 40
    for vid in bad:
        r = q[vid]
        assert (r.dims, r.scale, r.q_sum, r.q_min, r.q_max) == (None,) * 5, vid
    assert q[1].q_sum is not None and q[1].dims == 8
