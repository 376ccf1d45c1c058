"""Vectorized embedding-LSH tier tests (VERDICT r01 #3 + #9):

- the numpy pandas-UDF fingerprint kernel is bit-exact with the interpreted
  `aggregate`-fold expression it replaced (same float64 association order);
- neardup_lsh_pairs implements EXACTLY the documented predicate
  (exists table with bucket-hamming <= 1, cosine >= threshold) — the same
  predicate the DuckDB oracle evaluates from inlined plane literals;
- planted high-cosine near-dups are recalled (>= 0.99 at real dup
  similarity; the multiprobe tables are the recall lever);
- the q_embedding_neardup plan contains no cartesian/nested-loop join.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from dynaalign_spark import annsearch

DIM = 16


def _emb_df(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _fp_py(planes, vecs):
    """Reference fingerprint: sequential-over-dims float64 accumulation."""
    out = []
    for v in vecs:
        acc = np.zeros(planes.shape[1])
        for i in range(planes.shape[0]):
            acc = acc + np.float64(np.float32(v[i])) * planes[i]
        out.append(int(sum((1 << j) for j in range(planes.shape[1]) if acc[j] >= 0)))
    return out


def test_fingerprint_udf_matches_interpreted_expr(spark):
    rng = np.random.Generator(np.random.PCG64(3))
    vecs = rng.standard_normal((50, DIM)).astype(np.float32)
    planes = annsearch.hyperplanes(DIM, 24, seed=9)
    df = _emb_df(spark, vecs)
    got = (
        df.select(
            "vec_id",
            annsearch.embed_fingerprint_col(planes).alias("u"),
            annsearch.simhash_embed_col(planes).alias("e"),
        )
        .collect()
    )
    assert all(r.u == r.e for r in got)
    py = dict(zip(range(len(vecs)), _fp_py(planes, vecs)))
    assert all(r.u == py[r.vec_id] for r in got)


def test_neardup_lsh_matches_brute_force_predicate(spark):
    """Result set == {pairs : exists t bucket-hamming<=1 AND cos_r>=thr},
    computed by brute force over the same planes."""
    rng = np.random.Generator(np.random.PCG64(11))
    vecs = list(rng.standard_normal((40, DIM)).astype(np.float32))
    for i in range(12):  # planted near-dups
        vecs.append((vecs[i] + rng.standard_normal(DIM).astype(np.float32) * 0.05)
                    .astype(np.float32))
    bb, nt, seed, thr = 6, 4, 123, 0.5
    planes = annsearch.hyperplanes(DIM, bb * nt, seed)
    fps = _fp_py(planes, vecs)
    want = set()
    for a in range(len(vecs)):
        for b in range(a + 1, len(vecs)):
            band = any(
                bin(((fps[a] >> (t * bb)) & ((1 << bb) - 1))
                    ^ ((fps[b] >> (t * bb)) & ((1 << bb) - 1))).count("1") <= 1
                for t in range(nt)
            )
            va = np.asarray(vecs[a], dtype=np.float64)
            vb = np.asarray(vecs[b], dtype=np.float64)
            cos = round(float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))), 5)
            if band and cos >= thr:
                want.add((a, b))
    got = {
        (r.a, r.b)
        for r in annsearch.neardup_lsh_pairs(
            _emb_df(spark, vecs), threshold=thr, dim=DIM,
            bucket_bits=bb, n_tables=nt, seed=seed,
        ).collect()
    }
    assert got == want
    planted = {(i, 40 + i) for i in range(12)}
    assert len(planted & got) >= 11  # near-dup recall through the LSH bands


def test_neardup_lsh_recall_on_planted_dups(spark):
    """At genuine near-dup similarity (cos ~ 0.99+) the shipped config's
    multiprobe tables recall >= 0.99 of planted pairs."""
    rng = np.random.Generator(np.random.PCG64(21))
    base = rng.standard_normal((150, 64)).astype(np.float32)
    vecs, planted = [], set()
    for i, v in enumerate(base):
        vecs.append(v)
    for i, v in enumerate(base):
        vecs.append((v + rng.standard_normal(64).astype(np.float32) * 0.02)
                    .astype(np.float32))
        planted.add((i, 150 + i))
    got = {
        (r.a, r.b)
        for r in annsearch.neardup_lsh_pairs(
            _emb_df(spark, vecs), threshold=0.95, dim=64,
        ).collect()
    }
    recall = len(planted & got) / len(planted)
    assert recall >= 0.99, recall


def test_neardup_lsh_plan_has_no_cartesian_join(spark):
    """VERDICT r01 #3 'Done' gate: the scale query's plan must contain no
    CartesianProduct / BroadcastNestedLoopJoin."""
    rng = np.random.Generator(np.random.PCG64(5))
    df = _emb_df(spark, rng.standard_normal((30, 64)).astype(np.float32))
    q = annsearch.neardup_lsh_pairs(df, threshold=0.35, dim=64)
    plan = q._jdf.queryExecution().explainString(
        q._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_neardup_lsh_hot_group_capped(spark):
    """All-identical embeddings: every row shares every bucket; the group cap
    must bound fan-out to O(n * chain_width) while keeping one component."""
    v = [1.0] + [0.0] * (DIM - 1)
    n, cw = 200, 2
    df = _emb_df(spark, [np.array(v, dtype=np.float32)] * n)
    got = {
        (r.a, r.b)
        for r in annsearch.neardup_lsh_pairs(
            df, threshold=0.9, dim=DIM, bucket_bits=6, n_tables=4,
            group_cap=50, chain_width=cw,
        ).collect()
    }
    assert got and len(got) <= n * cw
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in got:
        parent[find(a)] = find(b)
    assert len({find(i) for i in range(n)}) == 1


def test_ivf_topk_recall_vs_exact(spark):
    """IVF (32 cells, 4 probes) on a clustered corpus: top-5 recall vs the
    exact crossJoin oracle >= 0.9, and the result is deterministic."""
    rng = np.random.Generator(np.random.PCG64(8))
    centers = rng.standard_normal((16, 64))
    vecs = []
    for i in range(400):
        c = centers[i % 16]
        vecs.append((c + rng.standard_normal(64) * 0.25).astype(np.float32))
    emb = _emb_df(spark, vecs)
    queries = emb.where("vec_id < 20").selectExpr("vec_id as qid", "embedding")
    exact = {
        (r.qid, r.vec_id)
        for r in annsearch.cosine_topk(emb, queries, k=5).collect()
    }
    got1 = annsearch.ivf_topk(emb, queries, k=5, dim=64,
                              n_centroids=32, n_probe=4).collect()
    approx = {(r.qid, r.vec_id) for r in got1}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall
    got2 = annsearch.ivf_topk(emb, queries, k=5, dim=64,
                              n_centroids=32, n_probe=4).collect()
    assert sorted(map(tuple, got1)) == sorted(map(tuple, got2))


def test_ivf_topk_cell_cap_bounds_adversarial_skew(spark):
    """VERDICT r02 #7: adversarial fixture — ~90% of the corpus collapses
    into ONE coarse cell (tight cluster around a single direction). cell_cap
    must (a) leave the result EXACTLY unchanged (the salt shards partition
    each cell, queries fan out across all shards — same candidate pair set)
    and (b) bound the per-join-task group: no (cell, shard) corpus group
    exceeds ~cell_cap (2x slack for the hash split's unevenness)."""
    rng = np.random.Generator(np.random.PCG64(21))
    hot = rng.standard_normal(64)
    vecs = []
    for i in range(500):
        if i < 450:  # 90% jammed into one direction -> one IVF cell
            vecs.append((hot + rng.standard_normal(64) * 0.05).astype(np.float32))
        else:
            vecs.append(rng.standard_normal(64).astype(np.float32))
    emb = _emb_df(spark, vecs)
    queries = emb.where("vec_id % 50 = 0").selectExpr("vec_id as qid", "embedding")
    cents = annsearch.ivf_centroids(emb, 16, 64)

    # fixture sanity: the hot cell really is hot
    from pyspark.sql import functions as F
    assign = emb.select(
        F.element_at(
            annsearch._ivf_assign_col(cents, "embedding", n_probe=1), 1
        ).alias("cell")
    )
    top = assign.groupBy("cell").count().orderBy(F.desc("count")).first()
    assert top["count"] >= 400, "fixture no longer adversarial"

    cap = 64
    base = annsearch.ivf_topk(emb, queries, k=5, dim=64, centroids=cents,
                              n_probe=4).collect()
    capped = annsearch.ivf_topk(emb, queries, k=5, dim=64, centroids=cents,
                                n_probe=4, cell_cap=cap).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, capped))

    # replay the salting and measure the largest (cell, shard) corpus group
    corpus = emb.select(
        "vec_id",
        F.element_at(
            annsearch._ivf_assign_col(cents, "embedding", n_probe=1), 1
        ).alias("cell"),
    )
    shards = corpus.groupBy("cell").agg(
        F.ceil(F.count("*") / F.lit(cap)).cast("int").alias("_nshard")
    )
    grp = (
        corpus.join(shards, "cell")
        .withColumn("_shard",
                    F.pmod(F.xxhash64("vec_id"), F.col("_nshard")).cast("int"))
        .groupBy("cell", "_shard").count()
    )
    biggest = grp.agg(F.max("count")).first()[0]
    assert biggest <= 2 * cap, biggest


def test_ivf_topk_plan_has_no_cartesian_join(spark):
    rng = np.random.Generator(np.random.PCG64(9))
    emb = _emb_df(spark, rng.standard_normal((60, 64)).astype(np.float32))
    queries = emb.where("vec_id < 5").selectExpr("vec_id as qid", "embedding")
    q = annsearch.ivf_topk(emb, queries, k=3, dim=64, n_centroids=8, n_probe=2)
    plan = q._jdf.queryExecution().explainString(
        q._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
