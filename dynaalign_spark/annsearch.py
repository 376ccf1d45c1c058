"""Similarity search over an embedding column (array<float/double>).

Training-data-pipeline extension (no reference twin; the embedding-cosine
analog of the reference's signature-agreement similarity,
src/minHash.cpp:160-178):

- ``cosine_topk``     — brute-force exact top-k: crossJoin of a (small,
  broadcast) query set against the corpus, cosine via JVM-side
  zip_with/aggregate (whole-stage codegen, no Python), row_number window.
  The baseline and the verifier for the approximate path.
- ``simhash_embed``   — random-hyperplane SimHash of embeddings -> int64
  fingerprint (the same hyperplane-sign machinery as the pixel tier).
- ``ann_lsh_topk``    — bucketed approximate path: candidates must share at
  least one of ``n_tables`` b-bit hyperplane-sign bucket keys with the query
  (classic multi-table LSH); cosine is then computed only on candidates.
  At 100 TB the bucket equi-join replaces the crossJoin — per-table
  shuffle on the bucket key, skew bounded by b.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .hamming import banded_pairs


def _dot(a: str, b: str):
    # cast BEFORE the product: on array<float> inputs `x * y` would round
    # each product to float32 (~1e-7 relative per element, ~2e-6 on the
    # cosine at dim=64 — enough to flip a 5th-decimal rounding boundary vs
    # the double-precision DuckDB twin, found at sf0.1 r4); float->double
    # conversion is exact, so double products make the fold bit-comparable
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(c: str):
    return F.sqrt(
        F.aggregate(
            F.transform(F.col(c), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
    )


def with_cosine(pairs: DataFrame, a: str = "qvec", b: str = "nvec",
                out: str = "cosine", na_col: str | None = "_na",
                nb_col: str | None = "_nb") -> DataFrame:
    """cosine = dot/(|a||b|). Pass ``na_col``/``nb_col`` naming precomputed
    per-row norm columns (attach them with ``_norm`` on the SIDES before the
    pair join: higher-order fns evaluate interpreted, so a norm computed
    inside the joined plan runs once per PAIR — candidate fan-out times more
    work than once per vector; bit-identical either way, it is the same
    expression over the same doubles). The defaults keep the internal
    ``_na``/``_nb`` convention but fall back to computing the norm when the
    column is absent; pass ``na_col=None``/``nb_col=None`` to force
    recomputation even if same-named columns exist (ADVICE r02: external
    callers with accidental ``_na``/``_nb`` columns should not get them
    silently used as norms)."""
    na = F.col(na_col) if na_col and na_col in pairs.columns else _norm(a)
    nb = F.col(nb_col) if nb_col and nb_col in pairs.columns else _norm(b)
    out_df = pairs.withColumn(out, _dot(a, b) / (na * nb))
    drop = [c for c in (na_col, nb_col) if c and c in pairs.columns]
    return out_df.drop(*drop) if drop else out_df


def cosine_topk(
    embeddings: DataFrame, queries: DataFrame, k: int,
    id_col: str = "vec_id", vec_col: str = "embedding",
    qid_col: str = "qid",
) -> DataFrame:
    """Exact top-k neighbors per query: (qid, vec_id, cosine_r), ordered.

    queries: (qid, embedding). The query side is broadcast — the corpus is
    scanned once, no shuffle of the corpus; top-k via per-qid window.
    """
    corpus = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("nvec"),
        _norm(vec_col).alias("_nb"),
    )
    q = queries.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("qvec"),
                       _norm(vec_col).alias("_na"))
    scored = with_cosine(F.broadcast(q).crossJoin(corpus)).where(
        F.col("qid") != F.col("vec_id")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("qid", "vec_id", F.round("cosine", 5).alias("cosine_r"), "rnk")
    )


def hyperplanes(dim: int, bits: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((dim, bits))


def embed_fingerprint_col(planes: np.ndarray, vec_col: str = "embedding"):
    """int64 hyperplane-sign fingerprint as a vectorized Arrow pandas UDF —
    the numpy twin of ``simhash_embed_col`` (VERDICT r01 #9: dim x bits
    interpreted `aggregate` exprs per row -> one numpy kernel per batch).

    Bit-exact with the interpreted expression AND with a left-to-right SQL
    sum: the accumulation loops dims sequentially (i = 0..dim-1) in float64,
    the same association order as Catalyst's ``aggregate`` fold and a
    left-associated `e[1]*p1 + e[2]*p2 + ...` in DuckDB — so the same
    fingerprints can be recomputed by the SQL oracle from inlined plane
    literals (tested in test_annsearch_vec.py).
    """
    from pyspark.sql.functions import pandas_udf

    dim, bits = planes.shape
    if bits > 63:
        raise ValueError("fingerprint must fit a signed int64")
    p64 = planes.astype(np.float64)

    @pandas_udf(LongType())
    def _fp(vecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist(), dtype=np.float64)  # (n, dim), exact widen
        acc = np.zeros((m.shape[0], bits), dtype=np.float64)
        for i in range(dim):  # sequential over dims == fold order
            acc += m[:, i, None] * p64[i]
        weights = (1 << np.arange(bits, dtype=np.uint64))
        out = ((acc >= 0).astype(np.uint64) * weights).sum(axis=1)
        return pd.Series(out.astype(np.int64))

    return _fp(F.col(vec_col))


def simhash_embed_col(planes: np.ndarray, vec_col: str = "embedding"):
    """int64 hyperplane-sign fingerprint as a pure column expression:
    sum(v_i * p_ij) >= 0 per bit, bits packed via bitwise shifts.

    planes: (dim, bits<=64) — embedded as literal arrays (broadcast by
    closure; a (64,64) table is ~32 KB of plan, fine)."""
    dim, bits = planes.shape
    acc = F.lit(0).cast("long")
    for j in range(bits):
        col = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(planes[i, j])) for i in range(dim)]),
                lambda x, p: x * p,
            ),
            F.lit(0.0).cast("double"),
            lambda a, x: a + x,
        )
        acc = acc + F.when(col >= 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(0)
    return acc


def ann_lsh_topk(
    embeddings: DataFrame, queries: DataFrame, k: int,
    dim: int, bucket_bits: int = 12, n_tables: int = 4, seed: int = 777,
    id_col: str = "vec_id", vec_col: str = "embedding", qid_col: str = "qid",
) -> DataFrame:
    """Approximate top-k: multi-table hyperplane-bucket candidate join, then
    exact cosine on candidates only. Returns (qid, vec_id, cosine_r, rnk)."""
    total_bits = bucket_bits * n_tables
    planes = hyperplanes(dim, total_bits, seed)
    mask = (1 << bucket_bits) - 1

    def bucket_cols(df, vc):
        # vectorized numpy kernel; simhash_embed_col is its interpreted twin
        # (parity-tested) kept for plan-free contexts
        df = df.withColumn("_sh", embed_fingerprint_col(planes, vc))
        keys = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    (F.shiftright(F.col("_sh"), t * bucket_bits).bitwiseAND(F.lit(mask))).alias("bk"),
                )
                for t in range(n_tables)
            ]
        )
        return df.select(
            "*", F.explode(keys).alias("_key")
        ).select(*df.columns, F.col("_key.tbl").alias("tbl"), F.col("_key.bk").alias("bk")).drop("_sh")

    corpus = bucket_cols(
        embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("nvec"),
                          _norm(vec_col).alias("_nb")),
        "nvec",
    )
    q = bucket_cols(
        queries.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("qvec"),
                       _norm(vec_col).alias("_na")),
        "qvec",
    )
    cands = (
        q.join(corpus, ["tbl", "bk"])
        .where(F.col("qid") != F.col("vec_id"))
        .dropDuplicates(["qid", "vec_id"])
    )
    scored = with_cosine(cands)
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("qid", "vec_id", F.round("cosine", 5).alias("cosine_r"), "rnk")
    )


def cosine_neardup_pairs(
    embeddings: DataFrame, threshold: float,
    id_col: str = "vec_id", vec_col: str = "embedding",
    bucket_bits: int = 0, n_tables: int = 4, seed: int = 777, dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b, cosine_r), a < b,
    rounded cosine >= threshold.

    bucket_bits=0 (test/oracle mode): exact — crossJoin with a<b canonical
    ordering (the reference's i<j dense loop, src/minHash.cpp:160-168, in
    embedding space). bucket_bits>0 (scale mode): candidates restricted to
    pairs sharing a hyperplane-sign bucket in >= 1 of n_tables tables — the
    shuffle is the bucket equi-join, never a crossJoin.
    """
    lhs = embeddings.select(F.col(id_col).alias("a"), F.col(vec_col).alias("qvec"),
                            _norm(vec_col).alias("_na"))
    rhs = embeddings.select(F.col(id_col).alias("b"), F.col(vec_col).alias("nvec"),
                            _norm(vec_col).alias("_nb"))
    if bucket_bits <= 0:
        cands = lhs.crossJoin(rhs).where(F.col("a") < F.col("b"))
    else:
        planes = hyperplanes(dim, bucket_bits * n_tables, seed)
        mask = (1 << bucket_bits) - 1

        def keyed(df, vc, nm):
            sh = embed_fingerprint_col(planes, vc)
            keys = F.array(*[
                F.struct(
                    F.lit(t).alias("tbl"),
                    (F.shiftright(sh, t * bucket_bits).bitwiseAND(F.lit(mask))).alias("bk"),
                )
                for t in range(n_tables)
            ])
            return df.select("*", F.explode(keys).alias("_k")).select(
                *df.columns, F.col("_k.tbl").alias("tbl"), F.col("_k.bk").alias("bk")
            )

        cands = (
            keyed(lhs, "qvec", "a").join(keyed(rhs, "nvec", "b"), ["tbl", "bk"])
            .where(F.col("a") < F.col("b"))
            .dropDuplicates(["a", "b"])
        )
    return (
        with_cosine(cands)
        .select("a", "b", F.round("cosine", 5).alias("cosine_r"))
        .where(F.col("cosine_r") >= threshold)
    )


def neardup_lsh_pairs(
    embeddings: DataFrame, threshold: float, dim: int,
    bucket_bits: int = 8, n_tables: int = 6, seed: int = 777,
    id_col: str = "vec_id", vec_col: str = "embedding",
    group_cap: int = 2000, chain_width: int = 2,
) -> DataFrame:
    """Scale-path embedding near-dup pairs: (a, b, cosine_r), a < b.

    Semantics (EXACTLY mirrorable in SQL, which is what keeps the DuckDB
    hash-match green — see __spark_entry__._duck_neardup_lsh): a pair
    qualifies iff

        exists table t in 0..n_tables-1:
            popcount(bucket_t(a) XOR bucket_t(b)) <= 1        (multiprobe-1)
        AND round(cosine(a, b), 5) >= threshold

    where bucket_t is ``bucket_bits`` hyperplane signs of the shared seeded
    gaussian planes, computed by the vectorized numpy kernel
    (embed_fingerprint_col — bit-exact with a left-to-right SQL sum).

    Plan shape (no crossJoin, VERDICT r01 #3): each row emits its
    n_tables home keys plus the bucket_bits single-bit probe flips per
    table ((1 + bucket_bits) * n_tables exploded (band, key) rows of just
    (id, fingerprint) — vectors do NOT ship through this shuffle); one
    groupBy on the band key with the shared group-cap + chain pairing
    (hamming.banded_pairs); candidates are then re-verified JVM-side
    against the exact band predicate (probes can collide two rows whose
    buckets differ by 2 bits — those are filtered here, keeping the result
    set equal to the predicate above, independent of probe mechanics);
    finally vectors are hash-joined back by id for the exact cosine.

    Completeness of the probe banding for groups under ``group_cap``: if
    popcount(bucket_t(a) XOR bucket_t(b)) <= 1, then bucket_t(a) equals
    bucket_t(b) (home/home collision) or differs in exactly one bit, in
    which case b's probe at that bit equals a's home key. Hot keys degrade
    to connectivity-preserving chains, same as every other banded tier.

    bucket_bits is the scale knob: buckets must stay ~uniform at
    n / 2**bucket_bits rows; at 10^12 rows raise it (with more tables /
    probes to hold recall) so no bucket exceeds group_cap by orders of
    magnitude.
    """
    total_bits = bucket_bits * n_tables
    planes = hyperplanes(dim, total_bits, seed)
    sh = embeddings.select(
        F.col(id_col).alias("_id"),
        embed_fingerprint_col(planes, vec_col).alias("_sh"),
    )
    keys = []
    for t in range(n_tables):
        bk = f"((_sh >> {t * bucket_bits}) & {(1 << bucket_bits) - 1})"
        keys.append(F.struct(F.lit(t).alias("band_id"), F.expr(bk).alias("band_val")))
        for j in range(bucket_bits):
            keys.append(
                F.struct(
                    F.lit(t).alias("band_id"),
                    F.expr(f"{bk} ^ {1 << j}").alias("band_val"),
                )
            )
    bands = sh.select("_id", "_sh", F.explode(F.array(*keys)).alias("c")).select(
        "_id", "_sh", "c.band_id", "c.band_val"
    )
    band_ok = " or ".join(
        f"bit_count(((sa >> {t * bucket_bits}) & {(1 << bucket_bits) - 1}) ^ "
        f"((sb >> {t * bucket_bits}) & {(1 << bucket_bits) - 1})) <= 1"
        for t in range(n_tables)
    )
    cands = banded_pairs(bands, group_cap, chain_width).where(F.expr(band_ok))
    lhs = embeddings.select(F.col(id_col).alias("a"), F.col(vec_col).alias("qvec"),
                            _norm(vec_col).alias("_na"))
    rhs = embeddings.select(F.col(id_col).alias("b"), F.col(vec_col).alias("nvec"),
                            _norm(vec_col).alias("_nb"))
    return (
        with_cosine(cands.select("a", "b").join(lhs, "a").join(rhs, "b"))
        .select("a", "b", F.round("cosine", 5).alias("cosine_r"))
        .where(F.col("cosine_r") >= threshold)
    )


def ivf_centroids(
    embeddings: DataFrame, n_centroids: int, dim: int,
    seed: int = 777, iters: int = 8, sample_max: int = 20_000,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic IVF coarse quantizer: Lloyd k-means on a bounded,
    deterministic sample (the ``sample_max`` lowest ids — reproducible
    across runs and partitionings, unlike RDD sampling), spherical
    (centroids L2-normalized each round, so assignment by max dot product
    == max cosine). The collect is BOUNDED (sample_max rows) — the same
    driver-side-bounded pattern as the threshold estimator; at 10^12 rows
    the quantizer still trains on sample_max rows.

    Returns (n_centroids, dim) float64, rows L2-normalized.
    """
    sample = (
        embeddings.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy("_id")
        .limit(sample_max)
        .collect()
    )
    x = np.array([r["_v"] for r in sample], dtype=np.float64)
    return ivf_centroids_np(x, n_centroids, seed=seed, iters=iters)


def ivf_centroids_np(x: np.ndarray, n_centroids: int, seed: int = 777,
                     iters: int = 8) -> np.ndarray:
    """Numpy core of ``ivf_centroids``: deterministic seeded spherical
    k-means on an already-collected (n, dim) sample. Split out so the
    driver-contract oracle (__spark_entry__._duck_ivf_topk) can derive the
    same centroid constants from the same sample read outside Spark — the
    inlined-constants pattern hashing.simhash_planes_int established: the
    constants come from the engine's own deterministic kernel (pytest-gated
    in tests/test_annsearch_vec.py), and everything *after* them is replayed
    independently in SQL."""
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
    rng = np.random.Generator(np.random.PCG64(seed))
    # kmeans++-style seeded init on the normalized sample
    k = min(n_centroids, len(x))
    cents = [x[int(rng.integers(0, len(x)))]]
    for _ in range(1, k):
        d2 = np.min(
            [1.0 - x @ c for c in cents], axis=0
        )  # cosine distance to nearest chosen
        d2 = np.maximum(d2, 0)
        probs = d2 / d2.sum() if d2.sum() > 0 else None
        cents.append(x[int(rng.choice(len(x), p=probs))])
    c = np.array(cents)
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(k):
            mem = x[assign == j]
            if len(mem):
                c[j] = mem.mean(axis=0)
        c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-30)
    return c


def _ivf_assign_col(centroids: np.ndarray, vec_col: str, n_probe: int = 1):
    """array<int> of the ``n_probe`` nearest centroid ids (by cosine),
    vectorized pandas UDF; centroids ship in the closure (k*dim*8 bytes)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    c = centroids.astype(np.float64)

    @pandas_udf(ArrayType(IntegerType()))
    def _probe(vecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist(), dtype=np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = m @ c.T
        if n_probe == 1:
            top = np.argmax(sims, axis=1)[:, None]
        else:
            p = min(n_probe, sims.shape[1])
            top = np.argpartition(-sims, p - 1, axis=1)[:, :p]
        return pd.Series([row.astype("int32").tolist() for row in top])

    return _probe(F.col(vec_col))


def ivf_topk(
    embeddings: DataFrame, queries: DataFrame, k: int, dim: int,
    n_centroids: int = 64, n_probe: int = 4, seed: int = 777,
    id_col: str = "vec_id", vec_col: str = "embedding", qid_col: str = "qid",
    centroids: np.ndarray | None = None, cell_cap: int | None = None,
) -> DataFrame:
    """IVF approximate top-k (the data-adaptive alternative to ann_lsh_topk):
    corpus rows live in their single nearest coarse cell; each query probes
    its ``n_probe`` nearest cells; exact cosine runs on candidates only.

    Plan shape: one equi-join on the int cell id (corpus shuffled once by
    cell; query side exploded n_probe ways) — no crossJoin. Returns
    (qid, vec_id, cosine_r, rnk).

    Cell skew (VERDICT r02 #7): a data-hot cell (near-dup-heavy corpora can
    put most vectors in one cell) would otherwise become one straggler join
    task. ``cell_cap`` bounds it explicitly: per-cell counts (n_centroids
    rows, broadcast) split any cell with count > cell_cap into
    ceil(count/cell_cap) salt shards — corpus rows hash into one shard,
    queries probing that cell fan out across all shards — so the candidate
    PAIR SET is exactly unchanged (tested) while no join task sees more than
    ~cell_cap corpus vectors. n_centroids stays the coarse knob (cells ~
    n/n_centroids); cell_cap is the hard ceiling that survives adversarial
    skew. None = unsalted (AQE skew-join remains the runtime backstop).
    """
    if centroids is None:
        centroids = ivf_centroids(embeddings, n_centroids, dim, seed=seed,
                                  id_col=id_col, vec_col=vec_col)
    corpus = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("nvec"),
        _norm(vec_col).alias("_nb"),
        F.element_at(_ivf_assign_col(centroids, vec_col, n_probe=1), 1).alias("cell"),
    )
    q = queries.select(
        F.col(qid_col).alias("qid"), F.col(vec_col).alias("qvec"),
        _norm(vec_col).alias("_na"),
        F.explode(_ivf_assign_col(centroids, vec_col, n_probe=n_probe)).alias("cell"),
    )
    if cell_cap is not None:
        shards = F.broadcast(
            corpus.groupBy("cell").agg(
                F.ceil(F.count("*") / F.lit(cell_cap)).cast("int").alias("_nshard")
            )
        )
        corpus = corpus.join(shards, "cell").withColumn(
            "_shard", F.pmod(F.xxhash64("vec_id"), F.col("_nshard")).cast("int")
        ).drop("_nshard")
        q = q.join(shards, "cell").withColumn(
            "_shard", F.explode(F.sequence(F.lit(0), F.col("_nshard") - 1))
        ).drop("_nshard")
        join_key = ["cell", "_shard"]
    else:
        join_key = ["cell"]
    cands = (
        q.join(corpus, join_key)
        .where(F.col("qid") != F.col("vec_id"))
        .dropDuplicates(["qid", "vec_id"])
    )
    scored = with_cosine(cands)
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("qid", "vec_id", F.round("cosine", 5).alias("cosine_r"), "rnk")
    )


def embedding_stats(embeddings: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding", label_col: str = "label") -> DataFrame:
    """Per-label count + mean L2 norm (rounded for oracle hashing)."""
    return (
        embeddings.select(F.col(label_col).alias("label"), _norm(vec_col).alias("nrm"))
        .groupBy("label")
        .agg(F.count("*").alias("n"), F.round(F.avg("nrm"), 6).alias("mean_norm"))
    )
