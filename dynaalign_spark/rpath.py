"""R-path MinHash twin — the reference's pure-R ``minhash()`` pipeline
(reference ``R/minHash.R:206-221``) as relational Spark operators.

The engine's primary semantics is the C++ content-hash path (quirk Q3:
``src/minHash.cpp:153`` hashes shingle *content*; ``operators/signatures.py``
reproduces it bit-exactly and scales without a global vocabulary). The R path
instead hashes the **vocab row index** — ``compute_signature_matrix``
(``R/minHash.R:131-140``) hashes row ``i`` of the characteristic matrix with
``(a*i + b) mod max_val`` and folds the column minimum over member rows. This
module adds that variant as explicit, fully SQL-expressible operators so a
user of the R pipeline can reproduce each of its four exposed intermediates
(vocabulary, char_matrix, sig_matrix, dist_matrix) distributed:

- ``vocab_indexed``    == ``create_vocab`` (``R/minHash.R:38-41``): global
  distinct + binary sort + 1-based row index. The corpus-wide sorted
  vocabulary is the *point* of the R semantics; the global row_number window
  makes this the parity tier (the scale path is the content-hash one, which
  needs no vocabulary — SURVEY.md §2 #3).
- ``char_matrix_pairs`` == ``create_char_matrix`` (``R/minHash.R:60-66``):
  the (vocab_idx, doc_id) membership pairs — the sparse form of the dense
  binary matrix (never materialized dense, SURVEY.md §2 #4).
- ``hash_params``      == ``create_hash_parameters`` (``R/minHash.R:81-88``):
  the R RNG draw (``sample(1:max_val)`` / ``sample(0:max_val)``) pinned to
  the frozen seed table (quirk Q1 resolution, same policy as the C++ seeds):
  ``a_h = (seed_h mod m) + 1`` in [1, m],
  ``b_h = (seed_h * 2654435761 mod 2^32) mod (m + 1)`` in [0, m].
- ``signatures_r``     == ``compute_signature_matrix`` (``R/minHash.R:126-143``):
  ``sig[h][doc] = min over member rows i of (a_h * i + b_h) mod m``, emitted
  long-form as (doc_id, h, comp) — one row per signature cell, which is what
  a distributed engine (and a SQL oracle) can value-check cell by cell.
- ``distance_r_pairs`` == ``compute_distance_matrix`` (``R/minHash.R:166-182``):
  ``dist = 1 - mean(sig_a == sig_b)`` over ALL doc pairs. Like the
  reference it is dense O(n^2) — a parity/test-scale twin by design (the
  scale tier is LSH candidates + thresholding; SURVEY.md §2 #12).

Divergence note (documented, deliberate): R ``shingle()`` *errors* when
``k > nchar(x)`` (``R/minHash.R:15-16``); these operators skip such docs
(the C++ sentinel semantics, quirk Q2) rather than aborting a distributed
job over one short row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import shingle_explode

# Knuth multiplicative remix used to derive the R-path `b` offsets from the
# frozen seed table (one seed stream -> two independent-enough streams).
KNUTH = 2654435761


def vocab_indexed(docs: DataFrame, k: int, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(shingle, idx): sorted distinct shingles with 1-based row index
    (create_vocab; R sort() under C collation == Spark binary string order).

    Distributed zipWithIndex (VERDICT r02 plan nit #2): range-repartition on
    shingle (partition p's values all sort below partition p+1's), count per
    partition, driver-side cumulative offsets (one tiny collect of n_part
    rows), then idx = offset + within-partition rank. The global index is
    correct for ANY range-boundary placement, so the sampled boundaries
    don't need pinning — no single-task global window anywhere."""
    sh = shingle_explode(docs, k, id_col=id_col, text_col=text_col)
    spark = docs.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    dv = (
        sh.select("shingle").distinct()
        .repartitionByRange(n_part, "shingle")
        .withColumn("pid", F.spark_partition_id())
        # eager lineage cut: counted once here, scanned again by the ranked
        # select below; blocks are freed when the DataFrame is GC'd (no
        # leaked persist — ADVICE r02)
        .localCheckpoint()
    )
    counts = {
        r["pid"]: r["cnt"]
        for r in dv.groupBy("pid").agg(F.count("*").alias("cnt")).collect()
    }
    offs, acc = [], 0
    for pid in sorted(counts):
        offs.append((pid, acc))
        acc += counts[pid]
    if not offs:
        return dv.select("shingle", F.lit(0).cast("long").alias("idx")).limit(0)
    off_df = spark.createDataFrame(offs, "pid int, off long")
    w = Window.partitionBy("pid").orderBy("shingle")
    return (
        dv.join(F.broadcast(off_df), "pid")
        .withColumn("idx", (F.row_number().over(w) + F.col("off")).cast("long"))
        .select("shingle", "idx")
    )


def char_matrix_pairs(docs: DataFrame, k: int, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """(idx, doc_id): the 1-entries of the characteristic matrix
    (create_char_matrix, rows = vocab indices, cols = docs)."""
    sh = shingle_explode(docs, k, id_col=id_col, text_col=text_col)
    memb = sh.dropDuplicates(["doc_id", "shingle"])
    return memb.join(vocab_indexed(docs, k, id_col, text_col), "shingle").select(
        "idx", "doc_id"
    )


def hash_params(n_hash: int, m: int, seeds) -> list[tuple[int, int, int]]:
    """[(h, a, b)]: pinned replacement of create_hash_parameters' R RNG."""
    if m < 1:
        # the reference errors too for max_val < 2 (sample(1:max_val) with an
        # empty/degenerate vocab); raise explicitly instead of ZeroDivision
        raise ValueError(
            f"hash_params needs a non-empty vocabulary (m={m}); the corpus "
            "yielded no shingles of the configured k"
        )
    out = []
    for h in range(n_hash):
        s = int(seeds[h])
        a = (s % m) + 1
        b = ((s * KNUTH) % (1 << 32)) % (m + 1)
        out.append((h, a, b))
    return out


def signatures_r(docs: DataFrame, k: int, n_hash: int, seeds,
                 id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, h, comp) long-form R-path signature matrix.

    Plan: membership pairs (one shingle shuffle) -> broadcast the tiny
    (h, a, b) params table (cross join: n_hash rows) -> hash agg
    min((a*idx + b) % m) per (doc, h). The vocab count is one driver-side
    scalar (the R path cannot avoid it: max_val IS |vocab|)."""
    # eager lineage cut instead of a persist that nothing unpersists (ADVICE
    # r02): the count below materializes it once, the sig agg rescans the
    # checkpointed blocks, and they are freed when the DataFrame is GC'd
    cm = char_matrix_pairs(docs, k, id_col=id_col, text_col=text_col).localCheckpoint()
    m = cm.select("idx").distinct().count()
    spark = docs.sparkSession
    params = spark.createDataFrame(
        hash_params(n_hash, m, seeds), "h int, a long, b long"
    )
    sig = (
        cm.crossJoin(F.broadcast(params))
        .groupBy("doc_id", "h")
        .agg(F.min((F.col("a") * F.col("idx") + F.col("b")) % F.lit(m)).alias("comp"))
    )
    return sig


def distance_r_pairs(docs: DataFrame, k: int, n_hash: int, seeds,
                     id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(a, b, dist) for ALL doc pairs (a < b) with at least one shingle:
    dist = 1 - (#agreeing components)/n_hash (compute_distance_matrix).
    Dense by construction — parity/test-scale twin of the reference matrix.
    """
    sig = signatures_r(docs, k, n_hash, seeds, id_col=id_col, text_col=text_col)
    ids = sig.select(F.col("doc_id")).distinct()
    all_pairs = (
        ids.select(F.col("doc_id").alias("a"))
        .crossJoin(ids.select(F.col("doc_id").alias("b")))
        .where(F.col("a") < F.col("b"))
    )
    # join on BOTH (h, comp): component equality IS the match condition, so
    # making it an equi-key means only agreeing cells collide — the h-only
    # join produced an n^2 * n_hash intermediate before its filter (VERDICT
    # r02 plan nit #1); this form's intermediate is exactly the agreement set
    x = sig.select(F.col("doc_id").alias("a"), "h", F.col("comp").alias("ca"))
    y = sig.select(F.col("doc_id").alias("b"), "h", F.col("comp").alias("ca"))
    matches = (
        x.join(y, ["h", "ca"])
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("cnt"))
    )
    return all_pairs.join(matches, ["a", "b"], "left").select(
        "a", "b",
        (1.0 - F.coalesce(F.col("cnt"), F.lit(0)) / F.lit(float(n_hash))).alias("dist"),
    )
