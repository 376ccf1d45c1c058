"""MinHash signature stage (the Spark twin of reference src/minHash.cpp:140-158).

One narrow, shuffle-free map stage: a vectorized Arrow pandas UDF shingles
each caption (k-length char windows over UTF-8 bytes, reference
R/minHash.R:12-23 / src/minHash.cpp:92-105), optionally fuses phash-derived
bit-shingles (north-rule axis A), hashes every shingle with the frozen
murmur3 seed table, and folds the per-seed minimum — signature layout is one
``array<long>`` column per row (column-per-hash would fight Catalyst).

Rows with zero tokens (caption shorter than k and no phash) get a NULL
signature and are excluded from pairing, with a counted metric — our pinned
resolution of the reference's short-sequence sentinel divergence
(src/minHash.cpp:100-104 vs R/minHash.R:15-16, SURVEY.md quirk Q2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from ..config import DedupConfig
from ..hashing import minhash_batch


def minhash_signature_udf(cfg: DedupConfig):
    seeds = np.array(cfg.seeds, dtype=np.uint32)
    k = cfg.k
    use_phash = cfg.use_phash_shingles
    gram = cfg.phash_gram

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(caption: pd.Series, phash: pd.Series) -> pd.Series:
        sig, has = minhash_batch(
            caption.tolist(),
            k,
            seeds,
            phash=phash.tolist() if use_phash else None,
            phash_gram=gram,
        )
        sig64 = sig.astype(np.int64)
        return pd.Series(
            [sig64[i].tolist() if has[i] else None for i in range(len(has))]
        )

    return _sig


def add_signatures(images: DataFrame, cfg: DedupConfig, id_col: str = "image_id",
                   text_col: str = "caption", phash_col: str = "phash") -> DataFrame:
    """-> (id, minhash array<long> nullable). Only the needed columns are
    selected first so the parquet scan prunes `bytes` entirely."""
    udf = minhash_signature_udf(cfg)
    cols = [F.col(id_col).alias("image_id"), F.col(text_col).alias("caption")]
    ph = F.col(phash_col) if phash_col in images.columns else F.lit(None).cast("long")
    return (
        images.select(*cols, ph.alias("phash"))
        .withColumn("minhash", udf(F.col("caption"), F.col("phash")))
        .select("image_id", "minhash")
    )


def agreement_sim_col(a: str = "sig_a", b: str = "sig_b", n_hash: int = 50):
    """Signature-agreement similarity as a pure column expression
    (JVM-side zip_with/aggregate — reference src/minHash.cpp:167-174)."""
    matches = F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return matches.cast("double") / F.lit(float(n_hash))
