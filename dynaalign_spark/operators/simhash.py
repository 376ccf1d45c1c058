"""SimHash pixel tier (north-rule axis B; SURVEY.md §2.4).

The signature-agreement machinery of the reference (src/minHash.cpp:160-178)
transplanted to Hamming agreement over a 64-bit hyperplane-sign fingerprint
of decoded pixels:

1. ``add_simhash``      — vectorized pandas UDF: decode `bytes` per `fmt`
   (codec.decode_image; real-world codecs are stubbed per sandbox note),
   integer luma-grid block sums, sign of seeded integer-lattice hyperplane
   projections packed to int64 (cfg.simhash_kernel="int"; exact in int64, so
   bit-identical across engines and value-checkable by the driver's DuckDB
   twin; "float" keeps the round-1 gaussian kernel). Narrow map stage;
   `bytes` is read ONLY here (column pruning keeps it out of the caption
   tier's scan).
2. ``simhash_candidates`` — Hamming-ball LSH via hamming.hamming_candidates:
   composite chunk-PAIR keys (q = max_hamming + 2 chunks; any pair within
   ``max_hamming`` has >= 2 clean chunks, so it agrees on some chunk-index
   pair — complete, with ~2x the key bits of single-chunk banding) plus the
   LSH tier's group cap + chain pairing for hot keys. Verification is a
   pure-JVM ``bit_count(a ^ b)`` filter.
3. ``psnr_verify_pairs`` — the per-row invariant tier: decode both images of
   each candidate pair and keep pairs with PSNR >= cfg.psnr_threshold_db
   (BASELINE.json input_hint: decoded-pixel allclose / PSNR >= 40 dB).
   Runs only on the (tiny) candidate set — two id-joins fetch bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..codec import decode_image, luma_grid_sums, psnr, simhash_features
from ..config import DedupConfig
from ..hamming import hamming_candidates
from ..hashing import simhash_bits, simhash_bits_int


def simhash_udf(cfg: DedupConfig, grid: int = 16):
    """Fingerprint pandas UDF for cfg.simhash_kernel:

    - "int" (default): integer-exact lattice SimHash — codec.luma_grid_sums
      block sums + hashing.simhash_bits_int. No float enters the bit
      decision, so the fingerprint is bit-identical across engines (the
      value-exact DuckDB twin in __spark_entry__ recomputes it in pure
      integer SQL).
    - "float": gaussian projection over the mean-centered float luma grid
      (the round-1 kernel; kept for A/B and dense float features).
    """
    seed = cfg.simhash_seed
    bits = cfg.simhash_bits
    kernel = cfg.simhash_kernel
    if kernel not in ("int", "float"):
        raise ValueError(f"unknown simhash_kernel {kernel!r}")

    @F.pandas_udf(LongType())
    def _sh(data: pd.Series, fmt: pd.Series) -> pd.Series:
        n = len(data)
        ok = np.ones(n, dtype=bool)
        if kernel == "int":
            feats = np.zeros((n, grid * grid), dtype=np.int64)
        else:
            feats = np.zeros((n, grid * grid))
        for i, (b, f) in enumerate(zip(data, fmt)):
            try:
                pix = decode_image(bytes(b), f)
                if kernel == "int":
                    feats[i] = luma_grid_sums(pix, grid=grid)
                else:
                    feats[i] = simhash_features(pix, grid=grid)
            except Exception:
                ok[i] = False
        fn = simhash_bits_int if kernel == "int" else simhash_bits
        out = fn(feats, seed=seed, bits=bits).astype(np.int64)
        return pd.Series([int(v) if k else None for v, k in zip(out, ok)])

    return _sh


def add_simhash(images: DataFrame, cfg: DedupConfig, grid: int = 16) -> DataFrame:
    """-> (image_id, simhash long). Decode errors -> NULL (counted upstream)."""
    udf = simhash_udf(cfg, grid)
    return images.select(
        "image_id", udf(F.col("bytes"), F.col("fmt")).alias("simhash")
    )


def simhash_candidates(sh: DataFrame, cfg: DedupConfig) -> DataFrame:
    """-> (a, b, hamming) pairs within cfg.simhash_max_hamming — complete by
    the two-clean-chunks pigeonhole over composite chunk-pair keys, with the
    same group-cap + chain-pairing skew protection as the MinHash LSH tier
    (see hamming.hamming_candidates; VERDICT r01 scale fix)."""
    return hamming_candidates(
        sh,
        bits=cfg.simhash_bits,
        max_hamming=cfg.simhash_max_hamming,
        id_col="image_id",
        sim_col="simhash",
        group_cap=cfg.band_group_cap,
        chain_width=cfg.chain_width,
    )


def psnr_verify_pairs(
    pairs: DataFrame, images: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """(a, b, ...) + images -> pairs passing PSNR >= cfg.psnr_threshold_db,
    with the measured value. Mixed sizes compare as non-dup (psnr = -inf)."""
    thr = float(cfg.psnr_threshold_db)
    img_a = images.select(
        F.col("image_id").alias("a"), F.col("bytes").alias("bytes_a"),
        F.col("fmt").alias("fmt_a"),
    )
    img_b = images.select(
        F.col("image_id").alias("b"), F.col("bytes").alias("bytes_b"),
        F.col("fmt").alias("fmt_b"),
    )
    joined = pairs.join(img_a, "a").join(img_b, "b")

    @F.pandas_udf("double")
    def _psnr(ba: pd.Series, fa: pd.Series, bb: pd.Series, fb: pd.Series) -> pd.Series:
        out = []
        for xa, xfa, xb, xfb in zip(ba, fa, bb, fb):
            try:
                pa = decode_image(bytes(xa), xfa)
                pb = decode_image(bytes(xb), xfb)
                out.append(psnr(pa, pb) if pa.shape == pb.shape else float("-inf"))
            except Exception:
                out.append(float("-inf"))
        return pd.Series(out)

    return (
        joined.withColumn(
            "psnr_db", _psnr(F.col("bytes_a"), F.col("fmt_a"), F.col("bytes_b"), F.col("fmt_b"))
        )
        .where(F.col("psnr_db") >= thr)
        .select(*pairs.columns, "psnr_db")
    )


def row_invariant_violations(
    source: DataFrame, surviving: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """The per-row invariant from BASELINE.json input_hint: every surviving
    row must carry its source caption unchanged and pixels whose decode is
    allclose to the source decode (PSNR >= threshold for lossy fmt; exact for
    lossless). Returns the violating rows (empty == invariant holds).

    Joins on image_id; a surviving row missing from source is a violation.
    """
    thr = float(cfg.psnr_threshold_db)
    s = source.select(
        "image_id", F.col("caption").alias("src_caption"),
        F.col("bytes").alias("src_bytes"), F.col("fmt").alias("src_fmt"),
    )
    j = surviving.join(s, "image_id", "left")

    @F.pandas_udf("boolean")
    def _pix_ok(ba: pd.Series, fa: pd.Series, bb: pd.Series, fb: pd.Series) -> pd.Series:
        out = []
        for xa, xfa, xb, xfb in zip(ba, fa, bb, fb):
            if xa is None or xb is None:
                out.append(False)
                continue
            try:
                pa = decode_image(bytes(xa), xfa)
                pb = decode_image(bytes(xb), xfb)
                if pa.shape != pb.shape:
                    out.append(False)
                elif xfa == xfb == "ppm":
                    out.append(bool((pa == pb).all()))
                else:
                    out.append(psnr(pa, pb) >= thr)
            except Exception:
                out.append(False)
        return pd.Series(out)

    return j.where(
        F.col("src_caption").isNull()
        | (F.col("caption") != F.col("src_caption"))
        | ~_pix_ok(F.col("bytes"), F.col("fmt"), F.col("src_bytes"), F.col("src_fmt"))
    ).select("image_id")


def decode_features(images: DataFrame, grid: int = 8) -> DataFrame:
    """Multimodal feature-extraction pass over the binary image column:
    decode -> luma -> area-resize to grid x grid -> per-image stats + feature
    vector. ``mapInPandas`` (Arrow record batches), so the plumbing — schema,
    batch shape, partition parallelism — is exactly what a real
    decode/resize/embed stage uses at scale; only the codec is the sandbox's
    deterministic one (real-world codecs are stubbed per the driver brief,
    codec.decode_image raises NotImplementedError for them).

    Returns (image_id, w, h, mean_luma, std_luma, features array<float>).

    Luma stats use the INTEGER-scaled weights (299, 587, 114)/1000 with exact
    int64 accumulation, then one fixed-order float division chain
    (s1/1000.0/n; sqrt(max(s2/1e6/n - mean^2, 0))): bit-reproducible across
    engines (the driver's DuckDB oracle decodes the same bytes in SQL and
    replays the identical arithmetic — no pairwise-vs-sequential float-sum
    ordering hazard), and within 1e-11 of the float-weight to_gray mean.
    The feature vector keeps the float to_gray/area_resize path the pixel
    SimHash tier uses.
    """
    import pyarrow  # noqa: F401  (Arrow batching is the point of this path)

    def batches(it):
        import math

        for pdf in it:
            feats, means, stds, ws, hs, ids = [], [], [], [], [], []
            for img_id, buf, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    pix = decode_image(bytes(buf), fmt)
                except Exception:
                    continue
                from ..codec import area_resize, to_gray

                luma = to_gray(pix)
                small = area_resize(luma, grid, grid)
                p64 = pix.astype(np.int64)
                ls = 299 * p64[..., 0] + 587 * p64[..., 1] + 114 * p64[..., 2]
                n_px = ls.size
                s1 = int(ls.sum())
                s2 = int((ls * ls).sum())
                mean = s1 / 1000.0 / n_px
                var = s2 / 1000000.0 / n_px - mean * mean
                ids.append(img_id)
                hs.append(pix.shape[0])
                ws.append(pix.shape[1])
                means.append(mean)
                stds.append(math.sqrt(var if var > 0.0 else 0.0))
                feats.append([float(x) for x in small.ravel()])
            yield pd.DataFrame(
                {"image_id": ids, "w": ws, "h": hs, "mean_luma": means,
                 "std_luma": stds, "features": feats}
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        batches,
        "image_id string, w int, h int, mean_luma double, std_luma double, "
        "features array<float>",
    )


def pixel_edges(images: DataFrame, cfg: DedupConfig, verify_psnr: bool = False,
                grid: int = 16) -> DataFrame:
    """Pixel-tier edges only: simhash -> Hamming candidates -> (optional)
    PSNR verify. LAZY — unlike dedup_pixels, nothing is materialized, so
    callers that merge these edges into the flagship clusterbreak
    (jobs/dedup.py --pixel-tier, bench dedup_multitier) don't pay for a
    standalone pixel connected-components pass they never read
    (connected_components checkpoints eagerly at call time)."""
    sh = add_simhash(images, cfg, grid=grid)
    cands = simhash_candidates(sh, cfg)
    return psnr_verify_pairs(cands, images, cfg) if verify_psnr else cands


def dedup_pixels(images: DataFrame, cfg: DedupConfig, verify_psnr: bool = False,
                 grid: int = 16) -> dict:
    """Pixel-tier dedup: simhash -> Hamming candidates -> (optional) PSNR
    verify -> connected components. Returns dict of stage DataFrames.
    EAGER (CC checkpoints at call time) — use pixel_edges() when only the
    edge set is needed."""
    from .components import connected_components

    sh = add_simhash(images, cfg, grid=grid).persist()
    cands = simhash_candidates(sh, cfg)
    edges = psnr_verify_pairs(cands, images, cfg) if verify_psnr else cands
    comp, rounds = connected_components(edges)
    return {
        "simhash": sh,
        "candidates": cands,
        "edges": edges,
        "clusters": comp,
        "cc_rounds": rounds,
    }
