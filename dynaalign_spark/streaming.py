"""Structured Streaming extension: incremental near-dup detection for
newly-arriving images against a known corpus.

The reference is batch-only (no streams/watermarks anywhere in DynaAlign —
SURVEY.md §2.3), so this is a training-pipeline extension, not a transplant:
a production ingest pipeline dedups each new batch of crawled images against
the already-accepted corpus before admitting it.

Shape (all narrow or stream-static — no stateful shuffle, so no watermark is
needed; there is no event-time semantics in corpus membership):

1. ``stream_images``       — file-source ``readStream`` over the images
   schema (new parquet files = new micro-batches).
2. ``stream_signatures``   — the SAME pandas-UDF MinHash signature map used
   in batch (narrow, streaming-safe).
3. ``incremental_matches`` — LSH band keys of the stream joined
   stream-static against the precomputed band table of the known corpus,
   then exact agreement verification — each new image yields the known
   images it near-duplicates (sim >= threshold).
4. ``start_dedup_stream``  — writeStream to parquet with a checkpoint
   location: exactly-once per-batch output, kill-and-resume safe (the
   streaming twin of StageRunner's batch resume contract).

At 10^12-row corpus scale the static side is the bucketed/Iceberg band
table; Spark plans the stream-static join as a broadcast or shuffled hash
join per micro-batch exactly as in batch mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import DedupConfig
from .fixtures import IMAGES_SCHEMA
from .operators.lsh import band_keys
from .operators.signatures import add_signatures, agreement_sim_col


def stream_images(spark: SparkSession, path: str,
                  max_files_per_trigger: int = 16) -> DataFrame:
    """File-source stream of images-table parquet files dropped into
    ``path``; each micro-batch reads at most ``max_files_per_trigger``."""
    return (
        spark.readStream.schema(IMAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_signatures(stream: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Streaming twin of the batch signature stage — identical UDF, so
    stream and corpus signatures are bit-identical given equal seeds."""
    return add_signatures(stream, cfg)


def incremental_matches(
    stream_sigs: DataFrame, corpus_sigs: DataFrame, cfg: DedupConfig,
    threshold: float,
) -> DataFrame:
    """(new_id, known_id, sim) for every stream image whose signature
    agreement with a known image reaches ``threshold``.

    Stream side: band-key explode (narrow). Static side: the known corpus's
    band table + signatures (precomputed once per corpus snapshot; persist()
    them for many micro-batches). The join is stream-static, which Spark
    executes per micro-batch without state — restarts are safe.
    """
    new_bands = band_keys(stream_sigs, cfg).withColumnsRenamed(
        {"image_id": "new_id"}
    )
    known_bands = band_keys(corpus_sigs, cfg).withColumnsRenamed(
        {"image_id": "known_id"}
    )
    cands = (
        new_bands.join(known_bands, ["band_id", "band_hash"])
        .select("new_id", "known_id")
        .dropDuplicates(["new_id", "known_id"])
    )
    sig_new = stream_sigs.select(
        F.col("image_id").alias("new_id"), F.col("minhash").alias("sig_a")
    )
    sig_known = corpus_sigs.where(F.col("minhash").isNotNull()).select(
        F.col("image_id").alias("known_id"), F.col("minhash").alias("sig_b")
    )
    return (
        cands.join(sig_new, "new_id")
        .join(sig_known, "known_id")
        .select(
            "new_id", "known_id",
            agreement_sim_col("sig_a", "sig_b", cfg.n_hash).alias("sim"),
        )
        .where(F.col("sim") >= F.lit(float(threshold)))
    )


def start_dedup_stream(
    spark: SparkSession, incoming_path: str, corpus_sigs: DataFrame,
    cfg: DedupConfig, threshold: float, out_path: str, checkpoint_path: str,
):
    """Wire the full incremental pipeline and start it: returns the
    StreamingQuery. Append mode; the parquet sink + checkpoint give
    exactly-once batches across restarts."""
    stream = stream_images(spark, incoming_path)
    sigs = stream_signatures(stream, cfg)
    matches = incremental_matches(sigs, corpus_sigs, cfg, threshold)
    return (
        matches.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .start()
    )


def stateful_stream_dedup(stream: DataFrame, id_col: str = "image_id",
                          fp_col: str | None = None) -> DataFrame:
    """WITHIN-stream first-seen dedup — the custom stateful operator the
    stream-static join cannot express: two copies of the same content
    arriving in different micro-batches both miss the static corpus, so
    their duplicate relation lives in STREAM STATE.

    ``applyInPandasWithState`` keyed by an exact content fingerprint
    (xxhash64 of the caption by default, or any precomputed fingerprint
    column, e.g. phash): per key, state holds (first-seen image_id, number
    seen); each arriving row is emitted as (image_id, fp, dup_of, n_prior)
    where dup_of is NULL for the first-ever occurrence. Deterministic
    within a micro-batch (rows processed in sorted image_id order). State
    is checkpointed by the engine — kill-and-resume keeps first-seen
    attribution exactly-once, the stateful twin of StageRunner's contract.

    At 10^12 rows, state is partitioned by the fingerprint key across
    executors (RocksDB state store in production configs); per-key state is
    a constant-size tuple, so total state ~ distinct contents, not rows.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    fp = F.col(fp_col) if fp_col else F.xxhash64("caption")
    src = stream.select(F.col(id_col).alias("image_id"), fp.alias("fp"))

    def dedup_fn(key, pdfs, state):
        import pandas as pd

        fp_val = key[0]
        first_id, cnt = state.get if state.exists else (None, 0)
        out_ids, out_dup, out_prior = [], [], []
        for pdf in pdfs:
            for iid in sorted(pdf["image_id"].tolist()):
                out_ids.append(iid)
                out_dup.append(first_id)
                out_prior.append(cnt)
                if first_id is None:
                    first_id = iid
                cnt += 1
        state.update((first_id, cnt))
        yield pd.DataFrame(
            {"image_id": out_ids,
             "fp": [fp_val] * len(out_ids),
             "dup_of": out_dup,
             "n_prior": out_prior}
        )

    return src.groupBy("fp").applyInPandasWithState(
        dedup_fn,
        "image_id string, fp long, dup_of string, n_prior int",
        "first_id string, cnt int",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def windowed_ingest_stats(stream: DataFrame, ts_col: str = "ts",
                          window: str = "10 seconds",
                          watermark: str = "30 seconds") -> DataFrame:
    """Event-time windowed ingest statistics with late-data handling:
    per (window, fmt) counts + mean caption length. The watermark bounds
    state (windows older than max(event_time) - watermark are finalized
    and dropped) and discards late rows beyond it — the standard
    Structured Streaming pattern the reference (batch-only) has no twin
    for. Append output mode: a window row is emitted exactly once, when
    the watermark passes its end."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col("fmt"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(F.length("caption")), 3).alias("avg_caption_len"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "fmt", "n", "avg_caption_len",
        )
    )
