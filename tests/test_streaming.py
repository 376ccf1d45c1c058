"""Structured Streaming incremental-dedup tests: stream-static matches equal
the batch computation, micro-batches accumulate, and a checkpoint restart
neither loses nor duplicates output (SURVEY.md §5.2 resume contract, stream
twin)."""

import os

import pytest

from dynaalign_spark import streaming
from dynaalign_spark.config import PARITY
from dynaalign_spark.fixtures import images_df, make_images
from dynaalign_spark.operators.signatures import add_signatures

THRESHOLD = 0.5


def _drop_batch(spark, rows, incoming: str, tag: str):
    """Write rows as flat parquet part-files inside ``incoming`` (the file
    stream source lists top-level files, not subdirectories)."""
    import glob
    import shutil

    stage = os.path.join(os.path.dirname(incoming), f"_stage_{tag}")
    images_df(spark, rows).coalesce(1).write.mode("overwrite").parquet(stage)
    for i, part in enumerate(sorted(glob.glob(os.path.join(stage, "*.parquet")))):
        shutil.copy(part, os.path.join(incoming, f"{tag}_{i}.parquet"))
    shutil.rmtree(stage)


@pytest.fixture(scope="module")
def corpus(spark):
    rows, _ = make_images(n_clusters=10, seed=100)
    sigs = add_signatures(images_df(spark, rows), PARITY).persist()
    sigs.count()
    return rows, sigs


def _batch_matches(spark, new_rows, corpus_sigs):
    new_sigs = add_signatures(images_df(spark, new_rows), PARITY)
    return {
        (r.new_id, r.known_id)
        for r in streaming.incremental_matches(
            new_sigs, corpus_sigs, PARITY, THRESHOLD
        ).collect()
    }


def test_stream_matches_equal_batch_and_accumulate(spark, corpus, tmp_path):
    rows, sigs = corpus
    incoming = str(tmp_path / "incoming")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(incoming)

    # batch 1: first 20 corpus rows re-ingested (guaranteed near-dups)
    b1 = rows[:20]
    _drop_batch(spark, b1, incoming, "b1")
    q = streaming.start_dedup_stream(
        spark, incoming, sigs, PARITY, THRESHOLD, out, ckpt
    )
    try:
        q.processAllAvailable()
        got1 = {(r.new_id, r.known_id) for r in spark.read.parquet(out).collect()}
        want1 = _batch_matches(spark, b1, sigs)
        assert got1 == want1
        # every re-ingested row matches itself in the corpus
        assert {(r["image_id"], r["image_id"]) for r in b1} <= got1

        # batch 2: more files -> incremental micro-batch, output accumulates
        b2 = rows[20:35]
        _drop_batch(spark, b2, incoming, "b2")
        q.processAllAvailable()
        got2 = {(r.new_id, r.known_id) for r in spark.read.parquet(out).collect()}
        assert got2 == want1 | _batch_matches(spark, b2, sigs)
    finally:
        q.stop()

    # restart from checkpoint: nothing reprocessed, nothing lost
    q2 = streaming.start_dedup_stream(
        spark, incoming, sigs, PARITY, THRESHOLD, out, ckpt
    )
    try:
        q2.processAllAvailable()
        got3 = spark.read.parquet(out)
        assert got3.count() == got3.dropDuplicates(["new_id", "known_id"]).count()
        assert {(r.new_id, r.known_id) for r in got3.collect()} == got2
        # batch 3 arrives after the restart and is picked up
        b3 = rows[35:40]
        _drop_batch(spark, b3, incoming, "b3")
        q2.processAllAvailable()
        got4 = {(r.new_id, r.known_id) for r in spark.read.parquet(out).collect()}
        assert got4 == got2 | _batch_matches(spark, b3, sigs)
    finally:
        q2.stop()


def test_stream_nondup_rows_pass_clean(spark, corpus, tmp_path):
    """Unrelated images produce no matches (admission path)."""
    rows, sigs = corpus
    other, _ = make_images(n_clusters=3, seed=999)
    fresh = [r for r in other if r["caption"] not in {x["caption"] for x in rows}][:10]
    incoming = str(tmp_path / "in2")
    os.makedirs(incoming)
    _drop_batch(spark, fresh, incoming, "f")
    q = streaming.start_dedup_stream(
        spark, incoming, sigs, PARITY, THRESHOLD,
        str(tmp_path / "out2"), str(tmp_path / "ck2"),
    )
    try:
        q.processAllAvailable()
        got = spark.read.parquet(str(tmp_path / "out2"))
        batch = _batch_matches(spark, fresh, sigs)
        assert {(r.new_id, r.known_id) for r in got.collect()} == batch
    finally:
        q.stop()


def test_stateful_stream_dedup_across_microbatches(spark, tmp_path):
    """applyInPandasWithState: a content re-arriving in a LATER micro-batch
    (invisible to the stream-static join) is attributed to its first-seen
    image_id via stream state; restart from checkpoint keeps attribution."""
    incoming = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    os.makedirs(incoming)
    rows, _ = make_images(n_clusters=4, seed=7)
    base = rows[:6]
    # batch 1: six originals; batch 2: copies of the first three (same
    # caption => same fingerprint) under new image_ids
    copies = []
    for i, r in enumerate(base[:3]):
        c = dict(r)
        c["image_id"] = f"copy{i:04d}"
        copies.append(c)

    def start():
        stream = streaming.stream_images(spark, incoming)
        dd = streaming.stateful_stream_dedup(stream)
        return (
            dd.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .outputMode("append").start()
        )

    _drop_batch(spark, base, incoming, "b1")
    q = start()
    try:
        q.processAllAvailable()
        got1 = {r.image_id: r for r in spark.read.parquet(out).collect()}
        assert all(got1[r["image_id"]].dup_of is None for r in base)
    finally:
        q.stop()

    # restart from checkpoint, then the duplicate batch arrives
    _drop_batch(spark, copies, incoming, "b2")
    q2 = start()
    try:
        q2.processAllAvailable()
        got2 = {r.image_id: r for r in spark.read.parquet(out).collect()}
        for i, r in enumerate(base[:3]):
            c = got2[f"copy{i:04d}"]
            assert c.dup_of == r["image_id"]   # state survived the restart
            assert c.n_prior == 1
    finally:
        q2.stop()


def test_windowed_ingest_stats_watermark_drops_late(spark, tmp_path):
    """Watermarked event-time windows: counts per closed window are emitted
    once; a row arriving behind the watermark is discarded."""
    import datetime as dt

    from pyspark.sql import functions as F

    incoming = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    os.makedirs(incoming)

    def ts_rows(rows, t0, offsets):
        out_rows = []
        for r, off in zip(rows, offsets):
            r = dict(r)
            r["ts"] = t0 + dt.timedelta(seconds=off)
            out_rows.append(r)
        return out_rows

    rows, _ = make_images(n_clusters=3, seed=9)
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def drop(batch, tag):
        import glob
        import shutil
        stage = os.path.join(str(tmp_path), f"_st_{tag}")
        df = images_df(spark, [{k: v for k, v in r.items() if k != "ts"} for r in batch])
        ts_map = {r["image_id"]: r["ts"] for r in batch}
        pdf_ids = [r["image_id"] for r in batch]
        tsdf = spark.createDataFrame(
            [(i, ts_map[i]) for i in pdf_ids], "image_id string, ts timestamp"
        )
        df.join(tsdf, "image_id").coalesce(1).write.mode("overwrite").parquet(stage)
        for i, part in enumerate(sorted(glob.glob(os.path.join(stage, "*.parquet")))):
            shutil.copy(part, os.path.join(incoming, f"{tag}_{i}.parquet"))
        shutil.rmtree(stage)

    schema = images_df(spark, rows[:1]).schema.add("ts", "timestamp")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(incoming)
    )
    stats = streaming.windowed_ingest_stats(stream, window="10 seconds",
                                            watermark="5 seconds")
    q = (
        stats.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    )
    try:
        drop(ts_rows(rows[:4], t0, [1, 2, 3, 4]), "b1")       # window [0,10)
        q.processAllAvailable()
        # batch 2 advances the watermark far past the first window...
        drop(ts_rows(rows[4:6], t0, [100, 101]), "b2")
        q.processAllAvailable()
        # ...and batch 3 is a LATE row for the closed window: discarded
        drop(ts_rows(rows[6:7], t0, [5]), "b3")
        q.processAllAvailable()
        drop(ts_rows(rows[7:8], t0, [200]), "b4")             # close [100,110)
        q.processAllAvailable()
        got = spark.read.parquet(out).collect()
        w0 = [r for r in got if r.window_start.second == 0 and r.window_start.minute == 0]
        assert sum(r.n for r in w0) == 4            # late row NOT recounted
        assert all(r.window_start != r.window_end for r in got)
    finally:
        q.stop()
