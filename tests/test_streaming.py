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
