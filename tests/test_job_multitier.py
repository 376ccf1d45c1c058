"""Multi-signal tier merge (VERDICT r01 #4): pixel-SimHash and caption-
substring edges must actually reach the flagship job's cluster output —
planted pixel-only duplicates (identical image, unrelated captions) and
substring-only duplicates land in one cluster; resume stays byte-identical
with the tier flags on."""

import json
import os

import numpy as np
import pytest

from dynaalign_spark.fixtures import (
    encode_ppm,
    images_df,
    make_images,
    phash64,
)

PIXEL_CAP_A = "quiet harbor lanterns drifting over the winter tide tonight"
PIXEL_CAP_B = "amber canyon foxes gather beneath the sandstone arches today"
SUB_INNER = "the glass observatory above the clouds"
SUB_OUTER = f"panorama from {SUB_INNER} at dawn with migrating cranes"


@pytest.fixture(scope="module")
def multitier_input(spark, tmp_path_factory):
    rows, _ = make_images(n_clusters=6, seed=13)
    rng = np.random.Generator(np.random.PCG64(99))
    pix = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)

    def img_row(image_id, pixels, caption):
        return dict(
            image_id=image_id, bytes=bytearray(encode_ppm(pixels)),
            w=32, h=32, fmt="ppm", caption=caption, phash=phash64(pixels),
        )

    # pixel-only dups: same pixels, unrelated captions
    rows.append(img_row("pxdup000", pix, PIXEL_CAP_A))
    rows.append(img_row("pxdup001", pix, PIXEL_CAP_B))
    # substring-only dups: different pixels, contained caption
    p2 = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    p3 = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    rows.append(img_row("subdup00", p2, SUB_INNER))
    rows.append(img_row("subdup01", p3, SUB_OUTER))
    path = str(tmp_path_factory.mktemp("mt") / "images.parquet")
    images_df(spark, rows).write.parquet(path)
    return path


def _clusters(spark, out):
    return {
        r["image_id"]: r["cluster_id"]
        for r in spark.read.parquet(os.path.join(out, "clusters")).collect()
    }


def test_tiers_merge_into_flagship_clusters(spark, multitier_input, tmp_path):
    import jobs.dedup as job

    out = str(tmp_path / "out")
    argv = ["--input", multitier_input, "--output", out, "--config", "parity",
            "--set", "size_min=1", "--pixel-tier", "--substring-tier"]
    assert job.main(argv) == 0
    cl = _clusters(spark, out)
    assert cl["pxdup000"] == cl["pxdup001"], "pixel edge not merged"
    assert cl["subdup00"] == cl["subdup01"], "substring edge not merged"

    # resume: second run skips every stage and reproduces the assignments
    assert job.main(argv) == 0
    with open(os.path.join(out, "run_summary.json")) as f:
        s2 = json.load(f)
    assert all(st["skipped"] for st in s2["stages"])
    assert {st["stage"] for st in s2["stages"]} >= {"pixel_edges", "substring_edges"}
    assert _clusters(spark, out) == cl


def test_extra_edges_are_what_connects_pixel_dups(spark):
    """Control at the operator level: with captions sharing NO k-gram (fully
    disjoint alphabets — no LSH candidate can form), the caption tier alone
    keeps the pixel dups apart; passing the pixel edge via ``extra_edges``
    joins them. Proves the merge is what connects them."""
    from dynaalign_spark.config import PARITY
    from dynaalign_spark.operators.clusterbreak import clusterbreak_spark

    rng = np.random.Generator(np.random.PCG64(4))
    pix = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    # planted captions over character sets disjoint from the lowercase-letter
    # vocab (digits / symbols) — they can share NO k-gram with anything, so
    # the caption tier provably cannot produce a candidate pair for them.
    # The surrounding corpus keeps the global Louvain mass 2m realistic: in a
    # 2-row corpus the reference's gamma=1.05 self-loop modularity correctly
    # prefers singletons even at sim 1.0 (the documented allsame behavior).
    rows, _ = make_images(n_clusters=5, seed=31)
    rows.append(
        dict(image_id="a0", bytes=bytearray(encode_ppm(pix)), w=32, h=32,
             fmt="ppm", caption="0123 1230 2301 3012 0132", phash=phash64(pix)),
    )
    rows.append(
        dict(image_id="b0", bytes=bytearray(encode_ppm(pix)), w=32, h=32,
             fmt="ppm", caption="!@#$ @#$! #$!@ $!@# !#@$", phash=phash64(pix)),
    )
    images = images_df(spark, rows)
    cfg = PARITY.with_(size_min=1)
    alone = {r["image_id"]: r["cluster_id"]
             for r in clusterbreak_spark(images, cfg)["clusters"].collect()}
    assert alone["a0"] != alone["b0"]
    edge = spark.createDataFrame([("a0", "b0")], "a string, b string")
    merged = {
        r["image_id"]: r["cluster_id"]
        for r in clusterbreak_spark(images, cfg, extra_edges=edge)[
            "clusters"
        ].collect()
    }
    assert merged["a0"] == merged["b0"]
