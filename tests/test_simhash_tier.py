"""SimHash pixel-tier tests (north-rule axis B): Hamming-chunk candidate
completeness (pigeonhole guarantee), PSNR per-row invariant verification, and
planted-cluster recall over decoded pixels."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dynaalign_spark.codec import decode_image, simhash_features
from dynaalign_spark.config import PARITY
from dynaalign_spark.fixtures import images_df, make_images
from dynaalign_spark.hashing import hamming64, simhash_bits
from dynaalign_spark.operators.simhash import (
    add_simhash,
    dedup_pixels,
    psnr_verify_pairs,
    simhash_candidates,
)

CFG = PARITY


@pytest.fixture(scope="module")
def fixture_rows():
    return make_images(n_clusters=12, seed=11)


@pytest.fixture(scope="module")
def images(spark, fixture_rows):
    rows, _ = fixture_rows
    return images_df(spark, rows).cache()


def _oracle_simhash(rows, grid=16, kernel="int"):
    """Per-row fingerprint recomputed directly from the codec (no Spark)."""
    if kernel == "int":
        from dynaalign_spark.codec import luma_grid_sums
        from dynaalign_spark.hashing import simhash_bits_int

        sums = np.stack(
            [luma_grid_sums(decode_image(bytes(r["bytes"]), r["fmt"]), grid=grid)
             for r in rows]
        )
        return simhash_bits_int(sums, seed=CFG.simhash_seed, bits=CFG.simhash_bits)
    feats = np.stack(
        [simhash_features(decode_image(bytes(r["bytes"]), r["fmt"]), grid=grid) for r in rows]
    )
    return simhash_bits(feats, seed=CFG.simhash_seed, bits=CFG.simhash_bits)


def test_add_simhash_matches_oracle(spark, images, fixture_rows):
    rows, _ = fixture_rows
    got = {r["image_id"]: r["simhash"] for r in add_simhash(images, CFG).collect()}
    expect = _oracle_simhash(rows)
    for i, r in enumerate(rows):
        assert got[r["image_id"]] == int(expect[i])


def test_add_simhash_float_kernel_matches_oracle(spark, images, fixture_rows):
    """The round-1 gaussian-projection kernel stays available behind
    cfg.simhash_kernel='float' and still matches its numpy twin."""
    rows, _ = fixture_rows
    cfg = CFG.with_(simhash_kernel="float")
    got = {r["image_id"]: r["simhash"] for r in add_simhash(images, cfg).collect()}
    expect = _oracle_simhash(rows, kernel="float")
    for i, r in enumerate(rows):
        assert got[r["image_id"]] == int(expect[i])


def test_candidates_complete_within_hamming(spark, images, fixture_rows):
    """Every pair within max_hamming MUST be produced (pigeonhole chunks)."""
    rows, _ = fixture_rows
    sh = add_simhash(images, CFG)
    got = {(r["a"], r["b"]) for r in simhash_candidates(sh, CFG).collect()}
    sig = _oracle_simhash(rows)
    ids = [r["image_id"] for r in rows]
    expect = set()
    for i in range(len(ids)):
        dv = hamming64(sig[i + 1 :], np.full(len(ids) - i - 1, sig[i]))
        for off, d in enumerate(dv):
            if d <= CFG.simhash_max_hamming:
                a, b = sorted((ids[i], ids[i + 1 + off]))
                expect.add((a, b))
    assert expect == got


def test_psnr_verify_separates(spark):
    """The strict re-encode tier: an identical image re-encoded with the
    lossy codec passes PSNR>=40; a different base image fails. (Translated
    near-dup variants legitimately fail pixel-wise PSNR — that regime belongs
    to the SimHash tier, not this verifier.)"""
    from dynaalign_spark.codec import encode_ppm, encode_qrs, phash64
    from dynaalign_spark.fixtures import _base_image

    rng = np.random.Generator(np.random.PCG64(5))
    base = _base_image(rng, 32, 32)
    noisy = np.clip(base.astype(int) + rng.integers(-1, 2, base.shape), 0, 255).astype(
        np.uint8
    )
    other = _base_image(rng, 32, 32)
    rows = [
        dict(image_id="p0", bytes=bytearray(encode_ppm(base)), w=32, h=32,
             fmt="ppm", caption="x", phash=phash64(base)),
        dict(image_id="p1", bytes=bytearray(encode_qrs(base)), w=32, h=32,
             fmt="qrs", caption="x", phash=phash64(base)),
        dict(image_id="p2", bytes=bytearray(encode_ppm(noisy)), w=32, h=32,
             fmt="ppm", caption="x", phash=phash64(noisy)),
        dict(image_id="p3", bytes=bytearray(encode_ppm(other)), w=32, h=32,
             fmt="ppm", caption="x", phash=phash64(other)),
    ]
    imgs = images_df(spark, rows)
    pairs = spark.createDataFrame(
        [("p0", "p1"), ("p0", "p2"), ("p0", "p3")], "a string, b string"
    )
    kept = {(r["a"], r["b"]) for r in psnr_verify_pairs(pairs, imgs, CFG).collect()}
    assert ("p0", "p1") in kept   # lossy re-encode of the same pixels
    assert ("p0", "p2") in kept   # ±1 noise ~ 48 dB
    assert ("p0", "p3") not in kept


def test_row_invariant_check(spark, images, fixture_rows):
    """Per-row invariant (input_hint): pipeline output rows vs source rows —
    zero violations for a faithful pass-through; corrupted captions and
    re-encoded-with-loss pixels are caught."""
    from dynaalign_spark.operators.simhash import row_invariant_violations

    ok = row_invariant_violations(images, images, CFG)
    assert ok.count() == 0
    corrupted = images.withColumn(
        "caption",
        F.when(F.col("image_id") == "img00000000", F.lit("tampered")).otherwise(
            F.col("caption")
        ),
    )
    bad = row_invariant_violations(images, corrupted, CFG)
    assert {r["image_id"] for r in bad.collect()} == {"img00000000"}


def test_dedup_pixels_recall_on_planted_clusters(spark, images, fixture_rows):
    """The pixel tier reassembles the planted image clusters (intra-cluster
    pair recall >= 0.95 over multi-member truth clusters)."""
    rows, truth = fixture_rows
    res = dedup_pixels(images, CFG)
    comp = {r["image_id"]: r["component"] for r in res["clusters"].collect()}
    cl = {}
    for t in truth:
        cl.setdefault(t["true_cluster"], []).append(t["image_id"])
    want, got = 0, 0
    for mem in cl.values():
        if len(mem) < 2 or mem[0].startswith("s"):
            continue
        for i in range(len(mem)):
            for j in range(i + 1, len(mem)):
                want += 1
                if comp.get(mem[i]) is not None and comp.get(mem[i]) == comp.get(mem[j]):
                    got += 1
    assert want > 0
    assert got / want >= 0.95, (got, want)

def test_decode_features_matches_codec(spark):
    """mapInPandas decode/resize/feature pass == direct codec computation
    per row (multimodal plumbing: schema, Arrow batch shape, grid resize)."""
    import numpy as np

    from dynaalign_spark.codec import area_resize, decode_image, to_gray
    from dynaalign_spark.fixtures import images_df, make_images
    from dynaalign_spark.operators.simhash import decode_features

    rows, _ = make_images(n_clusters=4, seed=21)
    got = {r.image_id: r for r in decode_features(images_df(spark, rows), grid=8).collect()}
    assert set(got) == {r["image_id"] for r in rows}
    for r in rows[:10]:
        pix = decode_image(bytes(r["bytes"]), r["fmt"])
        luma = to_gray(pix)
        g = got[r["image_id"]]
        assert (g.h, g.w) == pix.shape[:2]
        assert abs(g.mean_luma - float(luma.mean())) < 1e-9
        np.testing.assert_allclose(
            np.array(g.features, dtype=np.float64).reshape(8, 8),
            area_resize(luma, 8, 8), rtol=1e-6,
        )


def test_hamming_candidates_hot_group_capped_not_quadratic(spark):
    """VERDICT r01 'Done' gate: an all-identical-fingerprint corpus (every
    row lands in ONE group per band) must emit O(n * chain_width) chain
    pairs, not the n(n-1)/2 all-pairs quadratic — while still forming a
    single connected component for the CC stage."""
    from dynaalign_spark.hamming import hamming_candidates

    n = 300
    df = spark.createDataFrame(
        [(f"i{i:04d}", 0x0123456789ABCDEF % (1 << 63)) for i in range(n)],
        "image_id string, simhash long",
    )
    cap, cw = 50, 2
    got = hamming_candidates(
        df, bits=64, max_hamming=8, group_cap=cap, chain_width=cw
    ).collect()
    pairs = {(r["a"], r["b"]) for r in got}
    assert all(r["hamming"] == 0 for r in got)
    assert len(pairs) <= n * cw, f"quadratic leak: {len(pairs)} pairs"
    # connectivity: union-find over the chain pairs must give one component
    parent = {f"i{i:04d}": f"i{i:04d}" for i in range(n)}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in pairs:
        parent[find(a)] = find(b)
    assert len({find(f"i{i:04d}") for i in range(n)}) == 1


def test_hamming_candidates_complete_below_cap(spark):
    """Composite chunk-pair keys are a COMPLETE generator for groups under
    the cap: every pair within max_hamming must be emitted (two-clean-chunks
    pigeonhole) — checked against brute force on random 64-bit fingerprints
    plus planted near-dups."""
    import numpy as np

    from dynaalign_spark.hamming import hamming_candidates

    rng = np.random.default_rng(5)
    vals = list(rng.integers(0, 1 << 62, size=40))
    # plant near-dups: flip <= 8 random bits of existing values
    for i in range(20):
        base = int(vals[i])
        for _ in range(int(rng.integers(0, 9))):
            base ^= 1 << int(rng.integers(0, 62))
        vals.append(base)
    rows = [(f"d{i:03d}", int(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "image_id string, simhash long")
    d = 8
    got = {(r["a"], r["b"]) for r in
           hamming_candidates(df, bits=64, max_hamming=d).collect()}
    expect = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            if bin(rows[i][1] ^ rows[j][1]).count("1") <= d:
                expect.add((rows[i][0], rows[j][0]))
    assert got == expect
