"""Deterministic synthetic `images` fixture generator (FIXTURES.md).

Mirrors the roles of the reference's packaged datasets
(/root/reference/data: h3n2sample, evp_peparray, allunique — usage
/root/reference/README.md:35-57) transplanted to the image+caption domain of
BASELINE.json's input_hint:

    images(image_id:string, bytes:binary, w:int, h:int, fmt:string,
           caption:string, phash:long)

All randomness flows from one numpy PCG64 seed. Planted near-dup clusters
provide ground truth; `truth(image_id, true_cluster)` is returned alongside.
"""

from __future__ import annotations

import numpy as np

from .codec import encode_ppm, encode_qrs, phash64

_WORDS = None


def _vocab(rng: np.random.Generator, n: int = 4000) -> list[str]:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    lens = rng.integers(3, 9, n)
    return ["".join(letters[rng.integers(0, 26, L)]) for L in lens]


def _base_image(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w, 3))
    for c in range(3):
        f1, f2 = rng.uniform(0.5, 3, 2)
        p1, p2 = rng.uniform(0, 2 * np.pi, 2)
        amp = rng.uniform(40, 90)
        img[..., c] = (
            128
            + amp * np.sin(2 * np.pi * f1 * xx / w + p1)
            + amp * 0.7 * np.cos(2 * np.pi * f2 * yy / h + p2)
        )
    img += rng.normal(0, 6, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _perturb_image(rng: np.random.Generator, pix: np.ndarray) -> np.ndarray:
    out = pix.astype(np.float64) + rng.normal(0, 1.5, pix.shape)
    out += rng.integers(-3, 4)  # brightness shift
    if rng.random() < 0.5:      # 1px translate
        axis = int(rng.integers(0, 2))
        out = np.roll(out, 1, axis=axis)
    return np.clip(out, 0, 255).astype(np.uint8)


def _perturb_caption(rng: np.random.Generator, words: list[str], vocab: list[str]) -> list[str]:
    w = list(words)
    for _ in range(int(rng.integers(1, 3))):
        op = rng.random()
        if op < 0.35 and len(w) > 3:
            del w[int(rng.integers(0, len(w)))]
        elif op < 0.7:
            w.insert(int(rng.integers(0, len(w) + 1)), vocab[int(rng.integers(0, len(vocab)))])
        elif len(w) >= 2:
            i, j = rng.integers(0, len(w), 2)
            w[i], w[j] = w[j], w[i]
    return w


def make_images(
    n_clusters: int = 40,
    singleton_frac: float = 0.3,
    seed: int = 42,
    img_hw: tuple[int, int] = (32, 32),
    substring_frac: float = 0.25,
    max_members: int = 12,
) -> tuple[list[dict], list[dict]]:
    """-> (rows, truth) as lists of dicts ready for spark.createDataFrame."""
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = _vocab(rng)
    h, w = img_hw
    rows: list[dict] = []
    truth: list[dict] = []
    rid = 0

    def emit(pix, words, cluster):
        nonlocal rid
        image_id = f"img{rid:08d}"
        rid += 1
        fmt = "qrs" if rng.random() < 0.3 else "ppm"
        data = encode_qrs(pix) if fmt == "qrs" else encode_ppm(pix)
        caption = " ".join(words)
        rows.append(
            dict(
                image_id=image_id,
                bytes=bytearray(data),
                w=int(pix.shape[1]),
                h=int(pix.shape[0]),
                fmt=fmt,
                caption=caption,
                phash=phash64(pix),
            )
        )
        truth.append(dict(image_id=image_id, true_cluster=cluster))

    for c in range(n_clusters):
        m = 2 + min(int(rng.zipf(1.6)), max_members - 2)
        base_pix = _base_image(rng, h, w)
        base_words = [vocab[int(i)] for i in rng.integers(0, len(vocab), int(rng.integers(8, 14)))]
        emit(base_pix, base_words, f"c{c}")
        for j in range(m - 1):
            if rng.random() < substring_frac and len(base_words) > 5:
                # exact-substring variant (exercises the suffix-array tier)
                a = int(rng.integers(0, 3))
                wv = base_words[a : a + max(5, len(base_words) - 3)]
            else:
                wv = _perturb_caption(rng, base_words, vocab)
            emit(_perturb_image(rng, base_pix), wv, f"c{c}")

    n_singletons = int(len(rows) * singleton_frac)
    for s in range(n_singletons):
        pix = _base_image(rng, h, w)
        words = [vocab[int(i)] for i in rng.integers(0, len(vocab), int(rng.integers(8, 14)))]
        emit(pix, words, f"s{s}")

    return rows, truth


def make_images_light(
    n_rows: int, seed: int = 42, pixel_pool: int = 64, img_hw: tuple[int, int] = (32, 32),
    singleton_frac: float = 0.3, max_members: int = 12,
) -> list[dict]:
    """Large-scale fixture: same schema/caption structure as ``make_images``
    but pixel buffers come from a small pre-generated pool (encoded once), so
    generation is caption-bound and scales to 10^5-10^6 rows for the
    two-cluster-size scaling benchmark. Caption/phash distributions match the
    primary fixture; `bytes` stays schema-faithful but is not unique per row."""
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = _vocab(rng)
    h, w = img_hw
    pool = []
    for _ in range(pixel_pool):
        pix = _base_image(rng, h, w)
        pool.append((bytearray(encode_ppm(pix)), phash64(pix)))
    rows: list[dict] = []
    rid = 0

    def emit(words):
        nonlocal rid
        data, ph = pool[rid % pixel_pool]
        rows.append(
            dict(
                image_id=f"img{rid:08d}",
                bytes=data,
                w=w,
                h=h,
                fmt="ppm",
                caption=" ".join(words),
                phash=ph,
            )
        )
        rid += 1

    n_cluster_rows = int(n_rows * (1 - singleton_frac))
    while rid < n_cluster_rows:
        m = 2 + min(int(rng.zipf(1.6)), max_members - 2)
        base_words = [vocab[int(i)] for i in rng.integers(0, len(vocab), int(rng.integers(8, 14)))]
        emit(base_words)
        for _ in range(min(m - 1, n_cluster_rows - rid)):
            emit(_perturb_caption(rng, base_words, vocab))
    while rid < n_rows:
        emit([vocab[int(i)] for i in rng.integers(0, len(vocab), int(rng.integers(8, 14)))])
    return rows


def generate_images_distributed(
    spark, n_rows: int, seed: int = 42, block_size: int = 20_000,
    img_hw: tuple[int, int] = (16, 16), pixel_pool: int = 32,
    singleton_frac: float = 0.3, max_members: int = 12,
    per_block_pixels: bool = False,
):
    """Distributed deterministic fixture generation: mapInPandas over seed
    blocks (one PCG64 stream per block, independent of partitioning), so a
    10^6-row corpus generates in parallel — the pattern a real 10^12-scale
    synthetic load would use. Planted clusters never span blocks. Returns a
    DataFrame in the images-table shape.

    ``per_block_pixels=False`` (default): pixels cycle through a small
    driver-side pool — cheap, but every row is an exact pixel dup of
    n_rows/pixel_pool others, so the PIXEL tier on this fixture degenerates
    into a handful of corpus-sized fingerprint groups. ``True`` generates
    pixels inside each block: caption-cluster members share a perturbed copy
    of their cluster's base image (pixel near-dups, as make_images plants)
    and singletons get unique images — pixel-dup group sizes stay bounded by
    max_members, which is what the multitier scaling benchmark needs."""
    import pandas as pd

    n_blocks = (n_rows + block_size - 1) // block_size
    # encoded pixel pool generated once on the driver, captured by closure
    prng = np.random.Generator(np.random.PCG64(seed))
    h, w = img_hw
    pool = []
    for _ in range(pixel_pool):
        pix = _base_image(prng, h, w)
        pool.append((bytes(encode_ppm(pix)), phash64(pix)))
    blocks = spark.range(n_blocks).toDF("block_id")

    def gen(pdf_iter):
        for pdf in pdf_iter:
            for block_id in pdf["block_id"].tolist():
                rng = np.random.Generator(np.random.PCG64(seed * 1_000_003 + block_id))
                vocab = _vocab(rng, 4000)
                start = block_id * block_size
                count = min(block_size, n_rows - start)
                ids, bts, caps, phs = [], [], [], []

                def emit(words, pix=None):
                    rid = start + len(ids)
                    if pix is None:
                        data, ph = pool[rid % pixel_pool]
                    else:
                        data, ph = bytes(encode_ppm(pix)), phash64(pix)
                    ids.append(f"img{rid:09d}")
                    bts.append(data)
                    caps.append(" ".join(words))
                    phs.append(ph)

                def fresh_pix():
                    return _base_image(rng, h, w) if per_block_pixels else None

                n_cluster_rows = int(count * (1 - singleton_frac))
                while len(ids) < n_cluster_rows:
                    m = 2 + min(int(rng.zipf(1.6)), max_members - 2)
                    base = [vocab[int(i)] for i in rng.integers(0, len(vocab), int(rng.integers(8, 14)))]
                    base_pix = fresh_pix()
                    emit(base, base_pix)
                    for _ in range(min(m - 1, n_cluster_rows - len(ids))):
                        emit(_perturb_caption(rng, base, vocab),
                             _perturb_image(rng, base_pix)
                             if per_block_pixels else None)
                while len(ids) < count:
                    emit([vocab[int(i)] for i in rng.integers(0, len(vocab), int(rng.integers(8, 14)))],
                         fresh_pix())
                yield pd.DataFrame(
                    dict(image_id=ids, bytes=bts, w=w, h=h, fmt="ppm",
                         caption=caps, phash=phs)
                )

    return blocks.repartition(min(n_blocks, 256)).mapInPandas(gen, IMAGES_SCHEMA)


def make_edge_case(kind: str, n: int = 30, seed: int = 7, k: int = 4) -> list[dict]:
    """Edge-case fixtures from FIXTURES.md §1.2 (same schema)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = _vocab(rng, 500)
    rows = []
    for i in range(n):
        pix = _base_image(rng, 16, 16)
        if kind == "allunique":
            words = [vocab[int(j)] for j in rng.integers(0, len(vocab), 10)]
            cap = f"u{i:04d} " + " ".join(words)
        elif kind == "allsame":
            cap = "identical caption for every single row here"
        elif kind == "shortcap":
            cap = "ab"[: k - 2] or "a"  # shorter than k -> empty shingle set (quirk Q2)
        else:
            raise ValueError(kind)
        data = encode_ppm(pix)
        rows.append(
            dict(
                image_id=f"img{i:08d}",
                bytes=bytearray(data),
                w=16,
                h=16,
                fmt="ppm",
                caption=cap,
                phash=phash64(pix),
            )
        )
    return rows


IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
)


def images_df(spark, rows):
    return spark.createDataFrame(rows, schema=IMAGES_SCHEMA)


def generate_images_skewed(
    spark, n_rows: int, seed: int = 42, block_size: int = 20_000,
    dup_frac: float = 0.9, img_hw: tuple[int, int] = (16, 16),
    pixel_pool: int = 32,
):
    """Adversarial-skew variant of ``generate_images_distributed`` (VERDICT
    r03 #8): ``dup_frac`` of all rows carry ONE identical caption — every
    MinHash band of that mass collapses into a single corpus-sized band
    group, the worst case the banded-LSH group cap + chain pairing exists
    for. The remainder is the normal planted-cluster mix, so the run still
    exercises the full pipeline. Deterministic per block, like the parent."""
    import pandas as pd

    n_blocks = (n_rows + block_size - 1) // block_size
    prng = np.random.Generator(np.random.PCG64(seed))
    h, w = img_hw
    pool = []
    for _ in range(pixel_pool):
        pix = _base_image(prng, h, w)
        pool.append((bytes(encode_ppm(pix)), phash64(pix)))
    hot_caption = " ".join(_vocab(prng, 64)[:12])  # the one shared caption
    blocks = spark.range(n_blocks).toDF("block_id")

    def gen(pdf_iter):
        for pdf in pdf_iter:
            for block_id in pdf["block_id"].tolist():
                rng = np.random.Generator(
                    np.random.PCG64(seed * 1_000_003 + block_id))
                vocab = _vocab(rng, 4000)
                start = block_id * block_size
                count = min(block_size, n_rows - start)
                ids, bts, caps, phs = [], [], [], []

                def emit(caption):
                    rid = start + len(ids)
                    data, ph = pool[rid % pixel_pool]
                    ids.append(f"img{rid:09d}")
                    bts.append(data)
                    caps.append(caption)
                    phs.append(ph)

                n_hot = int(count * dup_frac)
                for _ in range(n_hot):
                    emit(hot_caption)
                while len(ids) < count:
                    if rng.random() < 0.5 and len(ids) + 2 <= count:
                        base = [vocab[int(i)] for i in
                                rng.integers(0, len(vocab), int(rng.integers(8, 14)))]
                        emit(" ".join(base))
                        emit(" ".join(_perturb_caption(rng, base, vocab)))
                    else:
                        emit(" ".join(vocab[int(i)] for i in
                                      rng.integers(0, len(vocab), int(rng.integers(8, 14)))))
                yield pd.DataFrame(
                    dict(image_id=ids, bytes=bts, w=w, h=h, fmt="ppm",
                         caption=caps, phash=phs)
                )

    return blocks.repartition(min(n_blocks, 256)).mapInPandas(gen, IMAGES_SCHEMA)
