"""Relational text operators over a document corpus — pure Catalyst column
expressions (no UDFs), so predicate pushdown / column pruning / whole-stage
codegen all apply.

These re-express the reference's string machinery relationally where SQL can
carry the semantics (SURVEY.md §2.3):

- ``shingle_explode``     == reference ``shingle`` (R/minHash.R:12-23) as
  `explode(transform(sequence(...), i -> substring(...)))`.
- ``vocab``               == ``create_vocab`` (R/minHash.R:38-41): global
  distinct + sort of all shingles.
- ``ngram_jaccard_pairs`` == the exact set-resemblance the reference's MinHash
  *estimates* (src/minHash.cpp:160-178 estimates Jaccard of shingle sets);
  computed by shingle-explode self-join, never a dense matrix.
- ``similarity_stats``    == ``compute_similarity_stats`` (R/similarity.R:11-34).
- ``tabulate_sizes``      == ``tabulate`` cluster-size counting
  (R/clusterbreak.R:224) as groupBy().count().
- quality/token/langid ops are the training-data-pipeline extensions (no
  reference twin): stopword/length heuristics as column expressions.

At 100 TB these stay scan-friendly: the shingle explode is a narrow map; the
only shuffle is the equi-join on shingle (skew-prone on hot shingles — cap
with ``max_doc_freq``, the analog of dropping stop-shingles).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the heuristic language id op.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "it"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "ein"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "que", "por"],
    "zh": ["de", "shi", "le", "zai", "he", "you", "wo", "ta", "men", "zhe"],
}


def shingle_explode(docs: DataFrame, k: int, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, shingle) — one row per overlapping k-gram, order preserved by
    position; rows with len < k produce nothing (C++ sentinel, quirk Q2)."""
    # NB: Spark's sequence(1, 0) is DESCENDING ([1, 0]), so the
    # `greatest(..., 0)` guard alone would emit two truncated shingles for
    # rows with len < k; the explicit filter enforces the empty-set sentinel
    expr = (
        f"transform(sequence(1, length({text_col}) - {k} + 1), "
        f"i -> substring({text_col}, i, {k}))"
    )
    return docs.where(F.length(text_col) >= k).select(
        F.col(id_col).alias("doc_id"), F.explode(F.expr(expr)).alias("shingle")
    )


def shingle_counts(docs: DataFrame, k: int, **kw) -> DataFrame:
    """Per-doc total + distinct shingle counts (reference shingle + the
    set-collapse step of create_char_matrix membership)."""
    sh = shingle_explode(docs, k, **kw)
    return sh.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        F.countDistinct("shingle").alias("n_distinct"),
    )


def vocab(docs: DataFrame, k: int, **kw) -> DataFrame:
    """Global sorted distinct shingles with document frequency
    (create_vocab, R/minHash.R:38-41, plus df counts for skew planning)."""
    sh = shingle_explode(docs, k, **kw).dropDuplicates(["doc_id", "shingle"])
    return sh.groupBy("shingle").agg(F.countDistinct("doc_id").alias("doc_freq"))


def ngram_jaccard_pairs(
    docs: DataFrame, k: int, threshold: float = 0.0,
    max_doc_freq: int | None = None, **kw,
) -> DataFrame:
    """Exact k-gram Jaccard over all co-shingled pairs: (a, b, inter_cnt,
    union_cnt, jaccard), a < b.

    Plan: distinct (doc, shingle) membership -> self-equi-join on shingle
    (the ONLY shuffle; hot shingles optionally dropped via max_doc_freq,
    which bounds per-key fan-out at scale) -> count per pair -> join per-doc
    distinct counts -> jaccard = inter / (na + nb - inter).

    Cap plan shape (r4): the filter is a broadcast LEFT ANTI join against
    the DROP list (shingles with df > max_doc_freq) — small by construction
    (stop-shingles), vs the keep list which is the whole remaining vocab and
    grows without bound with the corpus. The df agg itself is two-phase
    (map-side partial), so one corpus-wide stop-shingle never concentrates
    rows in a single task the way a window-count would.
    """
    memb = shingle_explode(docs, k, **kw).dropDuplicates(["doc_id", "shingle"])
    if max_doc_freq is not None:
        hot = (
            memb.groupBy("shingle")
            .agg(F.countDistinct("doc_id").alias("df"))
            .where(F.col("df") > max_doc_freq)
            .select("shingle")
        )
        memb = memb.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = memb.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = memb.select(F.col("doc_id").alias("a"), "shingle")
    b = memb.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter_cnt"))
    )
    # no broadcast hint on sizes: it is a PER-DOC table, so forcing a
    # broadcast is wrong at 10^12 docs — AQE broadcasts it when it is small
    # and falls back to a shuffled join when it is not
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("nb")), "b")
        .select(
            "a", "b", "inter_cnt",
            (F.col("na") + F.col("nb") - F.col("inter_cnt")).alias("union_cnt"),
            (
                F.col("inter_cnt").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter_cnt")).cast("double")
            ).alias("jaccard"),
        )
    )
    if threshold > 0:
        out = out.where(F.col("jaccard") >= threshold)
    return out


def ngram_jaccard_pairs_lsh(
    docs: DataFrame, k: int, threshold: float,
    n_hash: int = 50, bands: int = 25,
    id_col: str = "doc_id", text_col: str = "text",
    est_floor: float | None = None,
) -> DataFrame:
    """Scale path for the exact-Jaccard tier: MinHash-LSH candidate
    generation + exact set-intersection verification.

    ``ngram_jaccard_pairs`` is exact but generates every co-shingled pair —
    on corpora with a shared vocabulary that is ~all n^2/2 pairs (the dense
    all-pairs wall of the reference, src/minHash.cpp:160-178). Here the pair
    generation is the LSH band self-join (linear-ish), and the *verification*
    is exact: join each side's distinct-shingle array, JVM
    ``array_intersect`` for the true intersection count. Detection prob at
    jaccard=t is 1-(1-t^r)^b (r=n_hash/bands); defaults give ~96% at t=0.5
    and prune ~97-98% of the j<0.2 mass. Pairs below LSH detection are the
    only loss — values of returned pairs are exact.

    ``est_floor``: the candidate generator already computes each pair's
    signature-agreement sim (an unbiased estimate of its jaccard, sd
    sqrt(t(1-t)/n_hash)); candidates with estimate below the floor are
    dropped BEFORE the shingle-array fetch + intersect — the widest shuffle
    of the query. Default: ``threshold - 3.5 sd`` (misses a true
    j=threshold pair with prob ~2e-4, far below the banding loss itself);
    pass 0.0 to disable pruning.
    """
    import math

    from .config import DedupConfig
    from .operators.lsh import candidate_pairs
    from .operators.signatures import add_signatures

    cfg = DedupConfig(
        k=k, n_hash=n_hash, bands=bands, rows_per_band=n_hash // bands,
    )
    if est_floor is None:
        est_floor = max(
            0.0, threshold - 3.5 * math.sqrt(threshold * (1 - threshold) / n_hash)
        )
    as_images = docs.select(
        F.col(id_col).cast("string").alias("image_id"),
        F.col(text_col).alias("caption"),
        F.lit(None).cast("long").alias("phash"),
    )
    sig = add_signatures(as_images, cfg)
    # one cheap count unlocks the broadcast verify join below
    # sig_broadcast_max (the shuffled join re-shuffles the signature table
    # per pair side — the widest exchange of the candidate stage)
    n_rows = docs.count()
    cands = candidate_pairs(
        sig, cfg, sim_floor=est_floor, n_rows_hint=n_rows
    ).select("a", "b")
    # 64-bit hashed shingle sets: array_intersect over longs is far cheaper
    # than over strings; xxhash64 collisions (~n_shingles^2 / 2^64) are
    # negligible, and the value-exact relational form remains the oracle tier
    sets_expr = (
        f"case when length({text_col}) >= {k} then "
        f"array_sort(array_distinct(transform("
        f"sequence(1, length({text_col}) - {k} + 1), "
        f"i -> xxhash64(substring({text_col}, i, {k}))))) "
        f"else array() end"
    )
    sets = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.expr(sets_expr).alias("sh"),
    )
    sa = sets.select(F.col("doc_id").alias("a"), F.col("sh").alias("sha"))
    sb = sets.select(F.col("doc_id").alias("b"), F.col("sh").alias("shb"))
    return (
        cands.join(sa, "a").join(sb, "b")
        # candidate ordering is lexicographic on the string ids; re-canonicalize
        # numerically so (a, b) matches the exact tier's a < b convention
        .select(
            F.least(F.col("a").cast("long"), F.col("b").cast("long")).alias("a"),
            F.greatest(F.col("a").cast("long"), F.col("b").cast("long")).alias("b"),
            F.size(F.array_intersect("sha", "shb")).alias("inter_cnt"),
            (F.size("sha") + F.size("shb")).alias("_sz"),
        )
        .select(
            "a", "b", "inter_cnt",
            (F.col("_sz") - F.col("inter_cnt")).alias("union_cnt"),
            (
                F.col("inter_cnt").cast("double")
                / (F.col("_sz") - F.col("inter_cnt")).cast("double")
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def similarity_stats(pairs: DataFrame, sim_col: str = "jaccard") -> DataFrame:
    """One-row summary over pair sims (compute_similarity_stats,
    R/similarity.R:11-34): mean/median/min/max + pair count."""
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.round(F.avg(sim_col), 9).alias("mean_sim"),
        F.round(F.expr(f"percentile({sim_col}, 0.5)"), 9).alias("median_sim"),
        F.round(F.min(sim_col), 9).alias("min_sim"),
        F.round(F.max(sim_col), 9).alias("max_sim"),
    )


def most_similar_pair(pairs: DataFrame, sim_col: str = "jaccard") -> DataFrame:
    """The argmax pair (R/similarity.R:26-29) — deterministic tie-break."""
    return pairs.orderBy(F.desc(sim_col), "a", "b").select(
        "a", "b", F.round(F.col(sim_col), 9).alias("sim")
    ).limit(1)


def exact_dedup(docs: DataFrame, key_cols: list[str], id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by key: (canonical_id = min id, dup_count),
    only groups with >1 member — the hash-groupBy dedup tier."""
    return (
        docs.groupBy(*key_cols)
        .agg(F.min(id_col).alias("canonical_id"), F.count("*").alias("dup_count"))
        .where(F.col("dup_count") > 1)
        .select("canonical_id", "dup_count")
    )


def tabulate_sizes(assign: DataFrame, cluster_col: str) -> DataFrame:
    """Cluster-size tabulation (R/clusterbreak.R:224)."""
    return assign.groupBy(cluster_col).agg(F.count("*").alias("size"))


def token_count(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token count per doc (training-pipeline token accounting)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).alias("n_tokens"),
        F.length(text_col).alias("n_chars_calc"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features: token count, mean token length, stopword
    ratio (en list), alpha ratio — all JVM column expressions."""
    toks = F.split(F.col(text_col), " ")
    n_tok = F.size(toks)
    stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop, w)))
    alpha = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", ""))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_tok.alias("n_tokens"),
        F.round(F.length(text_col).cast("double") / n_tok, 9).alias("mean_tok_len"),
        F.round(n_stop.cast("double") / n_tok, 9).alias("stopword_ratio"),
        F.round(alpha.cast("double") / F.length(text_col), 9).alias("alpha_ratio"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-vote language id: count hits per language list, argmax with
    deterministic tie-break by language code order."""
    toks = F.split(F.col(text_col), " ")
    scores = []
    for code in sorted(LANG_STOPWORDS):
        arr = F.array(*[F.lit(w) for w in LANG_STOPWORDS[code]])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda w: F.array_contains(arr, w))).alias("hits"),
                F.lit({"en": 4, "de": 3, "es": 2, "fr": 1, "zh": 0}[code]).alias("prio"),
                F.lit(code).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return docs.select(
        F.col(id_col).alias("doc_id"), best.getField("lang").alias("pred_lang")
    )


# Shared rolling-hash constants for the winnowing / relational-SimHash ops.
# B/M are small enough that ascii * B^j stays well inside int64 in BOTH Spark
# and DuckDB (term < 2^38, sum of k terms < 2^43) so the oracle can reproduce
# the hashes exactly with the same integer arithmetic.
POLY_B = 257
POLY_M = 1_073_741_789  # prime < 2^30
# Relational SimHash width: 60 bits — 30 from the k-gram hash h itself plus
# 30 from the remix h2 = (h * POLY_B2) % POLY_M2 (h < 2^30, so the product
# stays < 2^47, exact in int64 in both Spark and DuckDB). 30 bits alone made
# the Hamming chunk keys ~4 bits wide — a quadratic hot-group hazard at
# scale (VERDICT r01); 60 bits gives ~15-bit composite keys.
POLY_B2 = 48_271
POLY_M2 = 1_073_741_651  # prime < 2^30
SIMHASH_REL_BITS = 60


def _simhash_bit_source(b: int, h: str = "h", h2: str = "h2") -> str:
    """SQL expr for bit ``b`` of the 60-bit fingerprint (shared with the
    DuckDB oracle, which uses the same two-hash layout)."""
    return f"(({h} >> {b}) & 1)" if b < 30 else f"(({h2} >> {b - 30}) & 1)"


def _poly_pows(k: int) -> list[int]:
    out, p = [], 1
    for _ in range(k):
        out.append(p)
        p = (p * POLY_B) % POLY_M
    return out


def _kgram_hashes_expr(text_col: str, k: int) -> str:
    """SQL expr: array of polynomial k-gram hashes, one per position
    (the rolling-hash form of the reference's shingle op, R/minHash.R:12-23,
    with content hashing per quirk Q3)."""
    pows = ", ".join(f"{p}L" for p in _poly_pows(k))
    # `case when` guard, not greatest(..., 0): Spark's sequence(1, 0) is
    # descending ([1, 0]) and would emit two bogus windows for short rows
    return (
        f"case when length({text_col}) >= {k} then "
        f"transform(sequence(1, length({text_col}) - {k} + 1), "
        f"i -> aggregate(sequence(0, {k - 1}), 0L, "
        f"(acc, j) -> acc + ascii(substring({text_col}, i + j, 1)) "
        f"* element_at(array({pows}), j + 1)) % {POLY_M}) "
        f"else array() end"
    )


def winnow_fingerprints(docs: DataFrame, k: int = 8, w: int = 4,
                        id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    (doc_id, fp) — distinct per-window minima of the k-gram rolling hashes,
    window size w. Docs shorter than k emit nothing (quirk Q2 sentinel);
    docs with fewer than w k-grams emit the single global minimum.

    Pure column expressions (narrow map + explode; the distinct is per-doc
    inside the array, so NO shuffle until the caller aggregates) — at 100 TB
    this is a scan-speed fingerprinting pass.
    """
    # materialize the hash array once per row — inlining it inside the
    # window lambda would re-evaluate the whole array per window (quadratic;
    # higher-order fns run interpreted, outside whole-stage codegen)
    hs = docs.where(F.length(text_col) >= k).select(
        F.col(id_col).alias("doc_id"),
        F.expr(_kgram_hashes_expr(text_col, k)).alias("hs"),
    )
    fps = (
        f"array_distinct(transform(sequence(1, greatest(size(hs) - {w} + 1, 1)), "
        f"p -> array_min(slice(hs, p, {w}))))"
    )
    return hs.select("doc_id", F.explode(F.expr(fps)).alias("fp"))


def simhash_captions(docs: DataFrame, k: int = 4,
                     id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Relational text SimHash: (doc_id, simhash) — 60-bit majority-vote
    fingerprint over the doc's distinct k-gram rolling hashes (low 30 bits
    from the hash h, high 30 from the POLY_B2/POLY_M2 remix h2).

    bit b of simhash = 1 iff >= half of the doc's distinct k-gram hashes have
    source bit b set (ties -> 1). Fully JVM-side (explode -> per-doc groupBy
    with 60 bit-count sums); the DuckDB oracle reproduces it exactly because
    the k-gram hash is the shared polynomial (POLY_B/POLY_M), not engine
    hash(). Pixel-tier SimHash (operators/simhash.py) is the production
    analog; this relational form covers the text/caption axis of the
    training-pipeline SimHash requirement.
    """
    memb = (
        docs.where(F.length(text_col) >= k)
        .select(F.col(id_col).alias("doc_id"),
                F.explode(F.expr(_kgram_hashes_expr(text_col, k))).alias("h"))
        .dropDuplicates(["doc_id", "h"])
        .withColumn("h2", F.expr(f"(h * {POLY_B2}) % {POLY_M2}"))
    )
    aggs = [F.count("*").alias("n")] + [
        F.sum(F.expr(_simhash_bit_source(b))).alias(f"c{b}")
        for b in range(SIMHASH_REL_BITS)
    ]
    bits = " + ".join(
        f"(case when 2 * c{b} >= n then {1 << b}L else 0L end)"
        for b in range(SIMHASH_REL_BITS)
    )
    return (
        memb.groupBy("doc_id").agg(*aggs)
        .select("doc_id", F.expr(bits).cast("long").alias("simhash"))
    )


def simhash_caption_pairs(docs: DataFrame, k: int = 4, max_hamming: int = 6,
                          group_cap: int = 2000, chain_width: int = 2,
                          **kw) -> DataFrame:
    """(a, b, hamming) caption pairs within Hamming distance ``max_hamming``
    of their 60-bit relational SimHash — the shared skew-protected generator
    (hamming.hamming_candidates: composite chunk-pair keys carrying ~15 bits,
    group cap + chain pairing for hot keys), verified with JVM bit_count.

    One shuffle on the band key; the brute-force oracle joins on
    bit_count(xor) directly.
    """
    from .hamming import hamming_candidates

    sh = simhash_captions(docs, k, **kw)
    return hamming_candidates(
        sh,
        bits=SIMHASH_REL_BITS,
        max_hamming=max_hamming,
        id_col="doc_id",
        sim_col="simhash",
        group_cap=group_cap,
        chain_width=chain_width,
    )


def shared_substring_pairs(docs: DataFrame, min_len: int = 32,
                           prefix_cap: int = 48, id_col: str = "doc_id",
                           text_col: str = "text",
                           group_cap: int = 2000) -> DataFrame:
    """Distributed generalized-suffix-array pass (SURVEY §2.4, VERDICT r01
    #7): -> (a, b, maxlen) doc pairs sharing a substring of length >=
    ``min_len``, with maxlen = min(longest common substring, prefix_cap).
    The exact-substring analog of the reference's similarityNW tier
    (src/pairwiseSeqAlign.cpp:331-365) — finds long shared REGIONS, not just
    the whole-text containment ``suffix_candidates`` covers.

    Construction: every suffix with >= min_len chars left becomes a row
    keyed by its first ``prefix_cap`` chars (skey). The global suffix-array
    order is (bucket, skey) where bucket = skey's first min_len chars: each
    bucket is a disjoint LEXICAL RANGE of the suffix array, so the bucket
    shuffle IS the distributed range partition of the sorted suffix array,
    and the in-group sort completes the order. Two docs share an L-gram
    (min_len <= L <= prefix_cap) iff two of their suffixes land in one
    bucket with LCP >= L, so per-bucket scans are a COMPLETE generator and
    max-LCP per doc pair is exact: for sorted suffixes, LCP(s_i, s_j) =
    min of adjacent LCPs in between (numpy running-min scan per anchor).

    Skew: a bucket bigger than ``group_cap`` (a corpus-hot 32-gram) degrades
    to a doc chain at maxlen = min_len — bounded fan-out, connectivity
    preserved, value floor still correct (every doc pair in a bucket shares
    >= min_len by construction).

    One shuffle on the bucket key + one pair-level groupBy(max); suffixes
    carry (doc_id, skey) only — total bytes ~ prefix_cap * corpus chars.
    """
    suffixes = (
        docs.where(F.length(text_col) >= min_len)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.expr(
                    f"transform(sequence(1, length({text_col}) - {min_len} + 1),"
                    f" i -> substring({text_col}, i, {prefix_cap}))"
                )
            ).alias("skey"),
        )
        # NO dropDuplicates: a repeated window within one doc yields
        # duplicate rows, but intra-doc pairs are filtered in the scan and
        # maxlen is a max — deduping here would cost a full shuffle of the
        # widest intermediate (suffix strings), recomputed on every DAG
        # branch below
        .withColumn("bucket", F.substring("skey", 1, min_len))
    )

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series(dtype=object),
                              "b": pd.Series(dtype=object),
                              "maxlen": pd.Series(dtype="int32")})
        n = len(pdf)
        if n < 2:
            return empty
        pdf = pdf.sort_values(["bucket", "skey"]).reset_index(drop=True)
        # ONE vectorized adjacent-LCP pass over the whole call: numpy 'U'
        # arrays are fixed-width UCS4 (zero-padded), so first-mismatch over
        # uint32 codepoints is the LCP, clipped to the true string lengths
        # (two equal strings of length L < prefix_cap must report L, not the
        # padded width). Bucket boundaries are masked afterwards — iterating
        # pandas groups per 32-gram was the round-2 hotspot.
        arr = np.array(pdf["skey"].tolist(), dtype=f"U{prefix_cap}")
        u = arr.view(np.uint32).reshape(n, -1)
        neq = u[1:] != u[:-1]
        lcp_adj = np.where(neq.any(axis=1), neq.argmax(axis=1), u.shape[1])
        lens = pdf["skey"].str.len().to_numpy()
        lcp_adj = np.minimum(lcp_adj, np.minimum(lens[1:], lens[:-1]))
        bk = pdf["bucket"].to_numpy()
        docs = pdf["doc_id"].to_numpy()
        bounds = np.concatenate(
            [[0], np.nonzero(bk[1:] != bk[:-1])[0] + 1, [n]]
        )
        # accumulate RAW arrays per group and build ONE frame per call —
        # a pandas DataFrame + groupby per tiny group (~400us each over
        # tens of thousands of 2-4 row buckets) was 40 of the op's 50
        # seconds at sf0.1
        los, his, vals = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            m = e - s
            if m < 2:
                continue
            dc = docs[s:e]
            if m > group_cap:
                uniq = sorted(set(dc))
                if len(uniq) > 1:
                    ua = np.asarray(uniq)
                    los.append(ua[:-1])
                    his.append(ua[1:])
                    vals.append(np.full(len(uniq) - 1, min_len, dtype=np.int64))
                continue
            lcps = lcp_adj[s:e - 1]
            ai, vv = [], []
            for i in range(m - 1):
                ai.append(np.full(m - 1 - i, i, dtype=np.int64))
                vv.append(np.minimum.accumulate(lcps[i:]))
            idx_i = np.concatenate(ai)
            v = np.concatenate(vv)
            idx_j = idx_i + np.concatenate(
                [np.arange(1, m - i, dtype=np.int64) for i in range(m - 1)]
            )
            xa, xb = dc[idx_i], dc[idx_j]
            keep = xa != xb
            if not keep.any():
                continue
            los.append(np.where(xa[keep] < xb[keep], xa[keep], xb[keep]))
            his.append(np.where(xa[keep] < xb[keep], xb[keep], xa[keep]))
            vals.append(v[keep])
        if not los:
            return empty
        return (
            pd.DataFrame(
                {
                    "a": np.concatenate(los),
                    "b": np.concatenate(his),
                    "maxlen": np.concatenate(vals),
                }
            )
            .groupby(["a", "b"], as_index=False)["maxlen"].max()
            .astype({"maxlen": "int32"})
        )

    # JVM-side prefilter: only buckets holding >= 2 suffixes can pair, and
    # singleton buckets are the overwhelming majority of a text corpus
    # (~95% at sf0.1) — dropping them before the Python stage removes ~95%
    # of the Arrow transfer. One extra shuffle on the bucket key, repaid
    # many times over.
    multi = (
        suffixes.groupBy("bucket").count().where(F.col("count") >= 2)
        .select("bucket")
    )
    suffixes = suffixes.join(multi, "bucket", "left_semi")
    # salt-bucketed invocation (one Python call per hash bucket of suffix
    # buckets, not per 32-gram): same trick as the refine/consensus stages
    id_type = docs.schema[id_col].dataType.simpleString()
    n_buckets = 256
    pairs = (
        suffixes.withColumn("pg", F.pmod(F.xxhash64("bucket"), F.lit(n_buckets)))
        .groupBy("pg")
        .applyInPandas(scan, f"a {id_type}, b {id_type}, maxlen int")
    )
    return (
        pairs.groupBy("a", "b").agg(F.max("maxlen").alias("maxlen"))
        .where(F.col("maxlen") >= min_len)
    )


def suffix_candidates(docs: DataFrame, prefix_len: int, min_suffix: int = 8,
                      id_col: str = "doc_id", text_col: str = "text",
                      short_broadcast_max: int = 2_000_000) -> DataFrame:
    """Distributed suffix-array pass for exact substring duplicates.

    Explode every suffix (capped to its first ``prefix_len`` chars, carried
    as an 8-byte xxhash64 of that window), hash-partition by key, then pair
    docs sharing a key — a doc whose *entire text* equals a key prefix of
    another doc's suffix is a substring duplicate. This relational form
    finds (contained, container) pairs where contained's full text occurs
    in container.

    At scale: suffixes ~= total chars rows, so this relation IS the tier's
    shuffle bill — it crosses the wire once, as (hash, id) rows (~16 B),
    never as text (the reference analog is the exact tier of similarityNW,
    src/pairwiseSeqAlign.cpp:331-365 — SURVEY.md §2.4).

    Equivalence to the direct ``contains`` join (the DuckDB oracle,
    VERDICT r03 #9) is EXACT, not approximate, under the shared
    ``length >= min_suffix`` filter — the shape of the argument:

    - complete, long tier (``len(contained) >= prefix_len``): an occurrence
      at position p leaves >= len(contained) >= prefix_len chars after p,
      so the suffix at p is generated and its full prefix_len-char skey
      equals ``substring(contained, 1, prefix_len)``.
    - complete, short tier (``min_suffix <= len(contained) < prefix_len``):
      contained's whole text is SHORTER than the suffix key, so the equi-key
      is the first ``min_suffix`` chars instead, and the candidate is
      confirmed by ``startswith(skey, text)`` — which for texts shorter
      than the key is already full evidence of containment. (Found-by-test
      r4: the single-key form silently missed every contained doc shorter
      than prefix_len unless the occurrence sat in the container's last
      prefix_len chars.)
    - sound: long-tier candidates are shared-prefix hypotheses; the final
      JVM ``contains(t_out, t_in)`` verify removes pairs that diverge past
      ``prefix_len``. Multi-occurrence and mutual containment (equal
      texts -> both directions) collapse identically on both sides via the
      distinct candidate set / the oracle's pair-level semantics.

    Short-tier cost model (found-by-bench r4): the tier's first form joined
    the FULL deduped suffixes relation (corpus-total-chars rows, built with
    its own dedup shuffle) against the short side — so a corpus with ZERO
    short docs still paid a second suffix materialization plus a
    corpus-sized shuffle on the 16-char key (dedup_multitier 12.6 s -> 44.9 s
    at sf0.1 for 5 short captions). The tier is now sized by the short side:
    a cheap count gates it (0 short docs -> the r3 plan, no extra work at
    all); a small short side (< ``short_broadcast_max``) is BROADCAST
    against the raw, non-deduped suffix windows — a narrow, shuffle-free
    branch whose duplicate candidates collapse in the existing pair dedup;
    only a genuinely short-heavy corpus falls back to the shuffle form.

    Skew note for the short tier: its join key is only ``min_suffix`` chars,
    so a hot short prefix (think "https://") fans out; the tier only ever
    carries docs SHORTER than prefix_len (rare in caption corpora) and the
    startswith filter runs inside the same stage, before the dedup shuffle.

    tests/test_textops_ext.py::test_suffix_candidates_equals_contains_oracle
    pins each branch (multi-occurrence, >prefix_len divergence, short docs,
    short-contained mid-container occurrence, equal texts) against a
    brute-force containment oracle.
    """
    expr = (
        f"transform(sequence(1, length({text_col}) - {min_suffix} + 1),"
        f" i -> substring({text_col}, i, {prefix_len}))"
    )
    # Long tier shuffles 8-byte xxhash64 keys, never the 24-char windows
    # (r5, found by the 6.4M shuffle-residency incident — this tier's
    # suffix rows dominated ~75 GB of live shuffle; BENCH.md r5b):
    # candidate GENERATION only needs key equality, and the final JVM
    # `contains` verify removes any hash-collision false candidate, so
    # hashing loses nothing (equal windows always collide). Shuffle order
    # matters too: repartition(skey_h) FIRST, then the (container, skey_h)
    # dedup — HashPartitioning(skey_h) satisfies the aggregate's clustered
    # distribution (subset of its keys) AND the join's, so the wide suffix
    # relation crosses the wire ONCE, as (long, id) rows.
    expr_h = (
        f"transform(sequence(1, length({text_col}) - {min_suffix} + 1),"
        f" i -> xxhash64(substring({text_col}, i, {prefix_len})))"
    )
    suffixes = (
        docs.where(F.length(text_col) >= min_suffix)
        .select(
            F.col(id_col).alias("container"),
            F.explode(F.expr(expr_h)).alias("skey_h"),
        )
        .repartition("skey_h")
        .dropDuplicates(["container", "skey_h"])
    )
    eligible = docs.where(F.length(text_col) >= min_suffix)
    whole = eligible.where(F.length(text_col) >= prefix_len).select(
        F.col(id_col).alias("contained"),
        F.xxhash64(F.substring(F.col(text_col), 1, prefix_len)).alias("skey_h"),
    )
    cands_long = (
        suffixes.join(whole, "skey_h")
        .where(F.col("contained") != F.col("container"))
        .select("contained", "container")
    )
    short = eligible.where(F.length(text_col) < prefix_len).select(
        F.col(id_col).alias("contained"),
        F.col(text_col).alias("t_short"),
        F.substring(F.col(text_col), 1, min_suffix).alias("k8"),
    )
    # one cheap columnar scan decides the tier's physical shape; the result
    # is a scalar, not a collect of rows
    n_short = short.count()
    if n_short == 0:
        cands = cands_long.dropDuplicates(["contained", "container"])
    else:
        if n_short <= short_broadcast_max:
            # raw windows, no dedup shuffle: the broadcast hash join is
            # narrow, and duplicate (container, skey) windows only produce
            # duplicate candidates that the pair dedup below collapses
            sfx_short = docs.where(F.length(text_col) >= min_suffix).select(
                F.col(id_col).alias("container"),
                F.explode(F.expr(expr)).alias("skey"),
            ).join(F.broadcast(short), F.substring("skey", 1, min_suffix) == short["k8"])
        else:
            # rare short-heavy fallback: this branch needs the TEXT windows
            # (startswith below), so it materializes its own text-keyed
            # suffix relation — the hashed long-tier relation stays narrow
            sfx_short = (
                docs.where(F.length(text_col) >= min_suffix)
                .select(
                    F.col(id_col).alias("container"),
                    F.explode(F.expr(expr)).alias("skey"),
                )
                .dropDuplicates(["container", "skey"])
                .withColumn("k8", F.substring("skey", 1, min_suffix))
                .join(short, "k8")
            )
        cands_short = (
            sfx_short
            .where(
                (F.col("contained") != F.col("container"))
                & F.expr("startswith(skey, t_short)")
            )
            .select("contained", "container")
        )
        cands = cands_long.unionAll(cands_short).dropDuplicates(
            ["contained", "container"]
        )
    # verify: candidate set is tiny vs the corpus, so two id-joins fetch the
    # texts and a JVM `contains` confirms true containment.
    t_in = docs.select(F.col(id_col).alias("contained"), F.col(text_col).alias("t_in"))
    t_out = docs.select(F.col(id_col).alias("container"), F.col(text_col).alias("t_out"))
    return (
        cands.join(t_in, "contained")
        .join(t_out, "container")
        .where(F.expr("contains(t_out, t_in)"))
        .select("contained", "container")
    )
