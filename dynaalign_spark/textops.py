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
    expr = (
        f"transform(sequence(1, greatest(length({text_col}) - {k} + 1, 0)), "
        f"i -> substring({text_col}, i, {k}))"
    )
    return docs.select(
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
    distinct counts (broadcastable) -> jaccard = inter / (na + nb - inter).
    """
    memb = shingle_explode(docs, k, **kw).dropDuplicates(["doc_id", "shingle"])
    if max_doc_freq is not None:
        df_ok = (
            memb.groupBy("shingle")
            .agg(F.countDistinct("doc_id").alias("df"))
            .where(F.col("df") <= max_doc_freq)
            .select("shingle")
        )
        memb = memb.join(F.broadcast(df_ok), "shingle")
    sizes = memb.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = memb.select(F.col("doc_id").alias("a"), "shingle")
    b = memb.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter_cnt"))
    )
    out = (
        inter.join(F.broadcast(sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("na"))), "a")
        .join(F.broadcast(sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("nb"))), "b")
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


def suffix_candidates(docs: DataFrame, prefix_len: int, min_suffix: int = 8,
                      id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distributed suffix-array pass for exact substring duplicates.

    Explode every suffix (capped to its first ``prefix_len`` chars as the sort
    key), range-partition + sort by key, then pair docs sharing a key — a doc
    whose *entire text* equals a key prefix of another doc's suffix is a
    substring duplicate. This relational form finds (contained, container)
    pairs where contained's full text occurs in container.

    At scale: suffixes ~= total chars rows; repartitionByRange on the key
    keeps the sort distributed (the reference analog is the exact tier of
    similarityNW, src/pairwiseSeqAlign.cpp:331-365 — SURVEY.md §2.4).
    """
    expr = (
        f"transform(sequence(1, greatest(length({text_col}) - {min_suffix} + 1, 0)),"
        f" i -> substring({text_col}, i, {prefix_len}))"
    )
    suffixes = docs.select(
        F.col(id_col).alias("container"),
        F.explode(F.expr(expr)).alias("skey"),
    ).dropDuplicates(["container", "skey"])
    whole = docs.where(F.length(text_col) >= min_suffix).select(
        F.col(id_col).alias("contained"),
        F.substring(F.col(text_col), 1, prefix_len).alias("skey"),
    )
    cands = (
        suffixes.repartition("skey")
        .join(whole, "skey")
        .where(F.col("contained") != F.col("container"))
        .select("contained", "container")
        .dropDuplicates(["contained", "container"])
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
