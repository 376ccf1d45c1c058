"""Hot-shingle doc-frequency cap on the exact k-gram Jaccard tier (VERDICT
r03 #1): a degenerate shingle distribution (one k-gram present in EVERY doc
— the reference ships data/allunique.rda precisely because such corpora
break naive pairing) must not quadratically fan out the self-equi-join.
"""
import itertools
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dynaalign_spark import textops  # noqa: E402

JK = 6
HOT = "ZQXJVW"  # the adversarial 6-gram, planted in every doc


def _mk_docs(spark, n=600):
    """n docs sharing one hot 6-gram; three planted near-dup pairs whose
    similarity lives entirely in rare shingles. Seeded random tails + a
    deterministic self-check guarantee NO other 6-gram (including windows
    crossing the hot-gram boundary) is shared between distinct docs — a
    structured id like u00042 would leak shared digit prefixes into the
    boundary windows and silently group docs."""
    import random

    rng = random.Random(20260819)
    rows = []
    for i in range(n):
        tail = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(24))
        rows.append((f"d{i:05d}", f"{HOT} {tail}"))
    # planted near-dups: identical rare payloads (jaccard 1.0 on capped sets)
    for j, payload in enumerate(["alphaalphaalpha", "betabetabetabet",
                                 "gammagammagamma"]):
        rows.append((f"p{j}a", f"{HOT} {payload}"))
        rows.append((f"p{j}b", f"{HOT} {payload}"))
    # fixture self-check (deterministic seed -> checked once, never flaky):
    # pure-tail shingles are doc-unique (boundary windows that mix the hot
    # gram with the first <=5 tail chars DO group ~n/26 docs by first char —
    # that residual grouping is small-df by construction and is exactly what
    # the linear-not-quadratic bound below tolerates)
    owner: dict[str, set[str]] = {}
    for did, text in rows:
        for p in range(len(HOT) + 1, len(text) - JK + 1):
            owner.setdefault(text[p:p + JK], set()).add(did)
    for s, d in owner.items():
        assert len(d) == 1 or {x[-1] for x in d} == {"a", "b"}, (s, d)
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_cap_bounds_adversarial_fanout(spark):
    docs = _mk_docs(spark)
    pairs = textops.ngram_jaccard_pairs(
        docs, JK, threshold=0.5, max_doc_freq=400
    ).collect()
    got = sorted((r["a"], r["b"]) for r in pairs)
    assert got == [("p0a", "p0b"), ("p1a", "p1b"), ("p2a", "p2b")]
    # capped sets exclude the hot shingle entirely -> planted pairs are
    # exact duplicates of each other's rare-shingle sets
    assert all(r["jaccard"] == 1.0 for r in pairs)


def test_cap_candidate_set_is_linear_not_quadratic(spark):
    """The join's pair fan-out itself (pre-threshold) must be bounded: with
    the cap, only the 3 planted pairs co-shingle at all; without it, the hot
    shingle alone creates ~n^2/2 candidate pairs."""
    docs = _mk_docs(spark, n=300)
    n = docs.count()
    # residual pairs come only from the small boundary-prefix groups
    # (df ~ n/26 per first-tail-char): O(n * df) = linear in n
    capped = textops.ngram_jaccard_pairs(docs, JK, max_doc_freq=250)
    assert capped.count() <= 40 * n
    uncapped = textops.ngram_jaccard_pairs(docs, JK)
    assert uncapped.count() >= n * (n - 1) // 2  # the blowup the cap removes


def test_cap_matches_python_oracle_over_capped_sets(spark):
    """Capped-set semantics: jaccard over memberships AFTER dropping
    df > cap shingles (sizes recomputed on the filtered sets)."""
    rows = [
        ("a", "the cat sat on the mat today fine"),
        ("b", "the cat sat on the mat today okay"),
        ("c", "a dog ran in the park all day long"),
        ("d", "a dog ran in the park all day here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    cap = 3
    sets = {i: {t[p:p + JK] for p in range(len(t) - JK + 1)} for i, t in rows}
    df = {}
    for s in set(itertools.chain.from_iterable(sets.values())):
        df[s] = sum(s in v for v in sets.values())
    capped = {i: {s for s in v if df[s] <= cap} for i, v in sets.items()}
    want = {}
    for x, y in itertools.combinations(sorted(capped), 2):
        inter = len(capped[x] & capped[y])
        union = len(capped[x] | capped[y])
        if inter:
            want[(x, y)] = (inter, union, inter / union)
    got = {
        (r["a"], r["b"]): (r["inter_cnt"], r["union_cnt"], r["jaccard"])
        for r in textops.ngram_jaccard_pairs(docs, JK, max_doc_freq=cap).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][:2] == want[k][:2]
        assert got[k][2] == pytest.approx(want[k][2])


def test_driver_jpairs_oracle_mirrors_cap():
    """The DuckDB twin applies the identical cap (so the driver check stays
    value-exact at any SF), and the driver query passes it through."""
    import duckdb

    import __spark_entry__ as entrymod

    assert entrymod.JMAXDF == 400
    assert f"having count(*) <= {entrymod.JMAXDF}" in entrymod._JPAIRS
    con = duckdb.connect()
    con.sql(
        "create view documents as select * from (values "
        + ", ".join(
            f"('d{i}', '{HOT} ' || 'u{i:05d}u{i:05d}u{i:05d}')" for i in range(5)
        )
        + ") t(doc_id, text)"
    )
    # runnable and empty on the all-unique-tails corpus
    assert con.sql(f"select count(*) from ({entrymod._JPAIRS})").fetchone()[0] == 0
