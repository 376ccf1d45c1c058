"""The capped band-emission DuckDB oracle (`_duck_capped_cand`) must mirror
lsh.candidate_pairs' hot-band skew machinery (band_group_cap + sorted chain
pairing + per-endpoint verify routing) EXACTLY. On the driver fixtures the
default cap (2000) never engages, so the sf0.01 gate alone would leave the
chain branch of the oracle untested — this test drives BOTH engines with a
small cap on a corpus containing an over-cap band group and compares the
full (a, b, sim) candidate sets value-for-value.

Fixture shape: a 12-member identical-caption clique (every one of its 50
band groups has size >= 12 > cap, engaging chain pairing in every band),
two superset variants of the clique caption (they agree with the clique in
SOME components — mixed capped/uncapped membership, the per-endpoint
routing case), three planted near-dup pairs (2-member groups, all-pairs
branch), and unique-caption noise rows.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from dynaalign_spark.config import PARITY  # noqa: E402
from dynaalign_spark.operators.lsh import candidate_pairs  # noqa: E402
from dynaalign_spark.operators.signatures import add_signatures  # noqa: E402

CAP, CW = 5, 2
CLIQUE = 12
HOTCAP = "an identical caption shared by the whole hot clique"


def _docs(spark):
    import random

    rng = random.Random(20260821)
    rows = [(i, HOTCAP) for i in range(CLIQUE)]
    # superset variants: share most shingles with the clique caption, so
    # they join the clique's (capped) band groups at some positions and
    # form their own (uncapped) groups at others
    rows.append((100, HOTCAP + " trailing tail"))
    rows.append((101, HOTCAP + " trailing tnil"))
    for j, payload in enumerate(
        ["rare payload alpha", "rare payload omega", "other rare payload"]
    ):
        rows.append((200 + 2 * j, payload + " first"))
        rows.append((201 + 2 * j, payload + " last"))
    for i in range(20):
        tail = "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(28)
        )
        rows.append((300 + i, tail))
    return rows


@pytest.fixture(scope="module")
def frames(spark):
    rows = _docs(spark)
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    from pyspark.sql import functions as F

    images = docs.select(
        F.format_string("doc%08d", "doc_id").alias("image_id"),
        F.col("text").alias("caption"),
        F.lit(None).cast("long").alias("phash"),
    )
    return docs, images


def _pairs_set(df):
    return sorted(
        (a, b, round(float(s), 9)) for a, b, s in df[["a", "b", "sim_r"]].values
    )


def test_capped_cand_oracle_matches_engine(spark, frames):
    docs, images = frames
    cfg = PARITY.with_(band_group_cap=CAP, chain_width=CW)
    from pyspark.sql import functions as F

    got = (
        candidate_pairs(add_signatures(images, cfg), cfg)
        .select("a", "b", F.round("sim", 9).alias("sim_r"))
        .toPandas()
    )

    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    capped_sql = (
        f"{entrymod._duck_murmur_sig(4)}, "
        f"{entrymod._duck_capped_cand(cap=CAP, cw=CW)} "
        "select a, b, round(sim, 9) as sim_r from cand"
    )
    want = con.sql(capped_sql).df()

    # the fixture must actually engage the chain branch: the uncapped
    # enumeration emits strictly more pairs (the clique's C(12,2) vs its
    # chain's 11 + 10)
    uncapped = con.sql(
        f"{entrymod._duck_murmur_sig(4)} "
        "select count(*) from (select x.image_id, y.image_id from sig x "
        "join sig y on x.h = y.h and x.comp = y.comp "
        "and x.image_id < y.image_id group by 1, 2)"
    ).fetchone()[0]
    assert len(want) < uncapped

    assert len(got) == len(want)
    assert _pairs_set(got) == _pairs_set(want)

    # chain pairing kept the clique connected: every clique member appears
    # in at least one emitted pair with another clique member
    clique_ids = {f"doc{i:08d}" for i in range(CLIQUE)}
    touched = set()
    for a, b, _ in _pairs_set(got):
        if a in clique_ids and b in clique_ids:
            touched.update((a, b))
    assert touched == clique_ids


def test_default_cap_reduces_to_uncapped_form(spark, frames):
    """With the cap far above every group size, the capped oracle must
    degenerate to the plain agreement enumeration — the algebraic identity
    the sf0.01 driver gate relies on."""
    docs, _ = frames
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    capped = con.sql(
        f"{entrymod._duck_murmur_sig(4)}, "
        f"{entrymod._duck_capped_cand(cap=10_000, cw=CW)} "
        "select a, b, round(sim, 9) as s from cand order by a, b"
    ).df()
    plain = con.sql(
        f"{entrymod._duck_murmur_sig(4)} "
        "select x.image_id as a, y.image_id as b, "
        f"round(count(*) / {float(PARITY.n_hash)}, 9) as s "
        "from sig x join sig y on x.h = y.h and x.comp = y.comp "
        "and x.image_id < y.image_id group by 1, 2 order by 1, 2"
    ).df()
    assert capped.equals(plain)


def test_cc_rounds_unrolled_star_contraction():
    """`_duck_cc_rounds` (plain-SQL unrolled large/small-star) must produce
    exact min-member component labels on the adversarial shape that defeated
    the old recursive-reachability oracle: a sorted chain with diameter in
    the thousands (what chain pairing turns a hot clique into), plus random
    small components, validated against a Python union-find."""
    import random

    rng = random.Random(7)
    edges = [(f"n{i:06d}", f"n{i + 1:06d}") for i in range(3000)]  # one chain
    nodes = 3001
    for c in range(200):  # random small components
        size = rng.randint(2, 12)
        base = 10_000 + c * 100
        ids = [f"n{base + j:06d}" for j in range(size)]
        for j in range(1, size):
            edges.append((ids[rng.randrange(j)], ids[j]))
        nodes += size

    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = sorted((x, find(x)) for x in parent)

    con = duckdb.connect()
    con.register("edges_t", __import__("pandas").DataFrame(edges, columns=["a", "b"]))
    got = con.sql(
        f"with {entrymod._duck_cc_rounds('edges_t')} "
        "select image_id, component from ccomp order by image_id"
    ).fetchall()
    assert [tuple(r) for r in got] == want


def test_cc_rounds_nonconvergence_errors_loudly():
    """ADVICE r04: with too few rounds for the graph's diameter the oracle
    must raise (the ccguard CTE), never return silently wrong labels."""
    import pandas as pd
    import pytest

    # a 3000-node chain needs ~log2(diameter) star rounds; 2 is not enough
    edges = pd.DataFrame(
        [(f"n{i:06d}", f"n{i + 1:06d}") for i in range(3000)], columns=["a", "b"]
    )
    con = duckdb.connect()
    con.register("edges_t", edges)
    with pytest.raises(Exception, match="did not converge"):
        con.sql(
            f"with {entrymod._duck_cc_rounds('edges_t', rounds=2)} "
            "select image_id, component from ccomp order by image_id"
        ).fetchall()
