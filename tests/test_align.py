"""Exact NW alignment tier (operators/align.py) — reference similarityNW
(src/pairwiseSeqAlign.cpp:331-365): golden cases, invariants, Spark parity."""

import numpy as np
import pytest

from dynaalign_spark.operators.align import (
    get_substitution_matrix,
    nw_pair_stats,
)

IDENT = get_substitution_matrix("IDENTITY")
B62 = get_substitution_matrix("BLOSUM62")


class TestKernel:
    def test_exact_match(self):
        m, ln, sc = nw_pair_stats("ABC", "ABC", IDENT)
        assert (m, ln, sc) == (3, 3, 3)

    def test_single_mismatch(self):
        m, ln, sc = nw_pair_stats("ABC", "ABD", IDENT)
        assert (m, ln) == (2, 3)
        assert sc == 1  # +1 +1 -1, no gap beats open cost 14
        assert m / ln == pytest.approx(2 / 3)

    def test_contiguous_gap_score_and_greedy_traceback(self):
        # ABCDEF vs ABEF: optimal score takes one gap run of 2
        # (score = 4 - (10+4) - 4 = -14; two separate runs would cost 28).
        # The MATCH COUNT, however, is 2, not 4: the reference's traceback is
        # a per-cell greedy move matrix (src/pairwiseSeqAlign.cpp:283-313)
        # that here walks UUDDDD (leading gaps, then CDEF vs ABEF diagonal) —
        # a reference quirk we reproduce exactly (ADVICE r01 medium).
        m, ln, sc = nw_pair_stats("ABCDEF", "ABEF", IDENT)
        assert (m, ln, sc) == (2, 6, -14)

    def test_empty_sides(self):
        assert nw_pair_stats("", "AB", IDENT)[:2] == (0, 2)
        assert nw_pair_stats("AB", "", IDENT)[:2] == (0, 2)
        assert nw_pair_stats("", "", IDENT) == (0, 0, 0)

    def test_blosum62_diag_and_symmetry(self):
        # published values: W/W=11, C/C=9, A/A=4, W/C=-2, unknown->X row
        assert B62[ord("W"), ord("W")] == 11
        assert B62[ord("C"), ord("C")] == 9
        assert B62[ord("A"), ord("A")] == 4
        assert B62[ord("W"), ord("C")] == -2
        assert B62[ord("!"), ord("A")] == B62[ord("X"), ord("A")]
        assert np.array_equal(B62, B62.T)

    def test_self_similarity_one(self):
        rng = np.random.default_rng(7)
        aas = "ARNDCQEGHILKMFPSTWYV"
        for _ in range(10):
            s = "".join(rng.choice(list(aas), size=rng.integers(1, 40)))
            m, ln, _ = nw_pair_stats(s, s, B62)
            assert m == ln == len(s)

    def test_symmetry_and_bounds(self):
        rng = np.random.default_rng(11)
        aas = "ARNDCQEGHILKMFPSTWYV"
        for _ in range(10):
            a = "".join(rng.choice(list(aas), size=rng.integers(1, 30)))
            b = "".join(rng.choice(list(aas), size=rng.integers(1, 30)))
            ma, la, sa = nw_pair_stats(a, b, B62)
            mb, lb, sb = nw_pair_stats(b, a, B62)
            assert sa == sb            # score is symmetric
            assert 0 <= ma <= la
            assert max(len(a), len(b)) <= la <= len(a) + len(b)
            assert 0.0 <= ma / la <= 1.0

    def test_full_stats_vs_reference_transliteration(self):
        # (matches, length, score) against a slow per-cell DP written
        # directly from the reference's semantics (src/pairwiseSeqAlign.cpp:
        # 209-313): M overwritten with max(M, Ix, Iy) during the fill,
        # boundary Ix[i][0] = -o-(i-1)e, and a positional traceback matrix —
        # the exact behaviors ADVICE r01 flagged as divergent.
        def slow(a, b, sub, o=10, e=4):
            n, m = len(a), len(b)
            NEG = -(10**15)
            M = [[NEG] * (m + 1) for _ in range(n + 1)]
            Ix = [[NEG] * (m + 1) for _ in range(n + 1)]
            Iy = [[NEG] * (m + 1) for _ in range(n + 1)]
            tb = [["0"] * (m + 1) for _ in range(n + 1)]
            M[0][0] = 0
            for i in range(1, n + 1):
                Ix[i][0] = -o - (i - 1) * e
                tb[i][0] = "U"
            for j in range(1, m + 1):
                Iy[0][j] = -o - (j - 1) * e
                tb[0][j] = "L"
            for i in range(1, n + 1):
                for j in range(1, m + 1):
                    s = int(sub[ord(a[i - 1]), ord(b[j - 1])])
                    Ix[i][j] = max(M[i-1][j] - (o + e), Ix[i-1][j] - e)
                    Iy[i][j] = max(M[i][j-1] - (o + e), Iy[i][j-1] - e)
                    M[i][j] = s + max(M[i-1][j-1], Ix[i-1][j-1], Iy[i-1][j-1])
                    if M[i][j] >= Ix[i][j] and M[i][j] >= Iy[i][j]:
                        tb[i][j] = "D"
                    elif Ix[i][j] >= Iy[i][j]:
                        M[i][j] = Ix[i][j]
                        tb[i][j] = "U"
                    else:
                        M[i][j] = Iy[i][j]
                        tb[i][j] = "L"
            i, j, matches, length = n, m, 0, 0
            while i > 0 or j > 0:
                t = tb[i][j]
                if t == "D":
                    if a[i - 1] == b[j - 1]:
                        matches += 1
                    i, j = i - 1, j - 1
                elif t == "U":
                    i -= 1
                else:
                    j -= 1
                length += 1
            return matches, length, M[n][m]

        rng = np.random.default_rng(3)
        for sub, chars in [(IDENT, "ABCD"), (B62, "ARNDCQEGWYV")]:
            for _ in range(60):
                a = "".join(rng.choice(list(chars), size=rng.integers(1, 12)))
                b = "".join(rng.choice(list(chars), size=rng.integers(1, 12)))
                assert nw_pair_stats(a, b, sub) == slow(a, b, sub), (a, b)

    def test_boundary_gap_first_char_pays_open_only(self):
        # reference boundary (cpp:226): leading/trailing gap run of g chars
        # costs o + (g-1)e, NOT o + g*e — 'AB' vs 'CAB' aligns with one
        # leading gap: score = -10 + 1 + 1 = -8 under IDENTITY
        m, ln, sc = nw_pair_stats("AB", "CAB", IDENT)
        assert (m, ln, sc) == (2, 3, -8)

    @pytest.mark.parametrize(
        "name,ww",
        [("BLOSUM45", 15), ("BLOSUM50", 15), ("BLOSUM62", 11),
         ("BLOSUM80", 16), ("BLOSUM90", 11), ("BLOSUM100", 17)],
    )
    def test_all_blosum_variants(self, name, ww):
        # reference getSubstitutionMatrix dispatches six tables
        # (src/pairwiseSeqAlign.cpp:190-206); W/W diag pins each variant
        t = get_substitution_matrix(name)
        assert t[ord("W"), ord("W")] == ww
        assert np.array_equal(t, t.T)
        s = "HEAGAWGHEE"
        m, ln, _ = nw_pair_stats(s, s, t)
        assert m == ln == len(s)

    def test_unknown_matrix_raises(self):
        with pytest.raises(ValueError):
            get_substitution_matrix("BLOSUM999")


def _golden_cases():
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "golden", "nw_golden.json")
    with open(path) as f:
        return json.load(f)


@pytest.mark.parametrize(
    "case", _golden_cases(),
    ids=lambda c: f"{c['set']}-{c['matrix']}-{c['a'][:6]}x{c['b'][:6]}",
)
def test_golden_vectors_pin_reference_semantics(case):
    """VERDICT r02 #6: committed golden (matches, length, score) for fixed
    peptide sets x all six BLOSUM tables, generated by the per-cell
    transliteration of src/pairwiseSeqAlign.cpp:209-313 (overwritten-M
    recurrence order, -o-(g-1)e boundaries, positional traceback) in
    scripts/gen_nw_golden.py. Unlike the in-repo slow oracle above, the
    frozen JSON can't drift with a refactor."""
    sub = get_substitution_matrix(case["matrix"])
    got = nw_pair_stats(case["a"], case["b"], sub)
    assert got == (case["matches"], case["length"], case["score"]), case


@pytest.mark.usefixtures("spark")
class TestSpark:
    def test_similarity_nw_matches_kernel(self, spark):
        from dynaalign_spark.operators.align import similarity_nw

        rows = [("d1", "HEAGAWGHEE"), ("d2", "PAWHEAE"), ("d3", "HEAGAWGHEE"),
                ("d4", "AW")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {(r["a"], r["b"]): r["nw_sim"]
               for r in similarity_nw(df, matrix_name="BLOSUM62").collect()}
        assert len(got) == 6  # all i<j pairs
        texts = dict(rows)
        for (a, b), sim in got.items():
            m, ln, _ = nw_pair_stats(texts[a], texts[b], B62)
            assert sim == pytest.approx(m / ln)
        assert got[("d1", "d3")] == pytest.approx(1.0)

    def test_nw_verified_pairs_join(self, spark):
        from dynaalign_spark.operators.align import nw_verified_pairs

        docs = spark.createDataFrame(
            [("a", "HELLO WORLD"), ("b", "HELLO WORLD"), ("c", "XYZ")],
            ["doc_id", "text"],
        )
        pairs = spark.createDataFrame([("a", "b"), ("a", "c")], ["a", "b"])
        out = {(r["a"], r["b"]): r["nw_sim"]
               for r in nw_verified_pairs(docs, pairs).collect()}
        assert out[("a", "b")] == pytest.approx(1.0)
        assert out[("a", "c")] < 0.3
