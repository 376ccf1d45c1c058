"""Exact pairwise global alignment similarity (reference ``similarityNW``).

Spark re-grounding of the reference's exact (non-approximate) similarity
tier: global Needleman-Wunsch with affine gaps, 3-matrix DP (M / Ix / Iy)
plus traceback, ``sim = matches / alignment_length`` (reference
src/pairwiseSeqAlign.cpp:331-365, DP core :209-313). Substitution tables per
reference ``getSubstitutionMatrix`` (src/pairwiseSeqAlign.cpp:190-206):
BLOSUM62 is shipped (the published Henikoff & Henikoff 1992 constants —
public data) plus an IDENTITY matrix for arbitrary caption text; the other
BLOSUM variants follow the identical lookup path and can be added as data.

Semantics pinned from the reference (SURVEY.md §2 #15-17):
- boundary init ``Ix[i][0] = -gap_open - (i-1)*gap_ext`` (first gap position
  pays open+ext, src/pairwiseSeqAlign.cpp:224-229);
- opening a gap mid-alignment costs ``gap_open + gap_ext``, extending costs
  ``gap_ext`` (:255);
- similarity = (#aligned positions where chars are equal) / (total alignment
  columns, gaps included).
Tie-break precedence in the traceback (M over Ix over Iy) is OUR pinned
decision — the reference does not document its order, and ties only affect
which of several co-optimal alignments is counted, not the optimal score.

Execution shape: the DP is O(len_a * len_b) per pair — inherently
non-relational — so it runs as a vectorized-inner-loop numpy kernel inside
an Arrow pandas UDF over CANDIDATE pairs (LSH output), never all-pairs at
scale. The reference's dense all-pairs loop (src/pairwiseSeqAlign.cpp:
340-346) survives only as the test-scale ``similarity_nw`` form. Each DP row
is fully vectorized: M and Ix depend on the previous row only, and the
horizontal-gap recurrence Iy[j] = max(M[j-1]-open-ext, Iy[j-1]-ext) is a
prefix running-max after the substitution A[j] = Iy[j] + j*ext.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

NEG_INF = np.int32(-(10**9))

_AA_ALPHABET = "ARNDCQEGHILKMFPSTWYVBZX*"

# BLOSUM62, 24x24, row/col order ARNDCQEGHILKMFPSTWYVBZX* (published
# Henikoff & Henikoff 1992 / NCBI constants; reference ships the same table
# at src/pairwiseSeqAlign.cpp:23-186).
_BLOSUM62 = np.array([
    [4,-1,-2,-2,0,-1,-1,0,-2,-1,-1,-1,-1,-2,-1,1,0,-3,-2,0,-2,-1,0,-4],
    [-1,5,0,-2,-3,1,0,-2,0,-3,-2,2,-1,-3,-2,-1,-1,-3,-2,-3,-1,0,-1,-4],
    [-2,0,6,1,-3,0,0,0,1,-3,-3,0,-2,-3,-2,1,0,-4,-2,-3,3,0,-1,-4],
    [-2,-2,1,6,-3,0,2,-1,-1,-3,-4,-1,-3,-3,-1,0,-1,-4,-3,-3,4,1,-1,-4],
    [0,-3,-3,-3,9,-3,-4,-3,-3,-1,-1,-3,-1,-2,-3,-1,-1,-2,-2,-1,-3,-3,-2,-4],
    [-1,1,0,0,-3,5,2,-2,0,-3,-2,1,0,-3,-1,0,-1,-2,-1,-2,0,3,-1,-4],
    [-1,0,0,2,-4,2,5,-2,0,-3,-3,1,-2,-3,-1,0,-1,-3,-2,-2,1,4,-1,-4],
    [0,-2,0,-1,-3,-2,-2,6,-2,-4,-4,-2,-3,-3,-2,0,-2,-2,-3,-3,-1,-2,-1,-4],
    [-2,0,1,-1,-3,0,0,-2,8,-3,-3,-1,-2,-1,-2,-1,-2,-2,2,-3,0,0,-1,-4],
    [-1,-3,-3,-3,-1,-3,-3,-4,-3,4,2,-3,1,0,-3,-2,-1,-3,-1,3,-3,-3,-1,-4],
    [-1,-2,-3,-4,-1,-2,-3,-4,-3,2,4,-2,2,0,-3,-2,-1,-2,-1,1,-4,-3,-1,-4],
    [-1,2,0,-1,-3,1,1,-2,-1,-3,-2,5,-1,-3,-1,0,-1,-3,-2,-2,0,1,-1,-4],
    [-1,-1,-2,-3,-1,0,-2,-3,-2,1,2,-1,5,0,-2,-1,-1,-1,-1,1,-3,-1,-1,-4],
    [-2,-3,-3,-3,-2,-3,-3,-3,-1,0,0,-3,0,6,-4,-2,-2,1,3,-1,-3,-3,-1,-4],
    [-1,-2,-2,-1,-3,-1,-1,-2,-2,-3,-3,-1,-2,-4,7,-1,-1,-4,-3,-2,-2,-1,-2,-4],
    [1,-1,1,0,-1,0,0,0,-1,-2,-2,0,-1,-2,-1,4,1,-3,-2,-2,0,0,0,-4],
    [0,-1,0,-1,-1,-1,-1,-2,-2,-1,-1,-1,-1,-2,-1,1,5,-2,-2,0,-1,-1,0,-4],
    [-3,-3,-4,-4,-2,-2,-3,-2,-2,-3,-2,-3,-1,1,-4,-3,-2,11,2,-3,-4,-3,-2,-4],
    [-2,-2,-2,-3,-2,-1,-2,-3,2,-1,-1,-2,-1,3,-3,-2,-2,2,7,-1,-3,-2,-1,-4],
    [0,-3,-3,-3,-1,-2,-2,-3,-3,3,1,-2,1,-1,-2,-2,0,-3,-1,4,-3,-2,-1,-4],
    [-2,-1,3,4,-3,0,1,-1,0,-3,-4,0,-3,-3,-2,0,-1,-4,-3,-3,4,1,-1,-4],
    [-1,0,0,1,-3,3,4,-2,0,-3,-3,1,-1,-3,-1,0,-1,-3,-2,-2,1,4,-1,-4],
    [0,-1,-1,-1,-2,-1,-1,-1,-1,-1,-1,-1,-1,-1,-2,0,0,-2,-1,-1,-1,-1,-1,-4],
    [-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,-4,1],
], dtype=np.int32)


def get_substitution_matrix(name: str):
    """name -> (score_table[256,256] int32 over byte values, description).

    Reference twin: ``getSubstitutionMatrix`` (src/pairwiseSeqAlign.cpp:
    190-206). Unknown bytes map to 'X' for BLOSUM62 (the reference maps
    unknown residues to the X row via its alphabet table,
    src/pairwiseSeqAlign.cpp:15-21). IDENTITY scores +1 match / -1 mismatch
    over the full byte alphabet (caption text).
    """
    table = np.full((256, 256), 0, dtype=np.int32)
    name = name.upper()
    if name == "BLOSUM62":
        idx = np.full(256, _AA_ALPHABET.index("X"), dtype=np.int64)
        for i, ch in enumerate(_AA_ALPHABET):
            idx[ord(ch)] = i
            idx[ord(ch.lower())] = i
        table = _BLOSUM62[np.ix_(idx, idx)]
    elif name == "IDENTITY":
        table = np.full((256, 256), -1, dtype=np.int32)
        np.fill_diagonal(table, 1)
    else:
        raise ValueError(f"unknown substitution matrix: {name}")
    return table


def nw_pair_stats(a: str, b: str, sub: np.ndarray,
                  gap_open: int = 10, gap_ext: int = 4):
    """One-pair affine NW: -> (matches, alignment_length, score).

    Pure-numpy kernel, row-vectorized (see module docstring); also serves as
    the in-memory oracle for the Spark operator's tests.
    """
    ab = np.frombuffer(a.encode("utf-8", "replace"), dtype=np.uint8)
    bb = np.frombuffer(b.encode("utf-8", "replace"), dtype=np.uint8)
    n, m = len(ab), len(bb)
    if n == 0 or m == 0:
        glen = max(n, m)
        return 0, glen, int(-(gap_open + gap_ext) - (glen - 1) * gap_ext) if glen else 0
    o, e = np.int32(gap_open), np.int32(gap_ext)
    # sub scores for every (a_i, b_j): n x m
    S = sub[np.ix_(ab, bb)]
    M = np.full((n + 1, m + 1), NEG_INF, dtype=np.int32)
    Ix = np.full((n + 1, m + 1), NEG_INF, dtype=np.int32)  # gap in b (vertical)
    Iy = np.full((n + 1, m + 1), NEG_INF, dtype=np.int32)  # gap in a (horizontal)
    M[0, 0] = 0
    ii = np.arange(1, n + 1, dtype=np.int32)
    jj = np.arange(1, m + 1, dtype=np.int32)
    Ix[1:, 0] = -o - ii * e          # i gap chars: open+ext for the first,
    Iy[0, 1:] = -o - jj * e          # ext for each subsequent (= -o - i*e)
    for i in range(1, n + 1):
        best_prev = np.maximum(np.maximum(M[i - 1], Ix[i - 1]), Iy[i - 1])
        M[i, 1:] = S[i - 1] + best_prev[:-1]
        Ix[i, 1:] = np.maximum(M[i - 1, 1:] - (o + e), Ix[i - 1, 1:] - e)
        Ix[i, 0] = -o - np.int32(i) * e
        # Iy[i, j] = max(M[i, j-1] - (o+e), Iy[i, j-1] - e): running max on
        # A[j] = Iy[i, j] + j*e  =>  A[j] = max(A[j-1], M[i, j-1] + (j-1)e - o)
        cand = np.empty(m + 1, dtype=np.int64)
        cand[0] = Iy[i, 0]
        cand[1:] = M[i, :-1].astype(np.int64) + np.arange(m, dtype=np.int64) * e - o
        A = np.maximum.accumulate(cand)
        Iy[i, 1:] = (A[1:] - jj.astype(np.int64) * e).astype(np.int32)
    score = int(max(M[n, m], Ix[n, m], Iy[n, m]))
    # traceback (O(n+m)); precedence M > Ix > Iy, pinned (module docstring)
    i, j = n, m
    state = int(np.argmax([M[n, m], Ix[n, m], Iy[n, m]]))  # 0=M 1=Ix 2=Iy
    matches = 0
    length = 0
    while i > 0 or j > 0:
        length += 1
        if state == 0 and i > 0 and j > 0:
            if ab[i - 1] == bb[j - 1]:
                matches += 1
            prev = np.array([M[i - 1, j - 1], Ix[i - 1, j - 1], Iy[i - 1, j - 1]])
            state = int(np.argmax(prev))
            i, j = i - 1, j - 1
        elif state == 1 and i > 0:  # gap in b: consume a_i
            state = 0 if Ix[i, j] == M[i - 1, j] - (o + e) else 1
            i -= 1
        elif state == 2 and j > 0:  # gap in a: consume b_j
            state = 0 if Iy[i, j] == M[i, j - 1] - (o + e) else 2
            j -= 1
        else:  # boundary rows/cols
            if i > 0:
                i -= 1
            else:
                j -= 1
    return matches, length, score


def nw_similarity_udf(matrix_name: str = "BLOSUM62",
                      gap_open: int = 10, gap_ext: int = 4):
    """(text_a, text_b) -> sim double, as an Arrow pandas UDF (batch loop
    over pairs; numpy-vectorized DP rows inside)."""
    sub = get_substitution_matrix(matrix_name)

    @F.pandas_udf(DoubleType())
    def _nw(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.empty(len(a), dtype=np.float64)
        av, bv = a.tolist(), b.tolist()
        for i in range(len(av)):
            x, y = av[i], bv[i]
            if x is None or y is None:
                out[i] = np.nan
                continue
            matches, length, _ = nw_pair_stats(x, y, sub, gap_open, gap_ext)
            out[i] = matches / length if length else 1.0
        return pd.Series(out)

    return _nw


def nw_verified_pairs(docs: DataFrame, pairs: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      matrix_name: str = "IDENTITY",
                      gap_open: int = 10, gap_ext: int = 4) -> DataFrame:
    """Exact NW similarity on candidate pairs (a, b) — the scale path.

    The candidate set (LSH / banding output) is orders of magnitude smaller
    than the corpus, so two joins fetch the pair texts (Catalyst picks
    broadcast when the pair side is small; at 10^12 rows the docs side is
    bucketed by id and the joins co-locate) and the DP UDF runs once per
    pair. Columns: (a, b, nw_sim).
    """
    udf = nw_similarity_udf(matrix_name, gap_open, gap_ext)
    ta = docs.select(F.col(id_col).alias("a"), F.col(text_col).alias("_ta"))
    tb = docs.select(F.col(id_col).alias("b"), F.col(text_col).alias("_tb"))
    return (
        pairs.select("a", "b")
        .join(ta, "a")
        .join(tb, "b")
        .select("a", "b", udf(F.col("_ta"), F.col("_tb")).alias("nw_sim"))
    )


def similarity_nw(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", matrix_name: str = "BLOSUM62",
                  gap_open: int = 10, gap_ext: int = 4) -> DataFrame:
    """All-pairs exact NW similarity — the direct reference twin
    (``similarityNW``, src/pairwiseSeqAlign.cpp:331-365; all-pairs loop
    :340-346). O(n^2) pairs x O(len^2) DP: test-scale verifier ONLY; the
    production form is ``nw_verified_pairs`` over LSH candidates."""
    lhs = docs.select(F.col(id_col).alias("a"), F.col(text_col).alias("_ta"))
    rhs = docs.select(F.col(id_col).alias("b"), F.col(text_col).alias("_tb"))
    udf = nw_similarity_udf(matrix_name, gap_open, gap_ext)
    return (
        lhs.join(rhs, F.col("a") < F.col("b"))
        .select("a", "b", udf(F.col("_ta"), F.col("_tb")).alias("nw_sim"))
    )
