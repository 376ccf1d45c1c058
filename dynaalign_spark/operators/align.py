"""Exact pairwise global alignment similarity (reference ``similarityNW``).

Spark re-grounding of the reference's exact (non-approximate) similarity
tier: global Needleman-Wunsch with affine gaps, 3-matrix DP (M / Ix / Iy)
plus traceback, ``sim = matches / alignment_length`` (reference
src/pairwiseSeqAlign.cpp:331-365, DP core :209-313). Substitution tables per
reference ``getSubstitutionMatrix`` (src/pairwiseSeqAlign.cpp:190-206): all
six BLOSUM variants (45/50/62/80/90/100 — the published Henikoff & Henikoff
1992 / NCBI constants, see blosum.py) plus an IDENTITY matrix for arbitrary
caption text.

Semantics are the REFERENCE'S, matched exactly (ADVICE r01 medium):
- boundary init ``Ix[i][0] = -gap_open - (i-1)*gap_ext`` — the first
  boundary gap char pays only the open cost (src/pairwiseSeqAlign.cpp:226);
- the reference overwrites M[i][j] with max(M, Ix, Iy) during the fill
  (:284-290), so its Ix/Iy gap-open branches read the OVERALL best of the
  previous cell (Iy->Ix transitions allowed at open cost), not pure M;
- opening a gap mid-alignment costs ``gap_open + gap_ext``, extending costs
  ``gap_ext`` (:255-266);
- traceback is a per-cell move matrix recorded during the fill
  (D if diag >= Ix and diag >= Iy, else U if Ix >= Iy, else L — :283-291),
  walked positionally (:299-313), NOT a state machine;
- similarity = (#aligned positions where chars are equal) / (total alignment
  columns, gaps included).

Execution shape: the DP is O(len_a * len_b) per pair — inherently
non-relational — so it runs as a vectorized-inner-loop numpy kernel inside
an Arrow pandas UDF over CANDIDATE pairs (LSH output), never all-pairs at
scale. The reference's dense all-pairs loop (src/pairwiseSeqAlign.cpp:
340-346) survives only as the test-scale ``similarity_nw`` form. Each DP
row is fully vectorized even with the reference's overwritten-M coupling:
with U[j] = max(D[j], Ix[j]) (row-local, vectorizable), the same-row
recurrence Iy[j] = max(Vm[j-1]-(o+e), Iy[j-1]-e) collapses to
Iy[j] = max(U[j-1]-(o+e), Iy[j-1]-e) (because max(Iy[j-1]-(o+e), Iy[j-1]-e)
= Iy[j-1]-e for o >= 0), which is a prefix running-max after the
substitution A[j] = Iy[j] + j*ext.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from .blosum import AA_ALPHABET, TABLES

NEG_INF = np.int32(-(10**9))


def get_substitution_matrix(name: str):
    """name -> score_table[256,256] int32 over byte values.

    Reference twin: ``getSubstitutionMatrix`` (src/pairwiseSeqAlign.cpp:
    190-206), dispatching all six BLOSUM variants. Unknown bytes map to 'X'
    (the reference hard-errors on unknown residues,
    src/pairwiseSeqAlign.cpp:241 — we soften to the X row so arbitrary
    caption text aligns; BLOSUM inputs restricted to the AA alphabet behave
    identically). IDENTITY scores +1 match / -1 mismatch over the full byte
    alphabet (caption text).
    """
    name = name.upper()
    if name in TABLES:
        blosum = np.array(TABLES[name], dtype=np.int32)
        idx = np.full(256, AA_ALPHABET.index("X"), dtype=np.int64)
        for i, ch in enumerate(AA_ALPHABET):
            idx[ord(ch)] = i
            idx[ord(ch.lower())] = i
        return blosum[np.ix_(idx, idx)]
    if name == "IDENTITY":
        table = np.full((256, 256), -1, dtype=np.int32)
        np.fill_diagonal(table, 1)
        return table
    raise ValueError(f"unknown substitution matrix: {name}")


def nw_pair_stats(a: str, b: str, sub: np.ndarray,
                  gap_open: int = 10, gap_ext: int = 4):
    """One-pair affine NW: -> (matches, alignment_length, score).

    Pure-numpy kernel, row-vectorized, matching the reference DP exactly
    (src/pairwiseSeqAlign.cpp:209-313) — including its overwritten-M
    recurrences and its per-cell positional traceback (module docstring).
    Per row i we carry three vectors of the previous row:

    - ``vm``: the reference's post-overwrite M (boundary col 0 = -inf);
    - ``ix``: the vertical-gap matrix (boundary ix[0] = -o-(i-1)e);
    - ``vd``: max(vm, ix, iy) including boundary cols — what the diagonal
      branch reads (the overwrite makes diag = vd_prev[j-1] + score).
    """
    ab = np.frombuffer(a.encode("utf-8", "replace"), dtype=np.uint8)
    bb = np.frombuffer(b.encode("utf-8", "replace"), dtype=np.uint8)
    n, m = len(ab), len(bb)
    if n == 0 or m == 0:
        glen = max(n, m)
        # boundary gap run of g chars costs o + (g-1)e (cpp:226)
        return 0, glen, int(-gap_open - (glen - 1) * gap_ext) if glen else 0
    tb, score = _nw_fill(ab, bb, sub, gap_open, gap_ext)
    # positional traceback walk (cpp:299-313)
    i, j = n, m
    matches = 0
    length = 0
    while i > 0 or j > 0:
        length += 1
        t = tb[i, j]
        if t == 0:
            if ab[i - 1] == bb[j - 1]:
                matches += 1
            i -= 1
            j -= 1
        elif t == 1:
            i -= 1
        else:
            j -= 1
    return matches, length, score


def _nw_fill(ab: np.ndarray, bb: np.ndarray, sub: np.ndarray,
             gap_open: int, gap_ext: int):
    """DP fill over non-empty byte arrays -> (traceback matrix, score).

    Shared by ``nw_pair_stats`` (match counting) and ``nw_pair_align``
    (gapped-row emission); the recurrences are the reference's exactly
    (module docstring)."""
    n, m = len(ab), len(bb)
    o, e = np.int64(gap_open), np.int64(gap_ext)
    S = sub[np.ix_(ab, bb)].astype(np.int64)  # scores for every (a_i, b_j)
    NEG = np.int64(-(10**15))
    jj = np.arange(1, m + 1, dtype=np.int64)
    # row 0 state (reference cpp:222-235): M[0][0]=0, Iy[0][j] boundary
    vm_prev = np.full(m + 1, NEG, dtype=np.int64)
    vm_prev[0] = 0
    ix_prev = np.full(m + 1, NEG, dtype=np.int64)
    vd_prev = np.empty(m + 1, dtype=np.int64)
    vd_prev[0] = 0
    vd_prev[1:] = -o - (jj - 1) * e
    tb = np.zeros((n + 1, m + 1), dtype=np.uint8)  # 0=D(iag) 1=U(p) 2=L(eft)
    tb[1:, 0] = 1
    tb[0, 1:] = 2
    for i in range(1, n + 1):
        ix = np.empty(m + 1, dtype=np.int64)
        ix[0] = -o - (i - 1) * e
        ix[1:] = np.maximum(vm_prev[1:] - (o + e), ix_prev[1:] - e)
        d = np.empty(m + 1, dtype=np.int64)
        d[0] = NEG
        d[1:] = vd_prev[:-1] + S[i - 1]
        u = np.maximum(d, ix)
        # same-row Iy recurrence, collapsed (module docstring): running max
        # on A[j] = Iy[j] + j*e with cand[j] = U[j-1] + (j-1)e - o
        cand = np.empty(m + 1, dtype=np.int64)
        cand[0] = NEG  # Iy[i][0] boundary (cpp:228)
        cand[1] = NEG  # Vm[i][0] = -inf, so no open from column 0
        if m > 1:
            cand[2:] = u[1:-1] + jj[:-1] * e - o
        A = np.maximum.accumulate(cand)
        iy = np.empty(m + 1, dtype=np.int64)
        iy[0] = NEG
        iy[1:] = A[1:] - jj * e
        tb[i, 1:] = np.where(
            (d[1:] >= ix[1:]) & (d[1:] >= iy[1:]),
            0,
            np.where(ix[1:] >= iy[1:], 1, 2),
        )
        vm = np.maximum(u, iy)
        vm[0] = NEG
        vd = np.maximum(vm, np.maximum(ix, iy))
        vd[0] = ix[0]
        vm_prev, ix_prev, vd_prev = vm, ix, vd
    return tb, int(vm_prev[m])


GAP = np.int16(-1)


def nw_pair_align(a: str, b: str, sub: np.ndarray,
                  gap_open: int = 10, gap_ext: int = 4):
    """One-pair affine NW returning the ALIGNMENT itself: two equal-length
    int16 arrays of byte values with ``GAP`` (-1) at gap columns — the same
    DP fill and positional traceback as ``nw_pair_stats``, emitting columns
    instead of counting them. Pairwise NW never emits a gap/gap column, so
    at every position at least one side is a byte value."""
    ab = np.frombuffer(a.encode("utf-8", "replace"), dtype=np.uint8)
    bb = np.frombuffer(b.encode("utf-8", "replace"), dtype=np.uint8)
    n, m = len(ab), len(bb)
    if n == 0 or m == 0:
        # one side empty: the other aligns entirely against boundary gaps
        ra = ab.astype(np.int16) if n else np.full(m, GAP, dtype=np.int16)
        rb = bb.astype(np.int16) if m else np.full(n, GAP, dtype=np.int16)
        return ra, rb
    tb, _ = _nw_fill(ab, bb, sub, gap_open, gap_ext)
    ca = np.empty(n + m, dtype=np.int16)
    cb = np.empty(n + m, dtype=np.int16)
    t = 0
    i, j = n, m
    while i > 0 or j > 0:
        mv = tb[i, j]
        if mv == 0:
            ca[t] = ab[i - 1]
            cb[t] = bb[j - 1]
            i -= 1
            j -= 1
        elif mv == 1:
            ca[t] = ab[i - 1]
            cb[t] = GAP
            i -= 1
        else:
            ca[t] = GAP
            cb[t] = bb[j - 1]
            j -= 1
        t += 1
    return ca[:t][::-1].copy(), cb[:t][::-1].copy()


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
