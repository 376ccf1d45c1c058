"""Center-star multiple sequence alignment + column-majority consensus —
the align-first consensus the reference gets from DECIPHER::AlignSeqs +
ConsensusSequence (R/clusterbreak.R:309-320, DESCRIPTION:22-23).

The reference pipes each cluster through an external MSA black box, then
takes a column-wise consensus. This module supplies the repo's own
from-scratch MSA so that consensus is computed on ALIGNED captions (the
alignment-free majority vote in consensus.py stays as the cheap tier): the
classic center-star approximation (Gusfield 1993, 2-approximation for
sum-of-pairs under triangle-inequality scores) built on the repo's
reference-exact affine-gap NW DP (align.py):

1. pick the CENTER = the member maximizing the total pairwise NW score to
   the other members (the alignment medoid; deterministic — first index on
   ties, members pre-sorted by id by the caller);
2. align every other member to the center pairwise (affine NW, IDENTITY
   matrix over caption bytes);
3. merge the pairwise alignments into one multiple alignment by the
   "once a gap, always a gap" rule: the master center row carries, in each
   inter-character slot, the MAXIMUM number of center-side gap columns any
   pairwise alignment put there; every member is projected into master
   coordinates with its slot insertions left-aligned;
4. consensus = per-column majority vote over the member rows (gap counts
   as a vote; a column whose strict winner is the gap is dropped; count
   ties prefer a character over the gap, then the smallest byte — the same
   tie rule as the alignment-free ``oracle.cluster_consensus``).

Divergence from the reference, documented: DECIPHER uses a guide-tree
profile MSA and emits IUPAC ambiguity codes at mixed columns; we use
center-star and emit the majority byte. Both are "align, then column
consensus"; on clusters of shifted / indel-edited captions the center-star
consensus recovers the common string where the alignment-free vote smears
it (pinned in tests/test_msa.py).

Everything here is pure numpy over byte arrays (captions utf-8 encoded,
decoded back with errors="replace"); determinism does not depend on dict /
set ordering. Cost: k-1 alignment DPs per cluster plus O(k'^2) DPs for
center selection over the capped member subset (k' <= max_members), each
O(len_a * len_b) with vectorized rows — bounded per cluster, distributed
across clusters by the bucketed applyInPandas in consensus.py."""

from __future__ import annotations

import numpy as np

from .align import GAP, get_substitution_matrix, nw_pair_align, nw_pair_stats


def _subset_indices(k: int, max_members: int) -> np.ndarray:
    """Deterministic evenly-spread subset of range(k) when k > max_members
    (members arrive sorted by id, so the spread is stable). The MSA rows
    come from the subset; the reported cluster size stays the full k."""
    if k <= max_members:
        return np.arange(k)
    return np.unique(np.round(np.linspace(0, k - 1, max_members)).astype(np.int64))


def _center_index(caps: list[str], sub: np.ndarray,
                  gap_open: int, gap_ext: int) -> int:
    """Alignment medoid: argmax over members of the summed pairwise NW
    score to every other member; first index on ties (argmax semantics)."""
    k = len(caps)
    if k <= 2:
        return 0
    totals = np.zeros(k, dtype=np.int64)
    for i in range(k):
        for j in range(i + 1, k):
            _, _, s = nw_pair_stats(caps[i], caps[j], sub, gap_open, gap_ext)
            totals[i] += s
            totals[j] += s
    return int(np.argmax(totals))


def center_star_rows(caps: list[str], center: int, sub: np.ndarray,
                     gap_open: int = 10, gap_ext: int = 4) -> np.ndarray:
    """Merge pairwise center alignments into an MSA matrix.

    Returns an int16 matrix of shape (len(caps), n_columns): row order ==
    input order, byte values at aligned characters, GAP (-1) elsewhere.
    "Once a gap, always a gap": slot p (between center chars p-1 and p;
    slot 0 before the first, slot n after the last) gets
    max_t(ins_t[p]) gap columns in the master center row, and each member's
    slot-p insertions occupy that region left-aligned."""
    cb = np.frombuffer(caps[center].encode("utf-8", "replace"), dtype=np.uint8)
    n = len(cb)
    k = len(caps)
    aligns: list[tuple[int, np.ndarray, np.ndarray, np.ndarray]] = []
    ins = np.zeros(n + 1, dtype=np.int64)
    for t in range(k):
        if t == center:
            continue
        ra, rb = nw_pair_align(caps[center], caps[t], sub, gap_open, gap_ext)
        mask_char = ra >= 0
        # center chars consumed BEFORE each column == the slot index of
        # that column when it is a center-gap column
        p_arr = np.cumsum(mask_char) - mask_char
        ins_t = np.bincount(p_arr[~mask_char], minlength=n + 1)
        np.maximum(ins, ins_t, out=ins)
        aligns.append((t, ra, rb, p_arr))
    # master layout: [slot 0][c_0][slot 1][c_1]...[c_{n-1}][slot n]
    start = np.zeros(n + 1, dtype=np.int64)  # start[p] = first col of slot p
    start[1:] = np.cumsum(ins[:n] + 1)
    ncols = int(start[n] + ins[n])
    char_col = start[:n] + ins[:n]
    rows = np.full((k, ncols), GAP, dtype=np.int16)
    if n:
        rows[center, char_col] = cb
    for t, ra, rb, p_arr in aligns:
        mask_char = ra >= 0
        row = rows[t]
        # columns aligned to a center char land on that char's master column
        if mask_char.any():
            row[char_col[p_arr[mask_char]]] = rb[mask_char]
        # center-gap columns: left-aligned into their slot's region
        gap_cols = ~mask_char
        if gap_cols.any():
            pg = p_arr[gap_cols]  # nondecreasing slot ids
            grp_start = np.flatnonzero(np.r_[True, pg[1:] != pg[:-1]])
            reps = np.diff(np.r_[grp_start, len(pg)])
            u = np.arange(len(pg)) - np.repeat(grp_start, reps)
            row[start[pg] + u] = rb[gap_cols]
    return rows


def consensus_from_rows(rows: np.ndarray) -> str:
    """Column-majority vote over an MSA matrix -> consensus string.

    Per column: most frequent symbol (gap included); on a count tie a
    character beats the gap and the smallest byte wins; a column whose
    winner is the gap is dropped."""
    out = bytearray()
    vals = (rows + 1).astype(np.int64)  # 0 = gap, 1..256 = byte+1
    for col in range(vals.shape[1]):
        cnt = np.bincount(vals[:, col], minlength=257)
        best = cnt.max()
        nz = np.flatnonzero(cnt[1:] == best)
        if len(nz):  # a character ties-or-beats the gap
            out.append(int(nz[0]))
        # else: gap strictly wins -> column dropped
    return bytes(out).decode("utf-8", "replace")


def center_star_consensus(caps: list[str], gap_open: int = 10,
                          gap_ext: int = 4, max_members: int = 64,
                          matrix_name: str = "IDENTITY") -> tuple[str, int]:
    """caps (pre-sorted deterministically by the caller) -> (consensus
    string, center index into caps). The center is the alignment medoid of
    the (capped) member subset and doubles as the exemplar."""
    k = len(caps)
    if k == 0:
        return "", -1
    if k == 1:
        return caps[0], 0
    sub = get_substitution_matrix(matrix_name)
    idx = _subset_indices(k, max_members)
    sub_caps = [caps[i] for i in idx]
    center_local = _center_index(sub_caps, sub, gap_open, gap_ext)
    rows = center_star_rows(sub_caps, center_local, sub, gap_open, gap_ext)
    return consensus_from_rows(rows), int(idx[center_local])
