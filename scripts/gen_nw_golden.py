"""Regenerate tests/golden/nw_golden.json (VERDICT r02 #6).

The golden values are produced by a slow per-cell DP transliterated DIRECTLY
from the reference's semantics (src/pairwiseSeqAlign.cpp:209-313): M
overwritten with max(M, Ix, Iy) during the fill, boundary gap runs paying
-o-(g-1)e, and the per-cell positional traceback matrix (D >= ties). It is
intentionally independent of the production numpy kernel
(operators/align.nw_pair_stats) — the committed JSON pins the REFERENCE
semantics so a future kernel refactor can't silently drift even if the
in-repo test oracle drifts with it.

Usage: python scripts/gen_nw_golden.py   (writes the JSON; commit the diff)
"""

from __future__ import annotations

import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dynaalign_spark.operators.align import get_substitution_matrix

# fixed peptide sets: Durbin et al.'s textbook pair; prefix/containment
# shapes; repeat/gap-tempting shapes; full AA alphabet + its reversal
PEPTIDE_SETS = {
    "durbin": ["HEAGAWGHEE", "PAWHEAE"],
    "prefix": ["MKTAYIAKQR", "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ", "MKTAYIG"],
    "repeats": ["WWWWW", "WAWAW", "AAAAA", "WA"],
    "alphabet": ["ARNDCQEGHILKMFPSTWYV", "VYWTSPFMKLIHGEQCDNRA", "ARNDCQEG"],
}
MATRICES = ["BLOSUM45", "BLOSUM50", "BLOSUM62", "BLOSUM80", "BLOSUM90",
            "BLOSUM100"]


def reference_nw(a: str, b: str, sub, o: int = 10, e: int = 4):
    """Per-cell transliteration of src/pairwiseSeqAlign.cpp:209-313."""
    n, m = len(a), len(b)
    NEG = -(10**15)
    M = [[NEG] * (m + 1) for _ in range(n + 1)]
    Ix = [[NEG] * (m + 1) for _ in range(n + 1)]
    Iy = [[NEG] * (m + 1) for _ in range(n + 1)]
    tb = [["0"] * (m + 1) for _ in range(n + 1)]
    M[0][0] = 0
    for i in range(1, n + 1):
        Ix[i][0] = -o - (i - 1) * e  # cpp:226 — boundary run pays o+(g-1)e
        tb[i][0] = "U"
    for j in range(1, m + 1):
        Iy[0][j] = -o - (j - 1) * e
        tb[0][j] = "L"
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            s = int(sub[ord(a[i - 1]), ord(b[j - 1])])
            Ix[i][j] = max(M[i - 1][j] - (o + e), Ix[i - 1][j] - e)
            Iy[i][j] = max(M[i][j - 1] - (o + e), Iy[i][j - 1] - e)
            # diagonal reads the OVERWRITTEN previous cell (cpp:284-290)
            M[i][j] = s + max(M[i - 1][j - 1], Ix[i - 1][j - 1],
                              Iy[i - 1][j - 1])
            if M[i][j] >= Ix[i][j] and M[i][j] >= Iy[i][j]:
                tb[i][j] = "D"
            elif Ix[i][j] >= Iy[i][j]:
                M[i][j] = Ix[i][j]
                tb[i][j] = "U"
            else:
                M[i][j] = Iy[i][j]
                tb[i][j] = "L"
    i, j, matches, length = n, m, 0, 0
    while i > 0 or j > 0:  # positional walk (cpp:299-313)
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


def main():
    golden = []
    for set_name, seqs in PEPTIDE_SETS.items():
        for (ia, a), (ib, b) in itertools.combinations(enumerate(seqs), 2):
            for mat in MATRICES:
                sub = get_substitution_matrix(mat)
                matches, length, score = reference_nw(a, b, sub)
                golden.append({
                    "set": set_name, "a": a, "b": b, "matrix": mat,
                    "matches": matches, "length": length, "score": score,
                })
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "tests", "golden", "nw_golden.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(golden, f, indent=1)
    print(f"wrote {len(golden)} golden cases -> {out}")


if __name__ == "__main__":
    main()
