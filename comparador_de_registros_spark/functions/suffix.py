"""Suffix-array longest-common-substring (the substring-dup verifier).

The substring candidate generator (winnowed anchors, operators/lsh.py)
guarantees that two documents sharing any substring of
``window + gram - 1`` bytes share an anchor; this module supplies the
EXACT verification for candidates that fail both Jaccard and full
containment: the byte length of the longest common substring, computed
with a suffix array over ``a + NUL + b``.

Published constructions only:
* suffix array by prefix doubling (Manber & Myers 1990), each round one
  ``np.lexsort`` — O(n log^2 n), fully vectorized;
* adjacent-suffix LCPs by binary lifting over the per-round rank
  arrays (the standard O(log n)-per-query LCP-from-doubling technique,
  vectorized over all adjacent pairs at once) instead of Kasai's
  sequential scan — no Python loop over positions;
* LCS(a, b) = max LCP between SA-adjacent suffixes of different origin
  (the classic reduction; any non-adjacent cross pair is dominated by
  an adjacent cross pair in between).
"""

from __future__ import annotations

import numpy as np

from comparador_de_registros_spark.functions import hashing as H


def shares_min_overlap(a: bytes, b: bytes, k: int, seed: int = 0) -> bool:
    """True iff ``a`` and ``b`` share a common substring of >= ``k``
    bytes — i.e. exactly the decision ``lcs_len(a, b) >= k``, but via
    one vectorized rolling k-gram hash pass per document plus a set
    intersection (O(n log n), ~100 us/pair) instead of a per-pair
    suffix array (~ms/pair). A false positive requires a 64-bit hash
    collision between the two documents' gram sets (~n*m/2^64 ≈ 1e-13
    per pair); :func:`lcs_len` is the exact reference — the brute-force
    oracle uses it, so the two methods cross-check each other on every
    fixture run."""
    if len(a) < k or len(b) < k:
        return False
    ha = H.rolling_kgram_hashes(a, k, seed)
    hb = H.rolling_kgram_hashes(b, k, seed)
    return bool(np.intersect1d(ha, hb).size)


def suffix_array_with_ranks(
    s: np.ndarray,
) -> tuple[np.ndarray, list[tuple[int, np.ndarray]]]:
    """Suffix array of an integer array by prefix doubling.

    -> (sa, levels) where ``levels`` is [(span, rank_at_span), ...] for
    span = 1, 2, 4, ...: ``rank_at_span[i]`` is the sort rank of
    ``s[i : i+span]``. The levels feed the vectorized LCP below.
    """
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64), []
    rank = np.unique(s, return_inverse=True)[1].astype(np.int64)
    levels: list[tuple[int, np.ndarray]] = [(1, rank)]
    k = 1
    sa = np.argsort(rank, kind="stable")
    while rank[sa[-1]] != n - 1 and k < n:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        sa = np.lexsort((key2, rank))
        r1, r2 = rank[sa], key2[sa]
        nr = np.zeros(n, dtype=np.int64)
        np.cumsum((r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1]), out=nr[1:])
        rank = np.empty(n, dtype=np.int64)
        rank[sa] = nr
        k *= 2
        levels.append((k, rank))
    return sa, levels


def _adjacent_lcps(
    n: int, sa: np.ndarray, levels: list[tuple[int, np.ndarray]]
) -> np.ndarray:
    """LCP of every SA-adjacent suffix pair, by binary lifting: walk the
    doubling levels from widest to narrowest, extending both cursors by
    ``span`` wherever the span-ranks agree."""
    i = sa[:-1].copy()
    j = sa[1:].copy()
    lcp = np.zeros(n - 1, dtype=np.int64)
    for span, rank in reversed(levels):
        ok = (
            (i + span <= n)
            & (j + span <= n)
            & (rank[np.minimum(i, n - 1)] == rank[np.minimum(j, n - 1)])
        )
        # cursors at n are exhausted; np.minimum only guards the gather
        ok &= (i < n) & (j < n)
        lcp[ok] += span
        i[ok] += span
        j[ok] += span
    return lcp


def lcs_len(a: bytes, b: bytes) -> int:
    """Byte length of the longest common substring of ``a`` and ``b``."""
    if not a or not b:
        return 0
    sa_b = np.frombuffer(a + b"\x00" + b, dtype=np.uint8)
    # the NUL separator cannot occur in normalized text, so no common
    # substring can span it; even if it did occur, LCP comparison stops
    # at the mismatching rank, keeping the result a true common run
    sa, levels = suffix_array_with_ranks(sa_b)
    n = len(sa_b)
    lcp = _adjacent_lcps(n, sa, levels)
    boundary = len(a)
    origin_a = sa < boundary  # suffixes starting inside a
    origin_b = sa > boundary  # inside b (position `boundary` is the NUL)
    cross = (origin_a[:-1] & origin_b[1:]) | (origin_b[:-1] & origin_a[1:])
    if not cross.any():
        return 0
    return int(lcp[cross].max())
