"""Fuzzy string ratios with rapidfuzz-compatible semantics.

The reference's address comparator uses ``rapidfuzz.fuzz.token_set_ratio``
scaled by a multiset-coverage factor, plus a set Jaccard
(/root/reference/src/comparators/logradouro/normalizacao.py:218-244).
rapidfuzz is not installed here; this module is a from-scratch
implementation of the published token_set_ratio algorithm on top of an
exact LCS-based InDel ratio (rapidfuzz's ``fuzz.ratio`` is the
normalized InDel similarity: ``(|a|+|b|-dist_indel)/(|a|+|b|) * 100``
with ``dist_indel = |a|+|b|-2*LCS``).

Pure Python on purpose: these run only inside Arrow-batched pandas UDFs
over short tokenized strings (addresses), never per-row through Spark's
Python UDF path. The set-Jaccard used by the *dedup verify* stage is a
native Column expression instead (operators/verify.py).
"""

from __future__ import annotations

from collections import Counter
from functools import lru_cache
from typing import Iterable


def _lcs_len_dp(a: str, b: str) -> int:
    """Longest common subsequence length (classic DP; inputs here are
    short sorted-token strings, so O(n*m) is fine inside a batch)."""
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b, start=1):
            cur.append(prev[j - 1] + 1 if ca == cb else max(prev[j], cur[-1]))
        prev = cur
    return prev[-1]


def indel_ratio(a: str, b: str) -> float:
    """Normalized InDel similarity in [0, 100] (rapidfuzz ``fuzz.ratio``)."""
    if not a and not b:
        return 100.0
    total = len(a) + len(b)
    if total == 0:
        return 100.0
    lcs = _lcs_len_dp(a, b)
    return 200.0 * lcs / total


@lru_cache(maxsize=1 << 14)
def _token_set_ratio_cached(s1: str, s2: str) -> float:
    t1 = set(s1.split())
    t2 = set(s2.split())
    if not t1 or not t2:
        return 0.0
    inter = sorted(t1 & t2)
    sect = " ".join(inter)
    c1 = (sect + " " + " ".join(sorted(t1 - t2))).strip()
    c2 = (sect + " " + " ".join(sorted(t2 - t1))).strip()
    return max(
        indel_ratio(sect, c1),
        indel_ratio(sect, c2),
        indel_ratio(c1, c2),
    )


def fuzz_token_set_ratio(s1: str, s2: str) -> float:
    """rapidfuzz ``fuzz.token_set_ratio`` semantics, [0, 100]."""
    return _token_set_ratio_cached(s1, s2)


def token_set_ratio(tokens1: Iterable[str], tokens2: Iterable[str]) -> float:
    """Reference wrapper: base token_set_ratio (0..1) scaled by multiset
    coverage = |multiset intersection| / max(len)
    (normalizacao.py:218-233 semantics)."""
    l1, l2 = list(tokens1), list(tokens2)
    if not l1 or not l2:
        return 0.0
    base = fuzz_token_set_ratio(" ".join(l1), " ".join(l2)) / 100.0
    inter = sum((Counter(l1) & Counter(l2)).values())
    coverage = inter / max(len(l1), len(l2))
    return base * coverage


def jaccard_ratio(tokens1: Iterable[str], tokens2: Iterable[str]) -> float:
    """Set Jaccard; 0 when either side is empty (normalizacao.py:236-244)."""
    s1, s2 = set(tokens1), set(tokens2)
    if not s1 or not s2:
        return 0.0
    return len(s1 & s2) / len(s1 | s2)


def levenshtein(a: str, b: str) -> int:
    """Edit distance (Python fallback; the data plane uses Spark's
    built-in ``F.levenshtein`` which is the same metric)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(min(cur[j - 1] + 1, prev[j] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]
