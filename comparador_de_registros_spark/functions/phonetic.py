"""American Soundex with the reference library's exact semantics.

The reference delegates to ``jellyfish.soundex`` and maps empty input to
``"0000"`` (/root/reference/src/util.py:67-71). jellyfish is not
installed here, so this is a from-scratch implementation of the same
published algorithm (Odell & Russell soundex with the H/W "transparent"
rule, as documented by the U.S. National Archives and implemented by
jellyfish). Pinned by golden tests (``soundex("bruno") == "B650"``,
``soundex("") == "0000"``, digit-leading strings pass the first char
through and encode nothing after — e.g. ``soundex("19900101") ==
"1000"``), because criterion 6 of the N/T comparators zips code
characters positionally (/root/reference/src/comparators/nomes.py:72-79).

Spark's built-in ``F.soundex`` does NOT match: it returns the input
unchanged when the first character is non-alphabetic, so this stays a
Python batch function used inside pandas UDFs (SURVEY.md §2.8, §7).
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

_CODES: dict[str, str] = {}
for _letters, _digit in (
    ("BFPV", "1"),
    ("CGJKQSXZ", "2"),
    ("DT", "3"),
    ("L", "4"),
    ("MN", "5"),
    ("R", "6"),
):
    for _ch in _letters:
        _CODES[_ch] = _digit


@lru_cache(maxsize=1 << 16)
def soundex(word: str) -> str:
    """4-char soundex code; ``"0000"`` for empty input."""
    if not word:
        return "0000"
    s = unicodedata.normalize("NFKD", word).upper()
    out = [s[0]]
    last = _CODES.get(s[0])
    for ch in s[1:]:
        code = _CODES.get(ch)
        if code is not None:
            if code != last:
                out.append(code)
            last = code
        elif ch not in ("H", "W"):
            # vowels (and any non-coded char except H/W) break runs
            last = None
        if len(out) == 4:
            break
    out.append("0" * (4 - len(out)))
    return "".join(out)


def soundex_similar_chars(a: str, b: str) -> int:
    """Positionally equal chars between two soundex codes (zip-truncated),
    mirroring the reference's criterion-6 comparison
    (/root/reference/src/comparators/nomes.py:75)."""
    return sum(1 for c1, c2 in zip(a, b) if c1 == c2)
