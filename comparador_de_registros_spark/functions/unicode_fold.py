"""ASCII accent folding with identical Python and Spark-native variants.

The reference uses ``unidecode`` (a C-extension transliteration lib) to
strip accents before matching (/root/reference/src/util.py:42-44). That
library is not available here and would be a row-at-a-time Python call
anyway, so we implement the pt-BR-relevant subset two ways that agree
bit-for-bit with each other:

* :func:`fold_ascii` — Python batch version: NFKD-decompose, drop
  combining marks, apply a small special-case table (ss/ae/oe/...).
  Used inside pandas UDFs and as the parity oracle.
* :func:`fold_ascii_col` — pure Column expression: a ``translate`` over
  every Latin-1 Supplement / Latin Extended-A precomposed character
  whose NFKD decomposition collapses to one ASCII letter, preceded by
  ``regexp_replace`` for the multi-char specials and for already
  decomposed combining marks. JVM-side, codegen'd — the hot path.

For Latin-script pt-BR text (the reference's domain) this is equivalent
to unidecode; exotic scripts fold to themselves minus combining marks,
which the downstream ``[^a-z0-9\\s]`` strip then removes — matching the
reference pipeline's observable behavior after ``padroniza``.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

# Multi-character transliterations translate() cannot express (1:1 only).
_MULTI = {
    "ß": "ss",  # ß
    "ẞ": "SS",  # ẞ
    "æ": "ae",  # æ
    "Æ": "AE",
    "œ": "oe",  # œ
    "Œ": "OE",
    "þ": "th",  # þ
    "Þ": "TH",
}
# 1:1 foldings NFKD does not produce (no canonical decomposition).
_SINGLE = {
    "Ø": "O",  # Ø
    "ø": "o",
    "Đ": "D",  # Đ
    "đ": "d",
    "Ð": "D",  # Ð
    "ð": "d",
    "Ł": "L",  # Ł
    "ł": "l",
    "ı": "i",  # ı
}


def _build_translate_table() -> tuple[str, str]:
    """Precomposed char -> single ASCII via NFKD, over Latin-1
    Supplement (incl. ordinal indicators º/ª and superscript digits),
    Latin Extended-A/B, and Latin Extended Additional (Vietnamese)."""
    src: list[str] = []
    dst: list[str] = []
    for lo, hi in ((0x00A0, 0x0250), (0x1E00, 0x1F00)):
        for cp in range(lo, hi):
            ch = chr(cp)
            if ch in _MULTI or ch in _SINGLE:
                continue
            decomp = unicodedata.normalize("NFKD", ch)
            base = "".join(c for c in decomp if not unicodedata.combining(c))
            if len(base) == 1 and base != ch and base.isascii() and base.isalnum():
                src.append(ch)
                dst.append(base)
    for ch, base in _SINGLE.items():
        src.append(ch)
        dst.append(base)
    return "".join(src), "".join(dst)


_TRANSLATE_SRC, _TRANSLATE_DST = _build_translate_table()
_FOLD_1TO1 = dict(zip(_TRANSLATE_SRC, _TRANSLATE_DST))
# Combining diacritical marks (covers NFD'd input the translate misses).
_COMBINING_RE = "[̀-ͯ]"


@lru_cache(maxsize=8192)
def _fold_char(ch: str) -> str:
    """Mirrors the Spark expression EXACTLY: the shared 1:1 table, the
    multi-char specials, and combining-mark removal — chars outside the
    tables pass through unchanged on BOTH sides (the downstream
    ``[^a-z0-9\\s]`` strip then removes them identically)."""
    if ch in _MULTI:
        return _MULTI[ch]
    if ch in _FOLD_1TO1:
        return _FOLD_1TO1[ch]
    if "̀" <= ch <= "ͯ":
        return ""
    return ch


def fold_ascii(s: str) -> str:
    """Python golden implementation (batch path / parity oracle)."""
    if not s:
        return s
    if s.isascii():
        return s
    return "".join(_fold_char(ch) for ch in s)


def fold_ascii_col(col: Column) -> Column:
    """Spark-native equivalent of :func:`fold_ascii` (no UDF).

    One regexp pass for multi-char specials, one ``translate`` for the
    ~180 precomposed chars, one regexp to drop stray combining marks —
    all guarded behind a single non-ASCII probe: for a pure-ASCII
    string every one of those passes is an identity (NFKD of ASCII is
    ASCII, the special/combining characters cannot occur), so the
    CaseWhen short-circuits ~10 full string scans down to one on the
    (overwhelmingly common) ASCII rows. Bit-for-bit equal to
    :func:`fold_ascii` either way (property-tested)."""
    out = col
    for ch, repl in _MULTI.items():
        out = F.regexp_replace(out, ch, repl)
    out = F.translate(out, _TRANSLATE_SRC, _TRANSLATE_DST)
    out = F.regexp_replace(out, _COMBINING_RE, "")
    return F.when(col.rlike("[^\\x00-\\x7F]"), out).otherwise(col)
