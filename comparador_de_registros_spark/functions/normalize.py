"""Canonical text normalization (``padroniza``) — Python + Spark-native.

Reproduces the reference's normalization semantics
(/root/reference/src/util.py:42-64): lowercase, accent-fold, strip
non-``[a-z0-9\\s]``, drop Portuguese particles (de/do/da/dos/das),
strip at most ONE kinship suffix from a fixed ordered list, trim.

Both variants below agree bit-for-bit (property-tested):

* :func:`padroniza` — plain Python, used in parity tests and inside
  pandas UDF batch loops.
* :func:`padroniza_col` — pure Column expression (lower/translate/
  regexp_replace/filter/array_join), JVM-side; this is what runs in the
  10^12-turn data plane.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from comparador_de_registros_spark.functions.unicode_fold import (
    fold_ascii,
    fold_ascii_col,
)

STOP_WORDS = ("de", "do", "da", "dos", "das")
# Reference order matters only when multiple suffixes could match; for
# this set suffix matches are position-unique, so an ordered regex
# alternation anchored at $ is equivalent to the reference's
# first-match-then-break loop (/root/reference/src/util.py:59-63).
KINSHIP_SUFFIXES = (
    "junior",
    "jr",
    "neto",
    "bisneto",
    "filho",
    "filha",
    "sobrinha",
    "sobrinho",
    "segundo",
    "terceiro",
)
_SUFFIX_RE = re.compile(r" (?:%s)$" % "|".join(KINSHIP_SUFFIXES))
_SUFFIX_RE_SQL = r" (%s)$" % "|".join(KINSHIP_SUFFIXES)
_NON_ALNUM_RE = re.compile(r"[^a-z0-9\s]")
# every ASCII char [^a-z0-9\s] would strip (Java \s = [ \t\n\x0B\f\r]):
# translate() deletes these ~6x faster than regexp_replace (measured
# 2.3s -> 0.4s over 50k docs); non-ASCII leftovers fall back to the
# regexp behind a single rlike probe.
_ASCII_STRIP = "".join(
    c
    for c in map(chr, range(128))
    if not ("a" <= c <= "z" or "0" <= c <= "9" or c in " \t\n\x0b\x0c\r")
)


def minusculo_sem_acento(s: str) -> str:
    """lowercase + trim + accent fold (util.py:42-44 semantics)."""
    return fold_ascii(s.lower().strip())


def minusculo_sem_acento_col(col: Column) -> Column:
    return fold_ascii_col(F.lower(F.trim(col)))


def padroniza(s: str) -> str:
    if not s or not s.strip():
        return ""
    out = minusculo_sem_acento(s)
    out = _NON_ALNUM_RE.sub("", out)
    out = " ".join(p for p in out.split() if p not in STOP_WORDS)
    out = _SUFFIX_RE.sub("", out, count=1)
    return out.strip()


def padroniza_col(col: Column) -> Column:
    """Spark-native ``padroniza``. Whole-stage-codegen friendly."""
    s = minusculo_sem_acento_col(col)
    # strip [^a-z0-9\s]: translate-delete for the ASCII repertoire (6x
    # cheaper than the regexp), regexp only for rows that still carry
    # non-ASCII after the fold. Character removal is order-independent
    # and the translate set is exactly the ASCII subset of the regexp
    # class, so the composition equals the single regexp bit-for-bit.
    s = F.translate(s, _ASCII_STRIP, "")
    s = F.when(
        s.rlike("[^\\x00-\\x7F]"), F.regexp_replace(s, r"[^a-z0-9\s]", "")
    ).otherwise(s)
    tokens = F.filter(
        F.split(s, r"\s+"),
        lambda t: (t != F.lit("")) & ~t.isin(*STOP_WORDS),
    )
    s = F.array_join(tokens, " ")
    s = F.regexp_replace(s, _SUFFIX_RE_SQL, "")
    return s
