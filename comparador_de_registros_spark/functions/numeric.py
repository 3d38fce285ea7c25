"""Locale-tolerant numeric parsing (pt-BR ``1.234,56`` vs ``1,234.56``).

Reproduces the reference's ``_normalize_numeric`` semantics
(/root/reference/src/comparators/numeros.py:17-52): unicode minus and
NBSP cleanup, space/underscore/apostrophe group separators, decide the
decimal separator by whichever of ``,``/``.`` appears last, repair
multi-dot leftovers, parse to ``Decimal`` (None when unparseable).

Kept in Python ``Decimal`` (inside pandas UDF batches) rather than
``DecimalType`` columns: the reference's tolerance/quantize rules are
defined in decimal arithmetic and the M comparator runs on *raw*
(un-normalized) strings (/root/reference/src/comparaRegistros.py:59-60),
so double rounding through a fixed-scale DecimalType would break parity.
"""

from __future__ import annotations

from decimal import Decimal, InvalidOperation


def parse_locale_number(value: str | None) -> Decimal | None:
    if value is None:
        return None
    s = value.strip()
    if not s:
        return None
    s = s.replace("−", "-").replace(" ", "")
    sign = ""
    if s[0] in "+-":
        sign, s = s[0], s[1:]
    s = s.replace(" ", "").replace("_", "").replace("'", "")
    if not s:
        return None
    if "," in s and "." in s:
        if s.rfind(",") > s.rfind("."):
            s = s.replace(".", "").replace(",", ".")
        else:
            s = s.replace(",", "")
    else:
        s = s.replace(",", ".")
    if s.count(".") > 1:
        head, _, tail = s.rpartition(".")
        s = head.replace(".", "") + "." + tail
    candidate = sign + s
    if candidate in {"+", "-", ".", ""}:
        return None
    try:
        return Decimal(candidate)
    except InvalidOperation:
        return None


def is_int_like(n: Decimal) -> bool:
    return n == n.to_integral_value()
