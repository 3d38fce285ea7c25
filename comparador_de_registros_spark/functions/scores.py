"""Typed field comparators — golden batch semantics.

One scoring function per reference field type, each returning a tuple of
per-criterion float scores (the reference's "pontos", kept numeric; the
pt-BR comma-string rendering happens only at the export edge —
:func:`format_score_br`). Weights, thresholds and quirks are normative
and reproduced bit-for-bit from the reference:

* ``N`` names      — /root/reference/src/comparators/nomes.py:18-93
* ``T`` free text  — /root/reference/src/comparators/texto.py:17-80
* ``D`` dates      — /root/reference/src/comparators/data.py:17-42
* ``C`` locality   — /root/reference/src/comparators/localidade.py:17-54
* ``L`` address    — /root/reference/src/comparators/logradouro/comparador.py:17-55
* ``M`` numbers    — /root/reference/src/comparators/numeros.py:67-115

Normative quirks carried over (SURVEY.md §7): ratios normalized by the
LEFT side's token count (asymmetric), duplicate-counting membership
intersection (not set intersection), elif-exclusive date criteria,
numbers compared on RAW un-normalized strings, zip-truncated positional
soundex comparison.

These functions are called only from Arrow-batched pandas UDFs
(operators/compare.py) and from parity/oracle tests — never through
Spark's row-at-a-time Python UDF path. The D and C comparators also
have fully native Column-expression twins in operators/compare.py.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal, InvalidOperation
from typing import Mapping, Sequence

from comparador_de_registros_spark.functions.address import parse_address
from comparador_de_registros_spark.functions.fuzzy import (
    jaccard_ratio,
    levenshtein,
    token_set_ratio,
)
from comparador_de_registros_spark.functions.phonetic import (
    soundex,
    soundex_similar_chars,
)

RARE_THRESHOLD = 5  # token counts below this are "rare" (nomes.py:49)
COMMON_THRESHOLD = 1000  # above this are "common" (nomes.py:61)

N_CRITERIA = {"N": 7, "T": 7, "D": 5, "C": 4, "L": 6, "M": 4}


def score_name(
    name1: str,
    name2: str,
    freq_maps: Sequence[Mapping[str, int]] | None = None,
    include_abbreviations: bool = True,
) -> tuple[float, ...]:
    """Tipo N: 7 criteria over pre-padronized names."""
    parts1 = name1.split()
    parts2 = name2.split()
    if not parts1 or not parts2:
        return (0.0,) * 7

    t1 = len(parts1)
    c_first = 1.0 if parts1[0] == parts2[0] else 0.0
    c_last = 1.0 if parts1[-1] == parts2[-1] else 0.0
    # duplicate-counting membership: each parts1 token scored against
    # parts2 membership (NOT set intersection) — nomes.py:41-44
    c_inter = sum(1 for f in parts1 if f in parts2) / t1

    c_rare = 0.0
    c_common = 0.0
    if freq_maps:
        first_map, middle_map, last_map = freq_maps
        positional = (
            [(first_map, parts1[0])]
            + [(middle_map, p) for p in parts1[1:-1]]
            + [(last_map, parts1[-1])]
        )
        c_rare = sum(1 for m, p in positional if m.get(p, 0) < RARE_THRESHOLD) / t1
        c_common = -(
            sum(1 for m, p in positional if m.get(p, 0) > COMMON_THRESHOLD) / t1
        )

    codes2 = [soundex(p) for p in parts2]
    similar = sum(
        1
        for p1 in parts1
        if any(soundex_similar_chars(soundex(p1), s2) >= 3 for s2 in codes2)
    )
    c_sound = (similar / t1) * 0.8

    c_abbrev = 0.0
    if include_abbreviations:
        hits = sum(
            1 for p1 in parts1 if len(p1) == 1 and any(p.startswith(p1) for p in parts2)
        ) + sum(
            1 for p2 in parts2 if len(p2) == 1 and any(p.startswith(p2) for p in parts1)
        )
        c_abbrev = (hits / t1) * 0.5

    return (c_first, c_last, c_inter, c_rare, c_common, c_sound, c_abbrev)


def _is_date_like_pair(parts1: list[str], parts2: list[str]) -> bool:
    return (
        len(parts1) == 1
        and len(parts2) == 1
        and len(parts1[0]) == 8
        and parts1[0].isdigit()
        and len(parts2[0]) == 8
        and parts2[0].isdigit()
    )


def score_text(
    text1: str, text2: str, freq: Mapping[str, int] | None = None
) -> tuple[float, ...]:
    """Tipo T: like N but one flat frequency map and a date-like guard
    that skips the frequency criteria (texto.py:39-57)."""
    freq = freq or {}
    parts1 = text1.split()
    parts2 = text2.split()
    if not parts1 or not parts2:
        return (0.0,) * 7

    t1 = len(parts1)
    c_first = 1.0 if parts1[0] == parts2[0] else 0.0
    c_last = 1.0 if parts1[-1] == parts2[-1] else 0.0
    c_inter = sum(1 for f in parts1 if f in parts2) / t1

    c_rare = 0.0
    c_common = 0.0
    if not _is_date_like_pair(parts1, parts2):
        c_rare = sum(1 for p in parts1 if freq.get(p, 0) < RARE_THRESHOLD) / t1
        c_common = -(sum(1 for p in parts1 if freq.get(p, 0) > COMMON_THRESHOLD) / t1)

    codes2 = {p2: soundex(p2) for p2 in parts2}
    similar = sum(
        1
        for p1 in parts1
        if any(soundex_similar_chars(soundex(p1), c2) >= 3 for c2 in codes2.values())
    )
    c_sound = (similar / t1) * 0.8

    hits = sum(
        1 for p1 in parts1 if len(p1) == 1 and any(p.startswith(p1) for p in parts2)
    ) + sum(
        1 for p2 in parts2 if len(p2) == 1 and any(p.startswith(p2) for p in parts1)
    )
    c_abbrev = (hits / t1) * 0.5

    return (c_first, c_last, c_inter, c_rare, c_common, c_sound, c_abbrev)


def score_date(d1: str, d2: str) -> tuple[float, ...]:
    """Tipo D: equality, 1-edit, and three mutually exclusive (elif)
    2-edit transposition checks on YYYYMMDD strings."""
    c_eq = 1.0 if d1 == d2 else 0.0
    c_lev1 = c_day = c_month = c_year = 0.0
    dist = levenshtein(d1, d2)
    if dist == 1:
        c_lev1 = 1.0
    elif dist == 2 and len(d1) == 8 and len(d2) == 8:
        y1, m1, day1 = d1[:4], d1[4:6], d1[6:]
        y2, m2, day2 = d2[:4], d2[4:6], d2[6:]
        if day1[::-1] == day2:
            c_day = 1.0
        elif m1[::-1] == m2:
            c_month = 1.0
        elif levenshtein(y1, y2) == 2 and sorted(y1) == sorted(y2):
            c_year = 1.0
    return (c_eq, c_lev1, c_day, c_month, c_year)


def score_locality(loc1: str, loc2: str) -> tuple[float, ...]:
    """Tipo C: 6-char UF+code, exact/1-edit/soundex ladder per part."""
    if len(loc1) != 6 or len(loc2) != 6:
        return (0.0,) * 4
    uf1, cod1 = loc1[:2].upper(), loc1[2:].upper()
    uf2, cod2 = loc2[:2].upper(), loc2[2:].upper()

    c_uf_eq = c_uf_near = 0.0
    if uf1 == uf2:
        c_uf_eq = 1.0
    elif levenshtein(uf1, uf2) == 1:
        c_uf_near = 0.5
    elif soundex(uf1) == soundex(uf2):
        c_uf_near = 0.3

    c_cod_eq = c_cod_near = 0.0
    if cod1 == cod2:
        c_cod_eq = 1.0
    else:
        dist = levenshtein(cod1, cod2)
        if dist == 1:
            c_cod_near = 0.8
        elif dist == 2:
            c_cod_near = 0.5
        elif not (cod1.isdigit() and cod2.isdigit()) and soundex(cod1) == soundex(cod2):
            c_cod_near = 0.4
    return (c_uf_eq, c_uf_near, c_cod_eq, c_cod_near)


def score_address(addr1: str, addr2: str) -> tuple[float, ...]:
    """Tipo L: structural parse then 6 weighted component similarities."""
    a1 = parse_address(addr1)
    a2 = parse_address(addr2)

    c_via_eq = 1.0 if a1.via and a1.via == a2.via else 0.0
    c_via_ratio = token_set_ratio(a1.via_tokens, a2.via_tokens) * 0.8
    if a1.numero and a2.numero and a1.numero == a2.numero:
        c_num = 1.0
    elif a1.numero == "sn" and a2.numero == "sn":
        c_num = 0.5
    else:
        c_num = 0.0
    c_compl = token_set_ratio(a1.complemento_tokens, a2.complemento_tokens) * 0.5
    c_full = token_set_ratio(a1.all_tokens, a2.all_tokens) * 0.8
    c_jacc = jaccard_ratio(a1.all_tokens, a2.all_tokens) * 0.5
    return (c_via_eq, c_via_ratio, c_num, c_compl, c_full, c_jacc)


def _clamp01(x: float) -> float:
    return 0.0 if x < 0 else 1.0 if x > 1 else x


def score_number(raw1: str, raw2: str) -> tuple[float, ...]:
    """Tipo M: operates on RAW strings (dispatch passes un-padronized
    values — comparaRegistros.py:59-60). Decimal arithmetic throughout."""
    from comparador_de_registros_spark.functions.numeric import (
        is_int_like,
        parse_locale_number,
    )

    n1 = parse_locale_number(raw1)
    n2 = parse_locale_number(raw2)
    if n1 is None or n2 is None:
        return (0.0,) * 4

    c_eq = 1.0 if n1 == n2 else 0.0
    diff = abs(n1 - n2)
    scale = max(abs(n1), abs(n2), Decimal("1"))

    both_int = is_int_like(n1) and is_int_like(n2)
    tolerance = Decimal("5") if both_int else max(scale * Decimal("0.05"), Decimal("0.01"))
    ratio_abs = min(diff / tolerance, Decimal("1")) if tolerance else Decimal("1")
    c_abs = _clamp01(float(Decimal("1") - ratio_abs))

    ratio_rel = min(diff / scale, Decimal("1")) if scale else Decimal("0")
    c_rel = _clamp01(float(Decimal("1") - ratio_rel))

    try:
        if both_int:
            same_bucket = diff <= 1
        else:
            precision = Decimal("0.01") if scale <= Decimal("1000") else Decimal("0.1")
            same_bucket = n1.quantize(precision, rounding=ROUND_HALF_UP) == n2.quantize(
                precision, rounding=ROUND_HALF_UP
            )
    except InvalidOperation:
        same_bucket = False
    c_bucket = 1.0 if same_bucket else 0.0

    return (c_eq, c_abs, c_rel, c_bucket)


def format_score_br(x: float) -> str:
    """pt-BR comma-decimal export rendering (export edge only; internal
    representation stays double). Totals use Decimal ROUND_HALF_UP like
    the reference's DFMT (comparaRegistros.py:22)."""
    return (
        format(Decimal(repr(x)).quantize(Decimal("0.00"), rounding=ROUND_HALF_UP), "f")
        .replace(".", ",")
    )
