"""Brazilian street-address normalization (tipo ``L``).

Reproduces the reference's tokenizer + structural parser semantics
(/root/reference/src/comparators/logradouro/normalizacao.py:118-215):
accent-fold + lowercase, punctuation/ordinal cleanup, split glued
digit-letter pairs, canonicalize abbreviations through three lexicons
(street type, complement, number marker), map s/n variants to a
no-number sentinel, drop address particles, then a small state machine
that assigns tokens to via / numero / complemento.

Pure Python: runs only inside Arrow-batched pandas UDFs. The lexicons
are *data* mandated by the reference semantics; they are stored here
inverted (canonical -> aliases) and expanded at import.
"""

from __future__ import annotations

import re
from typing import NamedTuple

from comparador_de_registros_spark.functions.unicode_fold import fold_ascii

_PARTICLES = frozenset({"de", "da", "do", "das", "dos", "e"})

# canonical -> accepted aliases (aliases include the canonical itself)
_STREET_TYPES = {
    "avenida": ("av", "avd", "aven", "ave", "avenida"),
    "alameda": ("al", "alm", "alameda"),
    "rua": ("r", "rua"),
    "rodovia": ("rod", "rodovia"),
    "estrada": ("estr", "est", "estrada"),
    "travessa": ("tv", "trav", "travessa"),
    "praca": ("pc", "prac", "praca"),
    "largo": ("lgo", "largo"),
    "vila": ("vl", "vila"),
    "jardim": ("jd", "jardim"),
    "parque": ("pq", "pqe", "parque"),
}
_COMPLEMENTS = {
    "apto": ("ap", "apt", "apto", "apartamento", "apart"),
    "bloco": ("bl", "blc", "bloco", "blocos"),
    "conjunto": ("cj", "cjto", "conj", "conjunto"),
    "sala": ("sala", "sl"),
    "casa": ("casa", "cs"),
    "andar": ("andar",),
    "quadra": ("qd", "quadra"),
    "lote": ("lt", "lote"),
    "fundos": ("fundos",),
    "frente": ("frente",),
    "galpao": ("galpao",),
    "box": ("box",),
}
_NUMBER_MARKERS = ("n", "no", "num", "numero", "nro", "nr", "nro.")
_NO_NUMBER = frozenset({"sn", "s", "semnumero", "sem_numero", "semn"})

_ALIAS_TO_CANONICAL: dict[str, str] = {}
for _canon, _aliases in {**_STREET_TYPES, **_COMPLEMENTS}.items():
    for _a in _aliases:
        _ALIAS_TO_CANONICAL[_a] = _canon
for _a in _NUMBER_MARKERS:
    _ALIAS_TO_CANONICAL[_a] = "numero"

_COMPLEMENT_MARKERS = frozenset(_COMPLEMENTS.keys())
_SINGLE_LETTER_AFTER = frozenset(
    {"bloco", "casa", "apto", "quadra", "lote", "andar", "box"}
)

_PUNCT_TO_SPACE = re.compile(r"[#'\"()\[\]{}]")
_SEPARATORS = re.compile(r"[.,;:\-/\\]")
_DIGIT_LETTER = re.compile(r"(\d+)([a-z])")
_LETTER_DIGIT = re.compile(r"([a-z])(\d+)")
_WS = re.compile(r"\s+")


def tokenize_address(value: str) -> list[str]:
    if not value:
        return []
    txt = fold_ascii(value.lower())
    for ordinal in ("º", "°", "ª"):
        txt = txt.replace(ordinal, " ")
    txt = _PUNCT_TO_SPACE.sub(" ", txt)
    txt = _SEPARATORS.sub(" ", txt)
    txt = _DIGIT_LETTER.sub(r"\1 \2", txt)
    txt = _LETTER_DIGIT.sub(r"\1 \2", txt)
    txt = _WS.sub(" ", txt).strip()
    if not txt:
        return []
    out: list[str] = []
    for raw in txt.split():
        tok = _ALIAS_TO_CANONICAL.get(raw, raw)
        if tok in _NO_NUMBER:
            tok = "semnumero"
        if tok in _PARTICLES:
            continue
        out.append(tok)
    return out


class ParsedAddress(NamedTuple):
    via: str
    via_tokens: list[str]
    numero: str
    complemento: str
    complemento_tokens: list[str]
    all_tokens: list[str]


_EMPTY = ParsedAddress("", [], "", "", [], [])


def parse_address(value: str) -> ParsedAddress:
    """State machine assigning tokens to via / numero / complemento
    (normalizacao.py:158-215 semantics: first bare digit run becomes the
    street number with leading zeros stripped, later digits and anything
    after a complement marker / 'numero' keyword become complement;
    single letters are kept only after markers or in complement mode)."""
    tokens = tokenize_address(value)
    if not tokens:
        return _EMPTY

    via: list[str] = []
    compl: list[str] = []
    numero = ""
    in_complement = False
    marker: str | None = None

    for tok in tokens:
        if tok == "numero":
            in_complement, marker = True, None
            continue
        if tok == "semnumero":
            numero = "sn"
            in_complement, marker = True, None
            continue
        if tok.isdigit():
            stripped = tok.lstrip("0") or "0"
            if numero:
                compl.append(stripped)
            else:
                numero = stripped
            in_complement, marker = True, None
            continue
        if tok in _COMPLEMENT_MARKERS:
            compl.append(tok)
            in_complement, marker = True, tok
            continue
        if len(tok) == 1 and (marker in _SINGLE_LETTER_AFTER or in_complement):
            compl.append(tok)
            continue
        (compl if in_complement else via).append(tok)
        marker = None

    all_tokens = list(via)
    if numero:
        all_tokens.append(numero)
    all_tokens.extend(compl)
    return ParsedAddress(
        via=" ".join(via),
        via_tokens=via,
        numero=numero,
        complemento=" ".join(compl),
        complemento_tokens=compl,
        all_tokens=all_tokens,
    )
