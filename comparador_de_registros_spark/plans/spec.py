"""Declarative compare plans.

The reference's logical plan is the ``pares`` list of
``(idx1, idx2, tipo, nome)`` tuples dispatched per row
(/root/reference/src/comparaRegistros.py:205-222). Here the plan is a
named, typed :class:`CompareSpec` over DataFrame columns; the engine
(operators/compare.py) lowers it onto a DataFrame lineage that Catalyst
plans (scan -> normalize -> freq join -> score exprs/UDFs -> sort).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum


class FieldType(str, Enum):
    TEXT = "T"
    NAME = "N"
    DATE = "D"
    LOCALITY = "C"
    ADDRESS = "L"
    NUMBER = "M"

    @classmethod
    def parse(cls, code: str) -> "FieldType":
        code = (code or "T").upper()
        # legacy alias: 'E' (endereço) means address (gui.py:401-408)
        if code == "E":
            code = "L"
        try:
            return cls(code)
        except ValueError:
            return cls.TEXT

    @classmethod
    def parse_with_context(cls, code: str, column_name: str) -> "FieldType":
        """Reference-parity tipo parsing: user code + column-name guess
        conflict resolution (normalize_tipo_code, gui.py:401-424)."""
        return cls.parse(normalize_tipo_code(code, column_name))


# criterion column suffixes per type; the pt-BR labels mirror the
# reference's output headers (comparators/core.py:55-101) so a user of
# the reference can map columns 1:1.
CRITERIA: dict[FieldType, tuple[str, ...]] = {
    FieldType.NAME: (
        "prim_frag_igual", "ult_frag_igual", "qtd_frag_iguais",
        "qtd_frag_raros", "qtd_frag_comuns", "qtd_frag_muito_parec",
        "qtd_frag_abrev",
    ),
    FieldType.TEXT: (
        "prim_frag_igual", "ult_frag_igual", "qtd_frag_iguais",
        "qtd_frag_raros", "qtd_frag_comuns", "qtd_frag_muito_parec",
        "qtd_frag_abrev",
    ),
    FieldType.DATE: (
        "dt_iguais", "dt_ap_1digi", "dt_inv_dia", "dt_inv_mes", "dt_inv_ano",
    ),
    FieldType.LOCALITY: (
        "uf_igual", "uf_prox", "local_igual", "local_prox",
    ),
    FieldType.ADDRESS: (
        "via_igual", "via_prox", "numero_igual", "compl_prox",
        "texto_prox", "tokens_jacc",
    ),
    FieldType.NUMBER: (
        "num_igual", "num_prox_abs", "num_prox_rel", "num_prox_arred",
    ),
}


@dataclass(frozen=True)
class ComparePair:
    """One typed column-pair comparison: columns ``left`` and ``right``
    of a pairs DataFrame, compared as ``field_type``, labeled ``name``."""

    left: str
    right: str
    field_type: FieldType
    name: str

    def criterion_columns(self) -> list[str]:
        return [f"{self.name}_{c}" for c in CRITERIA[self.field_type]]


@dataclass(frozen=True)
class CompareSpec:
    """A full compare plan: ordered pairs + global knobs."""

    pairs: tuple[ComparePair, ...]
    include_abbreviations: bool = True
    # processar (legacy path) guards names non-empty / dates len 8;
    # processar_generico does not (SURVEY.md §3.2). Default = generic.
    legacy_empty_guards: bool = False
    total_column: str = "nota_final"

    def criterion_columns(self) -> list[str]:
        cols: list[str] = []
        for p in self.pairs:
            cols.extend(p.criterion_columns())
        return cols


def criteria_labels(spec: CompareSpec) -> list[str]:
    """Output criterion labels incl. the total — the Spark analogue of
    ``build_criterios_labels`` (core.py:55-101)."""
    return spec.criterion_columns() + [spec.total_column]


# --- reference-parity tipo guessing + conflict resolution ------------------
# gui.py:252-424 verbatim semantics: the GUI guesses a tipo from the
# column name and reconciles it against the user's declared code. Ported
# fully (round-1 carried only the E->L alias): L-vs-C disambiguation,
# C-vs-L/T fallbacks, T->M promotion.

_LOCALIDADE_SPECIFIC_PATTERNS = (
    "cod_localidade", "codigo_localidade", "codlocalidade", "cod_local",
    "codigo_local", "cod_ibge", "codigo_ibge", "codmunicipio",
    "cod_municipio", "codigo_municipio", "codmun", "cod_mun", "codcidade",
    "codigo_cidade",
)
_LOCALIDADE_SCOPE_HINTS = ("localidade", "local", "municip", "cidade", "ibge")
_LOCALIDADE_CODE_HINTS = ("cod", "codigo", "code", "id")
_LOGRADOURO_HINTS = (
    "logradouro", "endereco", "endereço", "avenida", "av", "rua",
    "travessa", "estrada", "rodovia", "alameda", "praca", "praça",
    "largo", "bairro", "quadra", "lote", "bloco", "casa", "apto",
)
_LOGRADOURO_TOKENS = {
    "rua", "avenida", "av", "travessa", "estrada", "logradouro",
    "endereco", "apto", "bloco", "quadra", "lote", "bairro",
}
_NUMERIC_KEYWORDS = (
    "ano", "anos", "mes", "meses", "dia", "dias", "idade", "numero",
    "num", "valor", "quantidade", "qtd", "qtde", "percentual", "percent",
    "porcentagem", "taxa", "indice", "nota", "pontuacao", "pontos",
    "score", "total", "saldo",
)
_NUMERIC_PREFIXES = ("num_", "valor_", "vl_", "vlr_", "qtd_", "qtde_", "vlr", "vl")
_NUMERIC_SUFFIXES = (
    "_ano", "_anos", "_mes", "_meses", "_dia", "_dias", "_idade",
    "_numero", "_num", "_valor", "_quantidade", "_qtd", "_qtde", "_total",
)


def _looks_like_logradouro_name(nome_lower: str) -> bool:
    """gui.py:361-380"""
    base = nome_lower.replace("_", " ").replace("-", " ")
    tokens = set(base.split())
    if any(hint in nome_lower for hint in _LOGRADOURO_HINTS):
        return True
    return bool(tokens & _LOGRADOURO_TOKENS)


def _looks_like_localidade_name(nome_lower: str) -> bool:
    """gui.py:349-359"""
    nome_lower = nome_lower.replace(" ", "")
    if any(p in nome_lower for p in _LOCALIDADE_SPECIFIC_PATTERNS):
        return True
    return any(s in nome_lower for s in _LOCALIDADE_SCOPE_HINTS) and any(
        c in nome_lower for c in _LOCALIDADE_CODE_HINTS
    )


def _looks_like_numeric_name(nome_lower: str) -> bool:
    """gui.py:382-398"""
    compact = re.sub(r"[\s_\-]", "", nome_lower)
    if not compact:
        return False
    if re.fullmatch(r"[+-]?\d+", compact):
        return True
    tokens = [tok for tok in re.findall(r"[a-z]+|\d+", nome_lower) if tok]
    if any(tok.isdigit() for tok in tokens):
        return True
    if any(tok in _NUMERIC_KEYWORDS for tok in tokens):
        return True
    if any(nome_lower.startswith(p) for p in _NUMERIC_PREFIXES):
        return True
    return any(nome_lower.endswith(s) for s in _NUMERIC_SUFFIXES)


def guess_tipo_code(nome: str) -> str:
    """Column-name tipo guess, reference priority order (gui.py:336-347):
    logradouro > localidade > date > numeric > text."""
    lower = nome.strip().lower()
    if _looks_like_logradouro_name(lower):
        return "L"
    if _looks_like_localidade_name(lower):
        return "C"
    if any(k in lower for k in ("data", "nasc", "dt")):
        return "D"
    if _looks_like_numeric_name(lower):
        return "M"
    return "T"


def normalize_tipo_code(tipo_raw: str, column_name: str) -> str:
    """Reconcile a user-declared tipo against the column-name guess
    (gui.py:401-424): E aliases L; a declared L column that looks like a
    locality/number becomes C/M; a declared C that doesn't look like a
    locality falls back to the guess (L or M) or T; a declared T on a
    numeric-looking column is promoted to M."""
    code = (tipo_raw or "").strip().upper()
    if not code:
        return ""
    guess = guess_tipo_code(column_name)
    if code == "E":
        return "L"
    if code == "L":
        if guess == "C":
            return "C"
        if guess == "M":
            return "M"
        return "L"
    if code == "C":
        if guess in {"C", "L"}:
            return guess
        if guess == "M":
            return "M"
        return "T"
    if code == "T" and guess == "M":
        return "M"
    if code == "M":
        return "M"
    return code


# --- config-time type inference (gui.py:252-424, condensed) ---------------

_DATE_HINTS = ("nasc", "data", "dt_", "_dt", "date", "dtnasc", "dn")
_ADDRESS_HINTS = ("lograd", "endere", "rua", "aven", "address", "street")
_LOCALITY_HINTS = ("municip", "cidade", "local", "codmun", "mun_")
_NAME_HINTS = ("nome", "nm_", "name", "mae", "pai", "paciente")
_NUMBER_HINTS = ("num", "valor", "qtd", "peso", "idade", "renda", "cep")


def spec_from_openreclink_header(
    columns: list[str],
    type_overrides: dict[str, FieldType] | None = None,
) -> CompareSpec:
    """Build a CompareSpec from an OpenRecLink-style paired header.

    The reference GUI splits ``R_<base>`` / ``C_<base>`` column names
    into (side, base name) and pairs every base present on both sides
    (/root/reference/src/gui.py:427-448, prepare_column_maps :64-185);
    field types default to the name-based inference below with optional
    per-base overrides. Pairs are emitted in first-appearance order.
    """
    overrides = type_overrides or {}
    sides: dict[str, dict[str, str]] = {}
    order: list[str] = []
    for col in columns:
        m = re.match(r"^([RC])_(.+)$", col.strip(), flags=re.IGNORECASE)
        if not m:
            continue
        side, base = m.group(1).upper(), m.group(2)
        key = base.lower()
        sides.setdefault(key, {})[side] = col
        if key not in order:
            order.append(key)
    pairs = []
    for key in order:
        if {"R", "C"} <= set(sides[key]):
            ftype = overrides.get(key, infer_field_type(key))
            pairs.append(
                ComparePair(sides[key]["R"], sides[key]["C"], ftype, key)
            )
    return CompareSpec(pairs=tuple(pairs))


def infer_field_type(column_name: str) -> FieldType:
    """Heuristic default type from a column name — config-time helper
    only (the reference GUI's guess tables, gui.py:252-398); never used
    in the data plane."""
    n = column_name.strip().lower()
    n = re.sub(r"^[rc]_", "", n)  # OpenRecLink side prefix (gui.py:427-439)
    if any(h in n for h in _DATE_HINTS):
        return FieldType.DATE
    if any(h in n for h in _ADDRESS_HINTS):
        return FieldType.ADDRESS
    if any(h in n for h in _LOCALITY_HINTS):
        return FieldType.LOCALITY
    if any(h in n for h in _NAME_HINTS):
        return FieldType.NAME
    if any(h in n for h in _NUMBER_HINTS):
        return FieldType.NUMBER
    return FieldType.TEXT
