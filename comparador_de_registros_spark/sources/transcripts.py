"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Generates the BASELINE.json input_hint table
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` with planted duplicate structure, fully distributed:
the driver only decides *counts*; every turn is derived inside
``mapInPandas`` from a per-conversation seed (splitmix of the conv
index), so generation scales with the cluster and two runs are
byte-identical.

Planted classes (one per base conversation, chosen by ``base % 10``):
* 0,1     -> exact duplicate (copy under a new conv_id)
* 2,3     -> near duplicate (1-2 token edits per a few turns: accent/
             abbreviation/one-digit-date changes mirroring the
             reference comparators)
* 4       -> substring duplicate (base embedded contiguously in a
             longer conversation — full containment)
* 5       -> turn-reordered decoy (same turns, shuffled turn_idx) —
             NOT a duplicate under stable-order assembly
* 6       -> partial-overlap duplicate (a long contiguous block of the
             base inside a conversation with different pre/post turns —
             NEITHER doc contains the other; exercises the suffix-array
             LCS verify, Jaccard lands well under the threshold)
* 7-9     -> singleton noise

Ground truth (``truth_pairs``/``truth_clusters``) is derived from the
same arithmetic, driver-side (tiny).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TURNS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

_FIRST = ["ana", "joao", "maria", "carlos", "paula", "bruno", "carla", "jose", "lucia", "pedro"]
_LAST = ["silva", "souza", "oliveira", "santos", "pereira", "costa", "almeida", "rocha"]
_DOMAIN_WORDS = (
    "consulta paciente registro sistema cadastro hospital resultado exame "
    "agendamento retorno receita medicamento dosagem historico relatorio "
    "atendimento prontuario liberado pendente confirmado aguardando analise "
    "verificar atualizar endereco telefone contato responsavel unidade setor"
).split()


def _build_vocab(size: int = 1600, seed: int = 7) -> list[str]:
    """Deterministic pseudo-word vocabulary. Real transcripts draw from
    tens of thousands of distinct words; a tiny vocabulary makes every
    random conversation pair share most shingles (pathologically high
    background Jaccard) and melts LSH into an all-pairs join, so the
    fixture must have realistic lexical entropy."""
    onsets = ["b", "c", "d", "f", "g", "j", "l", "m", "n", "p", "r", "s", "t", "v", "br", "cl", "fr", "gr", "pr", "tr"]
    nuclei = ["a", "e", "i", "o", "u", "ao", "ei", "ia", "ou"]
    codas = ["", "l", "m", "n", "r", "s", "z"]
    rng = np.random.default_rng(seed)
    vocab: set[str] = set(_DOMAIN_WORDS)
    while len(vocab) < size:
        n_syll = int(rng.integers(2, 4))
        word = "".join(
            onsets[int(rng.integers(0, len(onsets)))]
            + nuclei[int(rng.integers(0, len(nuclei)))]
            + (codas[int(rng.integers(0, len(codas)))] if s == n_syll - 1 else "")
            for s in range(n_syll)
        )
        vocab.add(word)
    return sorted(vocab)


_WORDS = _build_vocab()
_STREETS = ["rua das flores", "av brasil", "travessa alpha", "rua dos andradas", "al santos"]
_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["", "", "", "lookup", "scheduler"]

MODULUS = 10
KIND_EXACT = (0, 1)
KIND_NEAR = (2, 3)
KIND_SUBSTRING = (4,)
KIND_DECOY = (5,)
KIND_OVERLAP = (6,)


@dataclass(frozen=True)
class TranscriptSpec:
    n_base: int = 200
    seed: int = 42
    min_turns: int = 6
    max_turns: int = 14
    min_words: int = 5
    max_words: int = 9


def _conv_rng(spec: TranscriptSpec, index: int) -> np.random.Generator:
    return np.random.default_rng((spec.seed << 20) ^ index)


def _base_turns(spec: TranscriptSpec, base: int) -> list[str]:
    """The turn texts of base conversation ``base`` (deterministic).

    Word counts per turn are biased by the base's planted class so each
    class exercises what it is for at the default shingle config:
    decoy-class conversations get SHORT turns (turn reordering then
    rewrites a large fraction of char shingles -> clearly below the
    Jaccard threshold), near-dup-class get LONG turns (token edits stay
    a small fraction -> clearly above it)."""
    rng = _conv_rng(spec, base)
    n_turns = int(rng.integers(spec.min_turns, spec.max_turns + 1))
    kind = truth_kind(base)
    if kind == "decoy":
        lo, hi = 3, 4
    elif kind == "near":
        lo, hi = spec.max_words, spec.max_words + 4
    elif kind == "overlap":
        # long turns so the shared block (all but the first turn) is
        # safely above substring.min_overlap bytes even at min_turns
        lo, hi = spec.max_words + 2, spec.max_words + 6
    else:
        lo, hi = spec.min_words, spec.max_words
    turns = []
    for t in range(n_turns):
        n_words = int(rng.integers(lo, hi + 1))
        words = list(rng.choice(_WORDS, size=n_words))
        # sprinkle reference-comparator-shaped tokens (FIXTURES.md §1)
        roll = int(rng.integers(0, 6))
        if roll == 0:
            words.append(f"{rng.choice(_FIRST)} {rng.choice(_LAST)}")
        elif roll == 1:
            words.append(
                f"{1950 + int(rng.integers(0, 70)):04d}"
                f"{int(rng.integers(1, 13)):02d}{int(rng.integers(1, 29)):02d}"
            )
        elif roll == 2:
            words.append(f"{rng.choice(_STREETS)} {int(rng.integers(1, 999))}")
        elif roll == 3:
            words.append(f"SP{int(rng.integers(1000, 9999))}")
        turns.append(" ".join(words))
    return turns


def _near_dup_turns(spec: TranscriptSpec, base: int) -> list[str]:
    """1-2 light token edits on a copy (abbreviation, digit typo)."""
    turns = _base_turns(spec, base)
    rng = _conv_rng(spec, base + 7_000_003)
    for _ in range(2):
        ti = int(rng.integers(0, len(turns)))
        toks = turns[ti].split()
        if not toks:
            continue
        wi = int(rng.integers(0, len(toks)))
        tok = toks[wi]
        if tok.isdigit() and len(tok) >= 2:
            toks[wi] = tok[:-1] + str((int(tok[-1]) + 1) % 10)
        elif len(tok) > 3:
            toks[wi] = tok[0] + "."
        turns[ti] = " ".join(toks)
    return turns


def _dup_plan(spec: TranscriptSpec, base: int) -> tuple[str, list[str]] | None:
    """-> (dup kind, dup conversation turn texts) for a base index."""
    kind = base % MODULUS
    if kind in KIND_EXACT:
        return "exact", _base_turns(spec, base)
    if kind in KIND_NEAR:
        return "near", _near_dup_turns(spec, base)
    if kind in KIND_SUBSTRING:
        rng = _conv_rng(spec, base + 11_000_027)
        pre = _base_turns(spec, int(rng.integers(0, 1 << 30)) + 900_000_000)[:2]
        post = _base_turns(spec, int(rng.integers(0, 1 << 30)) + 950_000_000)[:2]
        return "substring", pre + _base_turns(spec, base) + post
    if kind in KIND_DECOY:
        turns = _base_turns(spec, base)
        rng = _conv_rng(spec, base + 13_000_033)
        perm = rng.permutation(len(turns))
        # guarantee an actual reordering
        if len(turns) > 1 and (perm == np.arange(len(turns))).all():
            perm = np.roll(perm, 1)
        return "decoy", [turns[i] for i in perm]
    if kind in KIND_OVERLAP:
        # shared block = base minus its FIRST turn, wrapped in fresh
        # pre/post turns: base has a turn the dup lacks and vice versa,
        # so neither normalized doc contains the other; the block stays
        # contiguous in both (LCS >= min_overlap catches it)
        rng = _conv_rng(spec, base + 19_000_093)
        pre = _base_turns(spec, int(rng.integers(0, 1 << 30)) + 850_000_000)[:2]
        post = _base_turns(spec, int(rng.integers(0, 1 << 30)) + 870_000_000)[:2]
        return "overlap", pre + _base_turns(spec, base)[1:] + post
    return None


def base_conv_id(i: int) -> str:
    return f"conv_{i:08d}"


def dup_conv_id(i: int) -> str:
    return f"dup_{i:08d}"


def generate_transcripts(spark: SparkSession, spec: TranscriptSpec) -> DataFrame:
    """Distributed deterministic generation of turns for all base
    conversations + their planted derivatives."""
    bspec = spark.sparkContext.broadcast(spec)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sp: TranscriptSpec = bspec.value
        base_ts = pd.Timestamp("2025-01-01T00:00:00")
        for pdf in batches:
            rows: list[tuple] = []
            for base in pdf["id"].astype(int):
                emit: list[tuple[str, list[str]]] = [
                    (base_conv_id(base), _base_turns(sp, base))
                ]
                plan = _dup_plan(sp, base)
                if plan is not None:
                    emit.append((dup_conv_id(base), plan[1]))
                rng = _conv_rng(sp, base + 17_000_131)
                for conv_id, turns in emit:
                    t0 = base_ts + pd.Timedelta(seconds=int(base) * 997)
                    for idx, text in enumerate(turns):
                        role = _ROLES[idx % len(_ROLES)]
                        tool = _TOOLS[int(rng.integers(0, len(_TOOLS)))]
                        rows.append(
                            (
                                conv_id,
                                idx,
                                role,
                                text,
                                tool if role == "tool" else "",
                                t0 + pd.Timedelta(seconds=idx),
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
            )

    n_part = max(2, min(spec.n_base // 64, 256))
    return (
        spark.range(spec.n_base)
        .repartition(n_part)
        .mapInPandas(gen, TURNS_SCHEMA)
    )


DUP_KINDS = ("exact", "near", "substring", "overlap")


def truth_kind(base: int) -> str | None:
    k = base % MODULUS
    if k in KIND_EXACT:
        return "exact"
    if k in KIND_NEAR:
        return "near"
    if k in KIND_SUBSTRING:
        return "substring"
    if k in KIND_DECOY:
        return "decoy"
    if k in KIND_OVERLAP:
        return "overlap"
    return None


def truth_pairs(spark: SparkSession, spec: TranscriptSpec) -> DataFrame:
    """Planted TRUE duplicate pairs (decoys and singletons excluded).
    -> (a, b, kind) with a < b."""
    rows = []
    for base in range(spec.n_base):
        kind = truth_kind(base)
        if kind in DUP_KINDS:
            a, b = sorted((base_conv_id(base), dup_conv_id(base)))
            rows.append((a, b, kind))
    return spark.createDataFrame(rows, ["a", "b", "kind"])


def truth_clusters(spark: SparkSession, spec: TranscriptSpec) -> DataFrame:
    """Planted cluster assignment: each true dup pair forms a 2-cluster
    labeled by its minimum conv_id; all other conversations are
    singletons. -> (conv_id, cluster_id)"""
    rows = []
    for base in range(spec.n_base):
        kind = truth_kind(base)
        cid = base_conv_id(base)
        if kind in DUP_KINDS:
            did = dup_conv_id(base)
            root = min(cid, did)
            rows.append((cid, root))
            rows.append((did, root))
        else:
            rows.append((cid, cid))
            if kind == "decoy":
                rows.append((dup_conv_id(base), dup_conv_id(base)))
    return spark.createDataFrame(rows, ["conv_id", "cluster_id"])
