"""Conversation assembly: turns -> documents.

Input is the transcript table mandated by BASELINE.json.input_hint
(``conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp``). A conversation document is the concatenation of turn
texts in stable ``turn_idx`` order — the per-row invariant ("per-turn
text equality under stable turn ordering") that turn-reordered decoys
must NOT satisfy.

Implementation note (scale): ``array_sort(collect_list(struct(...)))``
inside a single hash aggregation instead of a window + collect_list —
one shuffle on conv_id, no window state, map-side partial aggregation.
Struct sort orders by field position, so turn_idx leads the struct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TURN_SEPARATOR = "\n"


def assemble_conversations(
    turns: DataFrame,
    sep: str = TURN_SEPARATOR,
    include_role: bool = False,
    max_turns: int | None = None,
) -> DataFrame:
    """-> (conv_id, doc, n_turns, n_chars[, truncated])

    ``doc`` is the turn texts joined in turn_idx order. With
    ``include_role`` each turn is rendered ``role: text`` (useful for
    role-sensitive matching; default off to preserve raw per-turn text
    equality).

    ``max_turns`` is the assemble-shuffle skew guard: a pathological
    mega-conversation (crawler loop, runaway agent) otherwise lands its
    entire turn set in ONE aggregation task. The cap is applied INSIDE
    the aggregate — ``collect_list(when(turn_idx < max_turns, ...))``
    skips null entries, so the aggregation buffer itself never holds
    more than ``max_turns`` structs (with the input_hint's 0-based
    dense turn_idx this equals "first max_turns turns in order"; a
    trailing ``slice`` guarantees the bound even under duplicate
    turn_idx values). The row is flagged ``truncated`` — surfaced,
    never silent, matching the dropped-bucket accounting shape of the
    LSH stage. ``n_turns`` stays the TRUE turn count so metrics remain
    honest."""
    turn_struct = F.struct(
        F.col("turn_idx").alias("turn_idx"),
        (
            F.concat_ws(": ", F.col("role"), F.col("text"))
            if include_role
            else F.col("text")
        ).alias("text"),
    )
    collected = (
        F.collect_list(F.when(F.col("turn_idx") < max_turns, turn_struct))
        if max_turns is not None
        else F.collect_list(turn_struct)
    )
    assembled = turns.groupBy("conv_id").agg(
        F.array_sort(collected).alias("turns_sorted"),
        F.count(F.lit(1)).alias("n_turns"),
    )
    kept = (
        F.slice("turns_sorted", 1, max_turns)
        if max_turns is not None
        else F.col("turns_sorted")
    )
    out = assembled.select(
        "conv_id",
        kept.alias("__kept"),
        "n_turns",
    ).select(
        "conv_id",
        F.array_join(
            F.transform("__kept", lambda t: t["text"]), sep
        ).alias("doc"),
        "n_turns",
        F.size("__kept").alias("__n_kept"),
    ).withColumn("n_chars", F.length("doc"))
    if max_turns is not None:
        # truncated = ACTUAL loss, not just count > cap: the in-agg
        # value filter (turn_idx < max_turns) also drops turns whose
        # index exceeds the cap on sparse / non-0-based turn_idx inputs
        # even when the conversation has fewer than max_turns turns —
        # those rows must be flagged too ("surfaced, never silent")
        out = out.withColumn(
            "truncated", F.col("n_turns") > F.col("__n_kept")
        )
    return out.drop("__n_kept")


def normalize_doc_col(col):
    """Light document normalization applied before shingling: lowercase,
    collapse whitespace. Deliberately does NOT run the full ``padroniza``
    (stopword/suffix removal is name semantics, not document semantics);
    accent folding is skipped so that byte-level shingles preserve the
    reference's per-turn text equality invariant."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
