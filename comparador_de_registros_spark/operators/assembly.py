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

from pyspark.sql import DataFrame, Window
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
    entire turn set in ONE aggregation task. The cap is POSITIONAL
    ("first max_turns turns in turn_idx order") and exact, via two
    branches:

    * Hot path (every in-contract conversation): the cap is applied
      INSIDE the aggregate — ``collect_list(when(turn_idx < max_turns,
      ...))`` skips null entries, so the aggregation buffer itself
      never holds more than ``max_turns`` structs. With the
      input_hint's dense 0-based turn_idx this value filter IS the
      positional cap, so the hot path needs no window/sort.
    * Rescue path: on sparse / non-0-based turn_idx the value filter
      would lose turns a positional cap keeps (e.g. a 2-turn
      conversation with turn_idx {0, 9} under cap 3). A slim
      (conv_id, turn_idx)-only aggregate detects exactly those
      conversations — ``count(turn_idx < cap) < least(n_turns, cap)``
      — and ONLY they are re-aggregated with a rank-based
      (``row_number``) cap. The window sort spills instead of
      buffering, so the skew guard is preserved. With AQE enabled an
      empty rescue set propagates at runtime and the re-scan is
      eliminated, so in-contract inputs pay only the pruned 2-column
      counts scan.

    Rows capped below their true turn count are flagged ``truncated``
    — surfaced, never silent, matching the dropped-bucket accounting
    shape of the LSH stage. ``n_turns`` stays the TRUE turn count so
    metrics remain honest."""
    text_col = (
        F.concat_ws(": ", F.col("role"), F.col("text"))
        if include_role
        else F.col("text")
    )
    turn_struct = F.struct(
        F.col("turn_idx").alias("turn_idx"), text_col.alias("text")
    )

    def _render(assembled: DataFrame) -> DataFrame:
        return assembled.select(
            "conv_id",
            F.array_join(
                F.transform("__kept", lambda t: t["text"]), sep
            ).alias("doc"),
            "n_turns",
            F.size("__kept").alias("__n_kept"),
        ).withColumn("n_chars", F.length("doc"))

    if max_turns is None:
        out = _render(
            turns.groupBy("conv_id")
            .agg(
                F.array_sort(F.collect_list(turn_struct)).alias("turns_sorted"),
                F.count(F.lit(1)).alias("n_turns"),
            )
            .select("conv_id", F.col("turns_sorted").alias("__kept"), "n_turns")
        )
        return out.drop("__n_kept")

    cap = F.lit(max_turns)
    fast = _render(
        turns.groupBy("conv_id")
        .agg(
            F.array_sort(
                F.collect_list(F.when(F.col("turn_idx") < max_turns, turn_struct))
            ).alias("turns_sorted"),
            F.count(F.lit(1)).alias("n_turns"),
        )
        .select(
            "conv_id",
            F.slice("turns_sorted", 1, max_turns).alias("__kept"),
            "n_turns",
        )
    )
    # value-filter result is positional iff it kept least(n_turns, cap)
    # turns; computable per-row from the agg's own columns — no join on
    # the fat branch
    fast = fast.where(F.col("__n_kept") >= F.least(F.col("n_turns"), cap))

    # rescue ids from a SLIM counts-only aggregate (pruned 2-column
    # scan, map-side combined): n_lt < least(n_turns, cap) is exactly
    # the set the fast branch dropped above
    counts = turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(
            F.when(F.col("turn_idx") < max_turns, 1).otherwise(0)
        ).alias("__n_lt"),
    )
    rescue_ids = counts.where(
        F.col("__n_lt") < F.least(F.col("__n"), cap)
    ).select("conv_id")

    # rank-based positional cap for the rescued conversations only;
    # the (turn_idx, text) order key makes ties deterministic
    w_order = Window.partitionBy("conv_id").orderBy("turn_idx", "text")
    w_all = Window.partitionBy("conv_id")
    ranked = (
        turns.join(rescue_ids, "conv_id", "left_semi")
        .select(
            "conv_id",
            F.col("turn_idx"),
            text_col.alias("text"),
            F.row_number().over(w_order).alias("__rn"),
            F.count(F.lit(1)).over(w_all).alias("n_turns"),
        )
        .where(F.col("__rn") <= max_turns)
    )
    rescued = _render(
        ranked.groupBy("conv_id", "n_turns")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__rn"), F.col("text")))
            ).alias("__kept")
        )
        .select("conv_id", "__kept", "n_turns")
    )
    out = fast.unionByName(rescued).withColumn(
        "truncated", F.col("n_turns") > F.col("__n_kept")
    )
    return out.drop("__n_kept")


def normalize_doc_col(col):
    """Light document normalization applied before shingling: lowercase,
    collapse whitespace. Deliberately does NOT run the full ``padroniza``
    (stopword/suffix removal is name semantics, not document semantics);
    accent folding is skipped so that byte-level shingles preserve the
    reference's per-turn text equality invariant.

    The collapse pass is guarded behind a cheap probe: for a string
    with no whitespace RUN and no non-space whitespace char,
    ``\\s+ -> " "`` is the identity (single spaces map to themselves),
    so the expensive buffer-building regexp_replace is skipped — on the
    documents bench table every row is already collapsed."""
    s = F.lower(F.trim(col))
    return F.when(
        s.rlike("\\s\\s|[\\t\\n\\x0B\\f\\r]"),
        F.regexp_replace(s, r"\s+", " "),
    ).otherwise(s)
