"""Incremental / resumable processing primitives.

* :func:`anti_join_resume` — the north_rule's pair-level resume: drop
  work units already present in a checkpointed output (SURVEY.md §2.3:
  ``left_anti`` against done partitions).
* :func:`incremental_candidates` — delta dedup: newly arrived
  conversations are signed and banded, then joined against the FULL
  corpus's band table (new x all instead of all x all) — the shuffle is
  proportional to the delta, not the corpus. This is how a 10^12-turn
  table absorbs daily increments without re-running the self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from comparador_de_registros_spark.operators.lsh import lsh_band_keys
from comparador_de_registros_spark.plans.configs import LshConfig


def anti_join_resume(
    todo: DataFrame, done: DataFrame, keys: list[str]
) -> DataFrame:
    """Work units in ``todo`` not yet present in ``done`` (by key)."""
    return todo.join(done.select(*keys).distinct(), keys, "left_anti")


def _band_table(signatures: DataFrame, cfg: LshConfig) -> DataFrame:
    return signatures.select(
        "conv_id",
        F.posexplode(lsh_band_keys("minhash", cfg)).alias("band", "key"),
    )


def incremental_candidates(
    new_signatures: DataFrame,
    corpus_signatures: DataFrame,
    cfg: LshConfig,
) -> DataFrame:
    """Candidate pairs between NEW conversations and the whole corpus
    (including new-vs-new), without re-enumerating corpus-vs-corpus.
    -> (a, b, source='lsh_incr') with a < b."""
    new_keyed = _band_table(new_signatures, cfg)
    all_keyed = _band_table(
        corpus_signatures.unionByName(new_signatures).distinct(), cfg
    )
    return (
        new_keyed.alias("n")
        .join(all_keyed.alias("c"), ["band", "key"])
        .where(F.col("n.conv_id") != F.col("c.conv_id"))
        .select(
            F.least("n.conv_id", "c.conv_id").alias("a"),
            F.greatest("n.conv_id", "c.conv_id").alias("b"),
        )
        .distinct()
        .withColumn("source", F.lit("lsh_incr"))
    )
