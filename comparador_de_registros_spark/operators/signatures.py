"""Signature stage: documents -> (shingles, MinHash, SimHash, anchors).

One ``mapInPandas`` pass computes all four artifacts per document —
a single Arrow round-trip per batch instead of four pandas-UDF columns
re-shipping the document text (SURVEY.md §2.11: vectorized pandas/Arrow
UDFs only; this is the designated slow path, everything downstream of
it is native).

Scale notes:
* ``repartition(conv_id)`` upstream gives even Arrow batches;
* signatures are ~0.5 KB/doc (128 x int32) + shingle sets; the shingle
  array is kept for the exact-Jaccard verify stage — at 10^12-turn
  scale shingle sets dominate storage, so the pipeline stores them once
  here and the verify stage joins them by conv_id instead of
  recomputing.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from comparador_de_registros_spark.functions import hashing as H
from comparador_de_registros_spark.operators.assembly import normalize_doc_col
from comparador_de_registros_spark.plans.configs import DedupConfig

SIGNATURE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_shingles", T.IntegerType()),
        # stored shingles are the top 32 bits of the 64-bit gram hashes:
        # halves the dominant table + verify-shuffle bytes; within-pair
        # collision probability ~(1400^2)/2^33 ≈ 2e-4 shifts Jaccard by
        # <1e-3 — far inside the decoy/near-dup margin. The oracle
        # truncates identically (oracle.py).
        T.StructField("shingles", T.ArrayType(T.IntegerType())),
        T.StructField("minhash", T.ArrayType(T.IntegerType())),
        T.StructField("simhash", T.LongType()),
        T.StructField("anchors", T.ArrayType(T.LongType())),
    ]
)


def stored_shingles(sh64: "np.ndarray") -> "np.ndarray":
    """uint64 shingle hashes -> distinct int32 storage form."""
    return np.unique((sh64 >> np.uint64(32)).astype(np.uint32)).astype(np.int32)


def compute_signatures(docs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """``docs(conv_id, doc)`` -> SIGNATURE_SCHEMA rows.

    The text is normalized natively (lower + whitespace collapse)
    before crossing into Python, so the Arrow transfer carries the
    minimal payload.
    """
    shingle_cfg = cfg.shingle
    mh_cfg = cfg.minhash
    sub_cfg = cfg.substring
    sim_seed = cfg.simhash.seed
    use_substring = cfg.use_substring

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seeds = H.make_seeds(mh_cfg.num_perm, mh_cfg.seed)
        token_hash_cache: dict[str, int] = {}

        def tok_hash(t: str) -> int:
            h = token_hash_cache.get(t)
            if h is None:
                h = H.hash_bytes(t.encode("utf-8"), sim_seed)
                token_hash_cache[t] = h
            return h

        for pdf in batches:
            out = {
                "conv_id": pdf["conv_id"],
                "n_shingles": [],
                "shingles": [],
                "minhash": [],
                "simhash": [],
                "anchors": [],
            }
            for text in pdf["norm"]:
                text = text or ""
                if shingle_cfg.kind == "char":
                    sh = H.char_shingles(text, shingle_cfg.k, shingle_cfg.seed)
                else:
                    sh = H.word_shingles(text, shingle_cfg.k, shingle_cfg.seed)
                sig = H.minhash_signature(sh, seeds)
                tok_hashes = np.array(
                    [tok_hash(t) for t in set(text.split())],
                    dtype=np.uint64,
                )
                sim = H.simhash64(tok_hashes)
                if use_substring and len(text) >= sub_cfg.min_doc_len:
                    grams = H.rolling_kgram_hashes(
                        text.encode("utf-8"), sub_cfg.gram, sub_cfg.seed
                    )
                    anc = H.winnow(grams, sub_cfg.window)
                else:
                    anc = np.empty(0, dtype=np.uint64)
                stored = stored_shingles(sh)
                out["n_shingles"].append(len(sh))
                out["shingles"].append(stored.tolist())
                out["minhash"].append(sig.tolist())
                out["simhash"].append(int(sim))
                out["anchors"].append(anc.astype(np.int64).tolist())
            yield pd.DataFrame(out)

    prepared = docs.select(
        "conv_id", normalize_doc_col(F.col("doc")).alias("norm")
    )
    return prepared.mapInPandas(compute, SIGNATURE_SCHEMA)
