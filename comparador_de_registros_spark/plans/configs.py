"""Dedup pipeline configuration.

The shingle/signature config is THE contract the recall gate is defined
at (BASELINE.json: "matching the reference's cluster assignments
(dup-pair recall >= 0.99) at the same shingle/signature config"): the
oracle (brute-force exact Jaccard + transitive closure) and the LSH
pipeline both consume the same :class:`DedupConfig`.

Default LSH geometry: 128 permutations as 32 bands x 4 rows. The S-curve
gives pair-catch probability 1-(1-J^4)^32 — at the default Jaccard
threshold 0.8 a true dup pair is missed with p ~ 5e-8, comfortably
inside the 0.99 recall gate even before the SimHash and substring
stages add their independent catches.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ShingleConfig:
    """Document -> shingle-set config. ``kind='char'`` hashes utf-8 byte
    k-grams of the normalized text (robust to token-level edits);
    ``kind='word'`` hashes k-token windows."""

    kind: str = "char"
    # 12-byte char grams: small enough that 1-2 token edits keep J >= 0.9
    # on real-length conversations, large enough that reordering turns
    # (boundary-crossing grams rewritten) lands clearly under the 0.8
    # threshold — the stable-turn-ordering invariant stays observable.
    k: int = 12
    seed: int = 0x5EED_5EED

    def __post_init__(self) -> None:
        if self.kind not in ("char", "word"):
            raise ValueError(f"unknown shingle kind {self.kind!r}")
        if self.k < 1:
            raise ValueError("k must be >= 1")


@dataclass(frozen=True)
class MinHashConfig:
    """``scheme='oph'`` (default) is one-permutation hashing with
    circular densification (Li/Owen/Zhang 2012, Shrivastava/Li 2014):
    one hash pass per shingle instead of num_perm — the signature stage
    is ~num_perm x cheaper per byte with the same per-bucket collision
    probability J. ``scheme='kperm'`` is classic Broder MinHash (min
    over num_perm seeded mixes)."""

    num_perm: int = 128
    seed: int = 0x00C0FFEE
    scheme: str = "oph"

    def __post_init__(self) -> None:
        if self.scheme not in ("oph", "kperm"):
            raise ValueError(f"unknown minhash scheme {self.scheme!r}")
        if self.scheme == "oph" and self.num_perm & (self.num_perm - 1):
            raise ValueError("num_perm must be a power of two for OPH")


@dataclass(frozen=True)
class LshConfig:
    bands: int = 32
    rows: int = 4
    # skew guards: buckets larger than max_bucket_size are dropped from
    # pair enumeration (logged in metrics); exact-dup collapse upstream
    # makes oversized buckets near-dup mega-clusters only.
    max_bucket_size: int = 2000


@dataclass(frozen=True)
class SimHashConfig:
    bits: int = 64
    hamming_k: int = 3  # max Hamming distance considered a candidate
    seed: int = 0x51A5_11A5


@dataclass(frozen=True)
class SubstringConfig:
    """Winnowing fingerprints for the exact-substring stage: any common
    substring of length >= window + gram - 1 shares at least one
    selected anchor (Schleimer/Wilkerson/Aiken winnowing guarantee).

    ``min_overlap`` is the duplicate RULE: a candidate pair failing
    Jaccard is still a duplicate if one normalized doc contains the
    other, or if their longest common substring (suffix-array verify,
    functions/suffix.py) is >= min_overlap bytes. It must be >=
    window + gram - 1, otherwise the anchor generator cannot guarantee
    such pairs become candidates at all."""

    gram: int = 32  # bytes per fingerprinted gram
    window: int = 64  # winnowing window (positions per selection)
    min_doc_len: int = 96  # skip docs shorter than a detectable overlap
    min_overlap: int = 200  # LCS bytes that make a pair a substring dup
    seed: int = 0x5FF1_A11A

    def __post_init__(self) -> None:
        if self.min_overlap < self.window + self.gram - 1:
            raise ValueError(
                "min_overlap below window+gram-1 breaks the winnowing "
                "candidate-recall guarantee"
            )


@dataclass(frozen=True)
class DedupConfig:
    shingle: ShingleConfig = field(default_factory=ShingleConfig)
    minhash: "MinHashConfig" = None  # type: ignore[assignment]
    lsh: LshConfig = field(default_factory=LshConfig)
    simhash: SimHashConfig = field(default_factory=SimHashConfig)
    substring: SubstringConfig = field(default_factory=SubstringConfig)
    jaccard_threshold: float = 0.8
    use_simhash: bool = True
    use_substring: bool = True
    # assemble-shuffle skew guard: cap turns per conversation (first
    # max_turns in turn_idx order; truncations are flagged + counted in
    # the stage metrics, never silent). 10k turns * ~120 B/turn keeps
    # the worst aggregation task ~MBs; raise for corpora with genuinely
    # long conversations.
    max_turns_per_conv: int | None = 10_000
    # Dictionary-encode conv_ids to int64 for the candidates -> verify
    # -> cluster path (docs/TUNING.md): string conv_ids at 10^12-turn
    # scale triple the shuffle key bytes of the two biggest shuffles
    # and every CC round. The mapping table is a per-run checkpoint
    # (id_map); cluster output is decoded back to strings and
    # re-canonicalized to min-conv_id labels, so the output table is
    # bit-identical to the unencoded path (parity-tested).
    encode_ids: bool = False
    # Verify-stage participant filter: the candidate-pair id set is
    # broadcast into a semi-join that prunes the signature table BEFORE
    # its single shared exchange, so only conversations that appear in
    # >= 1 pair ship their shingle arrays (measured: 27% byte cut at
    # 150k base, and the filter must be STATIC — AQE's broadcast
    # conversion arrives after the exchange is already submitted).
    # Flip off when the distinct participant count outgrows what the
    # driver can broadcast (~100M int64 ids); the fallback keeps the
    # same single-exchange structure, just filtered post-shuffle.
    broadcast_participants: bool = True

    # verify-stage plan split point: when the caller KNOWS the candidate
    # pair count (e.g. signature_dup_pairs materializes its candidate
    # cache) and it is at most this, verify joins broadcast the pair
    # side directly into the cached signature table — zero sig-table
    # exchanges, the optimal small-corpus plan. Above it (or when the
    # count is unknown, as in the checkpointing pipeline) verify uses
    # the shared participant-filtered sig exchange, the optimal
    # large-corpus plan (round-4 verdict: verify shuffle bytes). Only
    # the slim (a, b, sources) pair table is ever broadcast (~50 B/row
    # -> ~10 MB at the threshold); the fat shingle arrays stay
    # partitioned.
    verify_small_candidates_max: int = 200_000

    # verify-stage MEDIUM plan: when the pair count is known but above
    # verify_small_candidates_max, verify counts the distinct
    # participants (one job over the caller's cached pair table); if at
    # most this many, the participant-filtered sig table is BROADCAST
    # into both shingle joins instead of exchanged — the pair side then
    # never shuffles at all. Byte budget: 200k participants * ~1.1 KB
    # avg sig row ≈ 220 MB broadcast, inside the 8 GB/512M-row broadcast
    # cap and comfortable for an 8 GB driver; above it the large
    # shared-exchange plan (the 100 TB shape) applies. Measured at 50k
    # docs / 2.76M candidates (sf1.0 bench): scored stage 15.3s
    # (shared exchange) -> 12.4s (broadcast sigs), and no sort of the
    # fat pair rows.
    verify_broadcast_sigs_max: int = 200_000

    # byte companion to the count gate above: estimated broadcast size
    # (participants * (avg_shingles * 4 B + row overhead) * 2) must stay
    # under this, pricing FAT sig rows (assembled conversations carry
    # 10x a short doc's shingles) out of the broadcast plan that a pure
    # count cap would admit.
    verify_broadcast_sigs_max_bytes: int = 256 * 1024 * 1024

    def __post_init__(self) -> None:
        if self.minhash is None:
            object.__setattr__(self, "minhash", MinHashConfig())
        if self.minhash.num_perm != self.lsh.bands * self.lsh.rows:
            raise ValueError(
                f"num_perm ({self.minhash.num_perm}) must equal "
                f"bands*rows ({self.lsh.bands}*{self.lsh.rows})"
            )
