"""Pipeline configuration.

Terminology follows the reference (``/root/reference/lsh-qd.py:20-27``):
``rows_per_band`` = reference ``k`` (AND within a band/table),
``num_bands``     = reference ``l`` (OR across bands/tables).
Collision curve: ``1 - (1 - s^rows_per_band)^num_bands``
(``/root/reference/lsh-qd.py:453``).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field

# Production MinHash affine family: h' = shingle_hash mod HASH_M;
# sig_j = (a_j * h' + b_j) mod MERSENNE_P. Bounds chosen so every product
# fits in int64 without 128-bit arithmetic: a_j, h' < 2^31 → a*h' < 2^62.
MERSENNE_P = (1 << 61) - 1  # 2305843009213693951, prime
# A prime < 2^31 (NOT the largest — 2^31-1 is also prime). The exact
# value is PINNED: it is baked into every persisted signature and into
# the DuckDB oracle twins' literal SQL — "correcting" it would silently
# invalidate both.
HASH_M = 2147483629

# Reference family constants (/root/reference/lsh-qd.py:30-33), used only by
# the parity kernel where inputs are small feature indices.
REF_MAX_VAL = 2**32 - 1
REF_P = 4294967311

# Version of the signature/banding key derivation. Bump whenever the BYTES
# of persisted artifacts change for the same config (e.g. v2: band_key =
# xxhash64(slice array) instead of xxhash64(comma-joined string)). It is
# mixed into config_hash, so checkpointed stages and persisted indexes
# built by an older kernel are detected as incompatible instead of
# silently joining to nothing.
KERNEL_VERSION = 2

# One shared default for DedupConfig.verify_broadcast_ids_cap AND the
# standalone verify_pairs_text(broadcast_ids_cap=...) signature — the two
# defaults desynced once (commit 9780f78 exists solely to re-sync them),
# which silently gave standalone callers a different fetch-mode boundary
# than pipeline runs. Sizing rationale lives at the dataclass field.
VERIFY_BROADCAST_IDS_CAP = 8_000_000


@dataclass(frozen=True)
class DedupConfig:
    """Configuration for the near-duplicate detection pipeline."""

    shingle_k: int = 5  # tokens per k-gram shingle
    rows_per_band: int = 2  # reference k: hashes AND-ed per band
    num_bands: int = 16  # reference l: bands OR-ed
    alpha: int = 1  # min #bands a pair must collide in (AlphaLSH, lsh-qd.py:286-297)
    jaccard_threshold: float = 0.8  # verify gate (north rule)
    seed: int = 42  # matches reference default (lsh-qd.py:20)
    # 'fast' = fused NumPy tokenize+shingle+minhash kernel (production;
    # functions/fast_shingle.py); 'xxhash64' = JVM higher-order-function
    # path; 'poly' = portable polynomial hash expressible in both Spark SQL
    # and DuckDB (oracle parity).
    shingle_hash: str = "fast"
    max_bucket_size: int = 2000  # buckets larger than this use star pairing
    # Skew handling is structural, not salt-based: count aggregations
    # already de-skew via map-side partial aggregation; within-bucket pair
    # generation cannot be salted without losing cross-salt pairs, so
    # oversized buckets are capped + star-paired instead (operators/pairs),
    # and AQE skew-join covers the residual joins (session.py).
    min_exact_overlap: int = 50  # suffix-array exact-overlap threshold (chars)
    # how verify fetches candidate text: 'auto' counts candidate ids and
    # broadcasts them (one corpus scan, zero corpus shuffle) when ≤
    # verify_broadcast_ids_cap, else falls back to the two-sided shuffle
    # join (the 10^12-doc shape — see operators/verify.verify_pairs_text).
    # The cap bounds the broadcast of the CANDIDATE IDS (8 B/row → 64 MB
    # at the default), NOT the candidate texts — those are materialized
    # distributed (localCheckpoint) and byte-gated separately. Sized so the
    # full-corpus-shuffle fallback only triggers when the id set itself
    # stops being broadcastable: profiling showed the old 1M default sent a
    # 3M-page corpus with 1.1M candidates into TWO full corpus-text
    # shuffles (2.8 GiB each) when the candidate texts were a 1 GiB
    # checkpoint away.
    verify_fetch: str = "auto"
    verify_broadcast_ids_cap: int = VERIFY_BROADCAST_IDS_CAP

    @property
    def num_hashes(self) -> int:
        return self.rows_per_band * self.num_bands

    def config_hash(self) -> str:
        """Content hash for checkpoint manifests (resume detection).
        Includes KERNEL_VERSION: artifacts persisted by an older key
        derivation must not be resumed or queried against."""
        payload = json.dumps(
            {**asdict(self), "kernel_version": KERNEL_VERSION},
            sort_keys=True,
        )
        return hashlib.sha256(payload.encode()).hexdigest()[:16]

    def key_hash(self) -> str:
        """Hash of ONLY the fields that determine persisted index BYTES
        (shingle ids, signature values, band keys). This is the compat
        gate for persisted LSH indexes: execution-only knobs
        (jaccard_threshold, alpha, verify_fetch, caps...) may differ
        between the builder and a querier of the same index — re-querying
        at a stricter threshold is a supported use, not an incompatible
        index."""
        payload = json.dumps(
            {
                "shingle_k": self.shingle_k,
                "rows_per_band": self.rows_per_band,
                "num_bands": self.num_bands,
                "seed": self.seed,
                "shingle_hash": self.shingle_hash,
                "kernel_version": KERNEL_VERSION,
            },
            sort_keys=True,
        )
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


@dataclass(frozen=True)
class RuntimeConfig:
    """Spark runtime knobs, sized for the target scale.

    At 100 TB / 1000 executors the same code runs with larger
    ``shuffle_partitions`` (rule of thumb: ~2-3× total cores, and
    ≥ input_bytes / 200MB for the pair-join stage) — these are plain Spark
    confs, not code changes.
    """

    shuffle_partitions: int = 32
    arrow_max_records_per_batch: int = 10000  # bound NumPy batch memory in UDFs
    extra_confs: dict = field(default_factory=dict)
