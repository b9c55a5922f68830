"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media ride as opaque ``binary`` columns with typed metadata; decode /
feature-extraction are Arrow-batched ``mapInPandas`` kernels. The actual
codecs are NOT available in this environment (no PIL/ffmpeg), so the decode
step is STUBBED: ``decode_fn=None`` raises ``NotImplementedError`` eagerly,
and tests exercise the real Spark plumbing (schema, batching, partitioning)
with a deterministic fake decoder. The dedup path downstream of decode is
fully real: embeddings → SimHash/p-stable buckets → candidate pairs →
cosine verify (operators/ann.py), identical to the text path's shape.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms long"
)

FEATURE_SCHEMA = "media_id long, feature array<float>, feat_dim int"


def require_decoder(kind: str) -> Callable[[bytes], np.ndarray]:
    """Real decoders need PIL/torchcodec/ffmpeg — absent here by design."""
    raise NotImplementedError(
        f"no {kind} codec in this environment; pass decode_fn= explicitly "
        "(production: PIL.Image.open / soundfile.read / frame sampler)"
    )


def deterministic_fake_decoder(dim: int = 64) -> Callable[[bytes], np.ndarray]:
    """Content-addressed fake 'decode': bytes → unit vector seeded by a
    CRC of the payload. Byte-identical media → identical features, so the
    whole downstream near-dup path is exercised realistically."""
    import zlib

    def decode(payload: bytes) -> np.ndarray:
        rng = np.random.default_rng(zlib.crc32(payload or b""))
        v = rng.standard_normal(dim).astype(np.float32)
        return v / np.linalg.norm(v)

    return decode


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], np.ndarray] | None = None,
    batch_limit_bytes: int = 256 << 20,
) -> DataFrame:
    """media(binary payload) → (media_id, feature, feat_dim).

    ``mapInPandas`` so each Arrow batch holds full binary payloads exactly
    once; heavy rows are bounded by repartitioning upstream (payload column
    never passes through a shuffle here — narrow map over the scan).
    """
    if decode_fn is None:
        require_decoder("media")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_fn(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": [f.tolist() for f in feats],
                    "feat_dim": [len(f) for f in feats],
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def media_near_dup(
    media: DataFrame,
    decode_fn: Callable[[bytes], np.ndarray] | None = None,
    cosine_threshold: float = 0.98,
    n_tables: int = 8,
    bits_per_table: int = 12,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(id_a, id_b, cosine): near-duplicate media via hyperplane-LSH bucket
    join + exact cosine verify — the image-dedup workload named in the
    reference's notes (/root/reference/notes_from_chris.txt:7), with the
    decode stage stubbed."""
    from lsh_qd_spark.operators.ann import cosine_expr, hyperplane_coefficients, make_hyperplane_udf
    from lsh_qd_spark.operators.pairs import candidate_pairs

    feats = extract_features(media, decode_fn)
    udf = make_hyperplane_udf(
        hyperplane_coefficients(n_tables, bits_per_table, dim, seed),
        bits_per_table,
    )
    keyed = feats.select(
        F.col("media_id").alias("doc_id"),
        F.col("feature"),
        F.posexplode(udf(F.col("feature"))).alias("band_idx", "band_key"),
    )
    cand = candidate_pairs(
        keyed.select("doc_id", "band_idx", "band_key"),
        alpha=1,
        max_bucket_size=10_000,
    )
    side = feats.select(F.col("media_id").alias("_id"), F.col("feature").alias("_f"))
    return (
        cand.join(side.withColumnRenamed("_id", "id_a"), "id_a")
        .withColumnRenamed("_f", "f_a")
        .join(side.withColumnRenamed("_id", "id_b"), "id_b")
        .withColumnRenamed("_f", "f_b")
        .select(
            "id_a",
            "id_b",
            cosine_expr(F.col("f_a"), F.col("f_b")).alias("cosine"),
        )
        .where(F.col("cosine") >= cosine_threshold)
    )
