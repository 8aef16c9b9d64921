"""Multimodal column support: opaque binary payloads + typed metadata,
with decode/feature-extraction as Arrow-batched Pandas operators.

Design for 100 TB: media bytes live in a ``binary`` column next to typed
metadata; per-item decode/feature work runs in ``mapInPandas`` so each
partition streams Arrow batches into Python once (no per-row pickling), and
the physical plan stays a single scan→map stage with no shuffle.

The image/audio decode libraries are not in this container, so ``decode``
raises NotImplementedError behind an import-try (clearly marked stub) while
``extract_features`` computes deterministic byte-level features — the Spark
plumbing (schema, batching, UDF signature) is real and oracle-checked.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KINDS = ["image", "audio", "video"]

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, byte_sum long, byte_mean double"
)


def build_media(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from documents: binary payload (utf-8 text
    standing in for encoded media) + deterministic typed metadata."""
    kind = F.element_at(F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        ((F.col("n_chars") % 64) + 1).cast("int").alias("width"),
        (((F.col("n_chars") * 7) % 64) + 1).cast("int").alias("height"),
        ((F.col("n_chars") % 24) + 1).cast("int").alias("n_frames"),
    )


def decode(media: DataFrame) -> DataFrame:
    """Real media decode — STUB: decoders are not available in this
    environment. The mapInPandas plumbing is identical to
    extract_features; swap the body for PIL/torchaudio/av calls."""
    try:
        import PIL  # noqa: F401
    except ImportError as exc:  # pragma: no cover - always taken here
        raise NotImplementedError(
            "media decode requires image/audio libraries not present in "
            "this container; use extract_features for the plumbing-true "
            "deterministic path"
        ) from exc
    raise NotImplementedError("real decode path not implemented")


def extract_features(media: DataFrame) -> DataFrame:
    """Byte-level features per media item via Arrow-batched mapInPandas.

    Deterministic stand-in for a decode+featurize stage: n_bytes, byte_sum,
    byte_mean. Batch shape: one output row per input row, computed
    vectorized-per-batch in pandas.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            byte_sum = payloads.map(lambda b: int(sum(b)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes.astype("int64"),
                    "byte_sum": byte_sum.astype("int64"),
                    "byte_mean": [
                        float(s) / n if n else None
                        for s, n in zip(byte_sum, n_bytes)
                    ],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        featurize, FEATURE_SCHEMA
    )


RESIZE_SCHEMA = (
    "media_id long, width int, height int, n_bytes_resized long, "
    "byte_sum_resized long"
)


def resize(media: DataFrame) -> DataFrame:
    """Resize stage for image items — deterministic stand-in: the "resized"
    payload is the first width×height bytes of the original (a real decoder
    would interpolate pixels; the Spark plumbing — per-row target dims from
    metadata columns, Arrow batching, output schema — is identical).
    """

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            target = pdf["width"].astype(int) * pdf["height"].astype(int)
            clipped = [
                bytes(p)[:t] for p, t in zip(pdf["payload"], target)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "n_bytes_resized": [len(c) for c in clipped],
                    "byte_sum_resized": [int(sum(c)) for c in clipped],
                }
            )

    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "width", "height", "payload")
        .mapInPandas(do_resize, RESIZE_SCHEMA)
    )


def sample_frames(media: DataFrame, *, stride: int = 4) -> DataFrame:
    """Frame sampling for video items: every ``stride``-th frame index.

    Pure relational (sequence + explode) — frame EXTRACTION would plug in
    as a mapInPandas over (media_id, frame_idx, payload)."""
    frames = F.sequence(
        F.lit(0), F.col("n_frames") - 1, F.lit(stride)
    )
    return (
        media.where(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_idx"))
    )
