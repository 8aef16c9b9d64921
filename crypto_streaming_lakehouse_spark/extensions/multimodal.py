"""Multimodal column support: opaque binary payloads + typed metadata,
with decode/feature-extraction as Arrow-batched Pandas operators.

Design for 100 TB: media bytes live in a ``binary`` column next to typed
metadata; per-item decode/feature work runs in ``mapInPandas`` so each
partition streams Arrow batches into Python once (no per-row pickling), and
the physical plan stays a single scan→map stage with no shuffle.

``decode`` is a REAL image decoder for binary P6 PPM payloads — pure
stdlib+numpy header parsing and pixel extraction inside mapInPandas, no
external media libraries — oracle-checked against pixel sums the SQL side
recomputes from the deterministic payload generator. Compressed formats
(JPEG/PNG/audio/video) would swap the parse body for PIL/av calls with the
identical Spark plumbing; ``extract_features`` keeps the format-agnostic
byte-level path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
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


PPM_SCHEMA = "media_id long, payload binary"


def build_ppm_media(docs: DataFrame) -> DataFrame:
    """Deterministic binary P6 PPM payloads for image-kind docs
    (``doc_id % 3 == 0``, matching build_media's kind assignment).

    Dimensions and pixel bytes are a pure function of doc_id — byte i of
    the raster is ``(doc_id*7 + i*13) % 256`` — so the DuckDB oracle can
    recompute every decoded statistic without parsing binary."""
    imgs = docs.where(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("media_id")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w = mid % 8 + 2
                h = (mid * 3) % 8 + 2
                idx = np.arange(3 * w * h, dtype=np.int64)
                px = ((mid * 7 + idx * 13) % 256).astype(np.uint8)
                payloads.append(
                    b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    return imgs.mapInPandas(gen, PPM_SCHEMA)


def _parse_ppm(raw: bytes) -> tuple[int, int, int, bytes]:
    """Parse a binary P6 PPM: magic, whitespace/comment-tolerant header
    (width, height, maxval), one whitespace byte, then the RGB raster."""
    if not raw.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if raw[pos : pos + 1] == b"#":
            while pos < len(raw) and raw[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(raw[start:pos]))
    pos += 1  # exactly one whitespace byte separates maxval from the raster
    w, h, maxval = vals
    px = raw[pos : pos + 3 * w * h]
    if len(px) != 3 * w * h:
        raise ValueError("truncated PPM raster")
    return w, h, maxval, px


DECODE_SCHEMA = (
    "media_id long, width int, height int, maxval int, n_pixels long, "
    "pixel_sum long, pixel_mean double, r_sum long, g_sum long, b_sum long"
)


def decode(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real image decode over binary PPM payloads via Arrow-batched
    mapInPandas: parse the header, lift the raster into numpy, and emit
    per-image statistics (the stand-in for a featurize stage; a resize or
    model-input stage would consume the same numpy array).

    Single scan→map stage, no shuffle — at 100 TB each partition streams
    its payloads through Python once per Arrow batch."""

    def do_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "width", "height", "maxval", "n_pixels",
                "pixel_sum", "pixel_mean", "r_sum", "g_sum", "b_sum",
            )}
            for mid, raw in zip(pdf["media_id"], pdf[payload_col]):
                w, h, maxval, px = _parse_ppm(bytes(raw))
                arr = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
                total = int(arr.sum())
                rows["media_id"].append(int(mid))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["maxval"].append(maxval)
                rows["n_pixels"].append(w * h)
                rows["pixel_sum"].append(total)
                rows["pixel_mean"].append(
                    total / arr.size if arr.size else None
                )
                rows["r_sum"].append(int(arr[0::3].sum()))
                rows["g_sum"].append(int(arr[1::3].sum()))
                rows["b_sum"].append(int(arr[2::3].sum()))
            yield pd.DataFrame(rows)

    return media.select("media_id", payload_col).mapInPandas(
        do_decode, DECODE_SCHEMA
    )


WAV_SCHEMA = "media_id long, payload binary"
WAV_RATE = 8000


def build_wav_media(docs: DataFrame) -> DataFrame:
    """Deterministic mono 16-bit PCM WAV payloads for audio-kind docs
    (``doc_id % 3 == 1``, matching build_media's kind assignment).

    Sample i is ``((doc_id*13 + i*7) % 65536) - 32768`` and the count is
    ``doc_id % 200 + 50`` — closed forms the DuckDB oracle recomputes
    without parsing RIFF."""
    import struct

    auds = docs.where(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").alias("media_id")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                n = mid % 200 + 50
                idx = np.arange(n, dtype=np.int64)
                samples = (((mid * 13 + idx * 7) % 65536) - 32768).astype(
                    "<i2"
                )
                data = samples.tobytes()
                hdr = (
                    b"RIFF"
                    + struct.pack("<I", 36 + len(data))
                    + b"WAVEfmt "
                    + struct.pack(
                        "<IHHIIHH", 16, 1, 1, WAV_RATE, WAV_RATE * 2, 2, 16
                    )
                    + b"data"
                    + struct.pack("<I", len(data))
                )
                payloads.append(hdr + data)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    return auds.mapInPandas(gen, WAV_SCHEMA)


AUDIO_SCHEMA = (
    "media_id long, n_channels int, sample_rate int, n_samples long, "
    "peak long, dc_mean double, rms double"
)


def decode_audio(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real audio decode over binary WAV payloads: the stdlib ``wave``
    parser reads the RIFF/fmt/data chunks, the PCM raster lands in numpy,
    and per-clip statistics come out (peak, DC offset, RMS — the
    stand-ins for a feature-extraction stage). Same single scan→map
    shape as the image decoder: no shuffle at any scale."""
    import io
    import wave

    def do_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                k: []
                for k in (
                    "media_id", "n_channels", "sample_rate", "n_samples",
                    "peak", "dc_mean", "rms",
                )
            }
            for mid, raw in zip(pdf["media_id"], pdf[payload_col]):
                with wave.open(io.BytesIO(bytes(raw))) as w:
                    nch = w.getnchannels()
                    rate = w.getframerate()
                    nfr = w.getnframes()
                    if w.getsampwidth() != 2:
                        raise ValueError("expected 16-bit PCM")
                    pcm = np.frombuffer(
                        w.readframes(nfr), dtype="<i2"
                    ).astype(np.float64)
                rows["media_id"].append(int(mid))
                rows["n_channels"].append(nch)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(nfr)
                rows["peak"].append(int(np.abs(pcm).max()) if nfr else 0)
                rows["dc_mean"].append(float(pcm.mean()) if nfr else None)
                rows["rms"].append(
                    float(np.sqrt((pcm * pcm).mean())) if nfr else None
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", payload_col).mapInPandas(
        do_decode, AUDIO_SCHEMA
    )


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


PATCH_SCHEMA = (
    "media_id long, px int, py int, patch_w int, patch_h int, "
    "patch_sum long, patch_mean double"
)


def extract_patches(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """ViT-style patch extraction over decoded PPM rasters: split each
    image into a 2×2 quadrant grid (floor split; right/bottom quadrants
    absorb odd remainders) and emit per-patch pixel sums/means — the
    decode→patchify→featurize front half of a vision-model ingest
    pipeline, minus the model.

    Same execution shape as decode(): one Arrow-batched mapInPandas over
    the payload scan, 4 output rows per image, no shuffle. The numpy
    reshape to (h, w, 3) + quadrant slicing is exactly what a real
    patchifier does at any resolution; the 2×2 grid just keeps the
    fixture-scale output bounded."""

    def do_patches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "px", "py", "patch_w", "patch_h",
                "patch_sum", "patch_mean",
            )}
            for mid, raw in zip(pdf["media_id"], pdf[payload_col]):
                w, h, _maxval, px_bytes = _parse_ppm(bytes(raw))
                arr = (
                    np.frombuffer(px_bytes, dtype=np.uint8)
                    .astype(np.int64)
                    .reshape(h, w, 3)
                )
                x_cuts = [0, w // 2, w]
                y_cuts = [0, h // 2, h]
                for py in (0, 1):
                    for px in (0, 1):
                        patch = arr[
                            y_cuts[py] : y_cuts[py + 1],
                            x_cuts[px] : x_cuts[px + 1],
                            :,
                        ]
                        s = int(patch.sum())
                        rows["media_id"].append(int(mid))
                        rows["px"].append(px)
                        rows["py"].append(py)
                        rows["patch_w"].append(int(patch.shape[1]))
                        rows["patch_h"].append(int(patch.shape[0]))
                        rows["patch_sum"].append(s)
                        rows["patch_mean"].append(
                            s / patch.size if patch.size else None
                        )
            yield pd.DataFrame(rows)

    return media.select("media_id", payload_col).mapInPandas(
        do_patches, PATCH_SCHEMA
    )
