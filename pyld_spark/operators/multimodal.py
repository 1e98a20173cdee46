"""Multimodal column handling (training-data extras).

Images/audio/video are opaque ``binary`` columns plus typed metadata. The
decode/resize/frame-sample kernels require codec libraries that are not in
this container, so the *kernels* are stubbed (clearly marked), while all the
Spark-side plumbing — schemas, Arrow batch shapes, partitioning, UDF
signatures — is real and tested:

- :func:`attach_fake_payload` — deterministic synthetic binary payloads
  derived from text (lets the whole path run hermetically);
- :func:`extract_binary_features` — mapInPandas over binary columns:
  per-blob length / prefix / byte-histogram features (real vectorized code);
- :func:`decode_image_stub` / :func:`sample_frames_stub` — the codec-backed
  kernels; raise NotImplementedError unless ``fake=True``, in which case a
  deterministic fake decode runs so schema/batch plumbing stays testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def attach_fake_payload(documents: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Deterministic binary payload per document (utf-8 bytes of the text,
    doubled) + fake metadata — hermetic stand-in for real image bytes."""
    return documents.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.col(id_col) % 3 == 0, F.lit("image/png"))
        .when(F.col(id_col) % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
        .alias("media_type"),
        F.encode(F.concat(F.col(text_col), F.col(text_col)), "utf-8").alias("payload"),
        # portable modular arithmetic (not xxhash64) so the oracle can replay
        (F.pmod(F.col(id_col) * 7919, F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(F.col(id_col) * 104729, F.lit(1080)) + 1).cast("int").alias("height"),
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("prefix_hex", StringType(), False),
        StructField("byte_sum", LongType(), False),
        StructField("n_distinct_bytes", LongType(), False),
    ]
)


def extract_binary_features(media: DataFrame) -> DataFrame:
    """Vectorized feature extraction over binary payloads (real code, no
    codecs): size, 8-byte prefix, byte-value sum, distinct-byte count — all
    integer/hex statistics so a SQL oracle can replay them. Per blob the
    work is ``np.frombuffer`` + ``np.bincount`` (no Python byte loop — this
    stand-in measures the throughput shape a real decode stage would have).
    Narrow mapInPandas, pipelined with the scan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = [
                bytes(p) if p is not None else b"" for p in pdf["payload"]
            ]
            arrs = [np.frombuffer(p, dtype=np.uint8) for p in payloads]
            counts = [np.bincount(a, minlength=256) for a in arrs]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64").to_numpy(),
                    "n_bytes": np.array([a.size for a in arrs], dtype="int64"),
                    "prefix_hex": [p[:8].hex() for p in payloads],
                    "byte_sum": np.array(
                        [int(a.sum(dtype=np.int64)) for a in arrs], dtype="int64"
                    ),
                    "n_distinct_bytes": np.array(
                        [int((c > 0).sum()) for c in counts], dtype="int64"
                    ),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("pixels_checksum", StringType(), True),
        StructField("out_width", IntegerType(), True),
        StructField("out_height", IntegerType(), True),
    ]
)


def decode_image_stub(media: DataFrame, target_size: tuple[int, int] = (224, 224),
                      fake: bool = False) -> DataFrame:
    """Image decode + resize kernel.

    With ``fake=True`` a deterministic fake decode (md5 of the payload hex as
    the "pixel checksum") exercises the identical schema/batch/partitioning
    path and stays SQL-oracle-replayable. With ``fake=False`` the payload is
    REALLY decoded: PNG via the pure-numpy codec
    (:func:`pyld_spark.operators.codecs.decode_png` — zlib + scanline
    unfiltering, no PIL) and baseline-sequential JPEG via
    :func:`pyld_spark.operators.codecs.decode_jpeg` (Huffman + IDCT,
    4:4:4/4:2:0/4:2:2; progressive/arithmetic raise), nearest-neighbor-
    resized to ``target_size``, and checksummed over the decoded pixel
    bytes. WebP (libwebp-backed) remains ``NotImplementedError``.
    """

    tw, th = target_size

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyld_spark.operators.codecs import (
            decode_jpeg,
            decode_png,
            resize_nearest,
        )

        for pdf in batches:
            rows = []
            for doc_id, mt, payload, w, h in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"],
                pdf["width"], pdf["height"],
            ):
                if mt not in ("image/png", "image/jpeg", "image/webp"):
                    continue
                if fake:
                    if mt != "image/png":
                        continue
                    # md5 over the hex rendering: replayable in SQL (md5 of a
                    # BLOB isn't portable; md5 of its hex string is)
                    digest = hashlib.md5(
                        bytes(payload or b"").hex().encode("ascii")
                    ).hexdigest()
                    rows.append((int(doc_id), digest, min(tw, int(w)), min(th, int(h))))
                    continue
                if mt == "image/png":
                    arr = decode_png(bytes(payload or b""))
                elif mt == "image/jpeg":
                    arr = decode_jpeg(bytes(payload or b""))
                else:
                    raise NotImplementedError(
                        f"{mt} decode requires libwebp — not available "
                        "in this container (PNG/baseline-JPEG decode natively)"
                    )
                resized = resize_nearest(arr, (tw, th))
                digest = hashlib.md5(resized.tobytes()).hexdigest()
                rows.append((int(doc_id), digest, tw, th))
            yield pd.DataFrame(
                rows, columns=["doc_id", "pixels_checksum", "out_width", "out_height"]
            )

    return media.mapInPandas(run, DECODE_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("samples_checksum", StringType(), False),
    ]
)


def decode_audio_stub(media: DataFrame, fake: bool = False) -> DataFrame:
    """Audio decode kernel (``audio/wav`` rows).

    ``fake=True``: deterministic SQL-replayable double — ``n_samples`` =
    payload bytes // 2, rate 16000, checksum = md5 of the payload hex.
    ``fake=False``: REAL PCM-16 WAV parse via
    :func:`pyld_spark.operators.codecs.decode_wav` (pure struct+numpy);
    non-PCM/compressed codecs raise ``NotImplementedError``.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyld_spark.operators.codecs import decode_wav

        for pdf in batches:
            rows = []
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if mt != "audio/wav":
                    continue
                b = bytes(payload or b"")
                if fake:
                    rows.append((
                        int(doc_id), len(b) // 2, 16_000,
                        hashlib.md5(b.hex().encode("ascii")).hexdigest(),
                    ))
                else:
                    samples, rate = decode_wav(b)
                    rows.append((
                        int(doc_id), int(samples.shape[0]), int(rate),
                        hashlib.md5(samples.tobytes()).hexdigest(),
                    ))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "sample_rate", "samples_checksum"],
            )

    return media.mapInPandas(run, AUDIO_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_checksum", StringType(), False),
    ]
)


def sample_frames_stub(media: DataFrame, every_n: int = 10, fake: bool = False) -> DataFrame:
    """Video frame sampling: 1 row in → N frame rows out.

    ``fake=False`` REALLY decodes ``video/x-yuv4mpeg`` payloads via
    :func:`pyld_spark.operators.codecs.decode_y4m` (mono/444/420, the
    standard uncompressed interchange container) and emits every
    ``every_n``-th frame's md5 checksum; compressed containers (mp4)
    genuinely require ffmpeg and still raise. ``fake=True`` keeps the
    deterministic SQL-replayable double for mp4 payloads so batch shape
    and fan-out stay gate-certified."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if not mt.startswith("video/"):
                    continue
                if not fake:
                    if mt == "video/x-yuv4mpeg":
                        from pyld_spark.operators.codecs import decode_y4m

                        frames, _fps = decode_y4m(bytes(payload or b""))
                        for j, i in enumerate(range(0, len(frames), every_n)):
                            rows.append(
                                (int(doc_id), j,
                                 hashlib.md5(frames[i].tobytes()).hexdigest()[:16])
                            )
                        continue
                    raise NotImplementedError(
                        "mp4 frame sampling requires ffmpeg — not available; "
                        "use video/x-yuv4mpeg payloads or fake=True"
                    )
                if mt != "video/mp4":
                    continue
                b = bytes(payload or b"")
                n_frames = max(len(b) // (every_n * 10), 1)
                for i in range(min(n_frames, 8)):
                    chunk = b[i * every_n: (i + 1) * every_n + 10]
                    rows.append(
                        (int(doc_id), i,
                         hashlib.md5(chunk.hex().encode("ascii")).hexdigest()[:16])
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_checksum"])

    return media.mapInPandas(run, FRAME_SCHEMA)
