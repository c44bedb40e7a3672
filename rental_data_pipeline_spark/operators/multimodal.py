"""Multimodal-column plumbing: opaque ``binary`` payloads with typed
metadata, decoded/feature-extracted via Arrow-batched ``mapInPandas``.

Beyond-reference training-data operators. The container has no
image/audio codecs, so the *decode* step is a clearly-marked
deterministic stub (``_stub_decode``) — but everything Spark-side is
real and tested: the binary column, the metadata struct, the
``mapInPandas`` batch shape (pandas DataFrame in/out, Arrow transfer),
the multi-row frame-sampling emit, and the output schemas. Swapping the
stub for PIL/ffmpeg changes one local function, not the plan.

At 100 TB the payload column dominates I/O: these operators project the
payload only inside the UDF stage (column pruning upstream), and the
frame sampler emits rows proportional to payload size — partition by
expected output, not input, when writing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_offset", T.LongType()),
    ]
)

FRAME_STRIDE = 64  # bytes of "video" per sampled frame


ROWS_PER_PYTHON_PARTITION = 2_000


def _python_stage_partitions(df: DataFrame, id_col: str) -> DataFrame:
    """Size the partition count of a pandas-UDF stage to the DATA, not
    the cluster: every partition of a ``mapInPandas`` stage occupies a
    Python worker process (fork + imports + Arrow channel), so tiny
    inputs must not fan out to ``defaultParallelism`` workers, while a
    single-split small file must not serialize a compute-heavy stage
    through one worker either. Repartition only UP — a 100 TB scan
    already carries thousands of splits and is left untouched."""
    spark = df.sparkSession
    n_rows = df.count()  # zero-column parquet scan — cheap at any scale
    target = min(
        spark.sparkContext.defaultParallelism,
        max(1, -(-n_rows // ROWS_PER_PYTHON_PARTITION)),
    )
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target, F.col(id_col))
    return df


def pack_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Materialize an opaque binary payload column + typed metadata
    struct (the testdata has no media files; UTF-8 text bytes stand in
    as the payload — the plumbing is identical)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    df = _python_stage_partitions(df, id_col)
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.lit("application/octet-stream").alias("content_type"),
            F.md5(F.col(text_col)).alias("content_md5"),
        ).alias("media_meta"),
    )


def _stub_decode(payload: bytes) -> tuple[int, int, int, int]:
    """STUB for the real image/audio decoder (no codecs in this
    container). Deterministic features derived from the raw bytes:
    length, byte-sum checksum, and a fake geometry. Replace with e.g.
    ``PIL.Image.open(io.BytesIO(payload))`` in production. A NULL
    payload decodes as empty — one null row must not kill an
    hours-long stage (task retries fail identically)."""
    if payload is None:
        payload = b""
    n = len(payload)
    checksum = sum(payload) % 1_000_000_007
    return n, checksum, n % 640, (n // 640) + 1


def decode_features(df: DataFrame) -> DataFrame:
    """Decode/feature-extract each payload via mapInPandas (Arrow
    batches; pandas in/out). Output: one row per input doc."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_stub_decode(p) for p in pdf["payload"]]
            if not feats:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [f[0] for f in feats],
                    "checksum": [f[1] for f in feats],
                    "fake_width": [f[2] for f in feats],
                    "fake_height": [f[3] for f in feats],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, DECODE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("content_type", T.StringType()),
                    T.StructField("width", T.LongType()),
                    T.StructField("height", T.LongType()),
                ]
            ),
        ),
    ]
)


def _stub_resize(payload: bytes, width: int, height: int) -> bytes:
    """STUB for the real image resampler (no codecs in this
    container). Deterministic: stride-sample or cycle-pad the raw
    bytes to exactly ``width*height``. Replace with
    ``PIL.Image.resize`` in production — the Spark-side contract
    (binary in → binary out, one row per row, updated metadata) is
    identical."""
    target = width * height
    if not payload:
        return bytes(target)
    if len(payload) >= target:
        step = len(payload) / target
        return bytes(payload[int(i * step)] for i in range(target))
    reps = -(-target // len(payload))
    return (payload * reps)[:target]


def resize_media(df: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize/resample each payload to a fixed geometry — binary in,
    binary out through one Arrow-batched mapInPandas stage, with the
    metadata struct rewritten to the new geometry. The
    transform-in-place shape of every media normalization pass
    (resize, re-encode, loudness-normalize): at 100 TB the output
    payload column is the dominant write, and the fixed geometry makes
    output partition sizing exact (rows x width x height bytes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [_stub_resize(p, width, height) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": resized,
                    "media_meta": [
                        {
                            "n_bytes": len(p),
                            "content_type": "application/octet-stream",
                            "width": width,
                            "height": height,
                        }
                        for p in resized
                    ],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, RESIZE_SCHEMA)


def sample_frames(df: DataFrame, stride: int = FRAME_STRIDE) -> DataFrame:
    """Frame-sampling UDTF shape: each payload ("video") emits one row
    per ``stride`` bytes — a multi-row mapInPandas emit, the same plan
    shape as real video frame extraction."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            offs: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # null payload: treat as empty
                    payload = b""
                n_frames = max(len(payload) // stride, 1)
                for i in range(n_frames):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    offs.append(i * stride)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_offset": offs}
            )

    return df.select("doc_id", "payload").mapInPandas(run, FRAME_SCHEMA)
