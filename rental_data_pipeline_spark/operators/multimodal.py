"""Multimodal-column plumbing: opaque ``binary`` payloads with typed
metadata, decoded/feature-extracted via Arrow-batched ``mapInPandas``.

Beyond-reference training-data operators. The codec is REAL: a
pure-stdlib 24-bit BMP reader/writer (``encode_bmp``/``decode_bmp`` —
little-endian header parse, 4-byte row padding, bottom-up pixel order,
BGR channel layout), so ``decode_features`` and ``resize_media``
operate on genuine image bytes end to end; swapping in PIL/ffmpeg for
richer formats changes the per-row codec call, not the plan. The
Spark side is the part that matters at scale and is fully exercised:
the binary column, the metadata struct, the ``mapInPandas`` batch
shape (pandas DataFrame in/out, Arrow transfer), the multi-row
frame-sampling emit, and the output schemas.

At 100 TB the payload column dominates I/O: these operators project the
payload only inside the UDF stage (column pruning upstream), and the
frame sampler emits rows proportional to payload size — partition by
expected output, not input, when writing.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
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
    from rental_data_pipeline_spark.operators.planmeta import plan_partitions, plan_rows

    spark = df.sparkSession
    n_rows = plan_rows(df)  # zero-column parquet scan, memoized per session
    target = min(
        spark.sparkContext.defaultParallelism,
        max(1, -(-n_rows // ROWS_PER_PYTHON_PARTITION)),
    )
    if plan_partitions(df) < target:
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


# --- pure-stdlib 24-bit BMP codec ------------------------------------
# BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40 bytes), BI_RGB,
# bottom-up rows padded to 4 bytes, BGR byte order — the classic
# uncompressed Windows bitmap.  Real bytes, real parse: the decoder
# validates magic/bpp/compression, honors the pixel-array offset, and
# walks rows EXCLUDING padding (a parser that averaged padding zeros
# or swapped the BGR order fails the oracle's channel means).

BMP_HEADER_BYTES = 54


def _bmp_stride(width: int) -> int:
    return ((3 * width + 3) // 4) * 4


def encode_bmp(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """A ``width x height`` 24-bit BMP uniformly filled with ``rgb``."""
    r, g, b = rgb
    row = bytes((b, g, r)) * width
    row += b"\x00" * (_bmp_stride(width) - len(row))
    pixels = row * height
    head = struct.pack(
        "<2sIHHI", b"BM", BMP_HEADER_BYTES + len(pixels), 0, 0,
        BMP_HEADER_BYTES,
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels),
        2835, 2835, 0, 0,
    )
    return head + info + pixels


def decode_bmp(payload: bytes | None) -> dict | None:
    """Parse a 24-bit BI_RGB BMP: geometry + exact per-channel means.
    Returns ``None`` for null/undecodable payloads — one bad row must
    not kill an hours-long stage (task retries fail identically)."""
    if payload is None or len(payload) < BMP_HEADER_BYTES:
        return None
    if bytes(payload[:2]) != b"BM":
        return None
    (offset,) = struct.unpack_from("<I", payload, 10)
    hdr_sz, width, height, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr_sz < 40 or bpp != 24 or comp != 0 or width <= 0 or height == 0:
        return None
    h = abs(height)  # negative height = top-down; means are order-free
    stride = _bmp_stride(width)
    if offset + stride * h > len(payload):
        return None
    tot_b = tot_g = tot_r = 0
    for y in range(h):
        base = offset + y * stride
        row = payload[base : base + 3 * width]  # padding excluded
        tot_b += sum(row[0::3])
        tot_g += sum(row[1::3])
        tot_r += sum(row[2::3])
    n = width * h
    return {
        "n_bytes": len(payload),
        "width": width,
        "height": h,
        "n_pixels": n,
        "mean_r": tot_r / n,
        "mean_g": tot_g / n,
        "mean_b": tot_b / n,
    }


def _resize_bmp(payload: bytes, width: int, height: int) -> bytes | None:
    """Nearest-neighbor resample to ``width x height``; None when the
    input doesn't decode."""
    if payload is None or len(payload) < BMP_HEADER_BYTES:
        return None
    if bytes(payload[:2]) != b"BM":
        return None
    (offset,) = struct.unpack_from("<I", payload, 10)
    hdr_sz, w0, h0, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr_sz < 40 or bpp != 24 or comp != 0 or w0 <= 0 or h0 == 0:
        return None
    h_abs = abs(h0)
    s0 = _bmp_stride(w0)
    if offset + s0 * h_abs > len(payload):
        return None
    s1 = _bmp_stride(width)
    rows = []
    for y in range(height):
        sy = y * h_abs // height
        base = offset + sy * s0
        out = bytearray(s1)  # zero padding built in
        for x in range(width):
            sx = x * w0 // width
            out[3 * x : 3 * x + 3] = payload[base + 3 * sx : base + 3 * sx + 3]
        rows.append(bytes(out))
    pixels = b"".join(rows)
    head = struct.pack(
        "<2sIHHI", b"BM", BMP_HEADER_BYTES + len(pixels), 0, 0,
        BMP_HEADER_BYTES,
    )
    # preserve the source's row direction (sign of height)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height if h0 > 0 else -height, 1, 24,
        0, len(pixels), 2835, 2835, 0, 0,
    )
    return head + info + pixels


# deterministic per-doc geometry/fill for the synthetic image corpus
# (mirrored by the DuckDB oracle in queries_training.py — the decode
# must parse these values back OUT of real BMP bytes)
def _doc_geometry(doc_id: int) -> tuple[int, int, tuple[int, int, int]]:
    return (
        4 + doc_id % 13,
        3 + doc_id % 7,
        (doc_id % 251, (doc_id * 7) % 251, (doc_id * 13) % 251),
    )


def pack_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL 24-bit BMP payload per document (geometry and
    fill derived from the id — the decode oracle recomputes them in
    SQL, so a header mis-parse, padding leak, or BGR/RGB swap is a
    hash mismatch, not a silent pass)."""
    df = _python_stage_partitions(df, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                w, h, rgb = _doc_geometry(int(doc_id))
                payloads.append(encode_bmp(w, h, rgb))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return df.select(F.col(id_col)).mapInPandas(run, schema)


def decode_features(df: DataFrame) -> DataFrame:
    """Decode/feature-extract each payload via mapInPandas (Arrow
    batches; pandas in/out). Output: one row per input doc;
    undecodable payloads yield ``ok=false`` with null features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                feat = decode_bmp(payload)
                if feat is None:
                    rows.append({"doc_id": int(doc_id), "ok": False})
                else:
                    rows.append({"doc_id": int(doc_id), "ok": True, **feat})
            if rows:
                yield pd.DataFrame(
                    rows, columns=[f.name for f in DECODE_SCHEMA.fields]
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


def resize_media(df: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Nearest-neighbor resize of each BMP payload to a fixed geometry
    — binary in, binary out through one Arrow-batched mapInPandas
    stage, with the metadata struct rewritten to the new geometry.
    Undecodable payloads pass through as null payload + null metadata
    (quarantine downstream on ``media_meta IS NULL``). The
    transform-in-place shape of every media normalization pass
    (resize, re-encode, loudness-normalize): at 100 TB the output
    payload column is the dominant write, and the fixed geometry makes
    output partition sizing exact (rows x stride x height bytes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [_resize_bmp(p, width, height) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": resized,
                    "media_meta": [
                        None
                        if p is None
                        else {
                            "n_bytes": len(p),
                            "content_type": "image/bmp",
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
