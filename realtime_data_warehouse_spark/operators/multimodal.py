"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas functions over mapInPandas. The media libraries (PIL/ffmpeg/
torchaudio) are NOT in this container, so the actual decoders are
stubbed behind clearly-marked hooks (NotImplementedError or a
deterministic fake) — the Spark-side plumbing (schema, partition
sizing, UDF signature, batch shape) is real and tested.

Scale notes: binary payloads dominate row size, so the operators
repartition by byte budget, not row count, before the pandas stage —
a 100 TB media corpus needs ~8-64 MB of payload per Arrow batch, not
a fixed row count.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried next to every media payload
MEDIA_META = T.StructType([
    T.StructField("mime", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
    T.StructField("n_bytes", T.LongType()),
])


def attach_binary_payload(df: DataFrame, text_col: str = "text",
                          out_col: str = "payload") -> DataFrame:
    """Testdata shim: materialize an opaque binary column (UTF-8 bytes
    of the text) standing in for image/audio bytes. In production this
    column arrives from the lake directly."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def with_media_metadata(df: DataFrame, payload_col: str = "payload",
                        mime: str = "application/octet-stream") -> DataFrame:
    """Typed metadata from the payload without decoding it: byte
    length plus deterministic fake dimensions (a real pipeline reads
    these from the container header — cheap, no full decode)."""
    n = F.octet_length(F.col(payload_col))
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            n.cast("long").alias("n_bytes"),
            F.pmod(n, F.lit(640)).cast("int").alias("width"),
            F.pmod(F.expr(f"octet_length({payload_col}) div 7"), F.lit(480)).cast("int").alias("height"),
        ),
    )


def decode_image(payload: bytes) -> object:
    """Real decoder hook — requires an image library not present in
    this container. Marked stub per the build contract."""
    raise NotImplementedError(
        "image decode requires PIL/opencv (not installed); "
        "use fake_features for deterministic pipeline tests"
    )


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic decode stand-in: per-slice mean byte value,
    normalized to [0,1]. Keeps golden tests stable while exercising
    the exact batch shapes a real extractor would."""
    if not payload:
        return [0.0] * dim
    step = max(1, len(payload) // dim)
    out = []
    for i in range(dim):
        chunk = payload[i * step:(i + 1) * step] or payload[-step:]
        out.append(round(sum(chunk) / len(chunk) / 255.0, 6))
    return out


def extract_features(df: DataFrame, id_col: str = "doc_id",
                     payload_col: str = "payload",
                     target_batch_bytes: int = 32 * 1024 * 1024) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    The partition count is derived from the total payload byte budget
    (binary rows are heavy; row-count-based sizing would OOM the Arrow
    batches at scale)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_features(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "features": feats,
                "n_bytes": pdf[payload_col].map(len).astype("int64"),
            })

    slim = df.select(id_col, payload_col)
    return slim.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample(df: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "payload", every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling plumbing demo: one output row per sampled
    "frame" (fixed byte stride standing in for a video timestamp
    stride). Output explodes — exactly like real frame sampling — so
    downstream operators see the fan-out shape."""

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_byte", T.IntegerType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            # Vectorized fan-out: concat all payloads into one uint8
            # buffer, compute every frame offset with numpy arithmetic,
            # and gather — no per-row Python loop over the heaviest
            # payload family.
            payloads = pdf[payload_col].to_numpy()
            lengths = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                                  count=len(payloads))
            n_frames = -(-lengths // every_n_bytes)  # ceil-div; 0 for empty
            row_of = np.repeat(np.arange(len(payloads)), n_frames)
            idxs = np.arange(n_frames.sum(), dtype=np.int64) - np.repeat(
                np.concatenate(([0], n_frames.cumsum()[:-1])), n_frames
            )
            starts = np.concatenate(([0], lengths.cumsum()[:-1]))
            buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            offsets = starts[row_of] + idxs * every_n_bytes
            yield pd.DataFrame({
                "doc_id": pd.Series(pdf[id_col].to_numpy()[row_of], dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_byte": pd.Series(buf[offsets], dtype="int32"),
            })

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def resize_payload(df: DataFrame, id_col: str = "doc_id",
                   payload_col: str = "payload", out_len: int = 16) -> DataFrame:
    """Resize plumbing demo: nearest-neighbor resample of each payload
    to a fixed `out_len` bytes (index j reads byte floor(j*n/out_len))
    — the byte-level stand-in for image resize, with the same contract
    a real resizer has: fixed-size output per row, vectorized batch
    kernel, no Python loop over rows. Empty payloads emit no rows.

    Output long (doc_id, n_bytes, j, b) so every resampled byte is
    value-hashable."""
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("j", T.IntegerType()),
        T.StructField("b", T.IntegerType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = pdf[payload_col].to_numpy()
            lengths = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                                  count=len(payloads))
            keep = lengths > 0
            payloads, lengths = payloads[keep], lengths[keep]
            if not len(payloads):
                continue
            ids = pdf[id_col].to_numpy()[keep]
            buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            starts = np.concatenate(([0], lengths.cumsum()[:-1]))
            j = np.tile(np.arange(out_len, dtype=np.int64), len(payloads))
            row_of = np.repeat(np.arange(len(payloads)), out_len)
            offsets = starts[row_of] + (j * lengths[row_of]) // out_len
            yield pd.DataFrame({
                "doc_id": pd.Series(ids[row_of], dtype="int64"),
                "n_bytes": pd.Series(lengths[row_of], dtype="int64"),
                "j": pd.Series(j, dtype="int32"),
                "b": pd.Series(buf[offsets], dtype="int32"),
            })

    return df.select(id_col, payload_col).mapInPandas(run, schema)
