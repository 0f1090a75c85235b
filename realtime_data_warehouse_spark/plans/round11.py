"""Round-11 registry entries — real media decode (de-stubbing the
multimodal hooks) plus micro-batch-latency support entries.

Append-only discipline: this module is imported LAST by
plans/registry.py, so every earlier round's natural-order gate prefix
is byte-identical.

The real-decode gate pattern (same as the round-3 multimodal four):
the testdata shim synthesizes GENUINE container bytes (spec-
conformant BMP / RIFF-WAV, operators/multimodal.encode_bmp /
encode_wav) whose decoded content is an ANALYTIC function of the row
id — so the DuckDB oracle states the expected decoded pixels/samples
without touching bytes at all, and the Spark side must run the real
numpy decoder (decode_bmp / decode_wav) to reproduce them. The BMP
widths cycle 5..8, putting 1/2/3/0 pad bytes on every row: a decoder
that mishandles 4-byte row padding, BGR channel order, or bottom-up
row order cannot match the oracle. Reference anchor: the reference
ships no media path at all (seedoilz/realtime-data-warehouse is
events-only); this family is part of the training-data-pipeline
surface the build brief adds beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import multimodal as M
from ..sources.batch import load_table
from .registry import register


@register(
    "multimodal_real_decode",
    # analytic twin of attach_bmp_payload's pixel law — the oracle
    # never parses BMP bytes; only a CORRECT real decode of the real
    # file bytes agrees with it
    oracle="""
    WITH d AS (
        SELECT doc_id,
               CAST(5 + doc_id % 4 AS INT) AS w,
               CAST(3 + doc_id % 3 AS INT) AS h
        FROM documents
    ),
    px AS (
        SELECT d.doc_id, d.w, d.h,
               CAST(t.y AS INT) AS y, CAST(q.c AS INT) AS c,
               (d.doc_id + 3 * (t.y * d.w + u.x) + q.c) % 256 AS v
        FROM d,
             LATERAL unnest(range(0, d.h)) AS t(y),
             LATERAL unnest(range(0, d.w)) AS u(x),
             LATERAL unnest(range(0, 3)) AS q(c)
    )
    SELECT doc_id, y, c, CAST(SUM(v) AS BIGINT) AS s, w, h
    FROM px
    GROUP BY doc_id, y, c, w, h
    """,
)
def multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end to end (round 11, upgrading multimodal
    from partial to done): synthesize a genuine 24-bit BMP per
    document (operators/multimodal.attach_bmp_payload), decode it
    with the pure-numpy decoder (decode_bmp — header parse +
    np.frombuffer + reshape + unpad + BGR→RGB + bottom-up flip), and
    emit per-(row, channel) pixel sums. Arrow-batched mapInPandas;
    payloads never leave the executor."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return M.real_image_decode(M.attach_bmp_payload(docs))


@register(
    "multimodal_wav_decode",
    oracle="""
    SELECT doc_id, CAST(t.i AS INT) AS i,
           CAST((doc_id * 31 + t.i * 7) % 65536 - 32768 AS INT) AS v
    FROM documents,
         LATERAL unnest(range(0, 16 + doc_id % 5)) AS t(i)
    """,
)
def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end to end: a genuine RIFF PCM-16 WAV per
    document, decoded by the pure-numpy chunk walker (decode_wav) —
    every sample value-hashed against the analytic oracle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return M.real_audio_decode(M.attach_wav_payload(docs))
