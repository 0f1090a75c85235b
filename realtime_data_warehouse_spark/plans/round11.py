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


@register(
    "scd2_changes_since",
    # same change model as stream_scd2_dim_history / the batch twin;
    # the predicate is the SCD2 range-scan the manifest stats serve:
    # "every version created at or after ts 1" (tombstones included —
    # a changes-feed consumer needs the closes too)
    oracle="""
    WITH chg AS (
        SELECT p_partkey, p_size, 0 AS ts, 'bootstrap-insert' AS typ FROM part
        UNION ALL
        SELECT p_partkey, p_size * 2, 1, 'update'
        FROM part WHERE p_partkey % 10000 < 500
        UNION ALL
        SELECT p_partkey, NULL, 2, 'delete'
        FROM part WHERE p_partkey % 1000 = 7
    ), v AS (
        SELECT p_partkey, p_size, ts, typ,
               lead(ts) OVER (PARTITION BY p_partkey ORDER BY ts) AS valid_to
        FROM chg
    )
    SELECT p_partkey, p_size, ts AS valid_from, valid_to, typ
    FROM v WHERE ts >= 1
    """,
)
def scd2_changes_since(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCD2 "changes since ts" feed through MANIFEST-STATS
    pruning (round 11 stretch, on the driver-checked surface): the
    same streamed CDC replay as stream_scd2_dim_history maintains the
    bucketed history table — whose manifest carries per-file
    valid_from min/max envelopes, gathered at commit from the same
    footer open that counts rows — and the read goes through
    merge_table.read_pruned, which opens ONLY the files whose
    envelope reaches ts >= 1 (bootstrap-only buckets skip) and
    applies the residual row filter. Hash-matching the full-history
    SQL twin proves the prune is an upper bound, never a row drop —
    the correctness side of SCALING Reading 17's bytes-read
    measurement."""
    import os as _os
    import tempfile as _tempfile

    from pyspark.sql import functions as F  # noqa: PLC0415

    from ..sources.cdc import changelog
    from ..streaming.merge_table import read_pruned
    from ..streaming.runner import run_foreach_batch, staged_files_dir
    from ..streaming.sinks import scd2_merge_batch
    from .streaming_queries import _stage_once

    part = load_table(spark, sf_dir, "part")
    chg = changelog(part, "sku_info", "p_partkey", None, "p_size",
                    with_deletes=True)
    rows = chg.select(
        F.col("data")["p_partkey"].cast("long").alias("p_partkey"),
        F.when(F.col("type") == "delete", F.lit(None).cast("int"))
         .otherwise(F.col("data")["p_size"].cast("int")).alias("p_size"),
        F.col("ts").cast("int").alias("valid_from"),
        F.col("type").alias("typ"),
    )
    in_dir = _stage_once(
        sf_dir, "scd2_changelog",
        lambda base: staged_files_dir(rows, base, n_files=3,
                                      order_col="valid_from"),
    )
    rundir = _tempfile.mkdtemp(prefix="rdw_r11_scd2since_")
    table_dir = _os.path.join(rundir, "history")
    sdf = (
        spark.readStream.schema(rows.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    run_foreach_batch(
        sdf,
        scd2_merge_batch(table_dir, "p_partkey"),
        checkpoint_dir=_os.path.join(rundir, "ck"),
        output_mode="append",
    )
    return read_pruned(spark, table_dir, "valid_from", lo=1).select(
        "p_partkey", "p_size", "valid_from", "valid_to", "typ")


@register(
    "multiwriter_additive_sum",
    oracle="""
    SELECT l_suppkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def multiwriter_additive_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERDICT r10 item 1's done-criterion on the driver-checked
    surface: TWO interleaved writers (threads, each its own ledgered
    additive sink with a distinct writer_id) push three disjoint
    micro-batches each into ONE merge table, concurrently — and the
    stored table must hash-match the serialized one-shot SQL
    aggregate. The commit CAS serializes the six commits (losers
    re-merge); sums ride DECIMAL through the sink so the result is
    exact and interleaving-independent; the writer_id namespace keeps
    the two queries' batch ids from colliding in the exactly-once
    ledger. Any lost update, double-apply, or torn manifest breaks
    the hash."""
    import os as _os
    import tempfile as _tempfile
    import threading

    from pyspark.sql import functions as F  # noqa: PLC0415

    from ..streaming.merge_table import read_table
    from ..streaming.sinks import additive_merge_batch

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_quantity")
    rundir = _tempfile.mkdtemp(prefix="rdw_r11_mw_")
    table = _os.path.join(rundir, "t")
    errors: list[Exception] = []

    def writer(w: int) -> None:
        try:
            fn = additive_merge_batch(
                table, keys=["l_suppkey"], sum_cols=["sum_qty"],
                writer_id=f"w{w}")
            for i in range(3):
                part = (
                    li.filter(F.pmod(F.col("l_orderkey"), F.lit(6))
                              == w * 3 + i)
                    .groupBy("l_suppkey")
                    .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                         .cast("decimal(38,2)").alias("sum_qty"))
                )
                fn(part, i)
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(w,)) for w in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]
    return read_table(spark, table).select(
        "l_suppkey", F.col("sum_qty").cast("double").alias("sum_qty"))
