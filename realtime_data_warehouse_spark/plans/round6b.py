"""Round-6 additions, batch 2 (appended AFTER plans/round6.py in
plans/registry.py — append-only registry discipline, driver-gate
prefix untouched).

Entries:
- stream_neardup_gate: streaming NEAR-dup ingest gate — arriving
  documents are LSH-checked against a stored corpus band index AND
  against earlier arrivals, and accepted/rejected with a reason. The
  incremental form of the batch decontaminate/near-dup family: until
  this entry every streaming dedup was exact-fingerprint only.
- stream_ann_route: streaming retrieval serving — a stream of query
  vectors gets exact top-k against the static corpus per micro-batch
  (the broadcast-probe pattern of brute_force_topk, streamed).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as S
from ..operators.dedup import band_keys, with_shingles
from ..sources.batch import fan_out, load_table
from ..streaming.runner import read_back, run_foreach_batch, staged_files_dir
from .datapipe import _SHINGLES
from .registry import register
from .streaming_queries import _stage_once

# ---------------------------------------------------------------------------
# Streaming near-dup ingest gate
# ---------------------------------------------------------------------------

# Gate rule (deterministic, batch-split invariant): an arriving doc d
# is REJECTED iff some doc o with jaccard(d, o) >= 0.8 exists where o
# is (a) in the pre-existing corpus, or (b) an EARLIER arrival
# (smaller doc_id — arrival order is doc_id order), regardless of
# whether o itself was accepted. The earlier-arrival rule is
# deliberately non-recursive: "was this content already seen at
# ingest time", not "is it a duplicate of a kept doc" — recursive
# keep-chain semantics are the batch clustering family's job
# (dedup_clusters_converged).
_NEARDUP_GATE_ORACLE = f"""
    WITH sh AS ({_SHINGLES}),
    inv AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    pairs AS (
        SELECT a.doc_id AS d, b.doc_id AS o, count(*) AS common
        FROM inv a JOIN inv b
          ON a.s = b.s AND a.doc_id % 10 = 0
         AND (b.doc_id % 10 <> 0 OR b.doc_id < a.doc_id)
        GROUP BY 1, 2
    ),
    matched AS (
        SELECT p.d, p.o
        FROM pairs p
        JOIN (SELECT doc_id, len(sh) AS n FROM sh) sa ON p.d = sa.doc_id
        JOIN (SELECT doc_id, len(sh) AS n FROM sh) sb ON p.o = sb.doc_id
        WHERE p.common / (sa.n + sb.n - p.common) >= 0.8
    ),
    flags AS (
        SELECT d AS doc_id,
               max(CASE WHEN o % 10 <> 0 THEN 1 ELSE 0 END) AS m_corpus,
               max(CASE WHEN o % 10 = 0 THEN 1 ELSE 0 END)  AS m_earlier
        FROM matched GROUP BY 1
    )
    SELECT i.doc_id,
           f.doc_id IS NULL AS accepted,
           CASE WHEN f.m_corpus = 1 THEN 'corpus'
                WHEN f.m_earlier = 1 THEN 'earlier' END AS reject_reason
    FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) i
    LEFT JOIN flags f ON i.doc_id = f.doc_id
"""


@register("stream_neardup_gate", oracle=_NEARDUP_GATE_ORACLE)
def stream_neardup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming NEAR-dup ingest gate: 10% of the documents table
    (doc_id % 10 == 0) arrives as a 3-micro-batch stream and each doc
    is accepted only if it is not a near-dup (word-bigram Jaccard ≥
    0.8) of (a) the stored 90% corpus or (b) any earlier arrival.
    Output per arrival: (doc_id, accepted, reject_reason∈{corpus,
    earlier, NULL}).

    This is the incremental form of the batch near-dup family
    (dedup_minhash_lsh / decontaminate_neardup): a day's crawl lands
    as a batch and is matched against an INDEX ON STORAGE, never
    against raw history. The index is the banded-minhash bucket table
    (operators/dedup.band_keys — the same 32×4 banding the batch
    self-join uses, recall ≈ 1−5e-8 at j ≥ 0.8, false positives
    removed by exact shingle verification, so stream ≡ batch ≡ the
    exact inverted-index SQL the oracle runs):

    - build once per corpus: corpus (band_idx, band_key, doc_id) +
      (doc_id, shingles) parquet — the write-once analogue of the
      reference pre-keying HBase dim tables (HBaseUtil.java:80-103);
    - per micro-batch: batch docs → shingles → band keys, equi-join
      against corpus index ∪ seen-arrivals index ∪ the batch itself
      (earlier-id rows only), exact-verify candidates, emit verdicts,
      append the batch's bands+shingles to the seen index.

    Scale: per-batch cost is (batch bands) ⋈ (index bands) — an
    equi-join on uniform band hashes, never all-pairs; index growth
    is the arrival stream itself (bounded by retention in a real
    deployment). State lives in parquet, not the state store, so a
    10⁹-doc index is a storage fact, not a heap fact. No watermark:
    the gate is per-record w.r.t. event time (T3 pattern); ordering
    is carried by arrival (file) order, as in a Kafka-keyed topic."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    incoming = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)

    def build(base: str) -> dict[str, str]:
        sh = with_shingles(fan_out(corpus), "text", 2, drop_empty=True).select(
            "doc_id", "shingles")
        bands_dir = os.path.join(base, "corpus_bands")
        sh_dir = os.path.join(base, "corpus_shingles")
        sh.write.mode("overwrite").parquet(sh_dir)
        sh_back = spark.read.parquet(sh_dir)  # reuse the staged pass
        band_keys(sh_back, "doc_id").write.mode("overwrite").parquet(bands_dir)
        in_dir = staged_files_dir(incoming, os.path.join(base, "stream"),
                                  n_files=3, order_col="doc_id")
        return {"bands": bands_dir, "shingles": sh_dir, "in": in_dir}

    dirs = _stage_once(sf_dir, "neardup_gate", build)
    rundir = tempfile.mkdtemp(prefix="rdw_streamq_gate_")
    out, ck = os.path.join(rundir, "out"), os.path.join(rundir, "ck")
    seen_bands = os.path.join(rundir, "seen_bands")
    seen_sh = os.path.join(rundir, "seen_shingles")
    # initialize the seen index empty so batch 0 can read it
    empty = incoming.limit(0)
    sh0 = with_shingles(empty, "text", 2).select("doc_id", "shingles")
    sh0.write.mode("overwrite").parquet(seen_sh)
    band_keys(sh0, "doc_id").write.mode("overwrite").parquet(seen_bands)

    def gate_batch(batch: DataFrame, _bid: int) -> None:
        # side inputs re-derived from batch.sparkSession (the
        # micro-batch execution session), same discipline as
        # streaming/sinks.upsert_batch — never close over an
        # outer-session DataFrame inside foreachBatch
        sp = batch.sparkSession
        corpus_bands = sp.read.parquet(dirs["bands"])
        corpus_sh = sp.read.parquet(dirs["shingles"])
        batch = batch.persist()
        try:
            sh_b = with_shingles(batch, "text", 2, drop_empty=True).select(
                "doc_id", "shingles").persist()
            bands_b = band_keys(sh_b, "doc_id")
            # index side: corpus (always a hit source) + earlier
            # arrivals (cross-batch via the seen parquet, within-batch
            # via the earlier-id self rows)
            idx_bands = (
                corpus_bands.select(
                    F.col("doc_id").alias("o_id"), "band_idx", "band_key",
                    F.lit(True).alias("is_corpus"))
                .unionByName(sp.read.parquet(seen_bands).select(
                    F.col("doc_id").alias("o_id"), "band_idx", "band_key",
                    F.lit(False).alias("is_corpus")))
                .unionByName(bands_b.select(
                    F.col("doc_id").alias("o_id"), "band_idx", "band_key",
                    F.lit(False).alias("is_corpus")))
            )
            cands = (
                bands_b.join(
                    idx_bands,
                    (bands_b["band_idx"] == idx_bands["band_idx"])
                    & (bands_b["band_key"] == idx_bands["band_key"])
                    & (idx_bands["is_corpus"]
                       | (idx_bands["o_id"] < bands_b["doc_id"])),
                )
                .select("doc_id", "o_id", "is_corpus")
                .distinct()
            )
            idx_sh = (
                corpus_sh.unionByName(sp.read.parquet(seen_sh))
                .unionByName(sh_b)
                .select(F.col("doc_id").alias("o_id"),
                        F.col("shingles").alias("sh_o"))
            )
            verified = (
                cands.join(sh_b, "doc_id").join(idx_sh, "o_id")
            )
            common = F.size(F.array_intersect("shingles", "sh_o"))
            jac = common / (F.size("shingles") + F.size("sh_o") - common)
            flags = (
                verified.filter(jac >= 0.8)
                .groupBy("doc_id")
                .agg(F.max(F.col("is_corpus")).alias("m_corpus"))
            )
            verdict = batch.select("doc_id").join(flags, "doc_id", "left").select(
                "doc_id",
                F.col("m_corpus").isNull().alias("accepted"),
                F.when(F.col("m_corpus"), F.lit("corpus"))
                .when(~F.col("m_corpus"), F.lit("earlier"))
                .alias("reject_reason"),
            )
            verdict.write.mode("append").parquet(out)
            # grow the seen index with THIS batch's arrivals (accepted
            # or not — the gate rule is "content already seen")
            bands_b.write.mode("append").parquet(seen_bands)
            sh_b.write.mode("append").parquet(seen_sh)
            sh_b.unpersist()
        finally:
            batch.unpersist()

    sdf = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1").parquet(dirs["in"])
    )
    run_foreach_batch(sdf, gate_batch, ck)
    return read_back(spark, out)


# ---------------------------------------------------------------------------
# Streaming ANN retrieval serving
# ---------------------------------------------------------------------------

_COS6 = (
    "round(list_inner_product(q.e, c.e)"
    " / sqrt(list_inner_product(q.e, q.e)"
    " * list_inner_product(c.e, c.e)), 6)"
)

_ANN_ROUTE_ORACLE = f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings)
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_COS6} AS cos_sim
    FROM v q JOIN v c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < 30
    QUALIFY row_number() OVER (
        PARTITION BY q.vec_id ORDER BY {_COS6} DESC, c.vec_id
    ) <= 5
"""


@register("stream_ann_route", tier="variant", oracle=_ANN_ROUTE_ORACLE)
def stream_ann_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval SERVING as a stream: query vectors arrive in 3
    micro-batches and each batch gets exact top-5 cosine neighbors
    against the static corpus — the streaming twin of ann_brute_topk
    (same rounded-cosine cut, same oracle arithmetic), shaped like a
    production embedding-lookup service fed from a query log topic.

    Per batch the probe set is broadcast and the corpus is scanned
    once (brute_force_topk's plan); swapping in lsh_topk/ivf_topk
    gives the sublinear serving path with the recall trade the
    ann_lsh_recall / ann_recall_report entries measure. Append-only
    sink: results are immutable per query. No watermark — per-record
    serving, no event-time aggregation (T3)."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 30).select("vec_id", "embedding")
    in_dir = _stage_once(
        sf_dir, "ann_route",
        lambda base: staged_files_dir(queries, base, n_files=3,
                                      order_col="vec_id"),
    )
    rundir = tempfile.mkdtemp(prefix="rdw_streamq_ann_")
    out, ck = os.path.join(rundir, "out"), os.path.join(rundir, "ck")

    def route_batch(batch: DataFrame, _bid: int) -> None:
        corpus = fan_out(load_table(batch.sparkSession, sf_dir, "embeddings"))
        S.brute_force_topk(corpus, batch, k=5, id_col="vec_id",
                           rank_rounded=True).write.mode("append").parquet(out)

    sdf = (
        spark.readStream
        .schema(queries.schema)
        .option("maxFilesPerTrigger", "1").parquet(in_dir)
    )
    run_foreach_batch(sdf, route_batch, ck)
    return read_back(spark, out)
