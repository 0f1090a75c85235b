"""Training-data pipeline queries (dedup / similarity / text / multimodal)
over the `documents` and `embeddings` tables — the 100 TB-scale
operator set layered on top of the warehouse (BASELINE.json north
star). Oracle SQL mirrors each algorithm exactly; only the
xxhash64-based ops (SimHash, and the LSH *candidate* stage) have no
DuckDB twin — MinHash-LSH is still oracle-checked because its
verified output provably equals the exact Jaccard result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import multimodal as M
from ..operators import similarity as S
from ..operators import text as X
from ..sources.batch import fan_out, load_table
from .registry import register

# Shared oracle fragment: tokenize exactly like functions.tokenize.tokenize
_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"

# Shared oracle fragment: distinct word-bigram shingles
_SHINGLES = f"""
    SELECT doc_id,
           list_distinct(list_transform(range(1, len(toks)),
                                        i -> toks[i] || ' ' || toks[i+1])) AS sh
    FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
"""

_JACCARD_PAIRS_SQL = f"""
    WITH sh AS ({_SHINGLES}),
    inv AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sized AS (
        SELECT p.doc_a, p.doc_b, p.common, sa.n AS size_a, sb.n AS size_b
        FROM pairs p
        JOIN (SELECT doc_id, len(sh) AS n FROM sh) sa ON p.doc_a = sa.doc_id
        JOIN (SELECT doc_id, len(sh) AS n FROM sh) sb ON p.doc_b = sb.doc_id
    )
    SELECT doc_a, doc_b,
           round(common / (size_a + size_b - common), 6) AS jaccard
    FROM sized
    WHERE common / (size_a + size_b - common) >= 0.8
"""


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

@register(
    "text_stats",
    oracle=f"""
    SELECT doc_id,
           len({_TOKS})                                             AS ws_tokens,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS bpe_tokens,
           round(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g'))
                 / length(text), 6)                                 AS punct_ratio,
           round(len(list_filter({_TOKS},
                     t -> list_contains(['the','a','of','and','to','in','is'], t)))
                 / len({_TOKS}), 6)                                 AS stopword_ratio,
           round(list_aggregate(list_transform({_TOKS}, t -> length(t)), 'sum')
                 / len({_TOKS}), 6)                                 AS avg_token_len
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality-signal components: whitespace tokens,
    BPE-ish regex tokens, punctuation/stopword ratios, mean token
    length. One codegen'd projection, zero shuffles."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        X.ws_token_count("text").alias("ws_tokens"),
        X.bpe_ish_token_count("text").alias("bpe_tokens"),
        F.round(X.punct_ratio("text"), 6).alias("punct_ratio"),
        F.round(X.stopword_ratio("text"), 6).alias("stopword_ratio"),
        F.round(X.avg_token_len("text"), 6).alias("avg_token_len"),
    )


@register(
    "text_quality_filter",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               len({_TOKS}) AS n_tokens,
               len(list_filter({_TOKS},
                   t -> list_contains(['the','a','of','and','to','in','is'], t)))
                   / len({_TOKS}) AS stop_ratio
        FROM documents
    )
    SELECT doc_id, lang, n_tokens, round(stop_ratio, 6) AS stop_ratio
    FROM scored
    WHERE n_tokens BETWEEN 20 AND 500 AND stop_ratio >= 0.01
    """,
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate: keep documents in a sane token-length band with a
    minimum stopword ratio (boilerplate/garbage rejection). The filter
    runs pre-shuffle — at corpus scale this is the cheap pass that
    shrinks everything downstream."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    scored = docs.select(
        "doc_id", "lang",
        X.ws_token_count("text").alias("n_tokens"),
        X.stopword_ratio("text").alias("stop_ratio_raw"),
    )
    return scored.filter(
        (F.col("n_tokens").between(20, 500)) & (F.col("stop_ratio_raw") >= 0.01)
    ).select("doc_id", "lang", "n_tokens", F.round("stop_ratio_raw", 6).alias("stop_ratio"))


@register(
    "text_langid",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, lang,
               len(list_intersect(list_distinct({_TOKS}),
                   ['the','a','of','and','to','in','is']))            AS s_en,
               len(list_intersect(list_distinct({_TOKS}),
                   ['el','la','los','de','y','que','en']))            AS s_es,
               len(list_intersect(list_distinct({_TOKS}),
                   ['der','die','das','und','nicht','ist']))          AS s_de,
               len(list_intersect(list_distinct({_TOKS}),
                   ['le','la','les','et','de','un','est']))           AS s_fr
        FROM documents
    )
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
                WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
                WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
                WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
                ELSE 'fr' END AS predicted_lang
    FROM s
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via per-language stopword-hit scoring + argmax with
    deterministic tie order (operators.text.langid). A real system
    swaps in char-n-gram profiles; the operator shape is identical."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        X.langid("text").alias("predicted_lang"),
    )


@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-text md5 fingerprint (the exact-dedup key)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", X.fingerprint("text").alias("fp"))


# The synthetic corpus carries no natural PII, so the query injects a
# deterministic email/IP/account tail into every 5th document as part
# of the pipeline — the scrub then has real matches to find, and the
# oracle replays injection + sequential redaction identically.
_PII_INJECT = ("text || ' contact u' || CAST(doc_id AS VARCHAR)"
               " || '@ex.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
               " || '.9 acct 98765432' || CAST(doc_id % 10 AS VARCHAR)")

_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IP = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
_PII_NUM = "[0-9]{9,}"


@register(
    "pii_redaction",
    oracle=f"""
    WITH injected AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN {_PII_INJECT} ELSE text END AS t,
               CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS injected
        FROM documents
    ), s1 AS (
        SELECT doc_id, injected,
               len(regexp_extract_all(t, '{_PII_EMAIL}')) AS n_email,
               regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g') AS t
        FROM injected
    ), s2 AS (
        SELECT doc_id, injected, n_email,
               len(regexp_extract_all(t, '{_PII_IP}')) AS n_ip,
               regexp_replace(t, '{_PII_IP}', '<IP>', 'g') AS t
        FROM s1
    ), s3 AS (
        SELECT doc_id, injected, n_email, n_ip,
               len(regexp_extract_all(t, '{_PII_NUM}')) AS n_num,
               regexp_replace(t, '{_PII_NUM}', '<NUM>', 'g') AS t
        FROM s2
    )
    SELECT doc_id, injected, n_email, n_ip, n_num, md5(t) AS redacted_md5
    FROM s3
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass (operators/text.redact_pii): mask emails, IPv4
    literals and long digit runs, reporting per-pattern match counts
    and the md5 of the scrubbed text. Every 5th doc gets a
    deterministic PII tail appended first so the scrub is exercised
    on real matches (the corpus itself is synthetic word soup). One
    codegen'd projection, zero shuffles — the map-side scrub a 100 TB
    corpus runs before tokenization/dedup."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    injected_text = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact u"), F.col("doc_id").cast("string"),
            F.lit("@ex.com from 10.0."), (F.col("doc_id") % 256).cast("string"),
            F.lit(".9 acct 98765432"), (F.col("doc_id") % 10).cast("string"),
        ),
    ).otherwise(F.col("text"))
    staged = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, 1).otherwise(0).alias("injected"),
        injected_text.alias("t"),
    )
    redacted, (n_email, n_ip, n_num) = X.redact_pii(F.col("t"))
    return staged.select(
        "doc_id", "injected",
        n_email.alias("n_email"), n_ip.alias("n_ip"), n_num.alias("n_num"),
        F.md5(redacted).alias("redacted_md5"),
    )


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
    ), scored AS (
        SELECT doc_id, term, tf,
               count(*) OVER (PARTITION BY term) AS df_docs,
               (SELECT count(*) FROM documents) AS n_docs
        FROM tf
    )
    SELECT doc_id, term, tf, df_docs,
           tf * (n_docs + 1) / (df_docs + 1) AS tfidf
    FROM scored
    QUALIFY row_number() OVER (
        PARTITION BY doc_id
        ORDER BY tf * (n_docs + 1) / (df_docs + 1) DESC, term
    ) <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 terms by TF-IDF (operators/text.tfidf_top_terms):
    tokenize → doc-term frequencies → document frequency via a term-
    partition window over the AGGREGATED rows (never the raw token
    stream) → per-doc rank. Linear idf ratio keeps the score doubles
    bit-identical across engines (see the operator docstring)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return X.tfidf_top_terms(docs, top_k=3)


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------

@register(
    "dedup_exact_stats",
    oracle="""
    SELECT lang,
           count(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))))
               AS unique_docs,
           CAST(count(*) - count(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))))
               AS BIGINT) AS duplicate_docs
    FROM documents GROUP BY 1
    """,
)
def dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (hash-groupBy on the fingerprint): per-language
    survivor/duplicate counts."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return D.exact_dedup_stats(docs).withColumn(
        "duplicate_docs", F.col("duplicate_docs").cast("long")
    )


@register("dedup_ngram_jaccard", oracle=_JACCARD_PAIRS_SQL)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-bigram Jaccard near-dup pairs (≥ 0.8) via the
    inverted-index candidate join — the ground-truth path."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return D.jaccard_pairs(docs, threshold=0.8)


@register("dedup_minhash_lsh", oracle=_JACCARD_PAIRS_SQL)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(128) + LSH(32×4) candidates, exact-Jaccard verified.
    Output provably equals dedup_ngram_jaccard (recall ≈ 1−5e-8,
    verification kills false positives) — hence the same oracle —
    while the candidate join scales bucket-locally."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return D.minhash_lsh_pairs(docs, threshold=0.8)


@register(
    "dedup_simhash",
    oracle=f"""
    WITH hashes AS (
        SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
        FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
    ),
    votes AS (
        SELECT doc_id, b.bit,
               CASE WHEN 2 * SUM((h >> b.bit) & 1) > COUNT(*)
                    THEN (CAST(1 AS BIGINT) << b.bit) ELSE 0 END AS bv
        FROM hashes CROSS JOIN (SELECT unnest(range(60)) AS bit) b
        GROUP BY doc_id, b.bit
    ),
    sh AS (
        SELECT d.doc_id, COALESCE(v.sh, 0) AS sh
        FROM documents d
        LEFT JOIN (SELECT doc_id, CAST(SUM(bv) AS BIGINT) AS sh
                   FROM votes GROUP BY doc_id) v USING (doc_id)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sh, b.sh)) <= 8
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming ≤ 8, pigeonhole block-join
    candidates) on the engine-portable 60-bit md5 hash family — the
    PRIMARY simhash entry is oracle-checked bit-for-bit: the full
    chain (tokenize → per-token hash → bit vote → block join →
    hamming filter) replays in ANSI SQL. The oracle brute-forces the
    pair space (fine at sf0.01); the Spark plan stays
    block-join-local. The xxhash64 hash family (~3× cheaper per
    token, no SQL twin) ships as the rows-only perf variant
    `dedup_simhash_fast` in plans/extras.py."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return D.simhash_pairs(
        docs, max_hamming=8, hasher=D.simhash60_md5, bits=60
    )


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_inner_product(a.e, b.e)
                 / sqrt(list_inner_product(a.e, a.e) * list_inner_product(b.e, b.e)), 6)
               AS cos_sim
    FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_inner_product(a.e, b.e)
          / sqrt(list_inner_product(a.e, a.e) * list_inner_product(b.e, b.e)) >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within label blocks (block key
    = LSH bucket at scale). Threshold 0.4 fits the synthetic
    embeddings' similarity range."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    return S.cosine_near_dup_pairs(emb, threshold=0.4)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_ANN_ORACLE = """
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round(list_inner_product(q.e, c.e)
                 / sqrt(list_inner_product(q.e, q.e) * list_inner_product(c.e, c.e)), 6)
               AS cos_sim
    FROM v q JOIN v c ON c.vec_id <> q.vec_id {cell_cond}
    WHERE q.vec_id < 10
    QUALIFY row_number() OVER (
        PARTITION BY q.vec_id
        ORDER BY list_inner_product(q.e, c.e)
                 / sqrt(list_inner_product(q.e, q.e) * list_inner_product(c.e, c.e)) DESC,
                 c.vec_id
    ) <= 5
"""


@register("ann_brute_topk", oracle=_ANN_ORACLE.format(cell_cond=""))
def ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for probe vectors (vec_id < 10): broadcast
    probes × corpus scan + per-query window rank."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 10)
    return S.brute_force_topk(emb, queries, k=5)


@register("ann_ivf_topk", oracle=_ANN_ORACLE.format(cell_cond="AND c.label = q.label"))
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: search restricted to the query's coarse cell —
    the 1/n_cells-cost scale path with identical plan shape."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 10)
    return S.ivf_topk(emb, queries, k=5)


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------

@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           'application/octet-stream'                          AS mime,
           CAST(octet_length(encode(text)) AS BIGINT)          AS n_bytes,
           CAST(octet_length(encode(text)) % 640 AS INT)       AS width,
           CAST((octet_length(encode(text)) // 7) % 480 AS INT) AS height
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload + typed header metadata without decode
    (operators.multimodal.with_media_metadata)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    payloads = M.attach_binary_payload(docs)
    out = M.with_media_metadata(payloads)
    return out.select(
        "doc_id",
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT d.doc_id,
           CAST(i AS INT)                                   AS frame_idx,
           ascii(substr(d.text, CAST(i AS INT) * 64 + 1, 1)) AS frame_byte
    FROM documents d,
         LATERAL unnest(range(0, CAST(ceil(length(d.text) / 64.0) AS BIGINT))) AS t(i)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads via mapInPandas (fixed byte
    stride standing in for a timestamp stride). The payload is UTF-8
    of ASCII text, so the DuckDB oracle can state the same bytes with
    substr+ascii — a rare case where the pandas path has an exact SQL
    twin."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    payloads = M.attach_binary_payload(docs)
    return M.frame_sample(payloads).withColumn(
        "frame_byte", F.col("frame_byte").cast("int")
    )


@register(
    "multimodal_features",
    # SQL twin of operators.multimodal.fake_features: the payload is
    # UTF-8 of ASCII text, so the byte math (8 chunks of step =
    # max(1, n//8) bytes, per-chunk mean/255 rounded to 6, empty
    # chunks falling back to the last `step` bytes, empty payloads to
    # 0.0) is stated exactly with substr+ascii — the decode stub stays
    # a stub, but the whole Arrow plumbing is hash-checked end to end.
    oracle="""
    WITH d AS (
        SELECT doc_id, text, length(text) AS n,
               greatest(1, length(text) // 8) AS step
        FROM documents
    ),
    means AS (
        SELECT doc_id, CAST(i // step AS INT) AS j,
               round(avg(ascii(substr(text, CAST(i AS INT) + 1, 1))) / 255.0, 6) AS f
        FROM d, LATERAL unnest(range(0, least(n, 8 * step))) AS t(i)
        GROUP BY 1, 2
    ),
    fallback AS (
        SELECT doc_id,
               round(avg(ascii(substr(text, CAST(i AS INT) + 1, 1))) / 255.0, 6) AS f
        FROM d, LATERAL unnest(range(greatest(0, n - step), n)) AS t(i)
        GROUP BY 1
    ),
    grid AS (
        SELECT doc_id, n, CAST(j AS INT) AS j
        FROM d, LATERAL unnest(range(0, 8)) AS t(j)
    )
    SELECT g.doc_id, CAST(g.n AS BIGINT) AS n_bytes, g.j,
           coalesce(m.f, fb.f, 0.0) AS f
    FROM grid g
    LEFT JOIN means m ON m.doc_id = g.doc_id AND m.j = g.j
    LEFT JOIN fallback fb ON fb.doc_id = g.doc_id
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction (deterministic fake decode —
    media libs absent; operators.multimodal.fake_features documents
    the real-decoder hook). Emitted long (doc_id, j, f) so every one
    of the 8 feature slots is value-hashed against the SQL twin."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    payloads = M.attach_binary_payload(docs)
    feats = M.extract_features(payloads)
    return feats.select(
        "doc_id", "n_bytes", F.posexplode("features").alias("j", "f")
    )


@register(
    "ann_lsh_topk",
    oracle="""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
               (CASE WHEN embedding[1]  >= 0 THEN 1   ELSE 0 END
              + CASE WHEN embedding[9]  >= 0 THEN 2   ELSE 0 END
              + CASE WHEN embedding[17] >= 0 THEN 4   ELSE 0 END
              + CASE WHEN embedding[25] >= 0 THEN 8   ELSE 0 END
              + CASE WHEN embedding[33] >= 0 THEN 16  ELSE 0 END
              + CASE WHEN embedding[41] >= 0 THEN 32  ELSE 0 END
              + CASE WHEN embedding[49] >= 0 THEN 64  ELSE 0 END
              + CASE WHEN embedding[57] >= 0 THEN 128 ELSE 0 END) AS bucket
        FROM embeddings
    )
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round(list_inner_product(q.e, c.e)
                 / sqrt(list_inner_product(q.e, q.e) * list_inner_product(c.e, c.e)), 6)
               AS cos_sim
    FROM v q JOIN v c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
    WHERE q.vec_id < 10
    QUALIFY row_number() OVER (
        PARTITION BY q.vec_id
        ORDER BY list_inner_product(q.e, c.e)
                 / sqrt(list_inner_product(q.e, q.e) * list_inner_product(c.e, c.e)) DESC,
                 c.vec_id
    ) <= 5
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed cosine top-5 (similarity.lsh_topk): sign-hash
    buckets as the partition key, candidates from the bucket
    equi-join — the third ANN strategy next to brute force (exact
    anchor) and IVF (centroid cells). Note the comparison is
    float-sign on the RAW float column in both engines (the oracle
    tests embedding[i] before the double cast) so bucket assignment
    is bit-identical."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 10)
    return S.lsh_topk(emb, queries, k=5)


@register(
    "multimodal_resize",
    oracle="""
    SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(j AS INTEGER) AS j,
           ascii(substr(text, CAST((j * length(text)) // 16 AS INT) + 1, 1)) AS b
    FROM documents, LATERAL unnest(range(0, 16)) AS t(j)
    WHERE length(text) > 0
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor byte resample to 16 bytes per payload
    (operators/multimodal.resize_payload) — the "resize" verb of the
    multimodal family, decoder-free so the whole vectorized gather is
    hash-checked against octet arithmetic in SQL."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    payloads = M.attach_binary_payload(docs)
    return M.resize_payload(payloads, out_len=16)


@register(
    "embedding_normalize",
    oracle="""
    SELECT vec_id, CAST(gs - 1 AS INTEGER) AS pos,
           round(x / sqrt(list_inner_product(e, e)), 6) AS val
    FROM (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
               unnest(CAST(embedding AS DOUBLE[])) AS x,
               generate_subscripts(embedding, 1) AS gs
        FROM embeddings
    )
    """,
)
def embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize every embedding — the standard pre-ANN/pre-dedup
    transform (unit vectors make cosine = dot). Entirely JVM-side
    array expressions: the norm is a sequential fold (same summation
    order as the oracle's list_inner_product, so the doubles are
    bit-identical), materialized in its own projection before the
    per-element divide (HOF lambdas have no CSE). Emitted long
    (vec_id, pos, val) so every coordinate is value-hashed."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = S.as_double("embedding")
    staged = emb.select(
        "vec_id", v.alias("v"),
        F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)).alias("n"),
    )
    return staged.select(
        "vec_id",
        F.posexplode(F.transform("v", lambda x: F.round(x / F.col("n"), 6)))
        .alias("pos", "val"),
    )


# One Lloyd's step in DuckDB SQL: assign every vector to its nearest
# centroid in {prev}, then per-cell per-dimension mean, rounded to
# the same 1e-6 grid kmeans_train's quantize=6 uses; empty cells keep
# their previous centroid. The assignment orders by the SAME
# grid-quantized expanded squared distance as the Spark side
# (similarity._sq_dists: round(x²−2xc+c², 6), ties to lowest cell) so
# argmin near-ties resolve identically on both engines.
_SQ_DIST = ("round(list_inner_product(e.v, e.v)"
            " - 2 * list_inner_product(e.v, c.c)"
            " + list_inner_product(c.c, c.c), 6)")

#: `t` suffixes the CTE names so several independent trainings (e.g.
#: one per PQ subspace) can unroll in one WITH clause; `src` is the
#: (vec_id, v) table the step assigns.
_LLOYD_STEP = """
    a{t}{i} AS (
        SELECT vec_id, v, cell FROM (
            SELECT e.vec_id, e.v, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {sq}, c.cell) AS rk
            FROM {src} e CROSS JOIN {prev} c
        ) WHERE rk = 1
    ),
    m{t}{i} AS (
        SELECT cell, list(round(s / n, 6) ORDER BY pos) AS c
        FROM (
            SELECT cell, pos, SUM(x) AS s, COUNT(*) AS n
            FROM (SELECT cell, unnest(v) AS x,
                         generate_subscripts(v, 1) AS pos
                  FROM a{t}{i})
            GROUP BY cell, pos
        )
        GROUP BY cell
    ),
    c{t}{i} AS (
        SELECT p.cell, coalesce(m{t}{i}.c, p.c) AS c
        FROM {prev} p LEFT JOIN m{t}{i} USING (cell)
    )
"""

_IVF_TRAINED_ORACLE = (
    """
    WITH emb AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    c0 AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
               list_transform(v, x -> round(x, 6)) AS c
        FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT 8)
    ),
    """
    + _LLOYD_STEP.format(i=1, t="", prev="c0", sq=_SQ_DIST, src="emb") + ","
    + _LLOYD_STEP.format(i=2, t="", prev="c1", sq=_SQ_DIST, src="emb") + ","
    + f"""
    corpus AS (
        SELECT vec_id AS neighbor_id, v AS cv, cell FROM (
            SELECT e.vec_id, e.v, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_SQ_DIST}, c.cell) AS rk
            FROM emb e CROSS JOIN c2 c
        ) WHERE rk = 1
    ),
    probes AS (
        SELECT vec_id AS query_id, v AS qv, cell FROM (
            SELECT e.vec_id, e.v, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_SQ_DIST}, c.cell) AS rk
            FROM emb e CROSS JOIN c2 c
            WHERE e.vec_id < 10
        ) WHERE rk <= 2
    )
    SELECT query_id, neighbor_id,
           round(list_inner_product(qv, cv)
                 / sqrt(list_inner_product(qv, qv) * list_inner_product(cv, cv)), 6)
               AS cos_sim
    FROM probes JOIN corpus USING (cell)
    WHERE neighbor_id <> query_id
    QUALIFY row_number() OVER (
        PARTITION BY query_id
        ORDER BY list_inner_product(qv, cv)
                 / sqrt(list_inner_product(qv, qv) * list_inner_product(cv, cv)) DESC,
                 neighbor_id
    ) <= 5
"""
)


@register("ann_ivf_trained_topk", oracle=_IVF_TRAINED_ORACLE)
def ann_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full trained-IVF pipeline, hash-checked END TO END including
    training: distributed k-means (2 Lloyd's iterations, k=8,
    deterministic lowest-id init, centroids quantized to the 1e-6
    grid after every update — see kmeans_train's quantize docs) →
    corpus assigned to argmin cells → queries probe their 2 nearest
    cells → cell-local cosine top-5. The oracle replays the identical
    quantized Lloyd's recurrence as unrolled SQL CTEs; centroid AND
    assignment-distance quantization (similarity._sq_dists) absorb
    engine summation-order noise and resolve argmin near-ties by the
    shared lowest-cell rule, so both engines train the same centroids
    and the search result hash-matches. Best-effort by construction
    (exact grid-boundary values can still round apart); the primary
    anchors are the n_probe=k ≡ brute-force property test and the
    inertia non-increase test (unquantized path)."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    centroids = S.kmeans_train(emb, k=8, iters=2, quantize=6)
    queries = emb.filter(F.col("vec_id") < 10)
    return S.ivf_trained_topk(emb, queries, centroids, k=5, n_probe=2)


# IVF-PQ oracle: unroll the per-subspace quantized Lloyd's recurrence
# (2 subspaces × 2 iterations via the suffixed _LLOYD_STEP), encode
# the corpus, then replay ADC scoring relationally: per-query LUT of
# subspace distances to every codebook entry, gathered by code and
# summed. Same 1e-6 grid + lowest-code tie-break as the Spark side.
def _pq_init(t: str, src: str) -> str:
    return f"""
    c{t}0 AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
               list_transform(v, x -> round(x, 6)) AS c
        FROM (SELECT vec_id, v FROM {src} ORDER BY vec_id LIMIT 8)
    )"""


def _pq_code(name: str, src: str, book: str) -> str:
    return f"""
    {name} AS (
        SELECT vec_id, cell AS code FROM (
            SELECT e.vec_id, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_SQ_DIST}, c.cell) AS rk
            FROM {src} e CROSS JOIN {book} c
        ) WHERE rk = 1
    )"""


def _pq_lut(name: str, src: str, book: str) -> str:
    return f"""
    {name} AS (
        SELECT p.query_id, c.cell AS code,
               round(list_inner_product(e.v, e.v)
                     - 2 * list_inner_product(e.v, c.c)
                     + list_inner_product(c.c, c.c), 6) AS d2
        FROM probes p
        JOIN {src} e ON e.vec_id = p.query_id
        CROSS JOIN {book} c
    )"""


_IVF_PQ_ORACLE = (
    """
    WITH emb AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
    ),
    e1 AS (SELECT vec_id, v[1:32] AS v FROM emb),
    e2 AS (SELECT vec_id, v[33:64] AS v FROM emb),
    """
    + _pq_init("s1", "e1") + ","
    + _LLOYD_STEP.format(i=1, t="s1", prev="cs10", sq=_SQ_DIST, src="e1") + ","
    + _LLOYD_STEP.format(i=2, t="s1", prev="cs11", sq=_SQ_DIST, src="e1") + ","
    + _pq_init("s2", "e2") + ","
    + _LLOYD_STEP.format(i=1, t="s2", prev="cs20", sq=_SQ_DIST, src="e2") + ","
    + _LLOYD_STEP.format(i=2, t="s2", prev="cs21", sq=_SQ_DIST, src="e2") + ","
    + _pq_code("code1", "e1", "cs12") + ","
    + _pq_code("code2", "e2", "cs22") + ","
    + """
    probes AS (SELECT vec_id AS query_id, label AS cell FROM emb WHERE vec_id < 10),
    corpus AS (SELECT vec_id AS neighbor_id, label AS cell FROM emb),
    """
    + _pq_lut("lut1", "e1", "cs12") + ","
    + _pq_lut("lut2", "e2", "cs22")
    + """
    SELECT p.query_id, co.neighbor_id, l1.d2 + l2.d2 AS adc_d2
    FROM probes p
    JOIN corpus co USING (cell)
    JOIN code1 k1 ON k1.vec_id = co.neighbor_id
    JOIN code2 k2 ON k2.vec_id = co.neighbor_id
    JOIN lut1 l1 ON l1.query_id = p.query_id AND l1.code = k1.code
    JOIN lut2 l2 ON l2.query_id = p.query_id AND l2.code = k2.code
    WHERE co.neighbor_id <> p.query_id
    QUALIFY row_number() OVER (
        PARTITION BY p.query_id ORDER BY l1.d2 + l2.d2, co.neighbor_id
    ) <= 5
"""
)


@register("ann_ivf_pq_topk", oracle=_IVF_PQ_ORACLE)
def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (similarity.pq_train/pq_encode/ivf_pq_topk),
    hash-checked end to end INCLUDING codebook training: 2 subspaces
    × 8 codes trained by 2 quantized Lloyd's iterations (one fused
    scan per iteration for all subspaces), corpus encoded as 2 codes
    per vector, queries probe their pre-assigned IVF cell and rank by
    grid-quantized ADC distance. The oracle unrolls both subspace
    trainings and replays encoding + LUT scoring relationally. Same
    best-effort cross-engine caveat as ann_ivf_trained_topk; the
    ADC==exact-when-codebook-holds-the-vector property test is the
    structural anchor."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    books = S.pq_train(emb, m=2, k=8, iters=2, quantize=6)
    queries = emb.filter(F.col("vec_id") < 10)
    return S.ivf_pq_topk(emb, queries, books, k=5)


@register(
    "train_val_test_split",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
    FROM (
        SELECT doc_id, lang,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS b
        FROM documents
    )
    """,
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 80/10/10 split assignment via the engine-portable
    md5 hash bucket (text.hash_bucket) — the way a 100 TB corpus gets
    split: deterministic, map-side, no sampling state, identical
    result from any engine that re-runs it (the oracle computes the
    same buckets in SQL). Seeded `sample()` can't make that promise
    across engines or partitionings."""
    docs = load_table(spark, sf_dir, "documents")
    b = X.hash_bucket("doc_id", 100)
    return docs.select(
        "doc_id", "lang",
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split"),
    )


@register(
    "doc_chunking",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
    ), starts AS (
        SELECT doc_id, t,
               unnest(range(1, len(t) + 1, 40)) AS start,
               generate_subscripts(range(1, len(t) + 1, 40), 1) - 1 AS chunk_idx
        FROM toks WHERE len(t) > 0
    )
    SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
           len(t[start : start + 49]) AS n_tokens,
           array_to_string(t[start : start + 49], ' ') AS chunk_text
    FROM starts
    """,
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking (50-token windows, stride
    40) — the tokenize→window→explode shape every LLM data loader
    needs, kept map-side (text.chunk_tokens docstring). Oracle builds
    identical windows with list slicing."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return X.chunk_tokens(docs, chunk_size=50, stride=40)


@register(
    "curation_pipeline",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang, text,
               len({_TOKS}) AS n_tokens,
               len(list_filter({_TOKS},
                   t -> list_contains(['the','a','of','and','to','in','is'], t)))
                   / len({_TOKS}) AS stop_ratio
        FROM documents
    ), quality AS (
        SELECT doc_id, lang, text FROM scored
        WHERE n_tokens BETWEEN 20 AND 500 AND stop_ratio >= 0.01
    ), surv AS (
        SELECT q.doc_id, q.lang, q.text
        FROM quality q
        JOIN (
            SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
                   min(doc_id) AS keep_id
            FROM quality GROUP BY 1
        ) k ON q.doc_id = k.keep_id
    ), split AS (
        SELECT doc_id, lang, text,
               CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 80
                    THEN 'train'
                    WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 90
                    THEN 'val' ELSE 'test' END AS split
        FROM surv
    ), chunks AS (
        SELECT doc_id, split, lang,
               unnest(range(1, len({_TOKS}) + 1, 40)) AS start
        FROM split
    )
    SELECT split, lang,
           count(DISTINCT doc_id) AS n_docs,
           count(*)               AS n_chunks
    FROM chunks GROUP BY 1, 2
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data curation flow as ONE declarative
    plan: quality gate → exact-dedup survivors (lowest id per
    fingerprint) → reproducible split assignment → context-window
    chunking → per-(split, lang) doc and chunk counts. Everything
    composes as DataFrame transformations, so Catalyst sees (and
    optimizes) the whole pipeline at once — filters run before the
    dedup shuffle, and the only exchanges are the fingerprint dedup
    and the final small aggregate. The oracle replays every stage as
    SQL CTEs."""
    from ..operators.text import chunk_tokens, hash_bucket

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    scored = docs.select(
        "doc_id", "lang", "text",
        X.ws_token_count("text").alias("n_tokens"),
        X.stopword_ratio("text").alias("stop_ratio"),
    )
    quality = scored.filter(
        F.col("n_tokens").between(20, 500) & (F.col("stop_ratio") >= 0.01)
    ).select("doc_id", "lang", "text")
    surv = D.exact_dedup(quality, id_col="doc_id", text_col="text").drop("dup_count")
    b = hash_bucket("doc_id", 100)
    split = surv.withColumn(
        "split",
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test"),
    )
    chunks = chunk_tokens(
        split.select("doc_id", "split", "lang", "text"),
        passthrough=["split", "lang"],
    )
    return chunks.groupBy("split", "lang").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_chunks"),
    )


@register(
    "crosssource_neardup_matrix",
    oracle=f"""
    WITH pairs AS ({_JACCARD_PAIRS_SQL}),
    labeled AS (
        SELECT least(da.source, db.source)    AS source_a,
               greatest(da.source, db.source) AS source_b,
               p.jaccard
        FROM pairs p
        JOIN documents da ON p.doc_a = da.doc_id
        JOIN documents db ON p.doc_b = db.doc_id
    )
    SELECT source_a, source_b,
           CAST(COUNT(*) AS BIGINT)   AS n_pairs,
           round(AVG(jaccard), 6)     AS avg_jaccard
    FROM labeled
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def crosssource_neardup_matrix(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: how many near-dup pairs
    (MinHash+LSH candidates, exact-verified — same chain as
    `dedup_minhash_lsh`, hence the shared oracle family) fall within
    and between each pair of corpus sources — the report that
    decides which crawl snapshots to drop before training. Scale
    plan: the expensive part (candidate generation) stays
    bucket-local LSH; the source labeling joins the PAIR list
    (orders of magnitude smaller than the corpus) to the 2-column
    (doc_id, source) projection of documents on doc_id — column
    pruning keeps the heavy text column out of both exchanges — and
    the matrix rollup is bounded by |sources|². Source pairs are
    canonicalized least/greatest so the matrix has one row per
    unordered pair."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    pairs = D.minhash_lsh_pairs(docs, threshold=0.8)
    src = docs.select("doc_id", "source")
    a = src.select(F.col("doc_id").alias("doc_a"),
                   F.col("source").alias("sa"))
    b = src.select(F.col("doc_id").alias("doc_b"),
                   F.col("source").alias("sb"))
    return (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            "jaccard",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("jaccard"), 6).alias("avg_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


@register(
    "bigram_lm_score",
    oracle=f"""
    WITH toked AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    bi AS (
        SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        FROM toked, unnest(range(1, len(toks))) AS u(i)
        WHERE len(toks) >= 2
    ),
    uni AS (
        SELECT t AS w, COUNT(*) AS c1
        FROM (SELECT unnest(toks) AS t FROM toked) GROUP BY 1
    ),
    big AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY 1, 2),
    v AS (SELECT COUNT(*) AS nv FROM uni)
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM((g.c12 + 1) * 1000000 // (u.c1 + v.nv)) AS BIGINT)
               AS p_e6_sum,
           CAST((2 * SUM((g.c12 + 1) * 1000000 // (u.c1 + v.nv))
                 + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE) / 1000000.0
               AS avg_prob
    FROM bi b
    JOIN big g ON b.w1 = g.w1 AND b.w2 = g.w2
    JOIN uni u ON b.w1 = u.w
    CROSS JOIN v
    GROUP BY 1
    ORDER BY 1
    """,
)
def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based bigram language-model score per document — the
    classic perplexity-filter stand-in (KenLM-style corpus-fit
    scoring, reduced to add-one-smoothed bigram probabilities
    P(w₂|w₁) = (C(w₁w₂)+1)/(C(w₁)+V)): documents whose word
    transitions are unusual for the corpus score low and get culled
    before training. Complements `token_rarity_score` (unigram
    rarity) with transition-level fit.

    Hash-stable by construction: probabilities are integer-scaled
    (×1e6, integral `div`) so every per-bigram value and the per-doc
    sum are exact BIGINTs on both engines — no float summation-order
    hazard — and the per-doc average is rounded HALF-UP on the 1e-6
    grid in pure integer math ((2·sum+n) div 2n, the
    `mv_rollup_rewrite` stabilizer) before the one exact double
    division, so engines can't disagree on grid half-points.

    Scale plan: the corpus unigram and bigram tables are
    Heaps-law-bounded rollups (map-side combined); the doc-bigram
    stream joins them on token equi-keys — uniform-by-construction
    shuffle keys, and at 100 TB the unigram table (and usually the
    bigram head) fits a broadcast, dropping one exchange. The
    per-doc rollup reuses the doc_id key. No UDFs anywhere — the
    whole chain is codegen'd expressions."""
    from ..cache import persisted
    from ..functions.tokenize import tokenize

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toked = docs.select("doc_id", tokenize(F.col("text")).alias("toks"))

    idx = F.sequence(F.lit(1), F.size("toks") - 1)
    # r12 (guide §1.2 step 1): `bi` feeds the bigram-count rollup AND
    # the final per-bigram join, `uni` feeds the vocab count AND the
    # unigram join — without persists the interpreted tokenize +
    # explode pass re-executed once per reference (4 tokenizations of
    # the corpus per run). Lazy tracked persists collapse each to one.
    bi = persisted(
        toked.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(F.col("toks"), i).alias("w1"),
                    F.element_at(F.col("toks"), i + 1).alias("w2"),
                ),
            )).alias("g"),
        )
        .select("doc_id", "g.w1", "g.w2")
    )
    uni = persisted(
        toked.select(F.explode("toks").alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    )
    big = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    n_vocab = uni.count()  # scalar model parameter, driver-side by design

    scored = (
        bi.join(big, ["w1", "w2"])
        .join(uni, bi["w1"] == uni["w"])
        .select(
            "doc_id",
            F.expr(f"(c12 + 1) * 1000000 div (c1 + {n_vocab})")
            .alias("p_e6"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("p_e6").alias("p_e6_sum"),
        )
        .select(
            "doc_id", "n_bigrams", "p_e6_sum",
            (F.expr("(2 * p_e6_sum + n_bigrams) div (2 * n_bigrams)")
             .cast("double") / 1000000.0).alias("avg_prob"),
        )
        .orderBy("doc_id")
    )
