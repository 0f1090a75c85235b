"""Corpus-curation registry queries — the pipeline stages between
"raw documents" and "training batches": benchmark decontamination,
repetition quality signals, per-domain quota caps, stratified
sampling, sequence packing, keep-first dedup policy and per-label
embedding centroids. No reference analogue (the reference stops at
warehouse aggregates); these are the 100 TB training-data operators
layered on the same engine, each hash-checked against a DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize
from ..operators import curation as C
from ..operators import dedup as D
from ..operators import text as X
from ..operators.similarity import as_double
from ..operators.text import chunk_tokens
from ..sources.batch import fan_out, load_table
from .datapipe import _JACCARD_PAIRS_SQL, _TOKS
from .registry import register

#: engine-portable md5 hash bucket, the SQL twin of text.hash_bucket
_BUCKET = "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)"

#: distinct token trigrams, the SQL twin of dedup.token_ngrams(n=3)
_TRIGRAMS = """list_distinct(list_transform(range(1, len(toks) - 1),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))"""


@register(
    "decontaminate_train",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, lang, text, {_BUCKET} % 100 AS bk FROM documents
    ),
    tr AS (SELECT * FROM b WHERE bk < 80),
    be AS (SELECT * FROM b WHERE bk >= 90),
    tg AS (
        SELECT doc_id, unnest({_TRIGRAMS}) AS gram
        FROM (SELECT doc_id, {_TOKS} AS toks FROM tr)
    ),
    bg AS (
        SELECT DISTINCT unnest({_TRIGRAMS}) AS gram
        FROM (SELECT {_TOKS} AS toks FROM be)
    ),
    hit AS (SELECT DISTINCT tg.doc_id FROM tg JOIN bg USING (gram))
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_train,
           CAST(count(hit.doc_id) AS BIGINT) AS n_contaminated,
           CAST(count(*) - count(hit.doc_id) AS BIGINT) AS n_kept
    FROM tr LEFT JOIN hit USING (doc_id)
    GROUP BY lang
    """,
)
def decontaminate_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: flag train-split docs sharing any
    token trigram with the held-out test split (standing in for a
    benchmark corpus). The benchmark gram set broadcasts — the
    corpus-side explosion never shuffles (operators/curation.py)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    bk = X.hash_bucket("doc_id", 100)
    train = docs.filter(bk < 80)
    bench = docs.filter(bk >= 90)
    hits = C.contaminated_ids(train, bench, n=3).withColumn("__hit", F.lit(1))
    return train.join(hits, "doc_id", "left").groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_train"),
        F.count("__hit").alias("n_contaminated"),
        (F.count(F.lit(1)) - F.count("__hit")).alias("n_kept"),
    )


@register(
    "decontaminate_mask_spans",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, text, {_BUCKET} % 100 AS bk FROM documents
    ),
    tr AS (SELECT doc_id, {_TOKS} AS toks FROM b WHERE bk < 80),
    be AS (SELECT {_TOKS} AS toks FROM b WHERE bk >= 90),
    bg AS (SELECT DISTINCT unnest({_TRIGRAMS}) AS gram FROM be),
    tg AS (
        SELECT doc_id, generate_subscripts(g, 1) AS pos, unnest(g) AS gram
        FROM (SELECT doc_id,
                     list_transform(range(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS g
              FROM tr)
    ),
    cov AS (
        SELECT DISTINCT h.doc_id, h.pos + o.o AS p
        FROM (SELECT t.doc_id, t.pos FROM tg t JOIN bg USING (gram)) h
        CROSS JOIN (SELECT unnest([0, 1, 2]) AS o) o
    ),
    tokpos AS (
        SELECT doc_id, unnest(toks) AS tok,
               generate_subscripts(toks, 1) AS pos
        FROM tr
    ),
    m AS (
        SELECT tp.doc_id, tp.pos,
               CASE WHEN c.p IS NOT NULL THEN '<MASKED>' ELSE tp.tok END AS tok,
               CASE WHEN c.p IS NOT NULL THEN 1 ELSE 0 END AS is_m
        FROM tokpos tp
        LEFT JOIN cov c ON c.doc_id = tp.doc_id AND c.p = tp.pos
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(SUM(is_m) AS BIGINT) AS n_masked,
           string_agg(tok, ' ' ORDER BY pos) AS masked_text
    FROM m GROUP BY doc_id HAVING SUM(is_m) > 0
    """,
)
def decontaminate_mask_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination (operators/curation.
    mask_contaminated_spans): same train/benchmark split as
    decontaminate_train, but contaminated trigram SPANS are masked
    in place instead of dropping the whole document. Returns the
    contaminated docs with their masked text and mask counts; the
    oracle rebuilds each masked document relationally (token
    positions ⟕ covered positions → ordered string_agg)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    bk = X.hash_bucket("doc_id", 100)
    train = docs.filter(bk < 80)
    bench = docs.filter(bk >= 90)
    out = C.mask_contaminated_spans(train, bench, n=3)
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_masked").cast("long").alias("n_masked"),
        "masked_text",
    )


@register(
    "gram_novelty",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    inv AS (SELECT DISTINCT doc_id, unnest({_TRIGRAMS}) AS gram FROM t),
    wdf AS (
        SELECT doc_id, count(*) OVER (PARTITION BY gram) AS gdf FROM inv
    ),
    agg AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN gdf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        FROM wdf GROUP BY doc_id
    )
    SELECT doc_id, n_grams, n_novel, n_novel / n_grams AS novelty FROM agg
    """,
)
def gram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection (operators/curation.
    gram_novelty): fraction of each doc's distinct trigrams appearing
    in no other document. Complements quality_repetition (which only
    sees repetition WITHIN a doc). Integer counts through one IEEE
    division — engine-exact doubles, no rounding needed."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return C.gram_novelty(docs, n=3)


@register(
    "quality_repetition",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    wc AS (
        SELECT doc_id, tok, count(*) AS c
        FROM (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY 1, 2
    ),
    top AS (SELECT doc_id, max(c) AS m FROM wc GROUP BY 1)
    SELECT t.doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CASE WHEN len(toks) > 0
                THEN round(len(list_distinct(toks)) / len(toks), 6)
                ELSE 0.0 END AS distinct_ratio,
           CASE WHEN len(toks) > 0
                THEN round(top.m / len(toks), 6)
                ELSE 0.0 END AS top_word_frac,
           CASE WHEN len(toks) >= 2
                THEN round(1.0 - len(list_distinct(list_transform(
                         range(1, len(toks)),
                         i -> toks[i] || ' ' || toks[i+1]))) / (len(toks) - 1), 6)
                ELSE 0.0 END AS dup_bigram_frac
    FROM t LEFT JOIN top USING (doc_id)
    """,
)
def quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MassiveText-style repetition signals per doc — all map-side
    array expressions, incl. max token frequency via one O(n) pass
    over the sorted token array (no (doc, token) shuffle)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return C.repetition_stats(docs)


@register(
    "domain_quota_cap",
    oracle=f"""
    SELECT doc_id, source, CAST(rn AS INTEGER) AS cap_rank FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                                  ORDER BY {_BUCKET}, doc_id) AS rn
        FROM documents
    ) WHERE rn <= 20
    """,
)
def domain_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-skew domain capping: at most 20 docs per source, picked by
    deterministic hash order (a reproducible uniform sample per
    domain, not head-of-scan bias)."""
    docs = load_table(spark, sf_dir, "documents")
    return C.quota_cap(docs, "source", per_key=20).select(
        "doc_id", "source", "cap_rank"
    )


@register(
    "stratified_sample_langs",
    oracle=f"""
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang, {_BUCKET} % 100 AS bk FROM documents
    )
    WHERE bk < CASE lang WHEN 'en' THEN 25 WHEN 'zh' THEN 50
                         WHEN 'de' THEN 50 WHEN 'es' THEN 75
                         WHEN 'fr' THEN 100 ELSE 0 END
    """,
)
def stratified_sample_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing as a deterministic filter: per-language
    keep-rates via the portable md5 bucket — re-derivable from any
    engine, no sampling state, no materialized copy."""
    docs = load_table(spark, sf_dir, "documents")
    rates = {"en": 25, "zh": 50, "de": 50, "es": 75, "fr": 100}
    return C.stratified_sample(docs, rates, strata_col="lang").select(
        "doc_id", "lang"
    )


@register(
    "pack_sequences_by_lang",
    oracle=f"""
    WITH toks AS (SELECT doc_id, lang, {_TOKS} AS t FROM documents),
    starts AS (
        SELECT doc_id, lang, t,
               unnest(range(1, len(t) + 1, 40)) AS start,
               generate_subscripts(range(1, len(t) + 1, 40), 1) - 1 AS chunk_idx
        FROM toks WHERE len(t) > 0
    ),
    chunks AS (
        SELECT doc_id, lang, {_BUCKET} % 4 AS shard,
               chunk_idx, len(t[start : start + 49]) AS n_tokens
        FROM starts
    ),
    packed AS (
        SELECT lang, shard, doc_id, n_tokens,
               SUM(n_tokens) OVER (
                   PARTITION BY lang, shard ORDER BY doc_id, chunk_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS st
        FROM chunks
    )
    SELECT lang, CAST(shard AS INTEGER) AS shard,
           CAST(st // 256 AS BIGINT) AS pack_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM packed GROUP BY 1, 2, 3
    """,
)
def pack_sequences_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-slice sequence packing (budget 256 tokens) over
    chunked docs, sharded 4-way per language so no group's running
    sum exceeds a bounded sort task — the shard IS the scale story:
    packing is shard-local exactly like a per-worker loader."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    chunks = chunk_tokens(
        docs.select("doc_id", "lang", "text"), passthrough=["lang"]
    ).withColumn("shard", X.hash_bucket("doc_id", 4).cast("int"))
    packed = C.pack_sequences(chunks, budget=256, group_cols=("lang", "shard"))
    return packed.groupBy("lang", "shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.count_distinct("doc_id").alias("n_docs"),
    )


@register(
    "corpus_mixture_weights",
    oracle=f"""
    WITH a AS (
        SELECT lang, source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY 1, 2
    )
    SELECT lang, source, n_docs, n_tokens,
           round(n_tokens / SUM(n_tokens) OVER (PARTITION BY lang), 6)
               AS share_of_lang,
           round(n_tokens / SUM(n_tokens) OVER (), 6) AS share_of_corpus
    FROM a
    """,
)
def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture planning: token mass per (lang, source) with its share
    of the language and of the corpus — the table a sampling-rate
    optimizer consumes. One groupBy; the window shares run over the
    ~|langs|x|sources| aggregate, not the data."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    agg = (
        docs.select("lang", "source", F.size(tokenize("text")).alias("nt"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("long").alias("n_tokens"),
        )
    )
    return agg.select(
        "lang", "source", "n_docs", "n_tokens",
        F.round(
            F.col("n_tokens") / F.sum("n_tokens").over(Window.partitionBy("lang")), 6
        ).alias("share_of_lang"),
        F.round(
            F.col("n_tokens") / F.sum("n_tokens").over(Window.partitionBy()), 6
        ).alias("share_of_corpus"),
    )


@register(
    "dedup_keep_first",
    oracle=f"""
    WITH losers AS (
        SELECT DISTINCT doc_b AS doc_id FROM ({_JACCARD_PAIRS_SQL})
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(losers.doc_id) AS BIGINT) AS n_dropped,
           CAST(count(*) - count(losers.doc_id) AS BIGINT) AS n_kept
    FROM documents LEFT JOIN losers USING (doc_id)
    GROUP BY lang
    """,
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs applied as a dedup POLICY: any doc with a
    ≥0.8-Jaccard twin of smaller id is dropped ("first occurrence
    wins"). Pairs come from the exact inverted-index join; at scale
    the MinHash-LSH pair generator plugs into the same keep_first."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    losers = (
        D.jaccard_pairs(docs, threshold=0.8)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("__drop", F.lit(1))
    )
    return docs.join(losers, "doc_id", "left").groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("__drop").alias("n_dropped"),
        (F.count(F.lit(1)) - F.count("__drop")).alias("n_kept"),
    )


def _lp_round(i: int, prev: str) -> str:
    """One min-label-propagation round as SQL (the oracle unrolls the
    exact rounds the Spark operator runs)."""
    return f"""
    l{i} AS MATERIALIZED (
        SELECT p.v, least(p.l, coalesce(min(n.l), p.l)) AS l
        FROM {prev} p
        LEFT JOIN edges e ON e.u = p.v
        LEFT JOIN {prev} n ON n.v = e.v
        GROUP BY p.v, p.l
    )"""


@register(
    "dedup_clusters",
    # AS MATERIALIZED: each round references the previous labels and
    # the edge list twice; without it DuckDB inlines the CTEs and
    # re-executes the whole O(n²)-ish pair query per reference.
    oracle=f"""
    WITH pr AS MATERIALIZED (SELECT doc_a, doc_b FROM ({_JACCARD_PAIRS_SQL})),
    edges AS MATERIALIZED (
        SELECT doc_a AS u, doc_b AS v FROM pr
        UNION ALL
        SELECT doc_b, doc_a FROM pr
    ),
    l0 AS MATERIALIZED (SELECT DISTINCT u AS v, u AS l FROM edges),
    {_lp_round(1, 'l0')},
    {_lp_round(2, 'l1')},
    {_lp_round(3, 'l2')}
    SELECT CAST(v AS BIGINT) AS doc_id, CAST(l AS BIGINT) AS cluster
    FROM l3
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster assignment: 3 rounds of min-label propagation
    (operators/curation.min_label_propagation) over the ≥0.8-Jaccard
    pair graph — the connected-components step real dedup pipelines
    run between pair generation and keep-one-per-cluster. The oracle
    replays the identical rounds as unrolled CTEs, so the result is
    hash-exact whether or not the graph has fully converged. For
    production semantics see `dedup_clusters_converged`
    (rounds="converge": iterate-to-fixpoint = true connected
    components regardless of chain depth, oracle-checked against a
    recursive-CTE transitive closure; tests/test_curation.py
    additionally pins it against union-find). This fixed-round entry
    stays for the deterministic replayable-rounds contract."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    pairs = D.jaccard_pairs(docs, threshold=0.8)
    return C.min_label_propagation(pairs, rounds=3).select(
        F.col("id").alias("doc_id"), "cluster"
    )


@register(
    "semdedup_keep_first",
    oracle="""
    WITH v AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    losers AS (
        SELECT DISTINCT b.vec_id
        FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_inner_product(a.e, b.e)
              / sqrt(list_inner_product(a.e, a.e)
                     * list_inner_product(b.e, b.e)) >= 0.4
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(count(losers.vec_id) AS BIGINT) AS n_dropped,
           CAST(count(*) - count(losers.vec_id) AS BIGINT) AS n_kept
    FROM embeddings LEFT JOIN losers USING (vec_id)
    GROUP BY label
    """,
)
def semdedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup policy: within each block, drop
    every vector with a ≥0.4-cosine twin of smaller id (first wins) —
    keep_first applied to embedding-cosine pairs instead of Jaccard
    pairs, the semantic companion to dedup_keep_first. Block key
    scales as an LSH bucket; pair maths is the JVM-side zip_with dot
    product from operators/similarity."""
    from ..operators.similarity import cosine_near_dup_pairs

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    losers = (
        cosine_near_dup_pairs(emb, threshold=0.4)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("__drop", F.lit(1))
    )
    return emb.join(losers, "vec_id", "left").groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.count("__drop").alias("n_dropped"),
        (F.count(F.lit(1)) - F.count("__drop")).alias("n_kept"),
    )


@register(
    "label_centroids",
    oracle="""
    SELECT label, CAST(gs - 1 AS INTEGER) AS pos,
           round(CAST(SUM(CAST(x AS DECIMAL(20, 10))) AS DOUBLE) / count(*), 6)
               AS c,
           CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS x,
               generate_subscripts(embedding, 1) AS gs
        FROM embeddings
    )
    GROUP BY 1, 2
    """,
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding, emitted long (label, pos, c, n) so
    every coordinate is value-hashed. DECIMAL(20,10) sums make the
    reduction exact and order-independent — both engines converge to
    identical doubles regardless of partitioning. The groupBy key
    (label, pos) partial-aggregates map-side, so the shuffle carries
    |labels|x|dim| rows per input partition, not the data."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode(as_double("embedding")).alias("pos", "x")
    )
    return ex.groupBy("label", "pos").agg(
        F.round(
            F.sum(F.col("x").cast("decimal(20,10)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("c"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "dedup_clusters_converged",
    # True connected components as a recursive transitive closure:
    # reach(v) = every vertex reachable from v; the component label is
    # min(reach(v)). UNION (not UNION ALL) dedupes per iteration, so
    # the recursion terminates at the closure fixpoint — the same
    # fixpoint min-label propagation converges to. Fine at gate scale
    # (near-dup components are tiny); the Spark side never builds the
    # closure, it propagates min labels in O(diameter) rounds.
    oracle=f"""
    WITH RECURSIVE pr AS MATERIALIZED (
        SELECT doc_a, doc_b FROM ({_JACCARD_PAIRS_SQL})
    ),
    edges AS MATERIALIZED (
        SELECT doc_a AS u, doc_b AS v FROM pr
        UNION ALL
        SELECT doc_b, doc_a FROM pr
    ),
    reach(id, r) AS (
        SELECT DISTINCT u, u FROM edges
        UNION
        SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id
    )
    SELECT CAST(id AS BIGINT) AS doc_id,
           CAST(MIN(r) AS BIGINT) AS cluster
    FROM reach GROUP BY 1
    """,
)
def dedup_clusters_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering at PRODUCTION semantics: min-label
    propagation iterated to fixpoint (`rounds="converge"`,
    checkpoint-truncated lineage per round), so labels are the TRUE
    connected components regardless of duplicate-chain depth — the
    guarantee the fixed-round `dedup_clusters` entry trades away for
    a replayable unrolled oracle. This entry closes that gap at the
    gate level too: the oracle states components as a recursive-CTE
    transitive closure (min reachable id per vertex), which equals
    the propagation fixpoint — so the driver hash-checks convergence
    itself, not a round count. Scale plan: each round is one
    edge-key equi-join + map-side-combined min per vertex; rounds =
    graph diameter (near-dup graphs: almost always ≤ 3, capped at
    20); the closure stays in the ORACLE only — Spark never
    materializes reachability sets.

    r12 (guide §1.2 step 1 — the distributed algorithm first): pair
    generation switched from the PPJoin prefix path to
    minhash_lsh_pairs — the SAME output under the SAME oracle family
    (dedup_minhash_lsh shares _JACCARD_PAIRS_SQL; banded 32×4 recall
    ≈ 1−5e-8 with exact-Jaccard verification killing every false
    positive). On the driver corpus the tiny (~931-gram) vocabulary
    makes the prefix filter nearly useless (1.5M distinct candidates
    from 5k docs — 12% of the full pair space), so the exact path
    pays a quadratic candidate join + mask verify ≈ 8.0 s at sf0.1
    while the banded path generates only truly-similar candidates
    ≈ 1.7 s (loop itself ~0.9 s). The exact inverted-index generator
    stays first-class as `dedup_ngram_jaccard` and as ground truth
    for the round-8 recall gates."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    pairs = D.minhash_lsh_pairs(docs, threshold=0.8)
    return C.min_label_propagation(pairs, rounds="converge").select(
        F.col("id").alias("doc_id"), "cluster"
    )
