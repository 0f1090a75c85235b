"""Tests for the deterministic Zipf corpus generator and the
relational gram-postings build that the set-similarity branch bench
relies on (round-5: measure BOTH verify branches on realistic data)."""
from __future__ import annotations

from pyspark.sql import functions as F

from realtime_data_warehouse_spark.operators import dedup as D
from realtime_data_warehouse_spark.sources.synthetic import zipf_documents


def test_zipf_documents_deterministic(spark):
    """Same params ⇒ byte-identical corpus, independent of plan or
    partitioning — the generator IS the artifact, nothing committed."""
    a = zipf_documents(spark, n_docs=60, doc_len=30, vocab=1000)
    b = zipf_documents(spark, n_docs=60, doc_len=30,
                       vocab=1000).repartition(7)
    rows_a = {r.doc_id: r.text for r in a.collect()}
    rows_b = {r.doc_id: r.text for r in b.collect()}
    assert rows_a == rows_b
    assert len(rows_a) == 60
    assert all(len(t.split(" ")) == 30 for t in rows_a.values())


def test_zipf_documents_vocab_is_zipf_shaped(spark):
    """Log-uniform rank draw ⇒ rank-1 token dominates and the realized
    vocabulary is large relative to the driver corpus's ~931 grams —
    the whole point is to force the >cap verify branch."""
    docs = zipf_documents(spark, n_docs=400, doc_len=80, vocab=50_000)
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok").count().orderBy(F.desc("count"))
    )
    rows = freq.collect()
    vocab_realized = len(rows)
    assert vocab_realized > 4096  # > mask_vocab_cap default
    # head token ('w1') carries ~1/ln(V) of the mass — far above uniform
    assert rows[0]["count"] > (400 * 80) / vocab_realized * 50


def test_zipf_documents_clones_are_near_duplicates(spark):
    """Docs ≥ n_base are mutated clones: word-shingle Jaccard to their
    source doc must sit near the dedup operating threshold (~0.8 at
    mut_rate=0.05), and be far higher than a random pair's."""
    n_docs, dup_frac = 100, 0.2
    n_base = int(n_docs * (1 - dup_frac))
    docs = zipf_documents(spark, n_docs=n_docs, doc_len=60,
                          vocab=20_000, dup_frac=dup_frac,
                          mut_rate=0.05)
    toks = {r.doc_id: set(r.text.split(" ")) for r in docs.collect()}
    jacs = []
    for j in range(n_docs - n_base):
        clone, src = toks[n_base + j], toks[(j * 7) % n_base]
        jacs.append(len(clone & src) / len(clone | src))
    assert sum(jacs) / len(jacs) > 0.65
    # unrelated pair baseline: rank-1 stopwords overlap, little else
    base = toks[0], toks[1]
    assert len(base[0] & base[1]) / len(base[0] | base[1]) < 0.3


def test_gram_postings_matches_hof_shingles(spark):
    """The relational postings build (posexplode + lead window) must
    produce exactly the distinct-(doc, gram) set and per-doc counts of
    the HOF with_shingles path it replaces — including dropping docs
    with < n tokens."""
    rows = [
        (0, "a b c a b"),          # grams: {a b, b c, c a} sz=3
        (1, "x"),                  # too short — no postings
        (2, "p q"),                # {p q} sz=1
        (3, "a b a b a b"),        # {a b, b a} sz=2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    post = D.gram_postings(df, "doc_id", "text", n=2)
    got = {(r.doc_id, r.s, r.sz) for r in post.collect()}
    hof = (
        D.with_shingles(df, "text", 2, drop_empty=True)
        .select("doc_id", F.explode("shingles").alias("s")).distinct()
    )
    hof_sets: dict[int, set[str]] = {}
    for r in hof.collect():
        hof_sets.setdefault(r.doc_id, set()).add(r.s)
    want = {(d, s, len(ss)) for d, ss in hof_sets.items() for s in ss}
    assert got == want
    assert 1 not in {d for d, _, _ in got}


def test_gram_postings_unigram_path(spark):
    df = spark.createDataFrame(
        [(0, "a b a"), (1, "c")], "doc_id long, text string")
    got = {(r.doc_id, r.s, r.sz)
           for r in D.gram_postings(df, n=1).collect()}
    assert got == {(0, "a", 2), (0, "b", 2), (1, "c", 1)}


def test_jaccard_pairs_branches_agree_on_zipf(spark):
    """The packed-bitmask and array_intersect verify branches must be
    result-identical on a realistic-vocabulary corpus — the branch is
    a physical-plan choice, never a semantics choice."""
    docs = zipf_documents(spark, n_docs=80, doc_len=40, vocab=5000,
                          dup_frac=0.25, mut_rate=0.03)
    tok = D.jaccard_pairs(docs, threshold=0.7, mask_vocab_cap=0)
    msk = D.jaccard_pairs(docs, threshold=0.7,
                          mask_vocab_cap=10_000_000)
    t = {(r.doc_a, r.doc_b, round(r.jaccard, 4)) for r in tok.collect()}
    m = {(r.doc_a, r.doc_b, round(r.jaccard, 4)) for r in msk.collect()}
    assert t == m
    assert len(t) > 0  # clones guarantee true positives


def test_synthetic_embeddings_geometry_and_determinism(spark):
    """Round-6 generator contract: (1) deterministic — two builds are
    byte-identical regardless of partitioning; (2) planted geometry —
    exactly one ≥0.9-cosine pair per clone (the 10% planted dups) and
    NO non-planted pair reaches the 0.8 dedup threshold (base noise is
    sized to keep same-cluster non-dups ≈ 0.5)."""
    from realtime_data_warehouse_spark.operators.similarity import (
        cosine_near_dup_pairs,
    )
    from realtime_data_warehouse_spark.sources.synthetic import (
        synthetic_embeddings,
    )

    a = synthetic_embeddings(spark, 500).collect()
    b = synthetic_embeddings(spark, 500).repartition(7).collect()
    assert sorted((r.vec_id, r.embedding) for r in a) == \
           sorted((r.vec_id, r.embedding) for r in b)
    emb = synthetic_embeddings(spark, 500)
    pairs = cosine_near_dup_pairs(emb, threshold=0.8).collect()
    n_base = 450  # 10% dup_frac
    assert len(pairs) == 500 - n_base
    # every pair links a clone (id >= n_base) to its base (id < n_base)
    assert all(min(p.id_a, p.id_b) < n_base <= max(p.id_a, p.id_b)
               for p in pairs)


def test_synthetic_upserts_and_events_shapes(spark):
    from realtime_data_warehouse_spark.sources.synthetic import (
        synthetic_upserts,
        synthetic_user_events,
    )

    up = synthetic_upserts(spark, n_keys=100, versions=2)
    assert up.count() == 200
    assert up.select("id").distinct().count() == 100
    assert up.groupBy("id").count().filter("count != 2").count() == 0
    ev = synthetic_user_events(spark, n_events=300, n_users=50, days=10)
    assert ev.count() == 300
    assert ev.select("uid").distinct().count() == 50
    days = ev.selectExpr("cast(ts_s / 86400 as long) d").distinct().count()
    assert days == 10


def test_synthetic_order_payments_window_split(spark):
    """One order + one payment per id; exactly ids with id % 10 != 9
    pay inside the 15-minute join window (0-840 s after the order),
    the rest 2-3 h after — the deterministic match count the
    stream_interval_join scaling family asserts against."""
    from realtime_data_warehouse_spark.sources.synthetic import (
        synthetic_order_payments,
    )

    df = synthetic_order_payments(spark, n_orders=200)
    assert df.count() == 400
    assert df.filter("side = 'o'").count() == 200
    gaps = (
        df.groupBy("order_id")
        .pivot("side", ["o", "p"]).sum("ts_s")
        .selectExpr("cast(order_id as long) oid", "p - o AS gap")
        .collect()
    )
    for r in gaps:
        if r.oid % 10 == 9:
            assert r.gap > 900, f"id {r.oid}: far payment inside window"
        else:
            assert 0 <= r.gap <= 840, f"id {r.oid}: near payment outside"
