"""Unit + plan-audit tests for the corpus-curation operators
(operators/curation.py): semantics on tiny inline frames, and the
physical-plan properties that make them 100 TB-shaped."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from realtime_data_warehouse_spark.operators import curation as C
from realtime_data_warehouse_spark.plans.registry import QUERIES


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_decontaminate_drops_only_overlapping_docs(spark):
    train = _docs(spark, [
        (1, "en", "the quick brown fox jumps"),
        (2, "en", "totally unrelated words here"),
        (3, "en", "quick brown fox elsewhere"),
    ])
    bench = _docs(spark, [(100, "en", "a quick brown fox appears")])
    # trigram "quick brown fox" is shared by docs 1 and 3 only
    kept = C.decontaminate(train, bench, n=3)
    assert {r.doc_id for r in kept.collect()} == {2}
    hits = C.contaminated_ids(train, bench, n=3)
    assert {r.doc_id for r in hits.collect()} == {1, 3}


def test_decontaminate_short_docs_never_match(spark):
    """Docs shorter than n tokens produce no grams, hence never hit."""
    train = _docs(spark, [(1, "en", "two words")])
    bench = _docs(spark, [(9, "en", "two words")])
    assert C.decontaminate(train, bench, n=3).count() == 1


def test_repetition_stats_against_python_reference(spark):
    texts = [
        (1, "en", "a a a b"),            # top word 3/4, bigram dups
        (2, "en", "all distinct words"),
        (3, "en", "x"),                   # single token: no bigrams
    ]
    got = {r.doc_id: r for r in C.repetition_stats(_docs(spark, texts)).collect()}

    for doc_id, _, text in texts:
        toks = text.split()
        n = len(toks)
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        r = got[doc_id]
        assert r.n_tokens == n
        assert r.distinct_ratio == round(len(set(toks)) / n, 6)
        assert r.top_word_frac == round(Counter(toks).most_common(1)[0][1] / n, 6)
        expect_dup = round(1 - len(set(bigrams)) / (n - 1), 6) if n >= 2 else 0.0
        assert r.dup_bigram_frac == expect_dup


def test_quota_cap_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(i, "s0" if i % 2 else "s1") for i in range(40)], "doc_id long, source string"
    )
    capped = C.quota_cap(df, "source", per_key=5)
    by_src = Counter(r.source for r in capped.collect())
    assert by_src == {"s0": 5, "s1": 5}
    # deterministic: same result on re-run
    again = {(r.doc_id, r.cap_rank) for r in C.quota_cap(df, "source", 5).collect()}
    assert {(r.doc_id, r.cap_rank) for r in capped.collect()} == again


def test_stratified_sample_rates_are_exact_buckets(spark):
    df = spark.createDataFrame(
        [(i, "en" if i < 500 else "fr") for i in range(1000)],
        "doc_id long, lang string",
    )
    got = C.stratified_sample(df, {"en": 0, "fr": 100}, strata_col="lang")
    langs = {r.lang for r in got.collect()}
    assert langs == {"fr"}          # rate 0 drops all, rate 100 keeps all
    assert got.count() == 500


def test_pack_sequences_budget_and_order(spark):
    chunks = spark.createDataFrame(
        [(1, 0, 100), (1, 1, 100), (2, 0, 100), (2, 1, 100), (3, 0, 100)],
        "doc_id long, chunk_idx int, n_tokens int",
    ).withColumn("g", F.lit("all"))
    packed = {
        (r.doc_id, r.chunk_idx): (r.pack_id, r.pack_offset)
        for r in C.pack_sequences(chunks, budget=256, group_cols=("g",)).collect()
    }
    # running starts: 0,100,200,300,400 → packs 0,0,0,1,1
    assert packed == {
        (1, 0): (0, 0), (1, 1): (0, 100), (2, 0): (0, 200),
        (2, 1): (1, 300 % 256), (3, 0): (1, 400 % 256),
    }


def test_keep_first_drops_every_doc_with_smaller_twin(spark):
    df = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (2, 4)], "doc_a long, doc_b long"
    )
    kept = {r.doc_id for r in C.keep_first(df, pairs).collect()}
    assert kept == {1, 2}


def test_decontaminate_plan_broadcasts_benchmark(spark, sf_small):
    """The benchmark gram set must reach the corpus join as a
    broadcast — a shuffled gram join at 100 TB would move the entire
    exploded corpus."""
    plan = (
        QUERIES["decontaminate_train"](spark, sf_small)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_min_label_propagation_converges_to_components(spark):
    """With rounds ≥ graph diameter, labels equal true connected
    components (min id per component) — checked against a Python
    union-find on a chain + clique + isolated-pair graph."""
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)]
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        r.id: r.cluster
        for r in C.min_label_propagation(pdf, rounds=4).collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in parent}
    assert got == want


def test_min_label_propagation_converge_collapses_long_chains(spark):
    """rounds="converge" must reach TRUE connected components on
    chains far deeper than any fixed round count: a 12-hop duplicate
    chain (diameter 12 > the gate entry's 3 rounds) plus side
    components all collapse to one min-id label each, matching a
    Python union-find. Also pins that fixed rounds=3 genuinely
    under-merges this graph — the documented caveat the converge mode
    exists to fix."""
    chain = [(i, i + 1) for i in range(100, 112)]  # 13 vertices, diameter 12
    extra = [(1, 2), (2, 3), (50, 51)]
    pairs = chain + extra
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")

    got = {
        r.id: r.cluster
        for r in C.min_label_propagation(pdf, rounds="converge").collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in parent}
    assert got == want
    assert len({c for v, c in got.items() if v >= 100}) == 1

    fixed = {
        r.id: r.cluster
        for r in C.min_label_propagation(pdf, rounds=3).collect()
    }
    assert len({c for v, c in fixed.items() if v >= 100}) > 1


def test_min_label_propagation_raises_when_cap_exhausted(spark):
    """A 25-hop chain needs ~24 propagation rounds; with max_rounds=5
    the fixpoint is NOT reached and converge mode must raise (never
    silently return partial labels that claim component semantics)."""
    import pytest

    chain = [(i, i + 1) for i in range(25)]  # 26 vertices, diameter 25
    pdf = spark.createDataFrame(chain, "doc_a long, doc_b long")
    with pytest.raises(C.LabelPropagationDidNotConverge, match="max_rounds=5"):
        C.min_label_propagation(pdf, rounds="converge", max_rounds=5).collect()
    # a cap ≥ diameter converges fine on the same graph
    got = {
        r.id: r.cluster
        for r in C.min_label_propagation(
            pdf, rounds="converge", max_rounds=30
        ).collect()
    }
    assert set(got.values()) == {0}


def test_mask_contaminated_spans_covers_overlaps(spark):
    from realtime_data_warehouse_spark.operators import curation as C

    train = spark.createDataFrame(
        [
            # 'b c d' and 'c d e' both contaminated -> positions 2..6 masked
            (1, "a b c d e f"),
            (2, "x y z w"),            # clean -> no output row
            (3, "b c d"),              # whole doc is one contaminated gram
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "b c d e q r")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in C.mask_contaminated_spans(train, bench, n=3).collect()}
    assert set(rows) == {1, 3}
    m = "<MASKED>"
    # hits 'b c d' (pos 2) and 'c d e' (pos 3) merge into one 2..5 span
    assert rows[1].masked_text == f"a {m} {m} {m} {m} f"
    assert (rows[1].n_tokens, rows[1].n_masked) == (6, 4)
    assert rows[3].masked_text == f"{m} {m} {m}"
    assert (rows[3].n_tokens, rows[3].n_masked) == (3, 3)


def test_gram_novelty_flags_shared_boilerplate(spark):
    from realtime_data_warehouse_spark.operators import curation as C

    # docs 1 and 2 share the 'p q r s' prefix (grams 'p q r','q r s');
    # each also has a unique tail gram. doc 3 is fully unique.
    df = spark.createDataFrame(
        [
            (1, "p q r s a1 b1 c1"),
            (2, "p q r s a2 b2 c2"),
            (3, "u v w x y"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in C.gram_novelty(df, n=3).collect()}
    assert rows[3].novelty == 1.0
    assert rows[1].n_grams == 5  # 7 tokens -> 5 trigrams
    assert rows[1].n_novel == 3  # 'p q r','q r s' shared with doc 2
    assert rows[1].novelty == 3 / 5
    assert rows[2].n_novel == 3
