"""Property tests (SURVEY §5 layer 4).

Hypothesis generates adversarial inputs for the two places a subtle
correctness bug would hide: the A6 latest-per-key/delta semantics and
the PPJoin prefix filter's completeness claim. Spark round-trips are
slow, so examples are capped low — the properties do the work, the
corpus size does not.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from realtime_data_warehouse_spark.operators.dedup import jaccard_pairs
from realtime_data_warehouse_spark.operators.state import latest_per_key

_settings = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    updates=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),          # key
            st.integers(min_value=0, max_value=50),    # ts
            st.integers(min_value=-100, max_value=100) # amount
        ),
        min_size=1, max_size=30,
    )
)
@_settings
def test_latest_per_key_equals_python_fold(spark, updates):
    """A6 batch form: latest_per_key picks exactly the max-ts row per
    key (ties broken identically to a stable right-fold)."""
    df = spark.createDataFrame(updates, "id string, ts long, amt long")
    got = {
        r.id: (r.ts, r.amt)
        for r in latest_per_key(df, ["id"], "ts", tiebreak=["amt"]).collect()
    }
    want: dict[str, tuple[int, int]] = {}
    for k, ts, amt in updates:
        # max (ts, amt) per key — the same (order_col desc, tiebreak
        # desc) ordering latest_per_key ranks by
        if k not in want or (ts, amt) > want[k]:
            want[k] = (ts, amt)
    assert got == want


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("abcdefgh"), min_size=2, max_size=8
        ).map(" ".join),
        min_size=2, max_size=12,
    )
)
@_settings
def test_prefix_filter_jaccard_complete_vs_bruteforce(spark, docs):
    """jaccard_pairs (prefix-filtered) finds EXACTLY the pairs a
    brute-force O(n²) bigram-Jaccard computation finds — the prefix
    filter may prune candidates, never results."""
    threshold = 0.6
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(df, threshold=threshold, n=2).collect()
    }

    def bigrams(t: str) -> set[str]:
        toks = [w for w in t.lower().split() if w]
        return {f"{a} {b}" for a, b in zip(toks, toks[1:])}

    want = set()
    for i, a in rows:
        for j, b in rows:
            if i >= j:
                continue
            sa, sb = bigrams(a), bigrams(b)
            if not sa or not sb:
                continue
            jac = len(sa & sb) / len(sa | sb)
            if jac >= threshold:
                want.add((i, j))
    assert got == want


_token = st.sampled_from(["a", "b", "c", "dd", "eee"])


@given(docs=st.lists(st.lists(_token, min_size=0, max_size=12),
                     min_size=1, max_size=6))
@_settings
def test_repetition_stats_equals_python_reference(spark, docs):
    """Curation repetition signals (computed as one O(n) array
    aggregate over sorted tokens) equal the naive Python counts."""
    from collections import Counter

    from realtime_data_warehouse_spark.operators.curation import repetition_stats

    rows = [(i, "en", " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    for i, toks in enumerate(docs):
        n = len(toks)
        r = got[i]
        assert r.n_tokens == n
        if n == 0:
            assert (r.distinct_ratio, r.top_word_frac, r.dup_bigram_frac) == (0.0, 0.0, 0.0)
            continue
        assert r.distinct_ratio == round(len(set(toks)) / n, 6)
        assert r.top_word_frac == round(Counter(toks).most_common(1)[0][1] / n, 6)
        grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        want_dup = round(1 - len(set(grams)) / (n - 1), 6) if n >= 2 else 0.0
        assert r.dup_bigram_frac == want_dup


@given(chunks=st.lists(st.tuples(st.integers(0, 5), st.integers(1, 300)),
                       min_size=1, max_size=25),
       budget=st.sampled_from([64, 256]))
@_settings
def test_pack_sequences_equals_python_fold(spark, chunks, budget):
    """Concat-and-slice packing: pack_id/pack_offset equal the running
    Python fold over (doc_id, chunk_idx) order — the loader contract."""
    from realtime_data_warehouse_spark.operators.curation import pack_sequences

    rows = [(doc, idx, nt) for idx, (doc, nt) in enumerate(chunks)]
    df = spark.createDataFrame(
        rows, "doc_id long, chunk_idx int, n_tokens int"
    ).withColumn("g", F.lit("x"))
    got = {
        (r.doc_id, r.chunk_idx): (r.pack_id, r.pack_offset)
        for r in pack_sequences(df, budget=budget, group_cols=("g",)).collect()
    }
    start = 0
    for doc, idx, nt in sorted(rows, key=lambda r: (r[0], r[1])):
        assert got[(doc, idx)] == (start // budget, start % budget)
        start += nt


_pii_fragment = st.sampled_from([
    "plain words here", "x1y2", "a@b.io", "u7@sub.ex.org",
    "10.0.3.9", "255.255.255.255", "123456789", "98765432101234",
    "12345678", "192.168.1", "a.b@c", "end.",
])


@given(frags=st.lists(_pii_fragment, min_size=1, max_size=8))
@_settings
def test_redact_pii_is_idempotent_and_digit_free(spark, frags):
    """Scrubbing twice changes nothing (mask tokens contain no
    redactable material), and no ≥9-digit run survives a single
    pass — the guarantee a privacy pass must make."""
    import re

    from pyspark.sql import functions as F

    from realtime_data_warehouse_spark.operators.text import redact_pii

    text = " ".join(frags)
    df = spark.createDataFrame([(1, text)], "id long, text string")
    once, _ = redact_pii(F.col("text"))
    staged = df.select("id", once.alias("t1"))
    twice, _ = redact_pii(F.col("t1"))
    row = staged.select("t1", twice.alias("t2")).first()
    assert row.t1 == row.t2
    assert not re.search(r"[0-9]{9,}", row.t1)


@given(events=st.lists(
    st.tuples(st.integers(1, 4),                    # user
              st.integers(0, 50),                   # ts
              st.sampled_from(["view", "click", "purchase", "other"])),
    min_size=1, max_size=40))
@_settings
def test_funnel_state_machine_equals_chained_minima(spark, events):
    """streaming/stateful.advance_funnel (the exact transition
    funnel_stream's keyed state fn runs), fed ts-ordered chunks split
    at arbitrary batch boundaries, must converge to the batch
    formulation's chained minima (t1 = min view; t2 = min click > t1;
    t3 = min purchase > t2) for ANY event soup — duplicate
    timestamps, missing stages, out-of-order stage types."""
    from realtime_data_warehouse_spark.streaming.stateful import advance_funnel

    def chained(evts):
        t1 = min((ts for _, ts, ty in evts if ty == "view"), default=None)
        t2 = (min((ts for _, ts, ty in evts
                   if ty == "click" and ts > t1), default=None)
              if t1 is not None else None)
        t3 = (min((ts for _, ts, ty in evts
                   if ty == "purchase" and ts > t2), default=None)
              if t2 is not None else None)
        return (t1, t2, t3)

    expected = {
        u: chained([e for e in events if e[0] == u])
        for u in {e[0] for e in events}
    }

    stage_of = {"view": 0, "click": 1, "purchase": 2}
    ordered = sorted(events, key=lambda e: e[1])
    cut1, cut2 = len(ordered) // 3, 2 * len(ordered) // 3
    batches = [ordered[:cut1], ordered[cut1:cut2], ordered[cut2:]]

    t_by_user = {u: [None, None, None] for u in expected}
    for b in batches:  # cross-batch state carried in t_by_user
        per_user: dict[int, list] = {}
        for u, ts, ty in b:
            per_user.setdefault(u, []).append((ts, ty))
        for u, rows in per_user.items():
            advance_funnel(t_by_user[u], sorted(rows, key=lambda r: r[0]),
                           stage_of)
    assert {u: tuple(t) for u, t in t_by_user.items()} == expected


@given(
    lnames=st.lists(st.lists(st.sampled_from("abcdefgh"), min_size=1,
                             max_size=6), min_size=1, max_size=8),
    rnames=st.lists(st.lists(st.sampled_from("abcdefgh"), min_size=1,
                             max_size=6), min_size=1, max_size=8),
)
@_settings
def test_fuzzy_set_join_complete_vs_bruteforce(spark, lnames, rnames):
    """fuzzy_set_join (cross-table prefix filter over the UNION
    vocabulary) finds EXACTLY the pairs a brute-force O(n·m) word-set
    Jaccard computation finds."""
    from realtime_data_warehouse_spark.operators.dedup import fuzzy_set_join

    threshold = 0.6
    lrows = [(i, toks) for i, toks in enumerate(lnames)]
    rrows = [(j, toks) for j, toks in enumerate(rnames)]
    left = spark.createDataFrame(lrows, "lid long, toks array<string>")
    right = spark.createDataFrame(rrows, "rid long, toks array<string>")
    got = {(r.lid, r.rid)
           for r in fuzzy_set_join(left, right, "lid", "rid",
                                   threshold=threshold).collect()}
    want = set()
    for i, a in lrows:
        for j, b in rrows:
            sa, sb = set(a), set(b)
            if not sa or not sb:
                continue
            if len(sa & sb) / len(sa | sb) >= threshold:
                want.add((i, j))
    assert got == want


@given(
    docs=st.lists(st.lists(st.sampled_from("abcdefgh"), min_size=1,
                           max_size=8), min_size=1, max_size=10),
)
@_settings
def test_containment_join_complete_vs_bruteforce(spark, docs):
    """containment_join (inner-side-only prefix filter) finds EXACTLY
    the (inner, outer) pairs a brute-force O(n²) set-containment scan
    finds at t = 2/3 — including boundary pairs where t·|inner| is an
    integer (the case float thresholds mis-round)."""
    from realtime_data_warehouse_spark.operators.dedup import containment_join

    rows = [(i, toks) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    got = {(r.inner_id, r.outer_id)
           for r in containment_join(df, t_num=2, t_den=3).collect()}
    want = set()
    for i, a in rows:
        for j, b in rows:
            sa, sb = set(a), set(b)
            if i == j or not sa:
                continue
            if len(sa & sb) * 3 >= len(sa) * 2:
                want.add((i, j))
    assert got == want


@given(
    left=st.lists(
        st.tuples(st.sampled_from(["a", "b"]),
                  st.integers(min_value=0, max_value=100)),
        min_size=1, max_size=25,
    ),
    right=st.lists(
        st.tuples(st.sampled_from(["a", "b"]),
                  st.integers(min_value=0, max_value=100),
                  st.integers(min_value=-50, max_value=50)),
        min_size=1, max_size=25,
    ),
    direction=st.sampled_from(["backward", "forward"]),
    tolerance=st.sampled_from([None, 10]),
)
@_settings
def test_asof_join_equals_pandas_merge_asof(spark, left, right,
                                            direction, tolerance):
    """asof_join (union-scan window plan) reproduces
    pandas.merge_asof — the reference semantics for as-of joins —
    for both directions, with and without tolerance, including
    equal-timestamp inclusivity and unmatched-left nulls."""
    import pandas as pd

    from realtime_data_warehouse_spark.operators.joins import asof_join

    # right must be unique per (key, ts): the match "latest right at
    # ts T" is ill-defined otherwise (documented contract)
    rmap = {(k, ts): v for k, ts, v in right}
    rrows = [(k, float(ts), v) for (k, ts), v in sorted(rmap.items())]
    ldf = spark.createDataFrame(
        [(k, float(ts), i) for i, (k, ts) in enumerate(left)],
        "k string, ts double, lid long",
    )
    rdf = spark.createDataFrame(rrows, "k string, ts double, rval long")

    kwargs = {}
    pd_kwargs = {}
    if tolerance is not None:
        # numeric tolerance: express the same bound via pandas; the
        # Spark operator takes an INTERVAL literal, so feed it
        # timestamps (epoch seconds) instead of raw doubles
        from datetime import datetime, timezone

        def to_ts(s):
            return datetime.fromtimestamp(s, tz=timezone.utc)

        ldf = ldf.select("k", F.timestamp_seconds("ts").alias("ts"), "lid")
        rdf = rdf.select("k", F.timestamp_seconds("ts").alias("ts"), "rval")
        kwargs["tolerance"] = f"{tolerance} seconds"
        pd_kwargs["tolerance"] = pd.Timedelta(seconds=tolerance)

    got = {
        r.lid: r.rval
        for r in asof_join(ldf, rdf, "k", "ts", "ts",
                           direction=direction, **kwargs).collect()
    }

    lp = pd.DataFrame(
        [(k, float(ts), i) for i, (k, ts) in enumerate(left)],
        columns=["k", "ts", "lid"],
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(rrows, columns=["k", "ts", "rval"]).sort_values(
        "ts", kind="stable")
    if tolerance is not None:
        lp["ts"] = pd.to_datetime(lp["ts"], unit="s", utc=True)
        rp["ts"] = pd.to_datetime(rp["ts"], unit="s", utc=True)
    merged = pd.merge_asof(lp, rp, on="ts", by="k",
                           direction=direction, **pd_kwargs)
    want = {
        int(r.lid): (None if pd.isna(r.rval) else int(r.rval))
        for r in merged.itertuples(index=False)
    }
    assert got == want


@given(events=st.lists(
    st.tuples(st.integers(0, 50),                   # ts
              st.sampled_from(["view", "click", "purchase", "other"])),
    min_size=0, max_size=40),
    split=st.integers(0, 40))
@_settings
def test_advance_funnel_vec_equals_reference(events, split):
    """advance_funnel_vec (the masked-minima transition funnel_stream
    actually runs, round-6 vectorization) must equal the reference
    per-event walk for ANY unordered event soup and ANY batch split —
    including mid-batch stage completions, duplicate timestamps and
    pre-completed state carried across the boundary."""
    import numpy as np

    from realtime_data_warehouse_spark.streaming.stateful import (
        advance_funnel,
        advance_funnel_vec,
    )

    stages = ("view", "click", "purchase")
    stage_of = {s: i for i, s in enumerate(stages)}
    cut = min(split, len(events))
    batches = [events[:cut], events[cut:]]

    t_ref: list = [None, None, None]
    t_vec: list = [None, None, None]
    for b in batches:
        advance_funnel(t_ref, sorted(b), stage_of)
        if b:
            ts = np.asarray([e[0] for e in b], dtype="int64")
            ty = np.asarray([e[1] for e in b], dtype=object)
            advance_funnel_vec(t_vec, ts, ty, stages)
    assert t_vec == t_ref
