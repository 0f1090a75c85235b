"""Semantic invariants for the event-analytics family — properties
that must hold on ANY input, checked on the real fixtures (the oracle
parity suite proves engine-equivalence; these prove the semantics are
the ones a user expects)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_data_warehouse_spark.plans.registry import QUERIES


def test_funnel_stage_counts_monotone(spark, sf_small):
    """Each funnel stage requires the previous one strictly earlier,
    so stage user counts can never increase."""
    rows = {r.stage_idx: r.users
            for r in QUERIES["funnel_conversion"](spark, sf_small).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1] >= rows[2] >= rows[3]


def test_retention_week0_contains_cohort(spark, sf_small):
    """Every cohort is active in its own signup week (the signup event
    itself counts), so a week-0 row exists per cohort and no offset
    exceeds its week-0 count."""
    out = QUERIES["retention_cohorts"](spark, sf_small).collect()
    by_cohort: dict[str, dict[int, int]] = {}
    for r in out:
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = r.active_users
    assert by_cohort
    for cohort, offs in by_cohort.items():
        assert 0 in offs, f"cohort {cohort} missing week-0 row"
        assert all(v <= offs[0] for v in offs.values()), cohort


def test_scd2_versions_partition_time(spark, sf_small):
    """Per key: versions are contiguous ([valid_from, valid_to) chains
    with no overlap), at most one open version, and updated keys carry
    exactly two versions whose sizes differ by the doubling."""
    out = QUERIES["scd2_dim_history"](spark, sf_small).collect()
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r.p_partkey, []).append(r)
    assert by_key
    for k, vs in by_key.items():
        vs.sort(key=lambda r: r.valid_from)
        open_versions = [r for r in vs if r.valid_to is None]
        assert len(open_versions) <= 1, k
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to == b.valid_from, f"gap/overlap at key {k}"
        assert sum(r.is_current for r in vs) == len(open_versions)
        if k % 10_000 < 500:  # updated keys: doubled size in v2
            assert len(vs) == 2 and vs[1].p_size == vs[0].p_size * 2, k
        if k % 1_000 == 7:  # deleted keys: nothing current
            assert not open_versions, k


def test_scd2_stream_equals_batch(spark, sf_small):
    """Incremental streaming MERGE and the one-shot batch window must
    produce identical history tables."""
    batch = {tuple(r) for r in QUERIES["scd2_dim_history"](spark, sf_small).collect()}
    stream = {tuple(r) for r in
              QUERIES["stream_scd2_dim_history"](spark, sf_small).collect()}
    assert batch == stream


def test_passage_dedup_duplicated_doc_flags_all_passages(spark, sf_small, tmp_path):
    """A document cloned verbatim must have dup_ratio 1.0 — every one
    of its passages occurs at least twice corpus-wide."""
    import shutil

    import duckdb

    src = f"{sf_small}/documents.parquet"
    clone_dir = tmp_path / "sf"
    clone_dir.mkdir()
    for t in ("documents",):
        # corpus = originals + one verbatim clone of doc 0 under a new id
        con = duckdb.connect()
        con.execute(f"""
            COPY (
              SELECT * FROM read_parquet('{src}')
              UNION ALL
              SELECT 999999 AS doc_id, text, lang, source, n_chars
              FROM read_parquet('{src}') WHERE doc_id = 0
            ) TO '{clone_dir}/documents.parquet' (FORMAT PARQUET)
        """)
    out = {r.doc_id: r for r in
           QUERIES["passage_dedup_stats"](spark, str(clone_dir)).collect()}
    assert out[999999].dup_ratio == 1.0
    assert out[0].dup_ratio == 1.0
    assert out[999999].n_passages == out[0].n_passages


def test_pagerank_mass_conserved_and_degree_ordered(spark):
    """On a symmetric graph (no dangling sinks) total PageRank mass
    stays ≈ 1 through every iteration (only quantization dust leaks),
    and a hub with strictly more distinct in-neighbors outranks a
    leaf."""
    from realtime_data_warehouse_spark.operators.graph import pagerank

    # star: hub h connected to 4 leaves, plus an isolated pair x-y
    undirected = [("h", f"l{i}") for i in range(4)] + [("x", "y")]
    edges = spark.createDataFrame(
        undirected + [(b, a) for a, b in undirected], ["src", "dst"])
    out = {r.node: float(r.rank)
           for r in pagerank(edges, iterations=5).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-6
    assert out["h"] > out["l0"] and out["h"] > out["x"]
    # leaves are symmetric → identical ranks
    assert len({out[f"l{i}"] for i in range(4)}) == 1
