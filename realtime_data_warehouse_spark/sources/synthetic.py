"""Deterministic synthetic corpora for scale/branch benchmarking.

The driver testdata's `documents` table is a small-ALPHABET corpus:
at sf0.1 its bigram vocabulary is ~931 grams, so every set-similarity
operator takes the packed-bitmask verify branch (`mask_vocab_cap`)
in every gate and bench run, and the prefix+token-join branch — the
one a real Zipf-distributed corpus would exercise at 100 TB — was
correctness-tested but never perf-measured (round-4 verdict, top
item). This module generates a REALISTIC-vocabulary twin so both
branches get measured on the data shape they were designed for.

Everything is hash-derived (xxhash64 on (doc_id, pos) — no RNG, no
time): the same call always yields byte-identical text on any
engine/partitioning/retry, so bench numbers are reproducible and the
corpus never needs committing — the generator IS the artifact.

Token model: ranks drawn LOG-UNIFORMLY over [1, V] — p(rank∈[r,r+dr])
∝ 1/r, i.e. an exact Zipf(s=1) unigram law, the standard model for
natural-language token frequency (the head is stopword-like, the
tail is hapax-like). A `dup_frac` share of docs are near-duplicate
clones of earlier docs with a `mut_rate` share of positions redrawn,
so pair-finding operators have true positives to verify, not just
candidates to prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: 2^31-ish modulus for the hash→uniform fold (stays in int64 math).
_M = 2147483647


def _uniform(*cols) -> F.Column:
    """Deterministic uniform in (0,1): xxhash64 of the key tuple,
    folded mod _M, centered off 0 — never exactly 0 or 1, so log/pow
    stay finite."""
    return (F.pmod(F.xxhash64(*cols), F.lit(_M)).cast("double")
            + F.lit(0.5)) / F.lit(float(_M))


def zipf_documents(spark: SparkSession, n_docs: int = 5000,
                   doc_len: int = 100, vocab: int = 50_000,
                   dup_frac: float = 0.1,
                   mut_rate: float = 0.05) -> DataFrame:
    """(doc_id, text, n_chars) corpus with Zipf(1) token frequencies.

    Docs [0, n_base) are independent; docs [n_base, n_docs) are
    near-dup clones — doc n_base+j re-derives doc (j·k mod n_base)'s
    token stream and redraws ~mut_rate of the positions, leaving
    word-bigram Jaccard ≈ (1−2·mut_rate)/(1+2·mut_rate) ≈ 0.8 at the
    default — right at the dedup family's operating threshold.

    Pure-expression plan (one sequence-explode, one concat_ws
    aggregate): generation distributes like any other query and costs
    one shuffle on doc_id."""
    n_base = max(1, int(n_docs * (1.0 - dup_frac)))
    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    # clone j sources from base doc (j*7 mod n_base) — deterministic,
    # spread across the base range
    src = F.when(
        F.col("doc_id") >= n_base,
        ((F.col("doc_id") - n_base) * 7) % n_base,
    ).otherwise(F.col("doc_id"))
    pos = ids.select(
        "doc_id", src.alias("__src"),
        F.explode(F.sequence(F.lit(0), F.lit(doc_len - 1))).alias("pos"),
    )
    mutate = (F.col("doc_id") >= n_base) & (
        _uniform(F.col("doc_id"), F.col("pos"), F.lit("mut"))
        < F.lit(mut_rate)
    )
    # draw key: the clone re-uses the SOURCE doc's stream except at
    # mutated positions, where it draws from its own id
    draw_id = F.when(mutate, F.col("doc_id")).otherwise(F.col("__src"))
    u = _uniform(draw_id, F.col("pos"))
    # log-uniform rank over [1, V]: rank = floor(V^u)  ⇒  p(r) ∝ 1/r
    rank = F.floor(F.pow(F.lit(float(vocab)), u)).cast("long")
    word = F.concat(F.lit("w"), rank.cast("string"))
    toks = pos.select("doc_id", "pos", word.alias("tok"))
    return (
        toks.groupBy("doc_id")
        .agg(F.concat_ws(" ", F.array_sort(
            F.collect_list(F.struct("pos", "tok"))).getField("tok"))
             .alias("text"))
        .withColumn("n_chars", F.length("text"))
    )
