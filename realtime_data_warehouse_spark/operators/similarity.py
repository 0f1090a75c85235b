"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and an IVF-style
cell-restricted variant as the scale path. The arithmetic is
expression-only (zip_with/aggregate fold in double precision — a
sequential left fold, so the oracle's loop computes bit-identical
sums), no Python in the hot path.

Scale notes: brute-force is O(n_queries × n_corpus) — fine when the
query side is small enough to broadcast (the common "probe batch"
case). The IVF variant equi-joins on the cell id first, so the
shuffle moves only same-cell rows; with balanced cells that is a
1/n_cells fraction of the cross product. At 100 TB you'd train real
centroids; the operator shape (assign cell → equi-join → local
top-k) is identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec) -> F.Column:
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(c, lambda x: x.cast("double"))


def dot(a, b) -> F.Column:
    """Sequential-fold dot product in double (matches a scalar loop)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm2(a) -> F.Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0),
                              lambda acc, x: acc + x))


def cosine(a, b) -> F.Column:
    return dot(a, b) / (norm2(a) * norm2(b))


def _topk_cut(scored: DataFrame, k: int, rank_rounded: bool) -> DataFrame:
    """Shared top-k cut for the cosine retrievers. With
    ``rank_rounded`` the k-boundary is decided on the ROUND-6 cosine
    (neighbor-id tie-break) instead of the raw double: sub-round(6)
    FP differences between engines at the boundary then cannot select
    different member SETS — the same convention downstream consumers
    (ann_rrf_fusion's rank assignment) already use. Default stays the
    raw-cosine cut so the long-registered ann_* oracle entries are
    byte-unchanged."""
    order = F.round("cos_sim", 6) if rank_rounded else F.col("cos_sim")
    w = Window.partitionBy("query_id").orderBy(
        order.desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"))
    )


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     rank_rounded: bool = False) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    queries is broadcast (probe batches are small); the corpus is
    scanned once per batch; per-query ranking is a window over the
    (query, corpus) pairs partitioned by query id. Deterministic
    tie-break on neighbor id (on the round-6 cosine when
    ``rank_rounded`` — see _topk_cut).

    Norms are precomputed per side BEFORE the join — inside the pair
    expression they would be folded again for every (query, corpus)
    pair (HOF folds are interpreted, no CSE): 3 vector passes per pair
    → 1."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    ).withColumn("qn", norm2(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    ).withColumn("cn", norm2(F.col("cv")))
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.withColumn(
        "cos_sim", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    )
    return _topk_cut(scored, k, rank_rounded)


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             cell_col: str = "label") -> DataFrame:
    """IVF-style ANN: restrict the search to the query's coarse cell
    (here the pre-assigned `label`; in production, argmin over trained
    centroids) and rank within it. The join is an equi-join on the
    cell — shuffle moves only same-cell rows."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv"),
        F.col(cell_col).alias("cell"),
    ).withColumn("qn", norm2(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv"),
        F.col(cell_col).alias("cell"),
    ).withColumn("cn", norm2(F.col("cv")))
    pairs = c.join(F.broadcast(q), "cell").filter(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.withColumn(
        "cos_sim", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"))
    )


def lsh_sign_bucket(vec_col, bits: int = 8, stride: int = 8,
                    offset: int = 0) -> F.Column:
    """Coordinate-sign LSH bucket: bit i = sign(v[i*stride + offset]),
    folded into an int in [0, 2^bits). The simplest member of the
    random-hyperplane family (hyperplanes = coordinate axes — no
    stored model, any engine reproduces it bit-for-bit); swapping in
    seeded random hyperplanes changes only the projection, not the
    plan. `offset` selects a DISJOINT coordinate set per hash table
    for multi-table OR-amplification (lsh_topk n_tables). Pure
    expression, map-side."""
    v = as_double(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0)
    for i in range(bits):
        bucket = bucket + F.when(
            F.element_at(v, i * stride + offset + 1) >= 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
    return bucket.cast("int")


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             bits: int = 8, stride: int = 8, n_tables: int = 1,
             rank_rounded: bool = False) -> DataFrame:
    """LSH-bucketed ANN — the hash-partitioned scale path the task's
    similarity-search family calls for alongside IVF: corpus and
    probes bucket by sign-LSH, candidates come from a bucket
    equi-join (shuffle moves only same-bucket rows; 2^bits buckets
    are uniform by construction for centered embeddings), cosine
    rank within the candidates. `n_tables` > 1 unions candidates from
    that many hash tables on disjoint coordinate sets (offset t) —
    classic OR-amplification: true-neighbor recall 1−(1−p)^L for
    per-table collision probability p, at ~L× candidate cost.

    CALIBRATED (round 6, ann_lsh_recall + sign-collision law): a
    bucket agrees on a true neighbor at angle θ with probability
    (1−θ/π)^bits. That makes sign-LSH a NEAR-DUP-regime retriever —
    at cos ≥ 0.9 (θ ≤ 26°), p ≈ 0.89^8 ≈ 0.4 per 8-bit table and
    n_tables=4 reaches ≈ 0.87 true-twin recall; on the ISOTROPIC
    driver corpus, whose exact top-5 sit at cos ≈ 0.4 (θ ≈ 66°,
    p_bit ≈ 0.63, p_8 ≈ 0.02 — measured recall@5 0.00-0.28 across
    bits 8→2, tracking candidate fraction), NO sub-linear hash family
    can rank well and brute_force_topk / ivf_topk are the honest
    tools. Default bits=8 keeps per-table cost at ~n/256 per probe
    and is justified for the near-dup regime this operator serves
    (dedup_embedding_cosine's blocking, decontamination); raise
    n_tables — not bucket width — to buy recall."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv"),
    ).withColumn("qn", norm2(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv"),
    ).withColumn("cn", norm2(F.col("cv")))
    # table t reads coordinates {i*stride + t}, i < bits; a vector
    # shorter than the highest read makes element_at return NULL
    # (non-ANSI), every sign test falls to 0, and the high bucket bits
    # silently degrade toward constants — fail loudly instead (one
    # LIMIT-1 probe of the corpus, plan-cheap). Applies at n_tables==1
    # too: need reduces to (bits-1)*stride + 1 there.
    need = (bits - 1) * stride + (n_tables - 1) + 1
    row = corpus.select(F.size(as_double(vec_col)).alias("d")).first()
    if row is not None and row["d"] < need:
        raise ValueError(
            f"lsh_topk(n_tables={n_tables}, bits={bits}, "
            f"stride={stride}) reads coordinate {need - 1}; corpus "
            f"embeddings have dim {row['d']} — bucket bits beyond the "
            f"vector would silently collapse. Lower bits/stride/n_tables."
        )
    if n_tables == 1:
        qb = q.withColumn("bucket", lsh_sign_bucket(F.col("qv"), bits, stride))
        cb = c.withColumn("bucket", lsh_sign_bucket(F.col("cv"), bits, stride))
        pairs = cb.join(F.broadcast(qb), "bucket").filter(
            F.col("neighbor_id") != F.col("query_id")
        )
    else:
        # candidate IDS from L bucket joins, deduped BEFORE scoring so
        # a pair colliding in several tables is scored once; vectors
        # rejoin by id after the distinct
        cand = None
        for t in range(n_tables):
            qt = q.select(
                "query_id",
                lsh_sign_bucket(F.col("qv"), bits, stride, t).alias("bucket"),
            )
            ct = c.select(
                "neighbor_id",
                lsh_sign_bucket(F.col("cv"), bits, stride, t).alias("bucket"),
            )
            p = ct.join(F.broadcast(qt), "bucket").filter(
                F.col("neighbor_id") != F.col("query_id")
            ).select("query_id", "neighbor_id")
            cand = p if cand is None else cand.unionByName(p)
        pairs = (
            cand.distinct()
            .join(F.broadcast(q), "query_id")
            .join(c, "neighbor_id")
        )
    scored = pairs.withColumn(
        "cos_sim", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    )
    return _topk_cut(scored, k, rank_rounded)


def cosine_near_dup_pairs(vectors: DataFrame, threshold: float = 0.95,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          block_col: str = "label") -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocks.

    Blocking on `block_col` keeps the pair space n²/blocks; at scale
    the block key would be an LSH bucket (random-hyperplane sign
    bits) — same plan shape: equi-join on block, filter by cosine."""
    v = vectors.select(
        F.col(id_col), as_double(vec_col).alias("v"), F.col(block_col)
    ).withColumn("n", norm2(F.col("v")))
    a = v.alias("a")
    b = v.alias("b")
    pairs = a.join(
        b,
        (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        (dot(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n"))).alias("cos_sim"),
    )
    return pairs.filter(F.col("cos_sim") >= threshold).select(
        "id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim")
    )


# ---------------------------------------------------------------------------
# Trained IVF: distributed k-means centroids + cell-probed search
# (the "in production, argmin over trained centroids" path above,
# made real)
# ---------------------------------------------------------------------------

def _sq_dists(vs: pd.Series, C: np.ndarray, c2: np.ndarray) -> np.ndarray:
    """(batch × k) squared distances, quantized to the 1e-6 grid.

    Quantizing BEFORE argmin/argsort is the epsilon-aware tie
    handling that makes cell choices reproducible across engines: an
    argmin near-tie (two centroids within 1e-6) resolves by the
    deterministic lowest-cell tie-break on both sides instead of by
    whichever engine's last-ulp noise (numpy's BLAS x²−2xC+c² vs a
    SQL fold) happens to win. A distance landing exactly on a grid
    boundary can still split — the check is best-effort by
    construction; the n_probe=k ≡ brute-force and inertia property
    tests are the primary anchors (see kmeans_train docstring)."""
    X = np.asarray([np.asarray(x, dtype=np.float64) for x in vs])
    d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + c2
    return np.round(d2, 6)


def assign_cells(df: DataFrame, centroids: list[list[float]],
                 vec_col: str = "v", out_col: str = "cell") -> DataFrame:
    """Nearest-centroid assignment, Arrow-batched: one (batch × k)
    squared-distance matrix per Arrow batch in numpy — the same hybrid
    JVM-scan→vectorized-Python shape as the minhash/simhash operators.
    Distances are grid-quantized (_sq_dists) and ties break to the
    lowest cell id (np.argmin first occurrence), deterministically.

    The centroid matrix rides into the executors via udf closure —
    centroids are a model, k×dim doubles, broadcast-sized by
    definition."""
    C = np.asarray(centroids, dtype=np.float64)  # (k, d)
    c2 = (C * C).sum(axis=1)[None, :]

    @F.pandas_udf("int")
    def _assign(vs: pd.Series) -> pd.Series:
        return pd.Series(_sq_dists(vs, C, c2).argmin(axis=1).astype("int32"))

    return df.withColumn(out_col, _assign(F.col(vec_col)))


def kmeans_train(vectors: DataFrame, k: int = 10, iters: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 quantize: int | None = None) -> list[list[float]]:
    """Distributed Lloyd's iterations with Arrow-batched partial sums:
    each partition fuses assignment (numpy argmin) with per-cell
    (count, sum-vector) accumulation inside ONE mapInPandas pass, so
    an iteration moves at most partitions×k tiny rows to the driver —
    no shuffle at all, versus the naive posexplode → groupBy(cell,
    pos) rollup whose shuffle input is n_rows × dim rows.
    Deterministic init: the k lowest ids. Empty cells keep their
    previous centroid.

    What reaches the driver per iteration is k×dim model parameters,
    not data — the driver loop is NOT a driver-side data loop; all
    O(n) work is executor-side. At 100 TB each iteration is one scan,
    the canonical distributed k-means cost.

    ``quantize``: round every centroid coordinate to that many
    decimals at init and after each update. Together with the
    grid-quantized assignment distances (_sq_dists) this makes the
    trained model reproducible ACROSS ENGINES (an independent replay
    of the same quantized Lloyd's recurrence — e.g. the DuckDB
    oracle — converges to the same centroids, because sub-1e-12
    summation-order noise is absorbed by the 1e-6 grid and argmin
    near-ties resolve by the shared lowest-cell rule). BEST-EFFORT,
    not a proof: a mean or distance landing exactly on a grid
    boundary can still round apart (numpy rounds half-even, SQL
    half-away), so the cross-engine hash check is an end-to-end
    smoke with overwhelming-probability stability — the
    n_probe=k ≡ brute-force equivalence and inertia non-increase
    property tests are the primary correctness anchors."""
    v = vectors.select(F.col(id_col), as_double(vec_col).alias("v"))

    def _q(arr: list[float]) -> list[float]:
        return [round(x, quantize) for x in arr] if quantize is not None else list(arr)

    centroids = [_q(r["v"]) for r in v.orderBy(id_col).limit(k).collect()]
    dim = len(centroids[0])
    vec = v.select("v")
    for _ in range(iters):
        C = np.asarray(centroids, dtype=np.float64)  # (k, d)
        c2 = (C * C).sum(axis=1)[None, :]

        def partials(batches, C=C, c2=c2):
            sums = np.zeros((k, dim), dtype=np.float64)
            counts = np.zeros(k, dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
                cells = _sq_dists(pdf["v"], C, c2).argmin(axis=1)
                np.add.at(sums, cells, X)
                counts += np.bincount(cells, minlength=k)
            hit = np.flatnonzero(counts)
            yield pd.DataFrame({
                "cell": hit.astype("int32"),
                "n": counts[hit],
                "s": [sums[i].tolist() for i in hit],
            })

        stats = vec.mapInPandas(partials, schema="cell int, n long, s array<double>").collect()
        sums: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for r in sorted(stats, key=lambda r: r["cell"]):  # stable reduce order
            sums[r["cell"]] = sums.get(r["cell"], np.zeros(dim)) + np.asarray(r["s"])
            counts[r["cell"]] = counts.get(r["cell"], 0) + r["n"]
        nxt = [list(c) for c in centroids]
        for cell, s in sums.items():
            nxt[cell] = _q((s / counts[cell]).tolist())
        centroids = nxt
    return centroids


def pq_train(vectors: DataFrame, m: int = 2, k: int = 8, iters: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             quantize: int | None = None) -> list[list[list[float]]]:
    """Product-quantization codebooks: split the vector into `m`
    contiguous subspaces and run Lloyd's k-means independently in
    each — FUSED into one mapInPandas pass per iteration, so training
    all m codebooks costs the same single scan per iteration as one
    k-means (kmeans_train's partial-sum design, generalized: each
    partition emits per-(subspace, cell) (count, sum) rows, the
    driver folds k×dim model parameters, never data).

    Same determinism contract as kmeans_train: lowest-id init, empty
    cells keep their previous centroid, `quantize` rounds every
    update to the 1e-6 grid, and assignment distances are
    grid-quantized (_sq_dists semantics) — so the DuckDB oracle can
    replay the recurrence per subspace. Best-effort cross-engine
    exactness, with the ADC==exact property test as primary anchor.

    Returns m codebooks, each k×(dim/m)."""
    v = vectors.select(F.col(id_col), as_double(vec_col).alias("v"))

    def _q(arr: list[float]) -> list[float]:
        return [round(x, quantize) for x in arr] if quantize is not None else list(arr)

    first = v.orderBy(id_col).limit(k).collect()
    dim = len(first[0]["v"])
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sub = dim // m
    books = [[_q(list(r["v"][s * sub:(s + 1) * sub])) for r in first]
             for s in range(m)]
    vec = v.select("v")
    for _ in range(iters):
        Cs = [np.asarray(books[s], dtype=np.float64) for s in range(m)]
        c2s = [(C * C).sum(axis=1)[None, :] for C in Cs]

        def partials(batches, Cs=Cs, c2s=c2s):
            sums = np.zeros((m, k, sub), dtype=np.float64)
            counts = np.zeros((m, k), dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
                for s in range(m):
                    Xs = X[:, s * sub:(s + 1) * sub]
                    d2 = (Xs * Xs).sum(axis=1)[:, None] - 2.0 * (Xs @ Cs[s].T) + c2s[s]
                    cells = np.round(d2, 6).argmin(axis=1)
                    np.add.at(sums[s], cells, Xs)
                    counts[s] += np.bincount(cells, minlength=k)
            rows = []
            for s in range(m):
                for c in np.flatnonzero(counts[s]):
                    rows.append((s, int(c), int(counts[s][c]), sums[s][c].tolist()))
            yield pd.DataFrame(rows, columns=["s", "cell", "n", "vsum"])

        stats = vec.mapInPandas(
            partials, schema="s int, cell int, n long, vsum array<double>"
        ).collect()
        folded: dict[tuple[int, int], list] = {}
        for r in sorted(stats, key=lambda r: (r["s"], r["cell"])):  # stable reduce
            key = (r["s"], r["cell"])
            if key not in folded:
                folded[key] = [np.zeros(sub), 0]
            folded[key][0] = folded[key][0] + np.asarray(r["vsum"])
            folded[key][1] += r["n"]
        nxt = [[list(c) for c in books[s]] for s in range(m)]
        for (s, c), (vsum, n) in folded.items():
            nxt[s][c] = _q((vsum / n).tolist())
        books = nxt
    return books


def pq_encode(df: DataFrame, codebooks: list[list[list[float]]],
              vec_col: str = "v", out_col: str = "codes") -> DataFrame:
    """Encode each vector as m small codes (nearest codebook entry
    per subspace, grid-quantized distances, ties to the lowest code).
    The compressed corpus is m bytes-ish per vector instead of dim
    floats — the PQ memory story; Arrow-batched numpy, map-side."""
    Cs = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m, sub = len(Cs), Cs[0].shape[1]
    c2s = [(C * C).sum(axis=1)[None, :] for C in Cs]

    @F.pandas_udf("array<int>")
    def _enc(vs: pd.Series) -> pd.Series:
        X = np.asarray([np.asarray(x, dtype=np.float64) for x in vs])
        codes = np.empty((len(X), m), dtype=np.int32)
        for s in range(m):
            Xs = X[:, s * sub:(s + 1) * sub]
            d2 = (Xs * Xs).sum(axis=1)[:, None] - 2.0 * (Xs @ Cs[s].T) + c2s[s]
            codes[:, s] = np.round(d2, 6).argmin(axis=1)
        return pd.Series([c.tolist() for c in codes])

    return df.withColumn(out_col, _enc(F.col(vec_col)))


def ivf_pq_topk(corpus: DataFrame, queries: DataFrame,
                codebooks: list[list[list[float]]], k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                cell_col: str = "label") -> DataFrame:
    """IVF-PQ search (the FAISS-style compressed scale path): corpus
    vectors live as PQ codes in their IVF cell; each query joins its
    cell (equi-join — shuffle moves only same-cell codes, never raw
    vectors) and candidates are ranked by ASYMMETRIC DISTANCE (ADC):
    sum over subspaces of ||q_sub − codebook[s][code]||², each
    subspace distance grid-quantized for cross-engine determinism.

    The scorer builds each distinct query's m×k lookup table once per
    Arrow batch and gathers per-pair by code — O(q·k·dim + pairs·m),
    the LUT trick that makes PQ beat exact scan at scale. Ascending
    distance, ties to the lowest neighbor id."""
    Cs = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m, sub = len(Cs), Cs[0].shape[1]
    c2s = [(C * C).sum(axis=1) for C in Cs]

    c = pq_encode(
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      as_double(vec_col).alias("cv"),
                      F.col(cell_col).alias("cell")),
        codebooks, vec_col="cv", out_col="codes",
    ).select("neighbor_id", "cell", "codes")
    q = queries.select(F.col(id_col).alias("query_id"),
                       as_double(vec_col).alias("qv"),
                       F.col(cell_col).alias("cell"))
    pairs = c.join(F.broadcast(q), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )

    @F.pandas_udf("double")
    def _adc(qvs: pd.Series, codes: pd.Series) -> pd.Series:
        out = np.empty(len(qvs))
        luts: dict[bytes, np.ndarray] = {}
        for i, (qv, cd) in enumerate(zip(qvs, codes)):
            Q = np.asarray(qv, dtype=np.float64)
            key = Q.tobytes()
            lut = luts.get(key)
            if lut is None:
                lut = np.empty((m, Cs[0].shape[0]))
                for s in range(m):
                    qs = Q[s * sub:(s + 1) * sub]
                    lut[s] = np.round(
                        (qs * qs).sum() - 2.0 * (Cs[s] @ qs) + c2s[s], 6
                    )
                luts[key] = lut
            out[i] = lut[np.arange(m), np.asarray(cd)].sum()
        return pd.Series(out)

    scored = pairs.withColumn("adc_d2", _adc("qv", "codes"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "adc_d2")
    )


def inertia(vectors: DataFrame, centroids: list[list[float]],
            vec_col: str = "embedding") -> float:
    """Sum of squared distances to the assigned centroid (the k-means
    objective) — one scan, used by the convergence property test."""
    C = np.asarray(centroids, dtype=np.float64)
    c2 = (C * C).sum(axis=1)[None, :]

    @F.pandas_udf("double")
    def _min_d2(vs: pd.Series) -> pd.Series:
        X = np.asarray([np.asarray(x, dtype=np.float64) for x in vs])
        d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + c2
        return pd.Series(d2.min(axis=1))

    v = vectors.select(as_double(vec_col).alias("v"))
    return v.select(F.sum(_min_d2("v")).alias("j")).collect()[0]["j"]


def ivf_trained_topk(corpus: DataFrame, queries: DataFrame,
                     centroids: list[list[float]], k: int = 5,
                     n_probe: int = 3, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """IVF search against TRAINED centroids: corpus rows live in their
    argmin cell; each query probes its `n_probe` nearest cells (the
    recall knob); candidates come from the equi-join on the cell id —
    the shuffle moves only probed-cell rows, ~n_probe/k of the corpus
    per query batch. n_probe = k degenerates to exact brute force
    (every cell probed), which the property test exploits.

    Each corpus vector lives in exactly one cell and probe cells are
    distinct, so no pair dedup is needed."""
    C = np.asarray(centroids, dtype=np.float64)
    c2 = (C * C).sum(axis=1)[None, :]

    @F.pandas_udf("array<int>")
    def _probe(vs: pd.Series) -> pd.Series:
        d2 = _sq_dists(vs, C, c2)
        order = np.argsort(d2, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    c = assign_cells(
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      as_double(vec_col).alias("cv")),
        centroids, vec_col="cv", out_col="cell",
    ).withColumn("cn", norm2(F.col("cv")))
    q = (
        queries.select(F.col(id_col).alias("query_id"),
                       as_double(vec_col).alias("qv"))
        .withColumn("cell", F.explode(_probe(F.col("qv"))))
        .withColumn("qn", norm2(F.col("qv")))
    )
    pairs = c.join(F.broadcast(q), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = pairs.withColumn(
        "cos_sim", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"))
    )
