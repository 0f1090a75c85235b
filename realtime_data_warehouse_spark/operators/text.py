"""Text-analysis operators for training-data pipelines.

Language-ID (stopword n-gram heuristic), quality scoring, token
counting (whitespace + BPE-ish regex), and document fingerprinting
over the `documents` table. All pure JVM-side expressions — these run
inside whole-stage codegen over the text column, so a 100 TB corpus
pays one scan and zero shuffles for per-document scoring.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize

#: BPE-ish token pattern: letter runs | digit runs | single symbol.
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

#: tiny per-language stopword lists for the langid heuristic. The
#: testdata text is synthetic word soup, so this is a demonstrator of
#: the operator shape (per-language token-hit scoring + argmax), not a
#: linguistic model; swap lists for real ones in production.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "los", "de", "y", "que", "en"),
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "fr": ("le", "la", "les", "et", "de", "un", "est"),
}


def ws_token_count(text: str | Column) -> Column:
    """Whitespace token count."""
    c = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count(text: str | Column) -> Column:
    """Sub-word-ish token count via the BPE-ish regex (letter runs,
    digit runs, single symbols) — the cheap stand-in for a real BPE
    vocab when budgeting tokens at corpus scale."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(BPE_ISH_PATTERN), F.lit(0)))


def punct_ratio(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    punct = F.length(F.regexp_replace(F.lower(c), r"[a-z0-9\s]", ""))
    return punct / F.length(c)


def stopword_ratio(text: str | Column, stops: tuple[str, ...] = LANG_STOPWORDS["en"]) -> Column:
    """Fraction of tokens that are stopwords (token-occurrence based,
    not distinct)."""
    toks = tokenize(text)
    stop_arr = F.array(*[F.lit(s) for s in stops])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return hits / F.size(toks)


def avg_token_len(text: str | Column) -> Column:
    toks = tokenize(text)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda acc, x: acc + x
    )
    return total / F.size(toks)


def lang_scores(text: str | Column) -> dict[str, Column]:
    """Distinct-stopword hit count per language — the n-gram-heuristic
    scoring half of language ID."""
    toks_distinct = F.array_distinct(tokenize(text))
    out = {}
    for lang, stops in LANG_STOPWORDS.items():
        stop_arr = F.array(*[F.lit(s) for s in stops])
        out[lang] = F.size(F.array_intersect(toks_distinct, stop_arr))
    return out


def langid(text: str | Column) -> Column:
    """argmax over lang_scores with deterministic tie order (list
    order of LANG_STOPWORDS); score 0 everywhere → 'und'."""
    scores = lang_scores(text)
    langs = list(scores)
    best = scores[langs[0]]
    for lang in langs[1:]:
        best = F.greatest(best, scores[lang])
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    return F.when(best == 0, F.lit("und")).otherwise(pred)


def fingerprint(text: str | Column) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized lowercase text. Used as the exact-dedup key
    — two docs differing only in spacing/case collide on purpose."""
    c = F.col(text) if isinstance(text, str) else text
    normalized = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    return F.md5(normalized)


def hash_bucket(col, buckets: int = 100) -> Column:
    """Deterministic, engine-portable bucket in [0, buckets): md5 of
    the value's string form, folded to 60 bits (15 hex chars keeps the
    intermediate inside a signed BIGINT in any engine), mod buckets.
    The backbone of reproducible sampling / split assignment at any
    scale: pure map-side, no state, stable across engines and runs —
    DuckDB computes the identical bucket via
    ('0x' || substr(md5(x), 1, 15))::BIGINT % buckets."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


#: PII scrub patterns, applied in order. Deliberately restricted to
#: syntax with identical semantics in Java regex (Spark) and RE2
#: (DuckDB): no backrefs, no lookarounds, no \b. Order matters — IPs
#: are replaced before bare digit runs so the octets never feed the
#: <NUM> rule; counts are taken sequentially on the partially
#: redacted text for the same reason.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    (r"[0-9]{9,}", "<NUM>"),
)


def redact_pii(text: str | Column) -> tuple[Column, list[Column]]:
    """PII scrub for training corpora: email addresses, IPv4 literals
    and long (≥9) digit runs each replaced by a typed mask token.

    Returns (redacted_text, [match_count per pattern]). Counts are
    computed on the text as it stood when that pattern ran (the same
    sequential semantics as the replacement chain), so a digit run
    inside an already-masked IP is never double-counted.

    Pure JVM regexp expressions inside one codegen'd projection —
    zero shuffles, one scan; at 100 TB this is the canonical cheap
    map-side scrub pass before any tokenization or dedup."""
    c = F.col(text) if isinstance(text, str) else text
    counts: list[Column] = []
    for pat, repl in PII_PATTERNS:
        counts.append(F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))))
        c = F.regexp_replace(c, pat, repl)
    return c, counts


def tfidf_top_terms(df, id_col: str = "doc_id", text_col: str = "text",
                    top_k: int = 3):
    """Per-document top-k terms by TF-IDF — the classic two-pass
    relevance/keyword-extraction pipeline over a corpus.

    Plan: tokenize+explode (map-side) → groupBy(doc, term) term
    frequencies (shuffle 1) → document frequency as a COUNT window
    over the term partition (shuffle 2 — re-keying the already
    doc-term-aggregated rows, never the raw token stream) → per-doc
    ranking window (shuffle 3 on doc id). Corpus size is a scalar
    aggregate collected to the driver and inlined as a literal (one
    count scan; the same thing a scalar subquery plans) — model
    parameters may cross the driver, data never does. Skewed head
    terms (stopwords) are one row per (doc, term) by the time they
    hit the term window, so the skew cap is n_docs rows per term;
    AQE's skew handling covers it.

    The score uses the LINEAR idf ratio tf·(N+1)/(df+1) rather than
    the log form: integer-exact numerator/denominator through one
    correctly-rounded IEEE division makes the doubles bit-identical
    across engines (ln() is only 1-ulp-accurate and engine-specific,
    which would make a hash oracle flaky). Monotone in tf and 1/df
    like the log form; swap in log-idf when ranking quality across
    differently-sized corpora matters more than replayability."""
    from ..functions.tokenize import tokenize

    toks = df.select(id_col, F.explode(tokenize(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.count()
    from pyspark.sql import Window

    w_term = Window.partitionBy("term")
    scored = tf.withColumn("df_docs", F.count(F.lit(1)).over(w_term)).withColumn(
        "tfidf",
        F.col("tf") * F.lit(n_docs + 1) / (F.col("df_docs") + F.lit(1)),
    )
    w_rank = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= top_k)
        .select(id_col, "term", "tf", "df_docs", "tfidf")
    )


def chunk_tokens(df, text_col: str = "text", id_col: str = "doc_id",
                 chunk_size: int = 50, stride: int = 40,
                 passthrough: list[str] | None = None):
    """Context-window chunking for training pipelines: tokenize, then
    emit overlapping `chunk_size`-token windows every `stride` tokens
    (overlap = chunk_size − stride). One projection + one explode —
    map-side only, no shuffle; the fan-out factor is ~len/stride,
    which is the same ratio a loader would create downstream anyway.

    `passthrough` columns ride along into every chunk row, so callers
    never need to join chunks back to the source to recover doc-level
    attributes (that join is a whole extra shuffle at 100 TB).

    Output: (id, *passthrough, chunk_idx, n_tokens, chunk_text). Only
    non-empty chunks are emitted; docs with no tokens produce no
    rows."""
    from ..functions.tokenize import tokenize

    passthrough = passthrough or []
    toks = df.withColumn("__toks", tokenize(text_col)).filter(F.size("__toks") > 0)
    starts = F.sequence(F.lit(1), F.size("__toks"), F.lit(stride))
    exploded = toks.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        F.col("__toks"),
        F.posexplode(starts).alias("chunk_idx", "start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("start"), chunk_size)
    return exploded.select(
        id_col,
        *passthrough,
        "chunk_idx",
        F.size(chunk).alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
