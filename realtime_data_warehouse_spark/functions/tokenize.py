"""U1 — keyword tokenizer (SURVEY §2.10).

The reference wraps the IK Chinese segmenter in a Flink TableFunction
(KwSplit.java:11-21) and applies it via LEFT JOIN LATERAL
(DwsTrafficSourceKeywordPageViewWindow.java:63-69). Spark-first
re-expression: tokenization is a *built-in expression chain*
(lower → run extraction → per-run expansion), and the lateral join is
`explode` — both JVM-side, no Python UDF in the hot path.

CJK handling (round-6): IK segments Chinese by dictionary; no
segmentation library exists in this container (jieba absent —
documented README offline sweep), so Han-script runs fall back to
CHARACTER BIGRAMS — the standard no-dictionary CJK indexing unit
(what Lucene's CJKAnalyzer does without IK): a run 你好世界 yields
[你好, 好世, 世界]; a lone Han char yields itself. ASCII behavior is
byte-identical to the pre-round-6 split (runs of [a-z0-9]+ over
lower()), so every registered oracle entry over the ASCII testdata is
unchanged; mixed-script text now tokenizes both scripts in document
order instead of silently dropping the CJK runs.

Measured cost of the alternation (sf0.1 documents, full-corpus
explode+count, min of 5 interleaved): split-only 0.21 s →
regexp_extract_all 0.28 s. A has-Han rlike guard around the old split
does NOT recover it (0.29 s — the guard scan costs what it saves), so
the single-expression form stays: one convention, +33% on a kernel
that is never the query bottleneck (shuffles dominate every consumer).
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

#: word-ish tokens: letter/digit runs — a BPE-ish first pass that both
#: Spark and ANSI SQL can express.
TOKEN_PATTERN = "[a-z]+|[0-9]+"

#: CJK Unified Ideographs (the range IK's dictionary covers; extension
#: blocks would append here). Literal chars, not escapes, so the same
#: pattern text works in Java regex, SQL literals, and Python `re`.
HAN_RANGE = "一-鿿"

#: one alternation extracts BOTH kinds of run in document order; each
#: run is homogeneous (ASCII xor Han) by construction.
RUN_PATTERN = f"[a-z0-9]+|[{HAN_RANGE}]+"


def _expand_run(r: Column) -> Column:
    """ASCII run → itself; Han run → character bigrams (run itself
    when length 1). Pure expression — stays codegen'd.

    Bigrams come from zip_with(chars, chars[2:]) rather than
    transform(sequence(1, len−1), i → substr) — MEASURED DEAD END:
    a `sequence()` nested inside this lambda makes Spark 4.1 leave
    the downstream pandas_udf inside an inferred isnotnull join-key
    filter un-extracted (interpreted Filter → "Cannot evaluate
    expression: PythonUDF" in every self-join over a simhash/minhash
    column on a vanilla session); the zip_with form plans cleanly.
    zip_with pads the shorter side with null (concat → null-length
    tail entries), hence the length==2 filter."""
    chars = F.split(r, "(?!^)")  # split before every char but the first
    bigrams = F.filter(
        F.zip_with(
            chars,
            F.slice(chars, 2, F.greatest(F.length(r) - 1, F.lit(1))),
            lambda a, b: F.concat(a, b),
        ),
        lambda t: F.length(t) == 2,
    )
    return (
        F.when(r.rlike("^[a-z0-9]"), F.array(r))
        .when(F.length(r) == 1, F.array(r))
        .otherwise(bigrams)
    )


def tokenize(c: str | Column) -> Column:
    """STRING → ARRAY<STRING> of lowercase tokens: [a-z0-9]+ runs as
    single tokens, Han runs as character bigrams, in document order.
    Codegen'd; at scale this is the map-side of the keyword pipeline,
    no shuffle."""
    col = F.col(c) if isinstance(c, str) else c
    runs = F.regexp_extract_all(F.lower(col), F.lit(RUN_PATTERN), 0)
    return F.flatten(F.transform(runs, _expand_run))


def explode_keywords(df, text_col: str, out_col: str = "keyword"):
    """LEFT JOIN LATERAL TABLE(KwSplit(...)) ON TRUE equivalent (J6):
    explode the token array into one row per keyword."""
    return df.select("*", F.explode(tokenize(text_col)).alias(out_col))


def register_sql_functions(spark: SparkSession) -> None:
    """Expose `kw_split(text)` to the SQL entry point, mirroring
    createTemporarySystemFunction("KwSplit", ...)
    (DwsTrafficSourceKeywordPageViewWindow.java:26). Same expression
    as tokenize() — one tokenization convention across both APIs."""
    body = (
        "flatten(transform("
        f"  regexp_extract_all(lower(s), '{RUN_PATTERN}', 0),"
        "  r -> CASE WHEN r RLIKE '^[a-z0-9]' THEN array(r)"
        "            WHEN length(r) = 1 THEN array(r)"
        "            ELSE filter(zip_with(split(r, '(?!^)'),"
        "                   slice(split(r, '(?!^)'), 2,"
        "                         greatest(length(r) - 1, 1)),"
        "                   (a, b) -> concat(a, b)),"
        "                 t -> length(t) = 2) END))"
    )
    try:
        # Spark 4 SQL scalar UDF (CREATE FUNCTION ... RETURN) — expression
        # based, stays codegen'd.
        spark.sql(
            "CREATE OR REPLACE TEMPORARY FUNCTION kw_split(s STRING) "
            f"RETURNS ARRAY<STRING> RETURN {body}"
        )
    except Exception:
        # older Spark: fall back to a thin Python UDF (cold path only)
        import re

        runs = re.compile(RUN_PATTERN)
        ascii_head = re.compile("^[a-z0-9]")

        def _split(s):  # pragma: no cover - fallback
            if s is None:
                return []
            out = []
            for r in runs.findall(s.lower()):
                if ascii_head.match(r) or len(r) == 1:
                    out.append(r)
                else:
                    out.extend(r[i:i + 2] for i in range(len(r) - 1))
            return out

        spark.udf.register("kw_split", _split, "array<string>")
