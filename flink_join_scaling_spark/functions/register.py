"""SQL-surface registration: expose the engine's column expressions as
SQL functions and the catalog tables as views, so ``spark.sql`` users
get the same surface as the DataFrame API.

The reference is library-only (extractor functions passed to Scala
calls, ``joins.scala:11-13``); this engine additionally serves SQL.
Functions are registered as Spark SQL scalar UDFs (``CREATE FUNCTION
... RETURN <expression>``, Spark 4 SQL-standard UDFs) — they inline
into the plan as JVM expressions, so there is no Python boundary and
whole-stage codegen applies exactly as for the DataFrame forms.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from flink_join_scaling_spark.functions import text as _tx
from flink_join_scaling_spark.sources.catalog import register_views


def _sql_lit(pattern: str) -> str:
    """A Java-regex pattern as a Spark SQL string literal (backslashes
    doubled — Spark SQL literals are escape-processed by default)."""
    return "'" + pattern.replace("\\", "\\\\") + "'"


_NORM = r"regexp_replace(lower(trim(s)), '\\s+', ' ')"
_TOKS = f"split({_NORM}, ' ')"


def _lang_score(markers: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{m}'" for m in markers)
    return f"CAST(size(filter({_TOKS}, x -> x IN ({inlist}))) AS BIGINT)"


def _lang_id_body() -> str:
    """Mirror of text.lang_id, generated from the SAME marker table so
    the two faces cannot drift: argmax with deterministic priority
    (declaration order), 'und' on zero hits."""
    langs = list(_tx.LANG_MARKERS)
    scores = {g: _lang_score(m) for g, m in _tx.LANG_MARKERS.items()}
    best = "greatest(" + ", ".join(scores[g] for g in langs) + ")"
    out = "'und'"
    for g in reversed(langs):
        out = f"CASE WHEN {scores[g]} = __best THEN '{g}' ELSE {out} END"
    return (
        f"CASE WHEN __best = 0 THEN 'und' ELSE {out} END"
    ).replace("__best", best)


def _quality_body() -> str:
    """Mirror of text.quality_score (same constants, same rounding)."""
    n_chars = "CAST(length(s) AS DOUBLE)"
    n_toks = f"greatest(CAST(size({_TOKS}) AS DOUBLE), 1.0D)"
    punct = (
        f"CAST(length(s) - length(regexp_replace(s, {_sql_lit(_tx._PUNCT_CLASS)}, '')) AS DOUBLE)"
    )
    stop = f"CAST({_lang_score(_tx.LANG_MARKERS['en'])} AS DOUBLE)"
    return (
        "round("
        f"0.3D * least({n_chars} / 500.0D, 1.0D) + "
        f"0.2D * (CASE WHEN {n_chars} / {n_toks} BETWEEN 3.0D AND 10.0D THEN 1.0D ELSE 0.5D END) + "
        f"0.3D * least(({stop} / {n_toks}) * 5.0D, 1.0D) + "
        f"0.2D * (1.0D - least(({punct} / greatest({n_chars}, 1.0D)) * 10.0D, 1.0D))"
        ", 4)"
    )


def _pii_count_body() -> str:
    return " + ".join(
        f"CAST(regexp_count(s, {_sql_lit(p)}) AS BIGINT)"
        for p in _tx.PII_PATTERNS.values()
    )


def _redact_body() -> str:
    out = "s"
    for kind, pat in _tx.PII_PATTERNS.items():
        out = f"regexp_replace({out}, {_sql_lit(pat)}, '<PII:{kind}>')"
    return out


def _shingles3_body() -> str:
    gram = "concat(t[i], ' ', t[i + 1], ' ', t[i + 2])"
    return (
        "CASE WHEN size(t) >= 3 "
        f"THEN array_distinct(transform(sequence(0, size(t) - 3), i -> {gram})) "
        "ELSE array() END"
    )


#: name -> (signature, return type, SQL body). Bodies mirror
#: functions/text.py expression builders (kept in sync by test).
_SQL_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    "fjs_norm_text": (
        "(s STRING)",
        "STRING",
        r"regexp_replace(lower(trim(s)), '\\s+', ' ')",
    ),
    "fjs_tokens_ws": (
        "(s STRING)",
        "ARRAY<STRING>",
        r"split(regexp_replace(lower(trim(s)), '\\s+', ' '), ' ')",
    ),
    "fjs_n_tokens_ws": (
        "(s STRING)",
        "BIGINT",
        r"CAST(size(split(regexp_replace(lower(trim(s)), '\\s+', ' '), ' ')) AS BIGINT)",
    ),
    "fjs_dot": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)",
        "DOUBLE",
        "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)",
    ),
    "fjs_l2_norm": (
        "(a ARRAY<DOUBLE>)",
        "DOUBLE",
        "sqrt(aggregate(transform(a, x -> x * x), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))",
    ),
    "fjs_cosine": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)",
        "DOUBLE",
        "fjs_dot(a, b) / (fjs_l2_norm(a) * fjs_l2_norm(b))",
    ),
    # text-analysis family, generated from the same canonical
    # constants (BPE_ISH_PATTERN / LANG_MARKERS / PII_PATTERNS) the
    # DataFrame builders use, so the two faces cannot drift
    "fjs_tokens_bpe": (
        "(s STRING)",
        "ARRAY<STRING>",
        f"regexp_extract_all(s, {_sql_lit(_tx.BPE_ISH_PATTERN)}, 0)",
    ),
    "fjs_n_tokens_bpe": (
        "(s STRING)",
        "BIGINT",
        f"CAST(size(regexp_extract_all(s, {_sql_lit(_tx.BPE_ISH_PATTERN)}, 0)) AS BIGINT)",
    ),
    "fjs_punct_count": (
        "(s STRING)",
        "BIGINT",
        f"CAST(length(s) - length(regexp_replace(s, {_sql_lit(_tx._PUNCT_CLASS)}, '')) AS BIGINT)",
    ),
    "fjs_lang_id": ("(s STRING)", "STRING", _lang_id_body()),
    "fjs_quality_score": ("(s STRING)", "DOUBLE", _quality_body()),
    "fjs_pii_count": ("(s STRING)", "BIGINT", _pii_count_body()),
    "fjs_redact_pii": ("(s STRING)", "STRING", _redact_body()),
    "fjs_shingles3": ("(t ARRAY<STRING>)", "ARRAY<STRING>", _shingles3_body()),
}


def register_sql_surface(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register engine SQL functions (and optionally the table views)::

        register_sql_surface(spark, "/root/testdata/sf0.01")
        spark.sql("SELECT doc_id, fjs_n_tokens_ws(text) FROM documents")
    """
    if sf_dir is not None:
        register_views(spark, sf_dir)
    for name, (sig, ret, body) in _SQL_FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
            f"RETURNS {ret} RETURN {body}"
        )
