"""SQL-surface tests: registered fjs_* functions agree with the
DataFrame-API expression builders, and stay JVM-side (no Python UDF
node in the plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_join_scaling_spark.functions import text as tx
from flink_join_scaling_spark.functions import vectors as vx
from flink_join_scaling_spark.functions.register import register_sql_surface
from tests.conftest import SF_SMALL


def test_sql_functions_match_dataframe_builders(spark):
    register_sql_surface(spark, SF_SMALL)
    got = spark.sql(
        """
        SELECT doc_id,
               fjs_norm_text(text) AS nt,
               fjs_n_tokens_ws(text) AS n
        FROM documents ORDER BY doc_id LIMIT 50
        """
    ).collect()
    exp = (
        spark.table("documents")
        .select(
            "doc_id",
            tx.norm_text(F.col("text")).alias("nt"),
            tx.n_tokens_ws(F.col("text")).alias("n"),
        )
        .orderBy("doc_id")
        .limit(50)
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]


def test_sql_cosine_matches_vector_exprs(spark):
    register_sql_surface(spark)
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 2.0], [0.5, 1.0, -1.0])],
        "id long, a array<double>, b array<double>",
    )
    df.createOrReplaceTempView("__vecs")
    got = spark.sql("SELECT fjs_cosine(a, b) AS c FROM __vecs").first().c
    exp = (
        df.select(
            vx.cosine_expr("a", "b", vx.l2_norm_expr("a"), vx.l2_norm_expr("b")).alias("c")
        )
        .first()
        .c
    )
    assert abs(got - exp) < 1e-12


def test_sql_text_family_matches_dataframe_builders(spark):
    """Every generated text-family SQL function equals its DataFrame
    twin row-for-row on the documents fixture (exact equality — the
    bodies are generated from the same canonical constants)."""
    register_sql_surface(spark, SF_SMALL)
    got = spark.sql(
        """
        SELECT doc_id,
               fjs_n_tokens_bpe(text) AS nb,
               fjs_punct_count(text) AS pc,
               fjs_lang_id(text) AS lg,
               fjs_quality_score(text) AS q,
               fjs_pii_count(text) AS pii,
               fjs_redact_pii(text) AS red,
               fjs_shingles3(fjs_tokens_ws(text)) AS sh
        FROM documents ORDER BY doc_id LIMIT 100
        """
    ).collect()
    c = F.col("text")
    exp = (
        spark.table("documents")
        .withColumn("__t", tx.tokens_ws(c))
        .select(
            "doc_id",
            tx.n_tokens_bpe_ish(c).alias("nb"),
            tx.punct_count(c).alias("pc"),
            tx.lang_id(c).alias("lg"),
            tx.quality_score(c).alias("q"),
            tx.pii_count(c).alias("pii"),
            tx.redact_pii(c).alias("red"),
            tx.shingles_from_tokens("__t", 3).alias("sh"),
        )
        .orderBy("doc_id")
        .limit(100)
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]


def test_sql_functions_stay_jvm_side(spark):
    register_sql_surface(spark, SF_SMALL)
    plan = (
        spark.sql("SELECT fjs_n_tokens_ws(text) FROM documents")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
