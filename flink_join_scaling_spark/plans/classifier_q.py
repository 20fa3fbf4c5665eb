"""Trained-quality-classifier queries: model-based corpus filtering
(the GPT-3/fasttext-style "quality classifier" curation step) with the
training loop itself oracle-checked.

Like ``plans/bpe_q.py``, the DuckDB oracle RE-TRAINS the model by
unrolling the gradient-descent loop into K generated MATERIALIZED CTE
rounds. Engine-exactness comes from ``operators/classifier.py``'s
three disciplines: fast-sigmoid link (no libm ``exp``), e6-quantized
integer gradient sums (accumulation-order-immune), and a pinned
scalar update chain — so the driver hash attests the whole training
trajectory, final weights included, not merely downstream counts.

Weak labels are the standard bootstrap: top-quartile documents by the
heuristic quality score are positives, bottom-quartile negatives
(ntile over the (quality_raw DESC, doc_id) total order — engine-
identical bucketing, the q_ppl_buckets discipline). At 100 TB the
train frame is a bounded labeled sample (the global ntile runs over
that sample, not the corpus); apply stays a map-only scan of the full
corpus with the weights inlined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_join_scaling_spark.functions import text as tx
from flink_join_scaling_spark.operators import classifier as clf
from flink_join_scaling_spark.plans.llmdata import (
    _lang_score_sql,
    _NORM,
    _quality_cte,
)
from flink_join_scaling_spark.plans.registry import query
from flink_join_scaling_spark.sources.catalog import load_table

_LR_ITERS = 8
_LR_RATE = 2.0  # repr must match the SQL literal exactly

_Z_SQL = "w.w0 + w.w1*t.x1 + w.w2*t.x2 + w.w3*t.x3 + w.w4*t.x4 + w.w5*t.x5"


def _train_ctes(k: int, lr: float) -> str:
    """feat/lab/train + K unrolled GD rounds ending in weights w{k}.
    MATERIALIZED pins each round (the chain is otherwise inlined
    exponentially, the bpe_q lesson)."""
    feat = f"""
    feat AS MATERIALIZED (
        SELECT doc_id,
               least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS x1,
               least(CAST(length(text) AS DOUBLE)
                     / greatest(CAST(len(string_split({_NORM}, ' ')) AS DOUBLE), 1.0)
                     / 10.0, 1.0) AS x2,
               least(CAST({_lang_score_sql(tx.LANG_MARKERS["en"])} AS DOUBLE)
                     / greatest(CAST(len(string_split({_NORM}, ' ')) AS DOUBLE), 1.0)
                     * 5.0, 1.0) AS x3,
               least(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
                          AS DOUBLE)
                     / greatest(CAST(length(text) AS DOUBLE), 1.0) * 10.0, 1.0) AS x4,
               least(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                          AS DOUBLE)
                     / greatest(CAST(length(text) AS DOUBLE), 1.0) * 5.0, 1.0) AS x5
        FROM documents
    ),
    lab0 AS (
        SELECT doc_id, ntile(4) OVER (ORDER BY quality_raw DESC, doc_id) AS qt
        FROM qraw
    ),
    train AS MATERIALIZED (
        SELECT f.doc_id, f.x1, f.x2, f.x3, f.x4, f.x5,
               CASE WHEN l.qt = 1 THEN 1.0 ELSE 0.0 END AS y
        FROM feat f JOIN lab0 l USING (doc_id) WHERE l.qt IN (1, 4)
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM train),
    w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2,
                  0.0 AS w3, 0.0 AS w4, 0.0 AS w5)"""
    parts = [feat]
    for r in range(1, k + 1):
        gs = ", ".join(
            f"CAST(sum(CAST(round((p - y) * {'' if j == 0 else f'x{j} * '}1000000)"
            f" AS BIGINT)) AS BIGINT) AS g{j}"
            for j in range(6)
        )
        ws = ", ".join(
            f"w.w{j} - {lr} * (CAST(g.g{j} AS DOUBLE) / 1000000.0)"
            f" / CAST(nn.n AS DOUBLE) AS w{j}"
            for j in range(6)
        )
        parts.append(f"""
    g{r} AS MATERIALIZED (
        SELECT {gs}
        FROM (SELECT *, 0.5 + 0.5 * (z / (1.0 + abs(z))) AS p
              FROM (SELECT t.*, {_Z_SQL} AS z FROM train t, w{r - 1} w))
    ),
    w{r} AS MATERIALIZED (SELECT {ws} FROM w{r - 1} w, g{r} g, nn)""")
    return ",".join(parts)


def _labeled_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, y, x1..x5) for the quartile-labeled training slice."""
    d = load_table(spark, sf_dir, "documents")
    feats = clf.feature_columns(F.col("text"))
    base = d.select(
        "doc_id",
        tx.quality_score_raw(F.col("text")).alias("__qraw"),
        *[c.alias(n) for n, c in feats.items()],
    )
    qt = F.ntile(4).over(Window.orderBy(F.desc("__qraw"), F.asc("doc_id")))
    return (
        base.withColumn("qt", qt)
        .where(F.col("qt").isin(1, 4))
        .withColumn("y", F.when(F.col("qt") == 1, 1.0).otherwise(0.0))
        .select("doc_id", "y", *clf.FEATURES)
    )


def _weight_cols(w: list[float]) -> list:
    return [
        F.round(F.lit(float(wj)) * 1000000.0).cast("bigint").alias(f"w{j}_e6")
        for j, wj in enumerate(w)
    ]


@query(
    "q_quality_classifier",
    oracle=f"""
    WITH {_quality_cte()}, {_train_ctes(_LR_ITERS, _LR_RATE)}
    SELECT nn.n AS n_train,
           (SELECT CAST(sum(CASE WHEN (z >= 0) = (y = 1.0) THEN 1 ELSE 0 END)
                        AS BIGINT)
            FROM (SELECT t.y, {_Z_SQL} AS z FROM train t, w{_LR_ITERS} w))
               AS n_correct,
           {", ".join(f"CAST(round(w.w{j} * 1000000.0) AS BIGINT) AS w{j}_e6" for j in range(6))}
    FROM w{_LR_ITERS} w, nn
    """,
    tags=("llmdata", "classifier", "iterative"),
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the quality classifier and emit the fitted model: weight
    vector (e6 ints) + train-set accuracy counts. A hash match means
    DuckDB's from-scratch re-run of all 8 GD rounds lands on
    bit-identical weights."""
    lab = _labeled_frame(spark, sf_dir)
    w = clf.train_lr(lab.select("y", *clf.FEATURES), _LR_ITERS, _LR_RATE)
    z = clf.logit(w)
    correct = (z >= 0) == (F.col("y") == 1.0)
    return lab.agg(
        F.count("*").cast("bigint").alias("n_train"),
        F.sum(F.when(correct, 1).otherwise(0)).cast("bigint").alias("n_correct"),
        *_weight_cols(w),
    )


@query(
    "q_quality_classifier_apply",
    oracle=f"""
    WITH {_quality_cte()}, {_train_ctes(_LR_ITERS, _LR_RATE)}
    SELECT t.doc_id, t.source, t.n_chars,
           CAST(round(t.z * 1000000.0) AS BIGINT) AS logit_e6
    FROM (
        SELECT d.doc_id, d.source, d.n_chars, {_Z_SQL} AS z
        FROM documents d JOIN feat t ON t.doc_id = d.doc_id, w{_LR_ITERS} w
    ) t WHERE t.z >= 0
    """,
    headline=True,
    tags=("llmdata", "classifier", "iterative"),
)
def q_quality_classifier_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-filtered corpus: every document the trained classifier
    accepts (logit ≥ 0), with the logit exposed e6. The production
    shape: training runs on the bounded labeled slice; scoring is ONE
    map-only corpus scan with the six weights inlined as literals into
    a codegen projection — no join, no shuffle."""
    lab = _labeled_frame(spark, sf_dir)
    w = clf.train_lr(lab.select("y", *clf.FEATURES), _LR_ITERS, _LR_RATE)
    d = load_table(spark, sf_dir, "documents")
    feats = clf.feature_columns(F.col("text"))
    scored = d.select(
        "doc_id", "source", "n_chars",
        *[c.alias(n) for n, c in feats.items()],
    ).withColumn("__z", clf.logit(w))
    return scored.where(F.col("__z") >= 0).select(
        "doc_id", "source", "n_chars",
        F.round(F.col("__z") * 1000000.0).cast("bigint").alias("logit_e6"),
    )
