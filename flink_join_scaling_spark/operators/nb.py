"""Multinomial Naive Bayes text classifier on engine-native
primitives — the second *trained* classifier in the library (next to
the logistic quality classifier, ``operators/classifier.py``), and the
one whose training is EXACT integer arithmetic end to end: the model
IS a pair of count tables (add-1-smoothed token counts per class +
class priors), so a SQL oracle re-derives the entire model with two
GROUP BYs and the driver hash attests it directly.

Scoring discipline (the ``q_lm_score`` transcendental rule): per
(doc, class), the smoothed log-likelihood folds ``ln(count + 1)`` over
the class's per-token counts SORTED ascending, strictly left-to-right
(Spark ``aggregate`` ≙ DuckDB ``list_reduce`` — both sequential), then
subtracts ``n_tokens · ln(N_class + V)`` and adds the log-prior — a
pinned evaluation order shared by both engines, with the class argmax
taken over e6-quantized BIGINT scores (exact integer compares;
ties → lexicographically first class).

Scale shape: the model build is one token-keyed aggregation with
map-side partials (vocab-sized output, never collected); scoring joins
the corpus's exploded tokens back to the model on the token key — the
same co-partitioned big-big exchange as the TF-IDF/LM-score family —
then folds per document (state bounded by document length). Class
count is a column fan-out, not a join: 5 classes = 5 conditional sums
per token row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def nb_model(words: DataFrame, classes: tuple[str, ...], class_col: str = "lang",
             token_col: str = "w") -> DataFrame:
    """Token-conditional count table: one row per token, one BIGINT
    count column ``c_{cls}`` per class. ``words`` carries one row per
    token OCCURRENCE with its document's class label."""
    return words.groupBy(token_col).agg(
        *[
            F.sum(F.when(F.col(class_col) == c, 1).otherwise(0))
            .cast("bigint")
            .alias(f"c_{c}")
            for c in classes
        ]
    )


def nb_totals(words: DataFrame, classes: tuple[str, ...], class_col: str = "lang",
              token_col: str = "w") -> DataFrame:
    """1-row frame of the scoring scalars: per-class token totals
    ``n_{cls}`` and the shared vocabulary size ``v`` (distinct tokens
    over the WHOLE corpus — the add-1 smoothing denominator)."""
    return words.agg(
        *[
            F.sum(F.when(F.col(class_col) == c, 1).otherwise(0))
            .cast("bigint")
            .alias(f"n_{c}")
            for c in classes
        ],
        F.countDistinct(token_col).cast("bigint").alias("v"),
    )


def nb_priors(docs: DataFrame, classes: tuple[str, ...],
              class_col: str = "lang") -> DataFrame:
    """1-row frame of class priors as exact counts: ``d_{cls}`` docs
    per class and ``dd`` total docs."""
    return docs.agg(
        *[
            F.sum(F.when(F.col(class_col) == c, 1).otherwise(0))
            .cast("bigint")
            .alias(f"d_{c}")
            for c in classes
        ],
        F.count("*").cast("bigint").alias("dd"),
    )


def nb_score_expr(cls: str) -> Column:
    """Smoothed log-posterior (up to the class-independent evidence
    term) for one class, over a row carrying ``a_{cls}`` (the doc's
    per-token class counts, sorted ascending), ``n_toks``, and the
    totals/priors columns. Evaluation order is pinned left-to-right:
    (ln d_c − ln dd) + Σ ln(cnt+1) − n·ln(n_c + v)."""
    fold = F.aggregate(
        F.transform(F.col(f"a_{cls}"), lambda x: F.log(x + F.lit(1.0))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        F.log(F.col(f"d_{cls}").cast("double"))
        - F.log(F.col("dd").cast("double"))
        + fold
        - F.col("n_toks").cast("double")
        * F.log((F.col(f"n_{cls}") + F.col("v")).cast("double"))
    )


def nb_predict(
    scored: DataFrame,
    classes: tuple[str, ...],
) -> DataFrame:
    """argmax over the per-class e6 scores ``s_{cls}`` with
    first-class-ascending tiebreak: adds ``pred_lang`` and
    ``score_e6`` (the winning class's score). Pure array expressions —
    sort (negated score, class) structs, take the head — matching the
    oracle's ``greatest`` + ordered ``CASE``.

    The output column name is fixed: every NB caller in this repo is
    the language classifier. A ``class_col`` knob existed briefly in
    round 9 but no call site ever passed it — parameterize the output
    name only when a non-language NB plan actually needs it."""
    class_col = "lang"
    cands = F.array(
        *[
            F.struct(
                (-F.col(f"s_{c}")).alias("neg"), F.lit(c).alias("cls")
            )
            for c in classes
        ]
    )
    best = F.array_sort(cands)[0]
    return scored.withColumn("__best", best).withColumn(
        f"pred_{class_col}", F.col("__best.cls")
    ).withColumn("score_e6", -F.col("__best.neg")).drop("__best")
