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
heuristic quality score are positives, bottom-quartile negatives —
quartiles of the (qraw_e6 DESC, doc_id ASC) total order, where
qraw_e6 is the e6-integer quantization of the raw score (bounded
domain [0, 1e6] because the score is a convex combination in [0,1]).

The Spark side derives quartile MEMBERSHIP without any window: one
domain-bounded value histogram (the e6 score domain holds ≤ 1,000,001
distinct values at ANY corpus size) locates the exact cutoff values
and tie splits, and labeling is then a map-side filter against four
broadcast literals. The earlier global
``ntile(4)`` window ranked the ENTIRE corpus on one partition (Spark
warns ``WindowExec: No Partition Defined``) — the one corpus-sized
single-task sort in the repo; this replaces it with three bounded
1-pass aggregations over a slim checkpointed feature frame. The
DuckDB oracle keeps the declarative ``ntile(4)`` form (oracle
efficiency is irrelevant); membership is provably identical: ntile
bucket 1 is exactly the first ⌈n/4⌉-ish rows of the total order and
bucket 4 exactly the last ⌊n/4⌋, which is what the cutoffs select.
Apply stays a map-only scan of the full corpus with the weights
inlined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
        SELECT doc_id, ntile(4) OVER (
            ORDER BY CAST(round(quality_raw * 1000000) AS BIGINT) DESC, doc_id
        ) AS qt
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


def _kth_cut(fine: dict[int, int], buckets: list[int], start: int, k: int):
    """Walk ``buckets`` (an ordered traversal of e6 score values) until
    cumulative count reaches rank ``k``; returns
    (cut_value, n_strictly_before, tie_count)."""
    cum = start
    for v in buckets:
        if cum + fine[v] >= k:
            return v, cum, fine[v]
        cum += fine[v]
    raise AssertionError("rank walked past the histogram")  # pragma: no cover


def _quartile_conditions(base: DataFrame):
    """Exact ntile(4)-membership conditions for buckets 1 and 4 of the
    (``__qe6`` DESC, ``doc_id`` ASC) total order, as map-side filters.

    One bounded histogram job replaces the single-partition global
    sort: a full value histogram on ``__qe6`` — the raw quality score
    is a convex combination in [0,1], so the e6 domain holds at most
    1,000,001 distinct values and the collect is ≤ ~16 MB at ANY
    corpus size (bounded by the VALUE DOMAIN, never by rows — the same
    boundedness class as connected_components' gated 1M-edge collect).
    r18 folded the former two-level coarse→fine walk (≤101 + ≤2·10⁴
    rows over two jobs) into this single aggregation: one map-side-
    combined pass and ONE driver round-trip instead of two, saving a
    job + planning gap in each of the three trainer-bearing queries;
    the walk arithmetic below is unchanged, so membership is
    identical. A second job remains only when a boundary value is
    tied: a TakeOrdered over just that tie group finds the doc_id
    split (tie-group-bounded; score ties at e6 granularity are a
    vanishing fraction of a real corpus — a degenerate all-one-score
    corpus would make this quartile-sized, at which point quartile
    labels are meaningless anyway). No WindowExec anywhere."""
    fine_rows = base.groupBy("__qe6").count().collect()
    fine = {int(r["__qe6"]): int(r["count"]) for r in fine_rows}
    n = sum(fine.values())
    if n < 8:
        raise ValueError(
            f"quartile labeling needs >= 8 documents, got {n}: bucket 4 "
            "would be empty or the train set degenerate"
        )
    # ntile(4) bucket sizes: the first n%4 buckets carry one extra row
    k1 = n // 4 + (1 if n % 4 >= 1 else 0)  # rows in bucket 1 (top)
    k4 = n // 4  # rows in bucket 4 (bottom)

    top_vals = sorted(fine, reverse=True)
    bot_vals = sorted(fine)
    c1, gt1, tie1 = _kth_cut(fine, top_vals, 0, k1)
    c4, lt4, tie4 = _kth_cut(fine, bot_vals, 0, k4)
    r1, r4 = k1 - gt1, k4 - lt4  # rows taken from each boundary tie group

    qe6, did = F.col("__qe6"), F.col("doc_id")
    # bucket 1 = top k1 rows: all above c1, plus the r1 LOWEST doc_ids
    # at c1 (the total order breaks score ties by doc_id ASC)
    if r1 == tie1:
        pos = qe6 >= c1
    else:
        d1 = (
            base.where(qe6 == c1)
            .orderBy("doc_id")
            .limit(r1)
            .agg(F.max("doc_id"))
            .first()[0]
        )
        pos = (qe6 > c1) | ((qe6 == c1) & (did <= d1))
    # bucket 4 = bottom k4 rows = top k4 of the REVERSED order
    # (qe6 ASC, doc_id DESC): all below c4, plus the r4 HIGHEST doc_ids
    if r4 == tie4:
        neg = qe6 <= c4
    else:
        d4 = (
            base.where(qe6 == c4)
            .orderBy(F.desc("doc_id"))
            .limit(r4)
            .agg(F.min("doc_id"))
            .first()[0]
        )
        neg = (qe6 < c4) | ((qe6 == c4) & (did >= d4))
    # disjoint by construction: c1 > c4, or c1 == c4 with a tie group
    # spanning both boundaries — then r1 < tie1 and r4 < tie4 (the
    # group extends past both ranks since k1 <= n - k4), so both sides
    # take the doc_id-cut form and r1 + r4 <= tie keeps them apart
    return pos, neg


def _labeled_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, y, x1..x5) for the quartile-labeled training slice.
    The slim feature frame (7 numerics + id, text dropped) is pinned
    with localCheckpoint so the histogram/cut jobs and the training
    loop never recompute the regex-heavy text features."""
    from flink_join_scaling_spark.partitioning import widen_if_narrow

    d = load_table(spark, sf_dir, "documents")
    feats = clf.feature_columns(F.col("text"))
    # widen: the regex-heavy feature pass otherwise runs on the scan's
    # single bench-scale split (no-op at real scale)
    base = widen_if_narrow(d.select("doc_id", "text")).select(
        "doc_id",
        F.round(tx.quality_score_raw(F.col("text")) * 1_000_000.0)
        .cast("bigint")
        .alias("__qe6"),
        *[c.alias(n) for n, c in feats.items()],
    ).localCheckpoint(eager=True)
    pos, neg = _quartile_conditions(base)
    return (
        base.where(pos | neg)
        .withColumn("y", F.when(pos, 1.0).otherwise(0.0))
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
    from flink_join_scaling_spark.partitioning import widen_if_narrow

    lab = _labeled_frame(spark, sf_dir)
    w = clf.train_lr(lab.select("y", *clf.FEATURES), _LR_ITERS, _LR_RATE)
    d = load_table(spark, sf_dir, "documents")
    feats = clf.feature_columns(F.col("text"))
    # widen the scoring scan: regex-heavy features on a single bench-
    # scale split (no-op at real scale)
    scored = widen_if_narrow(
        d.select("doc_id", "source", "n_chars", "text")
    ).select(
        "doc_id", "source", "n_chars",
        *[c.alias(n) for n, c in feats.items()],
    ).withColumn("__z", clf.logit(w))
    return scored.where(F.col("__z") >= 0).select(
        "doc_id", "source", "n_chars",
        F.round(F.col("__z") * 1000000.0).cast("bigint").alias("logit_e6"),
    )
