"""Trained quality classifier: convergence, determinism, and the
exact-integer gradient discipline."""

import pytest
from pyspark.sql import functions as F

from flink_join_scaling_spark.operators import classifier as clf


@pytest.fixture(scope="module")
def toy_labeled(spark):
    # linearly separable on x1: positives high, negatives low
    rows = [(1.0, 0.9, 0.5, 0.5, 0.1, 0.1) for _ in range(20)] + [
        (0.0, 0.1, 0.5, 0.5, 0.9, 0.9) for _ in range(20)
    ]
    return spark.createDataFrame(rows, ["y", *clf.FEATURES])


def test_train_separates_toy(spark, toy_labeled):
    w = clf.train_lr(toy_labeled, iterations=8, lr=2.0)
    z = clf.logit(w)
    acc = toy_labeled.agg(
        F.avg(F.when((z >= 0) == (F.col("y") == 1.0), 1.0).otherwise(0.0))
    ).first()[0]
    assert acc == 1.0
    # positive class sits at higher x1 → w1 must be positive
    assert w[1] > 0


def test_train_deterministic_across_partitionings(spark, toy_labeled):
    w1 = clf.train_lr(toy_labeled.repartition(1), iterations=4, lr=2.0)
    w8 = clf.train_lr(toy_labeled.repartition(8), iterations=4, lr=2.0)
    assert w1 == w8  # exact-integer gradient sums → bit-identical


def test_fast_sigmoid_bounds(spark):
    df = spark.createDataFrame([(-1e9,), (-1.0,), (0.0,), (1.0,), (1e9,)], ["z"])
    vals = [
        r.p for r in df.select(clf.fast_sigmoid(F.col("z")).alias("p")).collect()
    ]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert vals[2] == 0.5
    assert vals[0] < 0.5 < vals[4]


def test_empty_training_frame_refused(spark, toy_labeled):
    with pytest.raises(ValueError):
        clf.train_lr(toy_labeled.where(F.lit(False)), iterations=1)


def test_registry_classifier_accuracy(spark):
    # the registered query must actually learn the weak labels
    from flink_join_scaling_spark.plans.classifier_q import q_quality_classifier

    row = q_quality_classifier(spark, "/root/testdata/sf0.001").first()
    assert row.n_correct / row.n_train >= 0.9


def test_labeled_frame_matches_ntile_membership(spark):
    """The window-free quartile labeling (histogram cutoffs + map-side
    filter) must reproduce EXACTLY the membership of the global
    ntile(4) window it replaced — same doc_ids, same y."""
    from pyspark.sql import Window

    from flink_join_scaling_spark.functions import text as tx
    from flink_join_scaling_spark.plans.classifier_q import _labeled_frame
    from flink_join_scaling_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        (r.doc_id, r.y) for r in _labeled_frame(spark, sf).select("doc_id", "y").collect()
    }
    d = load_table(spark, sf, "documents").select(
        "doc_id",
        F.round(tx.quality_score_raw(F.col("text")) * 1_000_000.0)
        .cast("bigint")
        .alias("qe6"),
    )
    qt = F.ntile(4).over(Window.orderBy(F.desc("qe6"), F.asc("doc_id")))
    want = {
        (r.doc_id, 1.0 if r.qt == 1 else 0.0)
        for r in d.withColumn("qt", qt).where(F.col("qt").isin(1, 4)).collect()
    }
    assert got == want


def test_labeled_frame_plan_has_no_global_window(spark):
    """The scale-killer this round removed: no WindowExec (partitioned
    or not) may appear anywhere in the labeling plan."""
    from flink_join_scaling_spark.plans.classifier_q import _labeled_frame

    plan = _labeled_frame(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_quartile_conditions_tie_split(spark):
    """Boundary score ties split by doc_id exactly as the total order
    (qe6 DESC, doc_id ASC) dictates: with 8 rows all sharing one score,
    bucket 1 = two lowest ids, bucket 4 = two highest."""
    from flink_join_scaling_spark.plans.classifier_q import _quartile_conditions

    base = spark.createDataFrame(
        [(i, 500_000) for i in range(1, 9)], ["doc_id", "__qe6"]
    ).localCheckpoint()
    pos, neg = _quartile_conditions(base)
    pos_ids = sorted(r.doc_id for r in base.where(pos).collect())
    neg_ids = sorted(r.doc_id for r in base.where(neg).collect())
    assert pos_ids == [1, 2]
    assert neg_ids == [7, 8]


def test_quartile_conditions_refuses_tiny_corpus(spark):
    from flink_join_scaling_spark.plans.classifier_q import _quartile_conditions

    base = spark.createDataFrame(
        [(i, i * 1000) for i in range(5)], ["doc_id", "__qe6"]
    ).localCheckpoint()
    with pytest.raises(ValueError):
        _quartile_conditions(base)
