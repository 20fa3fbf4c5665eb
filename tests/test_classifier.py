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
