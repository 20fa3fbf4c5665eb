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


def test_fused_trainer_matches_distributed(spark):
    """The r17 fused single-task GD trainer must reproduce the
    distributed per-round loop's exact weight trajectory — including
    on REAL feature distributions (the sf0.001 labeled frame), where
    quantization ties and sign mixes actually occur."""
    from flink_join_scaling_spark.plans.classifier_q import _labeled_frame

    frames = [
        spark.createDataFrame(
            [(1.0, 0.9, 0.5, 0.5, 0.1, 0.1) for _ in range(20)]
            + [(0.0, 0.1, 0.5, 0.5, 0.9, 0.9) for _ in range(20)],
            ["y", *clf.FEATURES],
        ),
        _labeled_frame(spark, "/root/testdata/sf0.001").select(
            "y", *clf.FEATURES
        ),
    ]
    for frame in frames:
        fused = clf.train_lr(frame, iterations=8, lr=2.0)
        orig = clf._FUSED_ROWS_MAX
        clf._FUSED_ROWS_MAX = -1  # force the distributed loop
        try:
            dist = clf.train_lr(frame, iterations=8, lr=2.0)
        finally:
            clf._FUSED_ROWS_MAX = orig
        assert fused == dist, (fused, dist)


def test_round_half_up_matches_spark_round(spark):
    """_round_half_up (the fused trainer's quantizer) twins Spark's
    round(double, 0) bit-for-bit, ties and negatives included."""
    import numpy as np

    vals = [
        0.0, -0.0, 0.5, -0.5, 1.5, -1.5, 2.4999999999999996,
        -2.4999999999999996, 2.5000000000000004, 0.49999999999999994,
        -0.49999999999999994, 123456.5, -123456.5, 7.499999999999999,
        1e15 + 0.5, -(1e15 + 0.5), 0.1 * 3 * 5,  # 1.5000000000000002
    ]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got_spark = [
        r.r
        for r in df.select(
            F.round(F.col("v")).cast("bigint").alias("r")
        ).collect()
    ]
    got_np = [int(x) for x in clf._round_half_up(np.array(vals))]
    assert got_np == got_spark, list(zip(vals, got_np, got_spark))


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
