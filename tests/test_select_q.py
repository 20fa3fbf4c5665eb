"""Model-based scoring & selection (plans/select_q.py): the trained
Naive Bayes lang classifier and DSIR importance weights."""

import pytest
from pyspark.sql import functions as F

from flink_join_scaling_spark.plans.registry import QUERIES
from tests.conftest import SF_SMALL


def _acc(df, true_col: str, pred_col: str) -> float:
    return df.agg(
        F.avg(F.when(F.col(true_col) == F.col(pred_col), 1.0).otherwise(0.0))
    ).first()[0]


def test_nb_beats_marker_heuristic_and_majority(spark):
    """The fixture's language signal is weak by construction (mostly
    shared technical tokens, occasional markers) — the trained NB must
    still beat BOTH the fixed marker heuristic (q_lang_id) and the
    majority-class baseline on the same data, or training learned
    nothing."""
    nb = QUERIES["q_nb_lang_apply"].fn(spark, SF_SMALL).cache()
    nb_acc = _acc(nb, "true_lang", "pred_lang")
    heur = QUERIES["q_lang_id"].fn(spark, SF_SMALL)
    heur_acc = _acc(heur, "lang", "lang_pred")
    majority = (
        nb.groupBy("true_lang").count().agg(F.max("count")).first()[0]
        / nb.count()
    )
    assert nb_acc > heur_acc
    assert nb_acc > majority


def test_nb_predicts_every_class(spark):
    """Not a degenerate majority-class predictor: all five classes
    appear among the predictions."""
    nb = QUERIES["q_nb_lang_apply"].fn(spark, SF_SMALL)
    preds = {r.pred_lang for r in nb.select("pred_lang").distinct().collect()}
    assert preds == {"de", "en", "es", "fr", "zh"}


def test_nb_train_totals_consistent(spark):
    """Model summary invariants: per-class token totals sum to the
    corpus explode size; class vocab never exceeds the shared vocab."""
    t = QUERIES["q_nb_lang_train"].fn(spark, SF_SMALL).collect()
    assert len(t) == 5
    vocab = {r.vocab for r in t}
    assert len(vocab) == 1  # shared smoothing denominator
    assert all(r.n_class_vocab <= r.vocab for r in t)
    assert all(r.n_docs > 0 and r.n_tokens > 0 for r in t)


def test_dsir_select_enriches_target(spark):
    """Importance resampling must shift the selected slice TOWARD the
    target distribution: the top-N's English fraction is at least the
    corpus's English fraction (weak data, weak bound — the invariant
    is direction, not magnitude)."""
    sel = QUERIES["q_dsir_select"].fn(spark, SF_SMALL)
    from flink_join_scaling_spark.sources.catalog import load_table

    d = load_table(spark, SF_SMALL, "documents").select("doc_id", "lang")
    en = F.when(F.col("lang") == "en", 1.0).otherwise(0.0)
    top_frac = sel.join(d, "doc_id").agg(F.avg(en)).first()[0]
    base_frac = d.agg(F.avg(en)).first()[0]
    assert top_frac >= base_frac


def test_dsir_select_rank_is_total_order(spark):
    sel = QUERIES["q_dsir_select"].fn(spark, SF_SMALL).collect()
    rows = sorted(sel, key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    keys = [(-r.weight_e6, r.doc_id) for r in rows]
    assert keys == sorted(keys)


def test_dsir_weights_plan_has_no_corpus_window(spark):
    """The corpus-sized weights stage must be window-free (folds +
    broadcast count tables); only the bounded top-N selection may
    rank."""
    df = QUERIES["q_dsir_weights"].fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


@pytest.mark.parametrize("name", ["q_nb_lang_train", "q_nb_lang_apply",
                                  "q_dsir_weights", "q_dsir_select"])
def test_select_q_oracle_parity(spark, name):
    from tests.oracle_utils import assert_parity

    spec = QUERIES[name]
    assert_parity(spec.fn(spark, SF_SMALL), spec.oracle, SF_SMALL)


def test_pipeline_trained_stage_invariants(spark):
    """The composed trained pipeline's output must lie inside every
    stage's survivor set: selected docs pass the classifier gate, are
    NB-routed English, are their normalized text's min-id keeper, and
    carry their own DSIR weight; rank is the (weight DESC, id) total
    order."""
    from flink_join_scaling_spark.operators import classifier as clf
    from flink_join_scaling_spark.plans.classifier_q import (
        _labeled_frame,
        _LR_ITERS,
        _LR_RATE,
    )
    from flink_join_scaling_spark.plans.select_q import (
        _dsir_weights,
        _nb_pred_frame,
    )
    from flink_join_scaling_spark.functions import text as tx
    from flink_join_scaling_spark.sources.catalog import load_table

    sel = QUERIES["q_pipeline_trained"].fn(spark, SF_SMALL).collect()
    assert 0 < len(sel) <= 50
    rows = sorted(sel, key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    keys = [(-r.weight_e6, r.doc_id) for r in rows]
    assert keys == sorted(keys)
    ids = {r.doc_id for r in sel}

    lab = _labeled_frame(spark, SF_SMALL)
    w = clf.train_lr(lab.select("y", *clf.FEATURES), _LR_ITERS, _LR_RATE)
    d = load_table(spark, SF_SMALL, "documents")
    feats = clf.feature_columns(F.col("text"))
    gate = {
        r.doc_id
        for r in d.select("doc_id", *[c.alias(n) for n, c in feats.items()])
        .where(clf.logit(w) >= 0)
        .collect()
    }
    assert ids <= gate
    en = {
        r.doc_id
        for r in _nb_pred_frame(spark, SF_SMALL)
        .where(F.col("pred_lang") == "en")
        .collect()
    }
    assert ids <= en
    # weights in the output are each doc's own DSIR weight
    wts = {
        r.doc_id: r.weight_e6
        for r in _dsir_weights(spark, SF_SMALL)
        .join(d.select("doc_id"), "doc_id")
        .collect()
    }
    assert all(r.weight_e6 == wts[r.doc_id] for r in sel)
    # keeper: no two selected docs share a normalized text
    texts = {
        r.doc_id: r.t
        for r in d.select("doc_id", tx.norm_text(F.col("text")).alias("t"))
        .where(F.col("doc_id").isin(list(ids)))
        .collect()
    }
    assert len(set(texts.values())) == len(texts)
