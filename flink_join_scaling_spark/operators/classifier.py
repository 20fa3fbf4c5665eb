"""Model-based quality filtering: a distributed-trained logistic
quality classifier (the fasttext/GPT-3-style "model-based filter"
step of an LLM curation pipeline, on engine-native primitives).

Beyond-reference operator (the reference's surface stops at versioned
joins); the novel part is that the full-batch gradient-descent
training loop is ENGINE-EXACT and therefore oracle-checkable:

- the link function is the "fast sigmoid" ``p = 0.5 + 0.5 * z/(1+|z|)``
  — pure IEEE +,*,/,abs in a pinned order, bit-identical across
  Spark and DuckDB (no ``exp``, whose libm/JDK implementations may
  disagree by an ulp);
- per-example gradient contributions are e6-quantized to BIGINT
  before summation, so the reduce is EXACT integer math — immune to
  accumulation order, partitioning, and engine;
- the weight update is a fixed scalar double expression of those
  integers, so the whole training trajectory (not just the final
  weights) is reproducible bit-for-bit in SQL.

Scale shape: one corpus-sized pass computes the (n_docs × d) feature
frame (narrow, text dropped immediately); the frame is pinned with
``localCheckpoint`` and each of the K iterations is one exact-integer
aggregation over it — an all-reduce of d+1 BIGINTs. Only the d+1
gradient sums reach the driver per round; the weight vector is the
same driver-resident artifact any distributed LR trainer carries.
Apply is map-only: the trained weights inline as literals into one
codegen projection over the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_join_scaling_spark.functions import text as tx

#: feature names in model order (x0 is the bias, implicit 1.0)
FEATURES = ("x1", "x2", "x3", "x4", "x5")

#: Gopher rule thresholds (Rae et al. 2021 §A1.1) — shared by the
#: batch q_gopher_rules plan and streaming.filters.stream_gopher_rules
#: so the two faces cannot drift. All compares below are integer
#: cross-multiplications; no float threshold exists.
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 100_000
GOPHER_RULES = (
    "ok_word_count", "ok_mean_wlen", "ok_symbol_ratio",
    "ok_alpha_words", "ok_stopwords", "ok_repetition",
)


def gopher_rules_frame(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the Gopher rule battery to ``df``: the six per-rule
    booleans (``GOPHER_RULES``), ``n_words``, ``n_rules_failed``, and
    the composite ``keep``. Pure per-row JVM array expressions — one
    map-only projection, zero exchanges, batch and streaming alike.
    See ``plans/llmdata.q_gopher_rules`` for the rule definitions,
    thresholds, and the oracle that pins them."""
    # Staged projections, deliberately: the normalized text, the token
    # array, and each count are materialized as columns that the NEXT
    # stage references multiple times, so Catalyst's CollapseProject
    # (which only inlines cheap or single-use expressions) keeps each
    # expensive expression computed ONCE per row. A single flat
    # projection here re-derived norm+split per rule and the bigram
    # array three times — measured 12.6 s vs ~1 s for the staged form
    # on the same sf0.1 scan.
    from flink_join_scaling_spark.partitioning import widen_if_narrow

    # the rule battery is a heavy map-only pass; widen a single-split
    # scan so it parallelizes (no-op at real scale / for streaming)
    df = widen_if_narrow(df)
    t = tx.norm_text(F.col(text_col))
    staged = df.withColumn("__t", t).withColumn("__ws", F.split(F.col("__t"), " "))
    ws = F.col("__ws")
    n1 = F.greatest(F.size(ws) - 1, F.lit(0))
    # bigrams as a zipped STRUCT array (codegen builtins end-to-end;
    # struct equality inside array_distinct is exact pairwise compare,
    # no separator string ever built)
    bigrams = F.arrays_zip(F.slice(ws, 1, n1), F.slice(ws, 2, n1))
    counts = staged.withColumns(
        {
            "n_words": F.size(ws).cast("bigint"),
            "__sum_wlen": F.length(
                F.replace(F.col("__t"), F.lit(" "), F.lit(""))
            ).cast("bigint"),
            "__n_punct": (
                F.length(F.col("__t"))
                - F.length(F.regexp_replace(F.col("__t"), r"[.,!?;:]", ""))
            ).cast("bigint"),
            "__n_alpha": F.size(
                F.filter(ws, lambda x: x.rlike("[a-z]"))
            ).cast("bigint"),
            "__n_stop": F.size(
                F.filter(
                    ws,
                    lambda x: x.isin("the", "and", "of", "to", "in", "a", "is"),
                )
            ).cast("bigint"),
            "__bigrams": bigrams,
        }
    ).withColumns(
        {
            "__n_bigrams": F.size(F.col("__bigrams")).cast("bigint"),
            "__n_dup": (
                F.size(F.col("__bigrams"))
                - F.size(F.array_distinct(F.col("__bigrams")))
            ).cast("bigint"),
        }
    )
    rules = counts.withColumns(
        {
            "ok_word_count": (F.col("n_words") >= GOPHER_MIN_WORDS)
            & (F.col("n_words") <= GOPHER_MAX_WORDS),
            "ok_mean_wlen": (3 * F.col("n_words") <= F.col("__sum_wlen"))
            & (F.col("__sum_wlen") <= 10 * F.col("n_words")),
            "ok_symbol_ratio": 10 * F.col("__n_punct") <= F.col("n_words"),
            "ok_alpha_words": 5 * F.col("__n_alpha") >= 4 * F.col("n_words"),
            "ok_stopwords": F.col("__n_stop") >= 2,
            "ok_repetition": 16 * F.col("__n_dup") <= F.col("__n_bigrams"),
        }
    )
    failed = sum(
        (F.when(F.col(c), 0).otherwise(1) for c in GOPHER_RULES), F.lit(0)
    )
    keep = F.lit(True)
    for c in GOPHER_RULES:
        keep = keep & F.col(c)
    return rules.withColumns(
        {"n_rules_failed": failed.cast("bigint"), "keep": keep}
    ).drop(
        "__t", "__ws", "__sum_wlen", "__n_punct", "__n_alpha", "__n_stop",
        "__bigrams", "__n_bigrams", "__n_dup",
    )


def feature_columns(text_col: Column) -> dict[str, Column]:
    """Bounded [0,1] doubles from exact integer text statistics; every
    expression is pure IEEE arithmetic in a pinned order (the
    ``quality_score_raw`` discipline), so values are bit-identical
    cross-engine."""
    n_chars = F.length(text_col).cast("double")
    n_toks = F.greatest(F.size(tx.tokens_ws(text_col)).cast("double"), F.lit(1.0))
    n_punct = tx.punct_count(text_col).cast("double")
    n_digit = (
        F.length(text_col) - F.length(F.regexp_replace(text_col, "[0-9]", ""))
    ).cast("double")
    s_en = tx.lang_scores(text_col)["en"].cast("double")
    safe_chars = F.greatest(n_chars, F.lit(1.0))
    return {
        "x1": F.least(n_chars / 500.0, F.lit(1.0)),
        "x2": F.least(n_chars / n_toks / 10.0, F.lit(1.0)),
        "x3": F.least(s_en / n_toks * 5.0, F.lit(1.0)),
        "x4": F.least(n_punct / safe_chars * 10.0, F.lit(1.0)),
        "x5": F.least(n_digit / safe_chars * 5.0, F.lit(1.0)),
    }


def logit(weights: list[float]) -> Column:
    """z = w0 + w1*x1 + ... — strictly left-to-right adds, matching
    the SQL twin's parse order."""
    z = F.lit(float(weights[0]))
    for w, name in zip(weights[1:], FEATURES):
        z = z + F.lit(float(w)) * F.col(name)
    return z


def fast_sigmoid(z: Column) -> Column:
    return F.lit(0.5) + F.lit(0.5) * (z / (F.lit(1.0) + F.abs(z)))


#: row ceiling for the FUSED single-task GD trainer: below this, all
#: iterations run inside one Arrow task over the gathered feature
#: frame (one Spark job) instead of one exact-integer all-reduce job
#: per round — the connected_components size-adaptive pattern. At
#: 100 TB the labeled frame is corpus-sized and the distributed
#: per-round loop below takes over.
_FUSED_ROWS_MAX = 2_000_000


def _round_half_up(d):
    """Vectorized twin of Spark's ``round(double, 0)``: BigDecimal
    HALF_UP on the shortest-decimal value — which, for non-tie inputs,
    equals mathematical nearest-int of the binary value (the shortest
    repr cannot cross the representable .5 boundary), and for ties
    (the double IS exactly k.5) rounds AWAY from zero. ``|d|-floor(|d|)``
    is exact for doubles (both are multiples of ulp(d), difference
    < 1 fits the mantissa), so the comparison is exact."""
    import numpy as np

    ad = np.abs(d)
    g = np.floor(ad)
    return np.sign(d) * (g + (ad - g >= 0.5))


def _train_lr_fused(
    labeled: DataFrame, n: int, iterations: int, lr: float
) -> list[float]:
    """All GD rounds in ONE Spark job: gather the feature frame onto a
    single task, run the iterations vectorized (numpy float64 — the
    identical IEEE ops in the identical order as the SQL/codegen twin;
    gradient quantization via :func:`_round_half_up`; integer sums are
    order-immune), emit the final weight row. Differentially tested
    against the distributed loop in tests/test_classifier.py."""
    import pandas as pd

    names = list(FEATURES)

    def run(batches):
        import numpy as np

        cols: dict[str, list] = {c: [] for c in ["y", *names]}
        for pdf in batches:
            for c in cols:
                cols[c].append(pdf[c].to_numpy(dtype="float64"))
        y = np.concatenate(cols["y"]) if cols["y"] else np.array([], dtype="float64")
        xs = [
            np.concatenate(cols[c]) if cols[c] else np.array([], dtype="float64")
            for c in names
        ]
        w = [0.0] * (len(names) + 1)
        for _ in range(iterations):
            z = np.full_like(y, w[0])
            for wj, xj in zip(w[1:], xs):
                z = z + wj * xj
            p = 0.5 + 0.5 * (z / (1.0 + np.abs(z)))
            resid = p - y
            gs = [int(_round_half_up(resid * 1000000.0).sum())]
            for xj in xs:
                gs.append(int(_round_half_up((resid * xj) * 1000000.0).sum()))
            w = [
                wj - lr * (gs[j] / 1000000.0) / float(n)
                for j, wj in enumerate(w)
            ]
        yield pd.DataFrame({f"w{j}": [w[j]] for j in range(len(w))})

    schema = ", ".join(f"w{j} double" for j in range(len(names) + 1))
    row = (
        labeled.select("y", *names)
        .coalesce(1)
        .mapInPandas(run, schema)
        .collect()[0]
    )
    return [float(row[f"w{j}"]) for j in range(len(names) + 1)]


def train_lr(
    labeled: DataFrame, iterations: int = 8, lr: float = 2.0
) -> list[float]:
    """Full-batch GD over a (y, x1..x5) frame; returns [w0..w5].

    ``labeled`` must carry ``y`` as DOUBLE 0.0/1.0. Each round is one
    exact-integer aggregation (e6-quantized per-row gradients); the
    driver holds only the d+1 gradient sums and the weight vector.
    Size-adaptive (r17): a frame that fits one task trains FUSED —
    every round inside one Arrow job — with bit-identical arithmetic
    (see :func:`_train_lr_fused`).
    """
    labeled = labeled.localCheckpoint(eager=True)  # features only, no text
    n = labeled.count()
    if n == 0:
        raise ValueError("train_lr: empty training frame")
    if n <= _FUSED_ROWS_MAX:
        return _train_lr_fused(labeled, n, iterations, lr)
    w = [0.0] * (len(FEATURES) + 1)
    for _ in range(iterations):
        p = fast_sigmoid(logit(w))
        resid = p - F.col("y")
        aggs = [
            F.sum(F.round(resid * F.lit(1000000.0)).cast("bigint")).alias("g0")
        ]
        for j, name in enumerate(FEATURES, start=1):
            aggs.append(
                F.sum(
                    F.round((resid * F.col(name)) * F.lit(1000000.0)).cast(
                        "bigint"
                    )
                ).alias(f"g{j}")
            )
        row = labeled.agg(*aggs).first()
        # the exact scalar chain the SQL twin replays:
        # w_j - lr * (g_j / 1e6) / n, all IEEE doubles in this order
        w = [
            wj - lr * (int(row[f"g{j}"]) / 1000000.0) / float(n)
            for j, wj in enumerate(w)
        ]
    return w
