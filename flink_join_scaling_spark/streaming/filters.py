"""Stateless streaming ingest filters: benchmark decontamination
applied to documents AS THEY ARRIVE, before anything stateful sees
them.

Production pipelines decontaminate at ingest (the earlier a
benchmark-tainted page dies, the less every downstream stage pays);
the batch operator (``operators.dedup.ngram_contamination``) covers
the backfill pass, this module the continuous one. The benchmark/eval
set is SMALL by definition (MBs against a multi-TB stream) — the same
premise that lets the batch path broadcast it — so here its distinct
shingle set rides the task closure and every micro-batch pays one
map-side set probe per document: no state store, no shuffle, no
watermark, works in append mode.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: refuse to close over an unbounded "benchmark" — past this, the set
#: is not an eval suite and the batch equi-join path is the right tool
_MAX_BENCHMARK_SHINGLES = 2_000_000


def _norm_tokens_py(text: str | None) -> list[str]:
    """Python twin of ``functions.text.tokens_ws`` — i.e. of the JVM
    expression ``regexp_replace(lower(trim(col)), '\\s+', ' ')`` +
    split — kept in lockstep so the streaming filter and the batch
    operator flag exactly the same documents; parity is asserted by
    the converged==batch test.

    The JVM semantics are narrower than Python's defaults, and the
    twin must match them, not improve on them: Spark ``trim`` strips
    SPACES only (not tabs/newlines — so ``"\\ttext"`` keeps a leading
    empty token after collapse+split, in both paths), and Java's
    ``\\s`` is the ASCII class ``[ \\t\\n\\x0b\\f\\r]`` (no U+00A0
    etc.), where Python's ``\\s``/``str.strip()`` are Unicode-aware.
    A Unicode-whitespace mismatch here silently diverges every gram
    hash downstream. NULL maps to [] (the JVM expression yields NULL
    and no gram survives); the EMPTY string maps to [''] exactly like
    JVM ``split('', ' ')`` — the guard must not conflate the two."""
    if text is None:
        return []
    return re.sub(r"[ \t\n\x0b\f\r]+", " ", text.strip(" ").lower()).split(" ")


def stream_decontaminate(
    sdf: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    keep_contaminated: bool = False,
) -> DataFrame:
    """Continuous n-gram decontamination: flag (and by default drop)
    arriving documents sharing at least one word ``shingle_n``-gram
    with the static benchmark set — GPT-3/Pile-style decontamination
    as an ingest filter.

    The benchmark's distinct shingle set is collected once at query
    construction (bounded by ``_MAX_BENCHMARK_SHINGLES``, loud refusal
    past it) and captured by an Arrow-batched ``mapInPandas`` that
    emits each document with its contaminated-shingle count — per
    batch the work is tokenize + set probes, map-only. Output:
    the stream's columns plus ``n_hits``; rows with hits are dropped
    unless ``keep_contaminated=True`` (then they pass through tagged,
    for quarantine sinks). Same n_hits definition as the batch
    operator: DISTINCT contaminated shingles per document.
    """
    import pandas as pd

    from flink_join_scaling_spark.functions.text import exploded_shingles

    # LIMIT to cap+1 BEFORE collecting: the cap is the operator's
    # memory-safety contract, and a corpus-sized benchmark must trip
    # the refusal without first materializing its full shingle set on
    # the driver (the similarity.py:256 / io.py pattern — collect at
    # most one row past the cap, then refuse).
    bench_rows = (
        exploded_shingles(
            benchmark, id_col, text_col, shingle_n, widen=False
        )
        .select("shingle")
        .distinct()
        .limit(_MAX_BENCHMARK_SHINGLES + 1)
        .collect()
    )
    if len(bench_rows) > _MAX_BENCHMARK_SHINGLES:
        raise ValueError(
            f"benchmark has more than {_MAX_BENCHMARK_SHINGLES} "
            "distinct shingles; that is a corpus, not an "
            "eval set — use the batch equi-join path "
            "(operators.dedup.ngram_contamination with "
            "broadcast_benchmark=False)"
        )
    bench = frozenset(r.shingle for r in bench_rows)
    cols = sdf.columns
    from pyspark.sql.types import LongType, StructField, StructType

    # a fresh StructType: StructType.add mutates self in PySpark, and
    # sdf.schema must stay what it was
    out_schema = StructType(
        list(sdf.schema.fields) + [StructField("n_hits", LongType())]
    )

    def probe(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            hits = []
            for text in pdf[text_col]:
                toks = _norm_tokens_py(text)
                seen = {
                    " ".join(toks[i : i + shingle_n])
                    for i in range(len(toks) - shingle_n + 1)
                }
                hits.append(len(seen & bench))
            out = pdf[cols].copy()
            out["n_hits"] = pd.Series(hits, index=pdf.index, dtype="int64")
            yield out

    tagged = sdf.mapInPandas(probe, out_schema)
    if keep_contaminated:
        return tagged
    return tagged.where(F.col("n_hits") == 0).drop("n_hits")


def stream_quality_score(
    sdf: DataFrame,
    weights: list[float],
    text_col: str = "text",
    threshold: float = 0.0,
    keep_rejected: bool = False,
) -> DataFrame:
    """Continuous model-based quality filtering: score arriving
    documents with a batch-trained classifier
    (``operators.classifier.train_lr``) and drop the ones whose logit
    falls below ``threshold`` — the train-once / score-forever split
    every production quality filter runs (the model retrains offline
    on the backfill; ingest only evaluates it).

    The trained weights inline as literals into the SAME pure-JVM
    column expressions the batch apply uses
    (``classifier.feature_columns`` + ``classifier.logit``), so this
    is stateless whole-stage-codegen map work: no state store, no
    shuffle, no watermark, append mode — and converged output is
    byte-identical to the batch ``q_quality_classifier_apply`` algebra
    by construction. Output: the stream's columns plus ``logit``;
    below-threshold rows are dropped unless ``keep_rejected=True``
    (then every row passes through carrying an explicit ``accepted``
    boolean — ``logit >= threshold`` evaluated HERE, so quarantine
    sinks route on the filter's own decision instead of re-deriving
    the comparison and risking threshold drift).
    """
    from flink_join_scaling_spark.operators import classifier as clf

    feats = clf.feature_columns(F.col(text_col))
    scored = sdf
    for name, col in feats.items():
        scored = scored.withColumn(f"__{name}", col)
    z = F.lit(float(weights[0]))
    for w, name in zip(weights[1:], clf.FEATURES):
        z = z + F.lit(float(w)) * F.col(f"__{name}")
    scored = scored.withColumn("logit", z).drop(
        *[f"__{name}" for name in clf.FEATURES]
    )
    if keep_rejected:
        return scored.withColumn("accepted", F.col("logit") >= threshold)
    return scored.where(F.col("logit") >= threshold)


def stream_gopher_rules(
    sdf: DataFrame,
    text_col: str = "text",
    keep_rejected: bool = False,
) -> DataFrame:
    """Continuous Gopher rule-based quality gate: arriving documents
    evaluated against the same six integer-threshold rules as the
    batch ``q_gopher_rules`` (shared expressions —
    ``operators.classifier.gopher_rules_frame`` — so the two faces
    cannot drift), failing rows dropped unless ``keep_rejected=True``
    (then every row passes through carrying the per-rule booleans +
    ``keep`` for quarantine routing).

    Stateless whole-stage-codegen map work: no state store, no
    shuffle, no watermark, append mode — the rule-based pre-filter
    runs BEFORE anything stateful sees the stream, exactly where
    MassiveWeb/FineWeb-class pipelines place it."""
    from flink_join_scaling_spark.operators.classifier import (
        gopher_rules_frame,
    )

    scored = gopher_rules_frame(sdf, text_col)
    if keep_rejected:
        return scored
    return scored.where(F.col("keep"))


def stream_nb_lang(
    sdf: DataFrame,
    model: DataFrame,
    totals: dict,
    priors: dict,
    classes: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Continuous Naive-Bayes classification: score arriving documents
    with a batch-trained NB model (``operators.nb``) — the
    train-once / score-forever split, with the NEW streaming shape the
    logistic scorer cannot show: the model here is a TABLE (per-token
    class counts), not six scalars, so scoring is a stream-static
    LEFT join of the exploded token stream against the static model
    frame, then an update-mode streaming aggregation per document
    whose state is the document's accumulated count arrays.

    ``totals``/``priors`` are the trainer's 1-row driver artifacts
    (``nb_totals``/``nb_priors`` rows as dicts) inlined as literals;
    the score/argmax algebra is literally ``nb_score_expr`` +
    ``nb_predict``, so the converged output (last emission per id) is
    bit-identical to the batch apply on the same data — asserted in
    tests. Out-of-vocab tokens (null join) coalesce to count 0 and
    contribute the exact add-1 unseen probability ln(1) − ln(N_c+V).

    Output: (id, pred_lang, score_e6) per touched document per
    micro-batch (update mode). State per document is bounded by its
    token count; the model side is static and re-broadcast per
    micro-batch by Spark's stream-static join machinery."""
    from flink_join_scaling_spark.functions import text as tx
    from flink_join_scaling_spark.operators import nb

    words = sdf.select(
        F.col(id_col), F.explode(tx.tokens_ws(F.col(text_col))).alias("w")
    )
    per = (
        words.join(model, "w", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_toks"),
            *[
                F.array_sort(
                    F.collect_list(
                        F.coalesce(F.col(f"c_{c}"), F.lit(0)).cast("double")
                    )
                ).alias(f"a_{c}")
                for c in classes
            ],
        )
    )
    scored = per
    for c in classes:
        scored = scored.withColumn(f"n_{c}", F.lit(int(totals[f"n_{c}"])))
        scored = scored.withColumn(f"d_{c}", F.lit(int(priors[f"d_{c}"])))
    scored = scored.withColumn("v", F.lit(int(totals["v"]))).withColumn(
        "dd", F.lit(int(priors["dd"]))
    )
    for c in classes:
        scored = scored.withColumn(
            f"s_{c}",
            F.round(nb.nb_score_expr(c) * 1_000_000.0).cast("bigint"),
        )
    return nb.nb_predict(scored, classes).select(
        id_col, "pred_lang", "score_e6"
    )


def stream_lm_score(
    sdf: DataFrame,
    tf: DataFrame,
    total: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Continuous CCNet-style LM quality scoring: arriving documents
    scored against the BATCH-fitted unigram frequency model (the
    train-once / score-forever split, same as the NB/DSIR siblings) —
    the exploded token stream LEFT-joins the static ``tf`` table
    (token → corpus frequency), and an update-mode per-document
    aggregation folds the mean token log-probability with the batch
    query's exact discipline (tf values sorted ascending, ln folded
    strictly left-to-right, round-6), so the converged score is
    bit-identical to ``q_lm_score``'s algebra on the same model.

    Out-of-vocab tokens (null join — text the fitted model never saw)
    take add-1 smoothing: count 0 coalesces to 1, contributing
    ln(1) − ln(total) — the OOV discipline the DSIR advisor fix
    standardized. On the training corpus itself no OOV exists and the
    converged==batch assertion is exact (tested).

    Output: (id, n_tokens, lm_logprob) per touched doc per
    micro-batch (update mode). State per doc is bounded by its token
    count; the model is static, re-broadcast by Spark's stream-static
    join machinery."""
    from flink_join_scaling_spark.functions import text as tx

    words = sdf.select(
        F.col(id_col), F.explode(tx.tokens_ws(F.col(text_col))).alias("w")
    )
    per = (
        words.join(tf, "w", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.array_sort(
                F.collect_list(
                    F.greatest(
                        F.coalesce(F.col("tf"), F.lit(0)), F.lit(1)
                    ).cast("double")
                )
            ).alias("tfs"),
        )
    )
    return per.select(
        F.col(id_col),
        "n_tokens",
        F.round(
            (
                F.aggregate(
                    F.transform(F.col("tfs"), lambda x: F.log(x)),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                - F.col("n_tokens").cast("double") * F.log(F.lit(float(total)))
            )
            / F.col("n_tokens").cast("double"),
            6,
        ).alias("lm_logprob"),
    )


def stream_dsir_weights(
    sdf: DataFrame,
    tcnt: DataFrame,
    rcnt: DataFrame,
    nt: int,
    nr: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Continuous DSIR importance weighting: score arriving documents
    against batch-fitted target/raw bucket models — importance-based
    selection at ingest, the train-once / score-forever split for the
    resampling step. The two models are 4096-row STATIC tables riding
    stream-static left joins (the corpus-size-independent width that
    makes DSIR streamable at all); per-doc count arrays accumulate in
    update-mode aggregation state bounded by document length, and the
    weight expression is literally the batch query's
    (``plans.select_q.dsir_weight_e6_expr``), so converged output is
    bit-identical to batch weights on the same data — asserted in
    tests. ``nt``/``nr`` are the trainer's scalar token totals.

    Output: (id, n_toks, weight_e6) per touched document per
    micro-batch; a threshold filter or top-k selection runs downstream
    on the converged values."""
    from flink_join_scaling_spark.functions import text as tx
    from flink_join_scaling_spark.plans.select_q import (
        _bucket_spark,
        dsir_fold_frame,
        dsir_weight_e6_expr,
    )

    wb = sdf.select(
        F.col(id_col), F.explode(tx.tokens_ws(F.col(text_col))).alias("w")
    ).select(id_col, _bucket_spark("w").alias("b"))
    # BOTH models left-join: a new streaming document can hash tokens
    # into buckets the batch-fitted models never saw. coalesce(…, 0)
    # inside dsir_fold_frame makes the unseen contribution ln(0+1)=0 —
    # the exact add-1 OOV discipline — instead of silently dropping the
    # token row (an inner rcnt join would undercount n_toks and delete
    # all-unseen documents from the output entirely).
    joined = wb.join(tcnt, "b", "left").join(rcnt, "b", "left")
    per = dsir_fold_frame(joined, id_col)
    return per.withColumn("nt", F.lit(int(nt))).withColumn(
        "nr", F.lit(int(nr))
    ).select(id_col, "n_toks", dsir_weight_e6_expr())


def stream_decontaminate_semantic(
    sdf: DataFrame,
    benchmark: DataFrame,
    vec_col: str = "embedding",
    threshold_e6: int = 300_000,
    keep_contaminated: bool = False,
) -> DataFrame:
    """Continuous SEMANTIC decontamination: flag (and by default drop)
    arriving vectors whose max cosine against the static benchmark
    embedding set reaches ``threshold_e6`` — the vector twin of
    :func:`stream_decontaminate`, completing the family convention
    that every batch ingest filter has a streaming face.

    Same closure discipline as the n-gram filter: the benchmark is
    bounded BY DEFINITION (an eval set — the shared collector refuses
    loudly past 65536 rows, and collects exactly once), its matrix
    rides the task closure, and each micro-batch pays one Arrow
    matmul-max per Arrow batch — stateless map-only, no state store,
    no shuffle, no watermark, works in append mode. The scoring is
    literally the batch operator's
    (``operators.similarity.semantic_max_cos_e6``), so converged
    output is bit-identical to ``semantic_contamination`` on the same
    data — asserted in tests/test_streaming_text.py.

    Output: the stream's columns plus ``max_bench_cos_e6``; rows at or
    past the threshold are dropped unless ``keep_contaminated=True``
    (then they pass through tagged with ``contaminated``, for
    quarantine sinks)."""
    import numpy as np
    import pandas as pd

    from flink_join_scaling_spark.operators.similarity import (
        collect_bench_matrix,
        semantic_max_cos_e6,
    )

    B, bnorm = collect_bench_matrix(benchmark, vec_col)
    cols = sdf.columns
    from pyspark.sql.types import BooleanType, LongType, StructField, StructType

    # fresh StructType: StructType.add mutates self in PySpark, and
    # sdf.schema must stay what it was
    out_schema = StructType(
        list(sdf.schema.fields)
        + [
            StructField("max_bench_cos_e6", LongType()),
            StructField("contaminated", BooleanType()),
        ]
    )

    def probe(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            mx = semantic_max_cos_e6(V, B, bnorm)
            out = pdf[cols].copy()
            out["max_bench_cos_e6"] = pd.Series(mx, index=pdf.index, dtype="int64")
            out["contaminated"] = pd.Series(
                mx >= threshold_e6, index=pdf.index, dtype="bool"
            )
            yield out

    tagged = sdf.mapInPandas(probe, out_schema)
    if keep_contaminated:
        return tagged
    return tagged.where(~F.col("contaminated")).drop("contaminated")


def stream_extract_html(
    sdf: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    min_block_chars: int | None = None,
    max_link_density: float | None = None,
) -> DataFrame:
    """Continuous HTML main-content extraction: arriving raw pages are
    segmented + boilerplate-classified where they arrive and emit
    ``(id, main_text)``; boilerplate-ONLY pages are dropped on the
    spot — the crawl-ingest shape (WARC stream → clean text stream)
    that runs BEFORE anything stateful sees the corpus, completing
    the every-ingest-stage-has-a-streaming-face convention.

    Stateless Arrow ``mapInPandas`` sharing the batch extractor
    verbatim (``operators.html_extract.extract_main_text`` — one
    function, two faces, cannot drift; None thresholds resolve to the
    extractor module's OWN defaults at call time, so a threshold tune
    there moves both faces together): no state store, no shuffle, no
    watermark, append mode."""
    from flink_join_scaling_spark.operators import html_extract as hx

    return hx.extract_main_text(
        sdf,
        id_col,
        html_col,
        min_block_chars=(
            hx._MIN_BLOCK_CHARS if min_block_chars is None
            else min_block_chars
        ),
        max_link_density=(
            hx._MAX_LINK_DENSITY if max_link_density is None
            else max_link_density
        ),
    )


def stream_extract_links(
    sdf: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    base_col: str | None = None,
) -> DataFrame:
    """Continuous web-graph construction: arriving raw pages explode
    into their outgoing ``(id, href)`` link edges where they arrive,
    hrefs resolved against ``base_col`` (and any ``<base href>``) —
    the frontier-feeding face of the crawl loop: a crawler consumes
    this stream to schedule fetches while the same pages' text flows
    through :func:`stream_extract_html`, completing the
    every-ingest-stage-has-a-streaming-face convention for the r14
    ingestion family.

    Stateless Arrow ``mapInPandas`` sharing the batch extractor
    verbatim (``operators.html_extract.extract_links`` — one
    function, two faces, cannot drift): no state store, no shuffle,
    no watermark, append mode; edges emit pre-partitioned by the
    arriving page's partition."""
    from flink_join_scaling_spark.operators import html_extract as hx

    return hx.extract_links(sdf, id_col, html_col, base_col=base_col)


def stream_ingest_warc(
    sdf: DataFrame,
    payload_col: str = "payload",
    min_block_chars: int | None = None,
    max_link_density: float | None = None,
) -> DataFrame:
    """Continuous end-to-end crawl ingestion: arriving WARC archive
    blobs (e.g. a ``readStream`` over a landing directory of .warc
    files via binaryFile) explode to records, keep HTTP-200 text/html
    responses, and emit ``(uri, main_text)`` with boilerplate removed
    — the full `q_extract_warc` chain as one continuous pipeline, so
    a crawler can feed the corpus while every downstream streaming
    face (dedup, quality, decontamination) consumes clean text.

    Stateless composition of the batch stages verbatim
    (``sources.warc.parse_warc_records`` →
    ``operators.html_extract.extract_main_text`` — shared functions,
    faces cannot drift): two Arrow map stages, no state store, no
    shuffle, no watermark, append mode; archive bytes never leave the
    executor that read them."""
    from flink_join_scaling_spark.operators import html_extract as hx
    from flink_join_scaling_spark.sources.warc import (
        html_responses,
        parse_warc_records,
    )

    pages = html_responses(parse_warc_records(sdf, payload_col))
    return hx.extract_main_text(
        pages,
        "uri",
        "html",
        min_block_chars=(
            hx._MIN_BLOCK_CHARS if min_block_chars is None
            else min_block_chars
        ),
        max_link_density=(
            hx._MAX_LINK_DENSITY if max_link_density is None
            else max_link_density
        ),
    )


def stream_extract_redirects(
    sdf: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Continuous redirect-edge extraction: arriving WARC archive
    blobs explode to records and emit the ``(uri, http_status,
    location, target)`` aliasing pairs their 3xx responses declare —
    the canonical-URL aliasing input a crawl graph consumes alongside
    :func:`stream_ingest_warc`'s clean text (r16, the
    every-ingest-stage-has-a-streaming-face convention).

    Stateless composition of the batch stages verbatim
    (``sources.warc.parse_warc_records`` →
    ``sources.warc.extract_redirects`` — shared functions, faces
    cannot drift): a JVM filter prunes to the 3xx slice before the
    Arrow resolution pass, no state store, no shuffle, no watermark,
    append mode."""
    from flink_join_scaling_spark.sources.warc import (
        extract_redirects,
        parse_warc_records,
    )

    return extract_redirects(parse_warc_records(sdf, payload_col))
