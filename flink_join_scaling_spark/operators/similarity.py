"""Similarity search over embedding columns.

Three tiers:
- :func:`cosine_topk` — exact brute force: queries × corpus join with a
  JVM-side cosine and per-query top-k window. Baseline, and fine when
  the query side is small enough to broadcast.
- :func:`cosine_topk_pandas` — same semantics through an Arrow-batched
  Pandas UDF doing the dot products in NumPy (matrix multiply per
  batch). The Python path wins when k and the corpus-per-partition are
  large enough that per-row JVM fold overhead dominates.
- :func:`ann_lsh_topk` — the scale path: sign-random-projection LSH
  buckets (hyperplanes derived deterministically from md5, so the
  operator is exactly reproducible in the DuckDB oracle), candidates
  restricted to the query's bucket. At 100 TB this is an equi-join on
  bucket id instead of a cross join.
- :func:`ann_ivf_topk` — the other scale path: IVF coarse quantization
  (cells from deterministic seed centroids; nprobe cells searched per
  query). Same equi-join shape, data-dependent partitioning instead of
  data-independent hyperplanes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_join_scaling_spark.functions.vectors import (
    cosine_e6_pandas,
    l2_norm_expr,
    np_quantize_e6,
    np_round_half_away,
    with_l2_norm,
)


def _ranked(pairs: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_e6").desc(), F.col("vec_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


#: Synthetic cell count for the exact top-k equi-join form. The value
#: only affects the broadcast hash table's size (queries × cells
#: rows), never the result — every corpus row lands in exactly one
#: cell and every query covers all cells, so each (query, corpus)
#: pair is scored exactly once.
_TOPK_CELLS = 16


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k by cosine: (query_id, vec_id, cosine_e6, rank).

    Brute force is inherent to EXACT top-k (every pair must be
    scored; the sub-linear siblings are ann_lsh/ivf/pq), but the plan
    need not be a cartesian node: the corpus carries a synthetic cell
    id (hash(vec_id) mod ``_TOPK_CELLS``) and the broadcast query side
    is exploded once per cell, so the pair enumeration is a
    BroadcastHashJoin on the cell key — execution-identical to the
    broadcast nested-loop form (corpus streams once, map-side, no
    shuffle; the hash table holds queries × 16 tiny rows), while the
    plan stays inside the no-cartesian guard the rest of the registry
    is swept by. Per-query partial top-k happens map-side via
    WindowGroupLimit before the single ranking exchange.

    Pair scoring runs through the Arrow-vectorized
    :func:`~flink_join_scaling_spark.functions.vectors.cosine_e6_pandas`
    (one NumPy multiply-sum per batch) — the interpreted Catalyst
    higher-order fold it replaced cost ~30µs/pair and dominated the
    corpus-streaming stage. Scores are e6-quantized BIGINTs, so the
    (cosine_e6 DESC, vec_id ASC) rank is exact integer math on every
    engine — a deterministic total order.
    """
    c = with_l2_norm(corpus, vec_col).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vc"),
        F.col("l2_norm").alias("nc"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(_TOPK_CELLS)).cast("int").alias("__cell"),
    )
    q = (
        with_l2_norm(queries, vec_col)
        .select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("vq"), F.col("l2_norm").alias("nq")
        )
        .withColumn("__cell", F.explode(F.sequence(F.lit(0), F.lit(_TOPK_CELLS - 1))))
    )
    pairs = (
        c.join(F.broadcast(q), "__cell")
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_e6_pandas("vq", "vc", "nq", "nc").alias("cosine_e6"),
        )
    )
    return _ranked(pairs, k).select("query_id", "vec_id", "cosine_e6", "rank")


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 3,
) -> DataFrame:
    """Contrastive hard-negative mining: per query, the top-k most
    cosine-similar corpus vectors carrying a DIFFERENT label —
    the standard negative-sampling step when building contrastive
    training pairs for embedding models (high similarity + wrong
    class = the informative negatives).

    Same synthetic-cell broadcast equi-join shape as
    :func:`cosine_topk` (corpus streams once map-side, queries × 16
    broadcast rows, WindowGroupLimit partial top-k before the single
    ranking exchange, Arrow-vectorized e6 cosine); the label-mismatch
    predicate filters BEFORE ranking, so negatives are ranked within
    the mismatching set. Returns (query_id, query_label, vec_id,
    neg_label, cosine_e6, rank).
    """
    c = with_l2_norm(corpus, vec_col).select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("neg_label"),
        F.col(vec_col).alias("vc"),
        F.col("l2_norm").alias("nc"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(_TOPK_CELLS)).cast("int").alias("__cell"),
    )
    q = (
        with_l2_norm(queries, vec_col)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(label_col).alias("query_label"),
            F.col(vec_col).alias("vq"),
            F.col("l2_norm").alias("nq"),
        )
        .withColumn("__cell", F.explode(F.sequence(F.lit(0), F.lit(_TOPK_CELLS - 1))))
    )
    pairs = (
        c.join(F.broadcast(q), "__cell")
        .where(
            (F.col("query_id") != F.col("vec_id"))
            & (F.col("query_label") != F.col("neg_label"))
        )
        .select(
            "query_id",
            "query_label",
            "vec_id",
            "neg_label",
            cosine_e6_pandas("vq", "vc", "nq", "nc").alias("cosine_e6"),
        )
    )
    return _ranked(pairs, k).select(
        "query_id", "query_label", "vec_id", "neg_label", "cosine_e6", "rank"
    )


def hard_negatives_ann(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 3,
    num_cells: int = 8,
    nprobe: int = 2,
    train: bool = True,
) -> DataFrame:
    """:func:`hard_negatives` with the IVF index as the search stage —
    the production form of contrastive negative mining: at 100 TB the
    exact form's per-query cost is the whole corpus (honest-linear,
    10.1× at the 100× probe), while this one probes ``nprobe`` of
    ``num_cells`` trained cells, so cost ∝ corpus/num_cells per query
    with recall bounded by the probe set (a negative is missed only
    when the query doesn't probe its home cell).

    The label rides the cell assignment via ``keep_cols`` — no
    corpus-sized join-back — and the mismatch predicate filters INSIDE
    the probed cells BEFORE ranking (filtered ANN search, not
    overfetch-then-filter: candidates sharing the query's label can
    never crowd the shortlist). Same trained-centroid, broadcast-probe,
    Arrow-cosine, total-order-rank contract as :func:`ann_ivf_topk`.
    """
    cents_fn = ivf_centroids_kmeans if train else ivf_centroids
    cents = cents_fn(corpus, id_col, vec_col, num_cells)
    idx = ivf_cells_pandas(
        corpus, id_col, vec_col, num_cells,
        nprobe=1, centroids=cents, keep_cols=(label_col,),
    ).select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("neg_label"),
        F.col(vec_col).alias("vc"),
        F.col("l2_norm").alias("nc"),
        "cell",
    )
    probes = ivf_cells_pandas(
        queries, id_col, vec_col, num_cells,
        nprobe=nprobe, centroids=cents, keep_cols=(label_col,),
    ).select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("query_label"),
        F.col(vec_col).alias("vq"),
        F.col("l2_norm").alias("nq"),
        "cell",
    )
    pairs = (
        idx.join(F.broadcast(probes), "cell")
        .where(
            (F.col("query_id") != F.col("vec_id"))
            & (F.col("query_label") != F.col("neg_label"))
        )
        .select(
            "query_id",
            "query_label",
            "vec_id",
            "neg_label",
            cosine_e6_pandas("vq", "vc", "nq", "nc").alias("cosine_e6"),
        )
    )
    return _ranked(pairs, k).select(
        "query_id", "query_label", "vec_id", "neg_label", "cosine_e6", "rank"
    )


#: semantic_contamination collects the benchmark side into a task
#: NumPy matrix; past this bound an unbounded collect is a silent
#: driver OOM at scale, so the operator refuses loudly instead (the
#: cosine_topk_pandas / stream_decontaminate discipline).
_SEMDECON_MAX_BENCH = 65_536


def collect_bench_matrix(bench: DataFrame, vec_col: str):
    """Collect a BOUNDED benchmark embedding set into a (matrix,
    norms) pair for task-closure broadcast — shared by the batch
    :func:`semantic_contamination` and its streaming face so their
    math cannot drift.

    Collects ONCE through ``limit(cap+1)``: a count()-then-collect()
    pair evaluates the benchmark twice, and a source that changes
    between the two actions could pass the count gate yet collect
    more rows than the cap. Refuses loudly on overflow and on an
    EMPTY benchmark (which would mark every document clean — almost
    certainly a wiring bug upstream)."""
    import numpy as np

    bench_rows = bench.select(vec_col).limit(_SEMDECON_MAX_BENCH + 1).collect()
    if len(bench_rows) > _SEMDECON_MAX_BENCH:
        raise ValueError(
            f"semantic_contamination: benchmark exceeds the "
            f"{_SEMDECON_MAX_BENCH}-row cap — past that it's a corpus; "
            "use the banded/IVF dedup paths instead"
        )
    if not bench_rows:
        raise ValueError(
            "semantic_contamination: benchmark is empty — there is "
            "nothing to screen against"
        )
    B = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in bench_rows])
    return B, np.sqrt((B * B).sum(axis=1))


def semantic_max_cos_e6(V, B, bnorm):
    """Max e6-quantized cosine of each row of ``V`` against the
    benchmark matrix — the one matmul both decontamination faces run.
    Quantize per pair THEN max: round is nondecreasing, so
    max(round(x)) == round(max(x)) — stated for the DuckDB oracle,
    which maxes the quantized pair values the same way."""
    import numpy as np

    vnorm = np.sqrt((V * V).sum(axis=1))
    denom = vnorm[:, None] * bnorm[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = np.where(denom == 0.0, 0.0, (V @ B.T) / denom)
    return np_quantize_e6(cos).max(axis=1)


def semantic_contamination(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold_e6: int = 300_000,
) -> DataFrame:
    """Embedding-space benchmark decontamination: per corpus vector,
    the MAX cosine against any benchmark vector (e6-quantized exact
    integer) and the contamination flag ``max ≥ threshold`` — the
    semantic complement to n-gram decontamination (paraphrased or
    reformatted test items share no shingles but sit next to the
    benchmark in embedding space; the screening step modern data
    reports run alongside the lexical one).

    Scale shape: the benchmark is BOUNDED by definition (an eval set,
    not a corpus — loud refusal past 65536 rows), collects once into
    a task-closure NumPy matrix, and the corpus streams through one
    Arrow ``mapInPandas`` matmul-max — map-only, zero shuffle, no
    join at all. Returns (id, max_bench_cos_e6, contaminated).
    """
    import numpy as np

    B, bnorm = collect_bench_matrix(bench, vec_col)

    id_t = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_t}, max_bench_cos_e6 bigint, contaminated boolean"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            mx = semantic_max_cos_e6(V, B, bnorm)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "max_bench_cos_e6": mx,
                    "contaminated": mx >= threshold_e6,
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(score, out_schema)


def triplet_mining(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    margin_e6: int = 200_000,
) -> DataFrame:
    """Batch-hard triplet mining (Schroff et al. 2015, FaceNet; the
    in-batch variant of Hermans et al. 2017): per anchor, the HARDEST
    positive (least-similar same-label vector — the pair the model
    most needs to pull together) and the HARDEST negative
    (most-similar different-label vector — the pair it most needs to
    push apart), plus the margin-violation flag
    ``neg_cos + margin > pos_cos`` that selects the triplets with
    non-zero loss. This is the step that turns a labeled embedded
    corpus into contrastive training triplets.

    One corpus pass: the same synthetic-cell broadcast equi-join as
    :func:`cosine_topk` scores every (anchor, corpus) pair with the
    Arrow e6 cosine, then a SINGLE anchor-keyed aggregation extracts
    both argmins/argmaxes via ``min_by``/``max_by`` on (cosine_e6,
    vec_id) struct keys (map-side partials; no second scan, no
    ranking window). Ties break to the lower vec_id on both sides —
    exact integer compares, so the DuckDB oracle's row_number form
    matches hash-for-hash.
    """
    c = with_l2_norm(corpus, vec_col).select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("c_label"),
        F.col(vec_col).alias("vc"),
        F.col("l2_norm").alias("nc"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(_TOPK_CELLS)).cast("int").alias("__cell"),
    )
    q = (
        with_l2_norm(queries, vec_col)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(label_col).alias("query_label"),
            F.col(vec_col).alias("vq"),
            F.col("l2_norm").alias("nq"),
        )
        .withColumn("__cell", F.explode(F.sequence(F.lit(0), F.lit(_TOPK_CELLS - 1))))
    )
    pairs = (
        c.join(F.broadcast(q), "__cell")
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "query_label",
            "vec_id",
            "c_label",
            cosine_e6_pandas("vq", "vc", "nq", "nc").alias("cosine_e6"),
        )
    )
    same = F.col("c_label") == F.col("query_label")
    cand = F.struct(F.col("vec_id"), F.col("cosine_e6"))
    t = pairs.groupBy("query_id", "query_label").agg(
        # hardest positive: min (cosine, vec_id) among same-label
        F.min_by(
            F.when(same, cand),
            F.when(same, F.struct(F.col("cosine_e6"), F.col("vec_id"))),
        ).alias("pos"),
        # hardest negative: max cosine among diff-label, tie → lower
        # vec_id (negated id inside the max key)
        F.max_by(
            F.when(~same, cand),
            F.when(
                ~same, F.struct(F.col("cosine_e6"), (-F.col("vec_id")).alias("nv"))
            ),
        ).alias("neg"),
    )
    return (
        t.where(F.col("pos").isNotNull() & F.col("neg").isNotNull())
        .select(
            "query_id",
            F.col("query_label").cast("bigint").alias("label"),
            F.col("pos.vec_id").alias("pos_id"),
            F.col("pos.cosine_e6").alias("pos_cosine_e6"),
            F.col("neg.vec_id").alias("neg_id"),
            F.col("neg.cosine_e6").alias("neg_cosine_e6"),
            (
                F.col("neg.cosine_e6") + F.lit(margin_e6)
                > F.col("pos.cosine_e6")
            ).alias("violates_margin"),
        )
    )


#: cosine_topk_pandas collects the query side into a driver NumPy
#: matrix; past this bound, an unbounded collect is a silent driver OOM
#: at scale, so the operator refuses loudly instead.
_MAX_COLLECTED_QUERIES = 65536


def cosine_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    max_queries: int = _MAX_COLLECTED_QUERIES,
) -> DataFrame:
    """Same semantics via mapInPandas: queries collected to a (small)
    driver matrix, corpus streamed in Arrow batches, NumPy matmul per
    batch, per-batch top-k then a global re-rank. ~vectorized BLAS vs
    per-element JVM fold.

    The collect is bounded: more than ``max_queries`` query rows raises
    instead of OOMing the driver — use :func:`cosine_topk` (broadcast
    join, no driver materialization) for large query sets."""
    import numpy as np

    qpd = (
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("v"))
        .limit(max_queries + 1)  # bound the fetch itself, not just the check
        .toPandas()
    )
    if len(qpd) > max_queries:
        raise ValueError(
            f"cosine_topk_pandas collects the query side to the driver and "
            f"got more than max_queries={max_queries} rows; use cosine_topk "
            f"(broadcast-join form) for large query sets, or raise "
            f"max_queries explicitly if the driver can hold them."
        )
    q_ids = qpd["qid"].to_numpy()
    qm = np.stack(qpd["v"].to_numpy()).astype("float64")
    qn = np.linalg.norm(qm, axis=1)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            cn = np.linalg.norm(cm, axis=1)
            cos = (cm @ qm.T) / np.outer(cn, qn)  # |batch| × |queries|
            n_q = len(q_ids)
            top = min(k + 1, len(pdf))  # +1: self-match removed later
            idx = np.argpartition(-cos, top - 1, axis=0)[:top]
            out = {
                "query_id": np.repeat(q_ids, top),
                "vec_id": pdf[id_col].to_numpy()[idx.T.ravel()],
                "cosine_e6": np_quantize_e6(
                    cos[idx.T.ravel(), np.repeat(np.arange(n_q), top)]
                ),
            }
            yield pd.DataFrame(out)

    partial = corpus.select(id_col, vec_col).mapInPandas(
        score, schema="query_id long, vec_id long, cosine_e6 long"
    )
    return (
        _ranked(partial.where(F.col("query_id") != F.col("vec_id")), k)
        .select("query_id", "vec_id", "cosine_e6", "rank")
    )


# ------------------------------------------------------------ LSH ANN


def hyperplanes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes: sign of bit parity of
    md5("{plane}_{dim}") — reproducible in any engine / language."""
    planes = []
    for j in range(num_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{j}_{i}".encode()).hexdigest()
            row.append(1.0 if int(h[0], 16) < 8 else -1.0)
        planes.append(row)
    return planes


def bucket_expr(vec_col: str, planes: list[list[float]]) -> F.Column:
    """Bucket id = Σ_j (round(dot(v, plane_j)·1e6) > 0) << j, all
    JVM-side. The sign is taken on the e6-BIGINT quantized dot (Spark
    ``round`` is HALF_UP = half-away-from-zero, matching DuckDB
    ``round`` and ``np_round_half_away``): a raw ``dot > 0`` could
    flip across engines when |dot| sits within accumulation-order
    noise of zero — the last resident of the float-boundary manifest,
    retired in round 10."""
    bucket = F.lit(0).cast("bigint")
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(w) for w in plane])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit_plane, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        dot_e6 = F.round(dot * F.lit(1_000_000.0), 0).cast("bigint")
        bucket = bucket + F.when(dot_e6 > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("bigint")
    return bucket


def lsh_buckets_pandas(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: list[list[float]],
) -> DataFrame:
    """(id, vec, l2_norm, bucket) via an Arrow-batched NumPy matmul
    against the plane matrix — the vectorized twin of
    :func:`bucket_expr` + ``with_l2_norm``. Same sign rule (e6-BIGINT
    quantized dot > 0, half-away rounding) so buckets agree with the
    expression/oracle path for any dot not exactly at a .5e-6 midpoint
    — the quantization exists precisely so last-ulp accumulation order
    can't flip a sign near zero. Catalyst's higher-order functions
    (``aggregate``/``zip_with``) are interpreted per element — at
    num_planes × dim ops per row they dominate the whole query, and a
    [batch × dim] @ [dim × planes] matmul replaces all of it."""
    import numpy as np

    from flink_join_scaling_spark.functions.vectors import np_round_half_away

    P = np.asarray(planes, dtype=np.float64)  # planes × dim
    weights = 1 << np.arange(len(planes), dtype=np.int64)
    id_t = df.schema[id_col].dataType.simpleString()
    vec_t = df.schema[vec_col].dataType.simpleString()
    out_schema = f"{id_col} {id_t}, {vec_col} {vec_t}, l2_norm double, bucket long"

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    vec_col: pdf[vec_col],
                    "l2_norm": np.sqrt((V * V).sum(axis=1)),
                    "bucket": (
                        np_round_half_away((V @ P.T) * 1_000_000.0, 0) > 0
                    ).astype(np.int64)
                    @ weights,
                }
            )

    return df.select(id_col, vec_col).mapInPandas(go, out_schema)


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 4,
    dim: int | None = None,
    assign: str = "pandas",
) -> DataFrame:
    """Approximate top-k: candidates = same LSH bucket as the query,
    then exact cosine rank within the bucket. The cross join of
    :func:`cosine_topk` becomes an equi-join on bucket id.

    ``dim`` (the embedding width) is required: ArrayType carries no
    length, and probing a row for it would submit a corpus-scan job at
    plan-build time — a driver-side stall before the real plan runs.

    ``assign="pandas"`` (default) computes buckets + norms through the
    vectorized :func:`lsh_buckets_pandas`; ``"expr"`` keeps the pure-
    Catalyst :func:`bucket_expr` form (the oracle-documented formula —
    identical output, interpreted HOF evaluation per row).
    """
    if dim is None:
        raise TypeError(
            "ann_lsh_topk requires dim= (the embedding width): ArrayType "
            "carries no length, and inferring it would scan the corpus at "
            "plan-build time."
        )
    planes = hyperplanes(num_planes, dim)
    if assign == "pandas":
        c = lsh_buckets_pandas(corpus, id_col, vec_col, planes).select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("vc"),
            F.col("l2_norm").alias("nc"),
            "bucket",
        )
        q = lsh_buckets_pandas(queries, id_col, vec_col, planes).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("vq"),
            F.col("l2_norm").alias("nq"),
            "bucket",
        )
    else:
        c = with_l2_norm(corpus, vec_col).select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("vc"),
            F.col("l2_norm").alias("nc"),
            bucket_expr(vec_col, planes).alias("bucket"),
        )
        q = with_l2_norm(queries, vec_col).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("vq"),
            F.col("l2_norm").alias("nq"),
            bucket_expr(vec_col, planes).alias("bucket"),
        )
    pairs = (
        c.join(F.broadcast(q), on="bucket")
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.col("bucket"),
            cosine_e6_pandas("vq", "vc", "nq", "nc").alias("cosine_e6"),
        )
    )
    return _ranked(pairs, k).select("query_id", "vec_id", "bucket", "cosine_e6", "rank")


# ------------------------------------------------------------ IVF ANN


def ivf_centroids(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int = 8,
) -> list:
    """Deterministic centroid seeding: the ``num_cells`` vectors with
    the smallest ids (reproducible and DuckDB-oracle-expressible; a
    production build would k-means them, which changes only this
    list). Returns collected Rows with fields ``cell``/``cvec``."""
    return (
        vectors.orderBy(id_col)
        .limit(num_cells)
        .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("cvec"))
        .collect()
    )


def ivf_centroids_kmeans(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int = 8,
    iters: int = 10,
    sample_cap: int = 65536,
) -> list:
    """Trained centroids: spherical k-means (Lloyd's iterations on
    cosine, i.e. argmax dot after L2 normalization) over a
    deterministic sample, initialized from :func:`ivf_centroids`'s
    seeds so training can only improve the partition it starts from.

    The sample is the ``sample_cap`` rows with the smallest
    ``md5(id)`` — a pseudo-random but run/engine-stable choice computed
    with a narrow TakeOrdered, no shuffle. Only the sample is collected
    (bounded by ``sample_cap``, not the corpus); training runs in NumPy
    on the driver. At 100 TB this is the right shape: centroid training
    is sample-sized by construction, and the corpus-sized pass is the
    cell *assignment* (:func:`ivf_cells_pandas`), which stays
    distributed. Fixed ``iters`` keeps the result deterministic.

    Returns ``{"cell": 0.., "cvec": [...]}`` dicts compatible with the
    ``centroids=`` parameter of the assignment functions; trained cells
    are numbered 0..num_cells-1. No SQL oracle exists for the trained
    list — consumers are rows-only checked and property-tested.
    """
    import numpy as np

    seeds = ivf_centroids(vectors, id_col, vec_col, num_cells)
    rows = (
        vectors.select(F.col(id_col).cast("string").alias("__sid"), F.col(vec_col))
        .orderBy(F.md5("__sid"), "__sid")
        .limit(sample_cap)
        .collect()
    )
    X = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    xn = np.linalg.norm(X, axis=1, keepdims=True)
    Xn = np.divide(X, xn, out=np.zeros_like(X), where=xn != 0)
    C = np.stack([np.asarray(r["cvec"], dtype=np.float64) for r in seeds])
    cn = np.linalg.norm(C, axis=1, keepdims=True)
    C = np.divide(C, cn, out=np.zeros_like(C), where=cn != 0)
    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)  # ties → lower cell
        for j in range(num_cells):
            members = Xn[assign == j]
            if not len(members):
                continue  # empty cell keeps its previous centroid
            m = members.mean(axis=0)
            n = np.linalg.norm(m)
            if n > 0:
                C[j] = m / n
    return [{"cell": j, "cvec": [float(x) for x in C[j]]} for j in range(num_cells)]


def ivf_cells(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int = 8,
    nprobe: int = 1,
    centroids: list | None = None,
) -> DataFrame:
    """Coarse quantization: assign each vector to its ``nprobe``
    nearest of ``num_cells`` centroid cells (rank by cosine). Output
    carries ``crank`` (0-based nearness rank: 0 = home cell), so one
    assignment pass can serve both as the index (``crank == 0``) and
    as the probe set.

    ``centroids`` (from :func:`ivf_centroids`) lets callers assign a
    second dataset — e.g. a query set — against the INDEX's cell
    space; when omitted, centroids are seeded from ``vectors`` itself.
    Assignment is a NARROW per-row argmax over the collected centroids
    (one array expression sorted by (csim desc, cell asc), sliced to
    ``nprobe``): the corpus is never shuffled — the earlier
    broadcast-join + Window.partitionBy(id) version shuffled corpus ×
    num_cells rows just to rank 8 candidates per row. Centroid count
    must stay modest (≲ a few hundred: they become expression
    literals); beyond that, :func:`ivf_cells_pandas` is the same shape
    with vectorized scoring.
    """
    import math

    cents = centroids if centroids is not None else ivf_centroids(
        vectors, id_col, vec_col, num_cells
    )
    v = with_l2_norm(vectors, vec_col)
    cands = []
    for row in cents:
        cvec = [float(x) for x in row["cvec"]]
        cnorm = math.sqrt(sum(x * x for x in cvec))
        # one ArrayType Literal node, not dim× Literal + CreateArray —
        # keeps the 8-centroid expression tree small enough that
        # analysis/codegen doesn't dominate the cold run
        lit_vec = F.lit(cvec)
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit_vec, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        # zero-norm guard: a zero vector (or zero centroid) has cosine
        # 0.0 to everything, so assignment falls through to cell asc —
        # identical to ivf_cells_pandas' np.where guard
        if cnorm == 0.0:
            csim = F.lit(0.0)
        else:
            csim = F.when(F.col("l2_norm") == 0.0, F.lit(0.0)).otherwise(
                F.round(dot / (F.col("l2_norm") * F.lit(cnorm)), 6)
            )
        # sort key = -csim, with ±0.0 collapsed so csim = 0.0 and -0.0
        # tie (and fall through to cell asc) exactly as in SQL DESC order
        negsim = F.when(csim == 0.0, F.lit(0.0)).otherwise(-csim)
        cands.append(
            F.struct(
                negsim.alias("negsim"),
                F.lit(int(row["cell"])).cast("bigint").alias("cell"),
            )
        )
    best = F.slice(F.array_sort(F.array(*cands)), 1, nprobe)
    return v.select(
        F.col(id_col),
        F.col(vec_col),
        F.col("l2_norm"),
        F.posexplode(best.getField("cell")).alias("crank", "cell"),
    )


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_cells: int = 8,
    nprobe: int = 2,
    assign: str = "pandas",
    train: bool = False,
) -> DataFrame:
    """IVF-style approximate top-k: the corpus is indexed into its
    single nearest cell; each query probes its ``nprobe`` nearest
    cells and brute-forces only those cells' members. The
    :func:`cosine_topk` cross join becomes an equi-join on cell id —
    cost ∝ corpus/num_cells per query instead of corpus.

    ``assign="pandas"`` (default) scores cells with the vectorized
    NumPy matmul (:func:`ivf_cells_pandas`); ``"expr"`` keeps the
    pure-Catalyst per-centroid expression (identical assignments —
    property-tested — but interpreted HOF evaluation per row, which
    dominates the query).

    ``train=True`` replaces the deterministic seed centroids with
    k-means-trained ones (:func:`ivf_centroids_kmeans`) — better cell
    balance / recall, but no SQL oracle for the centroid list."""
    cells_fn = ivf_cells_pandas if assign == "pandas" else ivf_cells
    # centroids come from the CORPUS only: queries are assigned into
    # the index's cell space (seeding them from the query set would
    # probe a different — wrong — partition of the corpus)
    cents_fn = ivf_centroids_kmeans if train else ivf_centroids
    cents = cents_fn(corpus, id_col, vec_col, num_cells)
    idx = cells_fn(
        corpus, id_col, vec_col, num_cells, nprobe=1, centroids=cents
    ).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vc"),
        F.col("l2_norm").alias("nc"),
        "cell",
    )
    probes = cells_fn(
        queries, id_col, vec_col, num_cells, nprobe=nprobe, centroids=cents
    ).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("vq"),
        F.col("l2_norm").alias("nq"),
        "cell",
    )
    return _probe_and_rank(idx, probes, k)


def _probe_and_rank(
    idx: DataFrame, probes: DataFrame, k: int, exclude_self: bool = True
) -> DataFrame:
    """Shared IVF scoring tail: broadcast the probe batch into the
    cell equi-join, Arrow-vectorized e6 cosine, total-order top-k
    on exact integers. ``idx`` carries
    (vec_id, vc, nc, cell); ``probes`` carries (query_id, vq, nq,
    cell). Used by :func:`ann_ivf_topk` (in-session) and
    ``operators.ann_index.ivf_index_topk`` (persisted index) so the
    scoring contract cannot drift between them. Each corpus vector
    lives in exactly one cell (nprobe=1 index), so every (query, vec)
    pair meets at most once — no dedup shuffle. ``exclude_self`` drops
    query_id == vec_id pairs (the self-join convention); pass False
    when the query batch's id space is foreign to the corpus."""
    pairs = idx.join(F.broadcast(probes), on="cell")
    if exclude_self:
        pairs = pairs.where(F.col("query_id") != F.col("vec_id"))
    pairs = pairs.select(
        "query_id",
        "vec_id",
        cosine_e6_pandas("vq", "vc", "nq", "nc").alias("cosine_e6"),
    )
    return _ranked(pairs, k).select("query_id", "vec_id", "cosine_e6", "rank")


def ivf_cells_pandas(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int = 8,
    nprobe: int = 1,
    centroids: list | None = None,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The many-cells variant of :func:`ivf_cells`: same assignment
    semantics (rank cells by cosine rounded to 6, ties → lower cell
    id), but the scoring is an Arrow-batched ``mapInPandas`` NumPy
    matmul against the closure-captured centroid matrix instead of a
    per-centroid Catalyst expression.

    Use this past ~hundreds of cells, where the expression-literal
    tree of :func:`ivf_cells` stops being reasonable: a [batch × dim] @
    [dim × cells] matmul scores every cell in one vectorized pass, so
    cells can scale with the corpus (bounded cell occupancy at 100 TB)
    while the operator stays narrow — still no shuffle, and still one
    pass over the corpus.

    ``keep_cols`` names extra input columns to pass through unchanged
    (repeated per probe, like the vector) — this is how attribute
    columns (e.g. a label for filtered ANN search) ride the cell
    assignment without a corpus-sized join-back afterwards.
    """
    import math

    import numpy as np

    cents = centroids if centroids is not None else ivf_centroids(
        vectors, id_col, vec_col, num_cells
    )
    cell_ids = np.array([int(r["cell"]) for r in cents], dtype=np.int64)
    C = np.stack([np.asarray(r["cvec"], dtype=np.float64) for r in cents])
    cnorm = np.sqrt((C * C).sum(axis=1))

    id_t = vectors.schema[id_col].dataType.simpleString()
    vec_t = vectors.schema[vec_col].dataType.simpleString()
    keep_schema = "".join(
        f", {c} {vectors.schema[c].dataType.simpleString()}" for c in keep_cols
    )
    out_schema = (
        f"{id_col} {id_t}, {vec_col} {vec_t}{keep_schema}, "
        "l2_norm double, crank int, cell long"
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            vnorm = np.sqrt((V * V).sum(axis=1))
            # zero-norm guard: cosine 0.0 instead of NaN, matching the
            # expression version — NaN would argsort last NON-tied with
            # real scores, silently diverging from ivf_cells
            denom = vnorm[:, None] * cnorm[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = np_round_half_away(
                    np.where(denom == 0.0, 0.0, (V @ C.T) / denom), 6
                )
            # stable sort on -sim: ties keep ascending centroid order
            # (cell_ids is ascending by construction) = the expression
            # version's (negsim, cell) rank
            order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
            n, p = order.shape
            out = {
                id_col: np.repeat(pdf[id_col].to_numpy(), p),
                vec_col: [v for v in pdf[vec_col] for _ in range(p)],
            }
            for c in keep_cols:
                out[c] = [v for v in pdf[c] for _ in range(p)]
            out["l2_norm"] = np.repeat(vnorm, p)
            out["crank"] = np.tile(np.arange(p, dtype=np.int32), n)
            out["cell"] = cell_ids[order].ravel()
            yield pd.DataFrame(out)

    return vectors.select(id_col, vec_col, *keep_cols).mapInPandas(
        assign, out_schema
    )


# -------------------------------------------------- product quantization


def pq_train(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    nbits: int = 4,
    iters: int = 10,
    sample_cap: int = 65536,
) -> dict:
    """Product-quantization codebooks (Jégou et al. 2011): the vector
    space is split into ``m`` contiguous subspaces of dim/m dimensions
    and a ``2**nbits``-centroid Euclidean k-means is trained PER
    subspace, so a vector compresses to ``m`` small codes — 64 float32
    dims at m=8, nbits=4 is 256 B → 4 B, the 64× memory lever that
    makes billion-vector ANN fit in RAM (FAISS's IVF-PQ workhorse).

    Vectors are L2-normalized before training so squared-L2 ADC order
    matches cosine order (‖a−b‖² = 2 − 2·cos for unit vectors) — the
    same measure every other similarity operator here ranks by.

    Training follows :func:`ivf_centroids_kmeans`'s 100 TB discipline
    exactly: a deterministic md5-ordered sample (bounded by
    ``sample_cap``, collected with a narrow TakeOrdered — never the
    corpus), fixed ``iters`` Lloyd's rounds in NumPy on the driver,
    first-k-sample-rows init; empty clusters keep their previous
    centroid. The corpus-sized passes (encode, scan) stay distributed.

    Returns ``{"m", "nbits", "dsub", "dim", "codebooks"}`` with
    codebooks as a nested list [m][2**nbits][dsub].
    """
    import numpy as np

    rows = (
        vectors.select(F.col(id_col).cast("string").alias("__sid"), F.col(vec_col))
        .orderBy(F.md5("__sid"), "__sid")
        .limit(sample_cap)
        .collect()
    )
    if not rows:
        raise ValueError("cannot train PQ codebooks on an empty corpus")
    X = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    k = 1 << nbits
    xn = np.linalg.norm(X, axis=1, keepdims=True)
    Xn = np.divide(X, xn, out=np.zeros_like(X), where=xn != 0)
    dsub = dim // m
    codebooks = []
    for j in range(m):
        S = Xn[:, j * dsub : (j + 1) * dsub]
        C = S[: min(k, len(S))].copy()
        if len(C) < k:  # tiny sample: pad by repeating (degenerate but defined)
            C = np.vstack([C] * ((k + len(C) - 1) // len(C)))[:k]
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # ties → lower code
            for c in range(k):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        codebooks.append(C.tolist())
    return {"m": m, "nbits": nbits, "dsub": dsub, "dim": dim, "codebooks": codebooks}


def pq_encode(
    vectors: DataFrame,
    codebooks: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector to its ``m`` nearest-subcentroid codes —
    the corpus-sized distributed pass. Arrow-batched ``mapInPandas``:
    per batch, one (n, k) distance matmul per subspace against the
    closure-captured codebook (m·k·dsub floats — KBs, shipped in the
    task closure like the IVF centroid matrix). Vectors are
    L2-normalized to match the trained space. Returns (id, codes
    array<int>); at rest the codes column is the index — m small ints
    per vector instead of the float payload."""
    import numpy as np
    import pandas as pd

    m, dsub = codebooks["m"], codebooks["dsub"]
    C = np.asarray(codebooks["codebooks"], dtype=np.float64)  # (m, k, dsub)
    out_schema = f"{id_col} long, codes array<int>"

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            xn = np.linalg.norm(X, axis=1, keepdims=True)
            Xn = np.divide(X, xn, out=np.zeros_like(X), where=xn != 0)
            codes = np.empty((len(Xn), m), dtype=np.int32)
            for j in range(m):
                S = Xn[:, j * dsub : (j + 1) * dsub]
                # ||s-c||² = ||s||² - 2s·c + ||c||²; argmin over k
                d2 = (
                    -2.0 * (S @ C[j].T)
                    + (C[j] ** 2).sum(axis=1)[None, :]
                )
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    return vectors.select(id_col, vec_col).mapInPandas(encode, out_schema)


def _pq_query_luts(
    queries: DataFrame, cb: dict, id_col: str, vec_col: str
):
    """Collect the (bounded) query batch and build each query's exact
    sub-distance lookup table: luts[q, j, c] = ‖q_subj − C[j, c]‖² over
    L2-normalized queries. Returns (qids ndarray, luts ndarray) — the
    closure payload every ADC scan ships (q × m × 2**nbits doubles)."""
    import numpy as np

    m, dsub = cb["m"], cb["dsub"]
    C = np.asarray(cb["codebooks"], dtype=np.float64)  # (m, k, dsub)
    q_rows = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col))
        .orderBy("query_id")
        .collect()
    )
    if len(q_rows) > _MAX_COLLECTED_QUERIES:
        raise ValueError(
            f"refusing to collect {len(q_rows)} query vectors "
            f"(> {_MAX_COLLECTED_QUERIES}); batch the query set"
        )
    qids = np.asarray([r["query_id"] for r in q_rows])
    Q = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in q_rows])
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    Qn = np.divide(Q, qn, out=np.zeros_like(Q), where=qn != 0)
    nq = len(Qn)
    kcb = C.shape[1]
    luts = np.empty((nq, m, kcb), dtype=np.float64)
    for j in range(m):
        Sq = Qn[:, j * dsub : (j + 1) * dsub]
        luts[:, j, :] = (
            (Sq**2).sum(axis=1)[:, None]
            - 2.0 * (Sq @ C[j].T)
            + (C[j] ** 2).sum(axis=1)[None, :]
        )
    return qids, luts


def _adc_shortlist(
    codes: DataFrame,
    qids,
    luts,
    m: int,
    shortlist: int,
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Shared ADC scan tail (in-session :func:`ann_pq_topk` and the
    persisted ``ann_index.ivf_index_topk`` ADC path): per Arrow batch
    of (id, codes) rows, approximate distances are m LUT lookups
    summed, each partition emits its LOCAL ``shortlist`` per query via
    one argpartition, and a window rank yields the global shortlist —
    the shuffle is (partitions × queries × shortlist) rows, never
    corpus-sized. Returns (query_id, vec_id, adist, rank ≤ shortlist).
    """
    import numpy as np
    import pandas as pd

    nq = len(qids)
    out_schema = "query_id long, vec_id long, adist double"
    kk = shortlist + 1 if exclude_self else shortlist  # self may hold a slot

    def scan(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            codemat = np.stack(pdf["codes"].to_numpy())  # (n, m)
            ids = pdf[id_col].to_numpy()
            # adist[q, v] = Σ_j luts[q, j, codemat[v, j]] — advanced
            # indexing with (m,) × (n, m) broadcasts to (nq, n, m)
            d = luts[:, np.arange(m), codemat].sum(axis=2)
            take = min(kk, n)
            part = np.argpartition(d, take - 1, axis=1)[:, :take]
            qi = np.repeat(np.arange(nq), take)
            vi = part.ravel()
            yield pd.DataFrame(
                {
                    "query_id": qids[qi],
                    "vec_id": ids[vi],
                    "adist": d[qi, vi],
                }
            )

    local = codes.select(F.col(id_col), "codes").mapInPandas(scan, out_schema)
    if exclude_self:
        local = local.where(F.col("query_id") != F.col("vec_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("vec_id").asc()
    )
    return local.withColumn(
        "rank", F.row_number().over(w).cast("bigint")
    ).where(F.col("rank") <= shortlist)


def ann_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    nbits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: dict | None = None,
    exclude_self: bool = True,
    refine_factor: int = 16,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes with exact
    re-ranking: each query builds an (m, 2**nbits) lookup table of
    exact sub-distances to every subcentroid, a corpus vector's
    approximate distance is m table lookups summed (no float vector is
    touched during the scan), and the ADC top ``refine_factor * k``
    shortlist is re-ranked by exact cosine — FAISS's
    ``IndexRefineFlat`` pattern, which buys back the recall raw 4-byte
    codes cannot hold (measured on the synthetic corpus: pure ADC
    top-5 recall ≈ 0.3–0.4 — near-random vectors are PQ's worst case —
    vs ≈ 0.85 containment at a 16× shortlist).

    Scale shape: the scan reads m CODES per vector (256 B of float32
    → 4 B at m=8/nbits=4 — the 64× lever that fits billion-vector
    indexes in RAM); the query LUT set (q × m × 2**nbits doubles)
    ships in the task closure like the IVF centroid matrix; each
    partition emits only its LOCAL shortlist per query via one NumPy
    argpartition, so the ADC shuffle is (partitions × queries ×
    shortlist) rows, never corpus-sized. The refine stage broadcasts
    the (queries × shortlist)-row id list into one more corpus scan
    (columnar: id + vector only) — the Spark form of fetch-by-id —
    and ranks exact cosine. ``refine_factor=0`` disables refining and
    returns (query_id, vec_id, adist_e6, rank) on the e6-quantized
    approximate squared L2 distance (unit vectors: adist = 2 −
    2·cos_approx); with refining the output is (query_id, vec_id,
    cosine_e6, rank) like every other top-k here. Compose with the IVF
    cell layout (prune cells, ADC inside probed cells) for the
    sublinear FAISS IVF-PQ shape. Ties break on vec_id.
    """
    import numpy as np
    import pandas as pd

    cb = codebooks or pq_train(
        corpus, id_col=id_col, vec_col=vec_col, m=m, nbits=nbits
    )
    qids, luts = _pq_query_luts(queries, cb, id_col, vec_col)
    codes = pq_encode(corpus, cb, id_col=id_col, vec_col=vec_col)
    shortlist = max(k, refine_factor * k) if refine_factor else k
    ranked = _adc_shortlist(
        codes, qids, luts, cb["m"], shortlist,
        id_col=id_col, exclude_self=exclude_self,
    )
    if not refine_factor:
        return ranked.withColumn(
            "adist_e6", F.round(F.col("adist") * F.lit(1_000_000.0)).cast("bigint")
        ).select("query_id", "vec_id", "adist_e6", "rank")
    # exact re-rank: broadcast the (queries × shortlist) id list into
    # one corpus scan (id + vector columns only) and score true cosine
    cand = F.broadcast(ranked.select("query_id", "vec_id"))
    corp = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vc")
    ).withColumn("nc", l2_norm_expr("vc"))
    qdf = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("vq")
    ).withColumn("nq", l2_norm_expr("vq"))
    pairs = (
        corp.join(cand, "vec_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "vec_id",
            cosine_e6_pandas("vq", "vc", "nq", "nc").alias("cosine_e6"),
        )
    )
    return _ranked(pairs, k).select("query_id", "vec_id", "cosine_e6", "rank")
