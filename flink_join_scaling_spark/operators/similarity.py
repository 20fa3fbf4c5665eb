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

from flink_join_scaling_spark.functions.vectors import cosine_expr, with_l2_norm


def _ranked(pairs: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k by cosine: (query_id, vec_id, cosine, rank).

    The query side is broadcast — at scale the corpus stays put and
    streams once. cosine is rounded to 6 decimals before ranking, with
    vec_id as tiebreak, so ranking is a deterministic total order.
    """
    c = with_l2_norm(corpus, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vc"), F.col("l2_norm").alias("nc")
    )
    q = with_l2_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("vq"), F.col("l2_norm").alias("nq")
    )
    pairs = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_expr("vq", "vc", "nq", "nc"), 6).alias("cosine"),
        )
    )
    return _ranked(pairs, k).select("query_id", "vec_id", "cosine", "rank")


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
                "cosine": np.round(cos[idx.T.ravel(), np.repeat(np.arange(n_q), top)], 6),
            }
            yield pd.DataFrame(out)

    partial = corpus.select(id_col, vec_col).mapInPandas(
        score, schema="query_id long, vec_id long, cosine double"
    )
    return (
        _ranked(partial.where(F.col("query_id") != F.col("vec_id")), k)
        .select("query_id", "vec_id", "cosine", "rank")
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
    """Bucket id = Σ_j (dot(v, plane_j) > 0) << j, all JVM-side."""
    bucket = F.lit(0).cast("bigint")
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(w) for w in plane])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit_plane, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("bigint")
    return bucket


def lsh_buckets_pandas(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: list[list[float]],
) -> DataFrame:
    """(id, vec, l2_norm, bucket) via an Arrow-batched NumPy matmul
    against the plane matrix — the vectorized twin of
    :func:`bucket_expr` + ``with_l2_norm``. Same sign rule (dot > 0 on
    float64 math), so buckets agree with the expression/oracle path up
    to last-ulp accumulation order. Catalyst's higher-order functions
    (``aggregate``/``zip_with``) are interpreted per element — at
    num_planes × dim ops per row they dominate the whole query, and a
    [batch × dim] @ [dim × planes] matmul replaces all of it."""
    import numpy as np

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
                    "bucket": ((V @ P.T) > 0).astype(np.int64) @ weights,
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
            F.round(cosine_expr("vq", "vc", "nq", "nc"), 6).alias("cosine"),
        )
    )
    return _ranked(pairs, k).select("query_id", "vec_id", "bucket", "cosine", "rank")


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
    cell equi-join, round-6 cosine, total-order top-k. ``idx`` carries
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
        F.round(cosine_expr("vq", "vc", "nq", "nc"), 6).alias("cosine"),
    )
    return _ranked(pairs, k).select("query_id", "vec_id", "cosine", "rank")


def ivf_cells_pandas(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int = 8,
    nprobe: int = 1,
    centroids: list | None = None,
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
    out_schema = (
        f"{id_col} {id_t}, {vec_col} {vec_t}, l2_norm double, crank int, cell long"
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
                sims = np.round(np.where(denom == 0.0, 0.0, (V @ C.T) / denom), 6)
            # stable sort on -sim: ties keep ascending centroid order
            # (cell_ids is ascending by construction) = the expression
            # version's (negsim, cell) rank
            order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
            n, p = order.shape
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), p),
                    vec_col: [v for v in pdf[vec_col] for _ in range(p)],
                    "l2_norm": np.repeat(vnorm, p),
                    "crank": np.tile(np.arange(p, dtype=np.int32), n),
                    "cell": cell_ids[order].ravel(),
                }
            )

    return vectors.select(id_col, vec_col).mapInPandas(assign, out_schema)
