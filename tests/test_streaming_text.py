"""The corpus text pipeline composed on a STREAM: the quality/filter
expressions are stateless Catalyst expressions, so the exact same
columns run under readStream unchanged — this pins that property (no
batch-only construct has crept into the text stack) and checks the
streamed result equals the batch pipeline on the same documents.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_join_scaling_spark.functions import text as tx
from flink_join_scaling_spark.sources.catalog import load_table
from flink_join_scaling_spark.streaming import (
    chunked_parquet_stream,
    collect_emissions,
)

SF_SMALL = "/root/testdata/sf0.001"


def _pipeline(df):
    """quality + repetition gates, then token count — all narrow."""
    t = df.select(
        "doc_id",
        tx.quality_score(F.col("text")).alias("quality"),
        tx.n_tokens_ws(F.col("text")).alias("n_tok"),
    )
    return t.where((F.col("quality") >= 0.5) & (F.col("n_tok") >= 10))


def test_text_pipeline_streams_unchanged(streaming_spark, tmp_path):
    spark = streaming_spark
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    expected = {
        (r.doc_id, r.quality, r.n_tok) for r in _pipeline(docs).collect()
    }
    s = chunked_parquet_stream(spark, docs, str(tmp_path), n_chunks=3)
    em = collect_emissions(_pipeline(s), output_mode="append")
    got = {tuple(r) for r in em[["doc_id", "quality", "n_tok"]].itertuples(index=False)}
    assert got == expected and len(expected) > 0


def test_stream_dedup_exact_first_wins(streaming_spark, tmp_path):
    """Content-hash ingestion dedup: exactly one survivor per distinct
    normalized text, across micro-batches, first arrival wins."""
    from flink_join_scaling_spark.streaming import stream_dedup_exact

    spark = streaming_spark
    rows = [
        (1, "alpha beta"), (2, "ALPHA   beta"),   # dup after normalization
        (3, "gamma"), (4, "gamma"), (5, "delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    s = chunked_parquet_stream(spark, df, str(tmp_path), n_chunks=3)
    em = collect_emissions(stream_dedup_exact(s, "text"), output_mode="append")
    # one survivor per content hash; survivor ids are the first-seen
    # (round-robin chunking: batch order follows row order per chunk)
    assert len(em) == 3
    assert set(em["doc_id"]) <= {1, 2, 3, 4, 5}
    texts = {t.lower().split()[0] for t in em["text"]}
    assert texts == {"alpha", "gamma", "delta"}


def test_stream_dedup_minhash_matches_batch_candidates(streaming_spark, tmp_path):
    """Streaming LSH near-dup detection: the converged candidate-pair
    set equals the batch banded self-join's candidates on the same
    corpus — same md5 hash family, same band buckets, computed
    map-only per arriving document with keyed bucket-membership state.
    Pairs must span micro-batches (a doc arriving in chunk 3 pairs
    with its near-dup from chunk 1) — the property batch can't give."""
    from flink_join_scaling_spark.operators.dedup import (
        minhash_bands,
        minhash_signatures,
    )
    from flink_join_scaling_spark.streaming import chunked_parquet_stream
    from flink_join_scaling_spark.streaming.dedup import stream_dedup_minhash

    spark = streaming_spark
    base = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    # plant near-dup families so candidates exist: 3 shifted copies
    shift = base.agg(F.max("doc_id")).first()[0] + 1
    docs = base
    for i in (1, 2):
        docs = docs.unionByName(
            base.withColumn("doc_id", F.col("doc_id") + F.lit(i * shift))
        )

    # batch expectation: distinct candidate pairs from the banded join
    sigs = minhash_signatures(docs, "doc_id", "text")
    bands = minhash_bands(sigs, "doc_id")
    a = bands.select(F.col("doc_id").alias("id_a"), "band_idx", "band_hash")
    b = bands.select(F.col("doc_id").alias("id_b"), "band_idx", "band_hash")
    expected = {
        (r.id_a, r.id_b)
        for r in a.join(b, ["band_idx", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .collect()
    }

    s = chunked_parquet_stream(spark, docs, str(tmp_path), n_chunks=3)
    em = collect_emissions(
        stream_dedup_minhash(s, "doc_id", "text", max_bucket=4096),
        output_mode="update",
    )
    got = {tuple(r) for r in em[["id_a", "id_b"]].itertuples(index=False)}
    assert got == expected
    assert len(expected) > 0


def test_stream_decontamination_stream_static_join(streaming_spark, tmp_path):
    """Benchmark decontamination on a LIVE stream: the corpus arrives
    as micro-batches, the benchmark slice is a static table, and the
    registered operator (ngram_contamination) runs unchanged as a
    stream-static join — the benchmark shingle set broadcasts into
    every micro-batch. Flagged ids equal the batch run's."""
    from flink_join_scaling_spark.operators.dedup import ngram_contamination
    from flink_join_scaling_spark.streaming import chunked_parquet_stream

    spark = streaming_spark
    d = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    bench = d.where(F.col("doc_id") % 50 == 0)
    corp = d.where(F.col("doc_id") % 50 != 0)
    expected = {
        (r.doc_id, r.n_hits)
        for r in ngram_contamination(corp, bench, "doc_id", "text").collect()
    }
    s = chunked_parquet_stream(spark, corp, str(tmp_path), n_chunks=3)
    em = collect_emissions(
        ngram_contamination(s, bench, "doc_id", "text"),
        output_mode="update",
    )
    # per-doc hits are complete within the doc's own micro-batch (the
    # aggregation is per doc_id and a doc arrives whole in one chunk):
    # take each doc's final emission
    got = {
        (r.doc_id, r.n_hits)
        for r in em.groupby("doc_id", as_index=False).last().itertuples(index=False)
    }
    assert got == expected and len(expected) > 0


def test_stream_dedup_simhash_matches_batch_pairs(streaming_spark, tmp_path):
    """Streaming SimHash near-dup detection: converged VERIFIED pair
    set (hamming <= 3, checked in-state) equals the batch
    simhash_dedup_pairs on the same corpus — same majority-bit simhash
    computed map-only per arriving doc, same byte-band pigeonhole."""
    from flink_join_scaling_spark.operators.dedup import simhash_dedup_pairs
    from flink_join_scaling_spark.streaming import chunked_parquet_stream
    from flink_join_scaling_spark.streaming.dedup import stream_dedup_simhash

    spark = streaming_spark
    base = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    shift = base.agg(F.max("doc_id")).first()[0] + 1
    docs = base.unionByName(
        base.withColumn("doc_id", F.col("doc_id") + F.lit(shift))
    ).unionByName(
        # a NULL-text row must be dropped by the guard, not kill the
        # query (batch drops it implicitly at the token explode)
        spark.createDataFrame([(10 * shift, None)], "doc_id long, text string")
    )

    expected = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_dedup_pairs(docs, "doc_id", "text").collect()
    }

    s = chunked_parquet_stream(spark, docs, str(tmp_path), n_chunks=3)
    em = collect_emissions(
        stream_dedup_simhash(s, "doc_id", "text", max_bucket=4096),
        output_mode="update",
    )
    got = {
        tuple(r)
        for r in em[["id_a", "id_b", "hamming"]].itertuples(index=False)
    }
    assert got == expected
    assert len(expected) > 0


def test_stream_lm_score_against_static_model(streaming_spark, tmp_path):
    """Unigram LM quality scoring on a LIVE stream: the tf model comes
    from the static historical corpus; arriving docs join it
    stream-static and score with the same sorted left-to-right fold as
    the registered q_lm_score. Scores equal the batch computation on
    the same docs — the deploy shape where the model refreshes offline
    while the gate runs continuously."""
    from flink_join_scaling_spark.streaming import chunked_parquet_stream

    spark = streaming_spark
    d = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")

    def score_against(words_src, model_tf, model_tot):
        per = (
            words_src.join(model_tf, "w")
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("n_tokens"),
                F.array_sort(
                    F.collect_list(F.col("tf").cast("double"))
                ).alias("tfs"),
            )
        )
        return per.join(F.broadcast(model_tot)).select(
            "doc_id",
            F.round(
                (
                    F.aggregate(
                        F.transform(F.col("tfs"), lambda x: F.log(x)),
                        F.lit(0.0),
                        lambda a, x: a + x,
                    )
                    - F.col("n_tokens") * F.log(F.col("t"))
                )
                / F.col("n_tokens"),
                6,
            ).alias("lm_logprob"),
        )

    words_static = d.select(
        "doc_id", F.explode(tx.tokens_ws(F.col("text"))).alias("w")
    )
    tf = words_static.groupBy("w").agg(F.count("*").alias("tf"))
    tot = tf.agg(F.sum("tf").alias("t"))
    expected = {
        (r["doc_id"], r["lm_logprob"])
        for r in score_against(words_static, tf, tot).collect()
    }

    s = chunked_parquet_stream(spark, d, str(tmp_path), n_chunks=3)
    words_stream = s.select(
        "doc_id", F.explode(tx.tokens_ws(F.col("text"))).alias("w")
    )
    em = collect_emissions(
        score_against(words_stream, tf, tot), output_mode="update"
    )
    got = {
        (r.doc_id, r.lm_logprob)
        for r in em.groupby("doc_id", as_index=False).last().itertuples(index=False)
    }
    assert got == expected and len(expected) > 0


def test_stream_hll_rollup_converges_to_batch_and_unions(
    streaming_spark, tmp_path
):
    """Continuous HLL: converged per-source estimates equal the batch
    sketch on the same tokens under micro-batch interleaved arrival,
    and a batch hll_union_agg over the converged sketch PARTIALS equals
    the batch GLOBAL estimate — the mergeable-rollup algebra of
    q_hll_rollup, maintained continuously and never re-reading the
    stream."""
    from flink_join_scaling_spark.streaming import (
        chunked_parquet_stream,
        collect_emissions,
        converged,
        stream_hll_rollup,
    )

    spark = streaming_spark
    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    toks = d.select(
        "source", F.explode(tx.tokens_ws(F.col("text"))).alias("w")
    )
    s = chunked_parquet_stream(spark, toks, str(tmp_path), n_chunks=3)
    em = collect_emissions(stream_hll_rollup(s, "source", "w"))
    conv = converged(em, ["source"])

    batch = {
        r.source: (r.n_est, bytes(r.sketch))
        for r in toks.groupBy("source")
        .agg(F.expr("hll_sketch_agg(w, 12)").alias("sketch"))
        .select(
            "source",
            F.expr("cast(round(hll_sketch_estimate(sketch)) as bigint)").alias(
                "n_est"
            ),
            "sketch",
        )
        .collect()
    }
    got = {
        r["source"]: int(r["n_est"]) for _, r in conv.iterrows()
    }
    # at these per-source cardinalities the sketch stays in sparse
    # (coupon) mode, where incremental merge == direct update exactly;
    # the 5% band guards the comparison if a regeneration pushes a
    # source into dense mode (union-vs-direct can differ by a few)
    assert set(got) == set(batch)
    for k, v in got.items():
        exact_est = batch[k][0]
        assert abs(v - exact_est) <= max(1, 0.05 * exact_est), (k, v, exact_est)

    # union the converged streaming partials -> batch global estimate
    part = spark.createDataFrame(
        [(k, bytes(v)) for k, v in zip(conv["source"], conv["sketch"])],
        "source string, sketch binary",
    )
    [u] = part.agg(
        F.expr(
            "cast(round(hll_sketch_estimate(hll_union_agg(sketch))) as bigint)"
        ).alias("g")
    ).collect()
    [g] = toks.agg(
        F.expr(
            "cast(round(hll_sketch_estimate(hll_sketch_agg(w, 12))) as bigint)"
        ).alias("g")
    ).collect()
    assert abs(u.g - g.g) <= max(1, 0.05 * g.g), (u.g, g.g)


def test_stream_decontaminate_matches_batch(streaming_spark, tmp_path):
    """Streaming ingest decontamination drops exactly the documents
    the batch operator (ngram_contamination anti-join) flags — the
    Python tokenizer twin and the JVM expression path cannot drift —
    and the tagged mode reports the same DISTINCT-hit counts."""
    from flink_join_scaling_spark.operators.dedup import ngram_contamination
    from flink_join_scaling_spark.streaming import chunked_parquet_stream
    from flink_join_scaling_spark.streaming.filters import stream_decontaminate
    from flink_join_scaling_spark.streaming.harness import run_to_memory

    spark = streaming_spark
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    # benchmark: substrings of real docs (guaranteed overlap) plus a
    # disjoint sentence (guaranteed miss)
    bench = spark.createDataFrame(
        [(1, r.text[: len(r.text) // 2]) for r in docs.where("doc_id < 5").collect()]
        + [(99, "zz qq xx ww vv uu tt")],
        "doc_id long, text string",
    )
    batch_hits = {
        r.doc_id: r.n_hits
        for r in ngram_contamination(docs, bench, "doc_id", "text").collect()
    }
    assert batch_hits, "fixture must produce contamination"

    sdf = chunked_parquet_stream(spark, docs, str(tmp_path / "chunks"), n_chunks=4)
    kept = run_to_memory(
        stream_decontaminate(sdf, bench), output_mode="append"
    )
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert kept_ids == all_ids - set(batch_hits)
    tagged = run_to_memory(
        stream_decontaminate(sdf, bench, keep_contaminated=True),
        output_mode="append",
    )
    got_hits = {r.doc_id: r.n_hits for r in tagged.where("n_hits > 0").collect()}
    assert got_hits == batch_hits


def test_stream_decontaminate_refuses_oversized_benchmark(
    streaming_spark, monkeypatch
):
    """A corpus-sized 'benchmark' must trip the loud refusal WITHOUT
    first materializing its full distinct-shingle set on the driver:
    the collect is LIMITed to cap+1 rows, so the refusal — the
    operator's whole memory-safety contract — fires before the driver
    holds more than cap+1 shingles. Pinned by spying on collect()."""
    import pytest

    import flink_join_scaling_spark.streaming.filters as filters_mod

    spark = streaming_spark
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    bench = docs.limit(20)  # hundreds of distinct 3-gram shingles
    monkeypatch.setattr(filters_mod, "_MAX_BENCHMARK_SHINGLES", 3)

    cls = type(docs)
    orig_collect = cls.collect
    sizes: list[int] = []

    def spying_collect(self):
        rows = orig_collect(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(cls, "collect", spying_collect)
    with pytest.raises(ValueError, match="corpus, not an"):
        filters_mod.stream_decontaminate(docs, bench)
    monkeypatch.setattr(cls, "collect", orig_collect)
    # the driver materialized at most cap+1 benchmark shingles — never
    # the full set (which is far larger than 4 for 20 documents)
    assert sizes and max(sizes) == 4, sizes


def test_stream_extract_html_matches_batch(streaming_spark, tmp_path):
    """Continuous HTML main-content extraction emits exactly the batch
    extractor's clean corpus under chunked arrival — the two faces
    share one function (operators.html_extract.extract_main_text), so
    this pins that the stateless Arrow stage runs unchanged under
    readStream (no batch-only construct), including the drop of
    boilerplate-only pages."""
    from flink_join_scaling_spark.operators import html_extract as hx
    from flink_join_scaling_spark.streaming import chunked_parquet_stream
    from flink_join_scaling_spark.streaming.filters import stream_extract_html
    from flink_join_scaling_spark.streaming.harness import run_to_memory

    spark = streaming_spark
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    pages = hx.attach_synth_html(docs, "doc_id", "text")
    batch = {
        r.doc_id: r.main_text
        for r in hx.extract_main_text(pages, "doc_id", "html").collect()
    }
    assert batch and len(batch) < docs.count()  # some pages dropped

    sdf = chunked_parquet_stream(spark, pages, str(tmp_path), n_chunks=4)
    got = {
        r.doc_id: r.main_text
        for r in run_to_memory(
            stream_extract_html(sdf), output_mode="append"
        ).collect()
    }
    assert got == batch


def test_stream_extract_links_matches_batch(streaming_spark, tmp_path):
    """Continuous link extraction emits exactly the batch edge set
    under chunked page arrival — the faces share one function
    (operators.html_extract.extract_links), so this pins that the
    stateless Arrow stage (parse + RFC 3986 §5 resolution, including
    the planted pseudo-link skips and the path-relative footer href)
    runs unchanged under readStream."""
    from flink_join_scaling_spark.operators import html_extract as hx
    from flink_join_scaling_spark.streaming import chunked_parquet_stream
    from flink_join_scaling_spark.streaming.filters import (
        stream_extract_links,
    )
    from flink_join_scaling_spark.streaming.harness import run_to_memory

    spark = streaming_spark
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    pages = hx.attach_synth_html(docs, "doc_id", "text").withColumn(
        "page_url",
        F.concat(
            F.lit("http://example.com/doc/"), F.col("doc_id").cast("string")
        ),
    )
    batch = sorted(
        (r.doc_id, r.href)
        for r in hx.extract_links(
            pages, "doc_id", "html", base_col="page_url"
        ).collect()
    )
    assert batch and len(batch) > docs.count()  # several edges per page

    sdf = chunked_parquet_stream(spark, pages, str(tmp_path), n_chunks=4)
    got = sorted(
        (r.doc_id, r.href)
        for r in run_to_memory(
            stream_extract_links(sdf, base_col="page_url"),
            output_mode="append",
        ).collect()
    )
    assert got == batch


def test_stream_ingest_warc_matches_batch(streaming_spark, tmp_path):
    """The full continuous ingestion chain (WARC blobs → records →
    HTTP-200 text/html filter → boilerplate removal) emits exactly
    the batch chain's clean corpus under chunked archive arrival —
    the composition shares the batch stage functions verbatim, and
    this pins that the two-Arrow-stage pipeline runs unchanged under
    readStream, including the by-type record skips and the
    boilerplate-only page drop."""
    from flink_join_scaling_spark.sources import warc as wc
    from flink_join_scaling_spark.streaming import chunked_parquet_stream
    from flink_join_scaling_spark.streaming.filters import stream_ingest_warc
    from flink_join_scaling_spark.streaming.harness import run_to_memory

    spark = streaming_spark
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    blobs = wc.attach_synth_warc(docs, "doc_id", "text", group_size=10)
    # batch reference: the same stateless composition over the batch
    # frame (mapInPandas runs identically in both execution modes)
    batch = {
        (r.uri, r.main_text)
        for r in stream_ingest_warc(blobs).collect()
    }
    assert batch and len(batch) < docs.count()

    sdf = chunked_parquet_stream(spark, blobs, str(tmp_path), n_chunks=3)
    got = {
        (r.uri, r.main_text)
        for r in run_to_memory(
            stream_ingest_warc(sdf), output_mode="append"
        ).collect()
    }
    assert got == batch


def test_stream_extract_redirects_matches_batch(streaming_spark, tmp_path):
    """Continuous redirect-edge extraction (r16): the planted 301
    records come back as (uri, status, location, target) rows with
    RFC 3986 §5 resolution of the relative Location, identical to
    the batch face under chunked archive arrival — and the gz
    member-per-record container walks identically in both modes."""
    from flink_join_scaling_spark.sources import warc as wc
    from flink_join_scaling_spark.streaming import chunked_parquet_stream
    from flink_join_scaling_spark.streaming.filters import (
        stream_extract_redirects,
    )
    from flink_join_scaling_spark.streaming.harness import run_to_memory

    spark = streaming_spark
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    blobs = wc.attach_synth_warc(
        docs, "doc_id", "text", group_size=10,
        gzip_members=True, plant_redirects=True,
    )
    batch = {
        (r.uri, r.http_status, r.location, r.target)
        for r in stream_extract_redirects(blobs).collect()
    }
    n_expected = docs.where("doc_id % 4 = 1").count()
    assert len(batch) == n_expected and n_expected > 0
    assert all(
        s == 301 and t == u.replace("/old/", "/doc/") and loc.startswith("/")
        for u, s, loc, t in batch
    )

    sdf = chunked_parquet_stream(spark, blobs, str(tmp_path), n_chunks=3)
    got = {
        (r.uri, r.http_status, r.location, r.target)
        for r in run_to_memory(
            stream_extract_redirects(sdf), output_mode="append"
        ).collect()
    }
    assert got == batch


def test_stream_robots_filter_matches_batch(streaming_spark, tmp_path):
    """The crawl-policy filter is stateless (per-host policies ride
    the task closure), so the SAME pass runs under readStream: a
    chunked URL stream annotates identically to the batch face —
    the frontier-policing shape (sitemap/extract_links feed →
    canonicalize → THIS → fetch queue)."""
    from flink_join_scaling_spark.sources import robots as rb
    from flink_join_scaling_spark.streaming import chunked_parquet_stream
    from flink_join_scaling_spark.streaming.harness import run_to_memory

    spark = streaming_spark
    robots = spark.createDataFrame(
        [("example.com", "User-agent: *\nDisallow: /private/\n"
          "Crawl-delay: 1\n")],
        "host string, body string",
    )
    urls = spark.createDataFrame(
        [(f"https://example.com/{'private/' if i % 3 == 0 else ''}p{i}",)
         for i in range(30)],
        "url string",
    )
    batch = {
        (r.url, r.allowed, r.crawl_delay)
        for r in rb.robots_filter(urls, robots).collect()
    }
    assert sum(1 for _, a, _ in batch if not a) == 10

    sdf = chunked_parquet_stream(spark, urls, str(tmp_path), n_chunks=3)
    got = {
        (r.url, r.allowed, r.crawl_delay)
        for r in run_to_memory(
            rb.robots_filter(sdf, robots), output_mode="append"
        ).collect()
    }
    assert got == batch


def test_stream_decontaminate_semantic_matches_batch(streaming_spark, tmp_path):
    """The vector twin of stream_decontaminate: converged output is
    bit-identical to batch semantic_contamination on the same data —
    same max_bench_cos_e6 integers, same kept set — because the
    scoring matmul is literally shared (semantic_max_cos_e6)."""
    from flink_join_scaling_spark.operators.similarity import (
        semantic_contamination,
    )
    from flink_join_scaling_spark.streaming import chunked_parquet_stream
    from flink_join_scaling_spark.streaming.filters import (
        stream_decontaminate_semantic,
    )
    from flink_join_scaling_spark.streaming.harness import run_to_memory

    spark = streaming_spark
    vecs = load_table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
    bench = vecs.where("vec_id % 50 = 0")
    corp = vecs.where("vec_id % 50 != 0")
    t_e6 = 300_000
    batch = {
        r.vec_id: (r.max_bench_cos_e6, r.contaminated)
        for r in semantic_contamination(corp, bench, threshold_e6=t_e6).collect()
    }
    assert any(c for _, c in batch.values()), "fixture must flag something"

    sdf = chunked_parquet_stream(spark, corp, str(tmp_path / "chunks"), n_chunks=4)
    tagged = run_to_memory(
        stream_decontaminate_semantic(
            sdf, bench, threshold_e6=t_e6, keep_contaminated=True
        ),
        output_mode="append",
    )
    got = {
        r.vec_id: (r.max_bench_cos_e6, r.contaminated) for r in tagged.collect()
    }
    assert got == batch
    # default mode drops flagged vectors, exactly the batch clean set
    kept = run_to_memory(
        stream_decontaminate_semantic(sdf, bench, threshold_e6=t_e6),
        output_mode="append",
    )
    kept_ids = {r.vec_id for r in kept.select("vec_id").collect()}
    assert kept_ids == {v for v, (_, c) in batch.items() if not c}


def test_stream_quality_score_matches_batch_apply(streaming_spark, tmp_path):
    """Continuous classifier scoring keeps exactly the documents the
    batch-trained model accepts, with bit-identical logits — the
    stateless expressions are shared with the batch apply, so the
    stream cannot drift from the model."""
    from flink_join_scaling_spark.operators import classifier as clf
    from flink_join_scaling_spark.plans.classifier_q import (
        _labeled_frame,
        _LR_ITERS,
        _LR_RATE,
    )
    from flink_join_scaling_spark.streaming import chunked_parquet_stream
    from flink_join_scaling_spark.streaming.filters import stream_quality_score
    from flink_join_scaling_spark.streaming.harness import run_to_memory

    spark = streaming_spark
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    w = clf.train_lr(
        _labeled_frame(spark, SF_SMALL).select("y", *clf.FEATURES),
        _LR_ITERS,
        _LR_RATE,
    )
    feats = clf.feature_columns(F.col("text"))
    batch = {
        r.doc_id: r.logit
        for r in docs.select("doc_id", *[c.alias(n) for n, c in feats.items()])
        .withColumn("logit", clf.logit(w))
        .where(F.col("logit") >= 0)
        .collect()
    }
    assert 0 < len(batch) < docs.count(), "threshold must split the fixture"

    sdf = chunked_parquet_stream(spark, docs, str(tmp_path / "chunks"), n_chunks=4)
    kept = run_to_memory(stream_quality_score(sdf, w), output_mode="append")
    got = {r.doc_id: r.logit for r in kept.select("doc_id", "logit").collect()}
    assert got == batch  # same ids AND bit-identical logits
    tagged = run_to_memory(
        stream_quality_score(sdf, w, keep_rejected=True), output_mode="append"
    )
    assert tagged.count() == docs.count()
    # quarantine routing decision is explicit: accepted == (logit >= 0)
    # and the accepted set IS the filtered stream's id set
    trows = tagged.select("doc_id", "logit", "accepted").collect()
    assert all(r.accepted == (r.logit >= 0) for r in trows)
    assert {r.doc_id for r in trows if r.accepted} == set(batch)

def test_stream_nb_lang_converged_equals_batch(streaming_spark, tmp_path):
    """Train-once / score-forever for the NB classifier, with the
    streaming shape the logistic scorer can't show: the model is a
    TABLE riding a stream-static left join, and per-doc state
    accumulates count arrays across micro-batches. The converged (last
    emission per doc) predictions + e6 scores must be bit-identical to
    the same (model, scalars) algebra evaluated in batch — even though
    each document's tokens never co-arrive with the model."""
    from flink_join_scaling_spark.operators import nb
    from flink_join_scaling_spark.plans.select_q import _NB_LANGS
    from flink_join_scaling_spark.streaming.filters import stream_nb_lang
    from flink_join_scaling_spark.streaming.harness import converged

    spark = streaming_spark
    d = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "lang", "text"
    ).limit(150)
    words = d.select(
        "doc_id", "lang", F.explode(tx.tokens_ws(F.col("text"))).alias("w")
    )
    model = nb.nb_model(words, _NB_LANGS).localCheckpoint(eager=True)
    totals = nb.nb_totals(words, _NB_LANGS).first().asDict()
    priors = nb.nb_priors(d, _NB_LANGS).first().asDict()

    # batch reference: identical algebra on the same model + scalars
    per = (
        words.select("doc_id", "w")
        .join(model, "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_toks"),
            *[
                F.array_sort(F.collect_list(
                    F.coalesce(F.col(f"c_{c}"), F.lit(0)).cast("double")
                )).alias(f"a_{c}")
                for c in _NB_LANGS
            ],
        )
    )
    scored = per
    for c in _NB_LANGS:
        scored = scored.withColumn(f"n_{c}", F.lit(int(totals[f"n_{c}"])))
        scored = scored.withColumn(f"d_{c}", F.lit(int(priors[f"d_{c}"])))
    scored = scored.withColumn("v", F.lit(int(totals["v"]))).withColumn(
        "dd", F.lit(int(priors["dd"]))
    )
    for c in _NB_LANGS:
        scored = scored.withColumn(
            f"s_{c}", F.round(nb.nb_score_expr(c) * 1_000_000.0).cast("bigint")
        )
    want = {
        int(r.doc_id): (r.pred_lang, int(r.score_e6))
        for r in nb.nb_predict(scored, _NB_LANGS)
        .select("doc_id", "pred_lang", "score_e6").collect()
    }

    s = chunked_parquet_stream(
        spark, d.select("doc_id", "text"), str(tmp_path), n_chunks=4
    )
    em = collect_emissions(
        stream_nb_lang(s, model, totals, priors, _NB_LANGS),
        output_mode="update",
    )
    conv = converged(em, ["doc_id"])
    got = {
        int(r.doc_id): (r.pred_lang, int(r.score_e6))
        for _, r in conv.iterrows()
    }
    assert got == want and len(want) == 150


def test_stream_gopher_rules_matches_batch(streaming_spark, tmp_path):
    """Continuous Gopher gate keeps exactly the documents the batch
    q_gopher_rules keeps, with identical per-rule booleans — the rule
    expressions are shared, so the faces cannot drift."""
    from flink_join_scaling_spark.plans.registry import QUERIES
    from flink_join_scaling_spark.streaming import chunked_parquet_stream
    from flink_join_scaling_spark.streaming.filters import stream_gopher_rules
    from flink_join_scaling_spark.streaming.harness import run_to_memory

    spark = streaming_spark
    batch = {
        r.doc_id: (r.n_rules_failed, r.keep)
        for r in QUERIES["q_gopher_rules"].fn(spark, SF_SMALL).collect()
    }
    kept_ids = {i for i, (_, k) in batch.items() if k}
    assert 0 < len(kept_ids) < len(batch), "gate must split the fixture"

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    sdf = chunked_parquet_stream(spark, docs, str(tmp_path / "chunks"), n_chunks=4)
    # drop mode: exactly the batch keep set survives
    got = run_to_memory(stream_gopher_rules(sdf), output_mode="append")
    assert {r.doc_id for r in got.select("doc_id").collect()} == kept_ids
    # quarantine mode: every row passes through with the batch booleans
    sdf2 = chunked_parquet_stream(spark, docs, str(tmp_path / "chunks2"), n_chunks=4)
    tagged = run_to_memory(
        stream_gopher_rules(sdf2, keep_rejected=True), output_mode="append"
    )
    got2 = {
        r.doc_id: (r.n_rules_failed, r.keep)
        for r in tagged.select("doc_id", "n_rules_failed", "keep").collect()
    }
    assert got2 == batch


def test_stream_lm_score_converged_equals_batch(streaming_spark, tmp_path):
    """Continuous LM quality scoring: converged per-doc scores equal
    the batch q_lm_score bit-for-bit when the stream replays the
    training corpus (no OOV), and an unseen-token doc takes the add-1
    path instead of vanishing."""
    from flink_join_scaling_spark.plans.registry import QUERIES
    from flink_join_scaling_spark.streaming import chunked_parquet_stream
    from flink_join_scaling_spark.streaming.filters import stream_lm_score
    from flink_join_scaling_spark.streaming.harness import converged

    spark = streaming_spark
    want = {
        r.doc_id: (r.n_tokens, r.lm_logprob)
        for r in QUERIES["q_lm_score"].fn(spark, SF_SMALL).collect()
    }
    d = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    words = d.select("doc_id", F.explode(tx.tokens_ws(F.col("text"))).alias("w"))
    tf = words.groupBy("w").agg(F.count("*").alias("tf")).localCheckpoint(True)
    total = tf.agg(F.sum("tf")).first()[0]

    s = chunked_parquet_stream(spark, d, str(tmp_path / "a"), n_chunks=4)
    em = collect_emissions(
        stream_lm_score(s, tf, int(total)), output_mode="update"
    )
    conv = converged(em, ["doc_id"])
    got = {
        int(r.doc_id): (int(r.n_tokens), r.lm_logprob)
        for _, r in conv.iterrows()
    }
    assert got == want

    # all-unseen doc: every token OOV → score = -ln(total) exactly
    import math

    alien = spark.createDataFrame(
        [(999_999, "zzqx vvwp qqrr")], "doc_id long, text string"
    )
    s2 = chunked_parquet_stream(spark, alien, str(tmp_path / "b"), n_chunks=1)
    em2 = collect_emissions(
        stream_lm_score(s2, tf, int(total)), output_mode="update"
    )
    row = em2.iloc[0]
    assert int(row.n_tokens) == 3
    assert row.lm_logprob == round(-math.log(float(total)), 6)


def test_stream_dedup_winnow_matches_batch(streaming_spark, tmp_path):
    """Continuous winnowing: converged per-pair emission counts equal
    the batch pair join's n_shared (one emission per shared
    fingerprint, any arrival order), with both caps lifted so neither
    side truncates. The Python-hashlib fingerprinter must agree with
    the batch window-function form byte-for-byte — this test IS that
    assertion."""
    from collections import Counter

    from flink_join_scaling_spark.operators import dedup as dd
    from flink_join_scaling_spark.streaming import chunked_parquet_stream
    from flink_join_scaling_spark.streaming.dedup import stream_dedup_winnow
    from flink_join_scaling_spark.streaming.harness import run_to_memory

    spark = streaming_spark
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    batch = {
        (r.id_a, r.id_b): r.n_shared
        for r in dd.winnow_dedup_pairs(
            docs, "doc_id", "text", min_shared=1, max_df=1 << 30
        ).collect()
    }
    assert batch, "fixture must produce winnow pairs"

    sdf = chunked_parquet_stream(spark, docs, str(tmp_path), n_chunks=4)
    em = run_to_memory(
        stream_dedup_winnow(sdf, "doc_id", "text", max_bucket=1 << 20),
        output_mode="update",
    )
    got = Counter((r.id_a, r.id_b) for r in em.collect())
    assert dict(got) == batch


def test_norm_tokens_py_matches_jvm_on_hostile_whitespace(streaming_spark):
    """The Python tokenizer twin (used by stream_dedup_winnow and
    stream_decontaminate) must reproduce the JVM
    ``regexp_replace(lower(trim(col)), '\\s+', ' ')`` + split EXACTLY
    on the inputs where Python's Unicode-aware defaults diverge:
    leading tabs/newlines (Spark trim strips spaces only → leading
    empty token), non-breaking and other Unicode whitespace (Java \\s
    is ASCII-only → they stay inside tokens). Divergence here silently
    shifts every downstream gram hash — the round-10 advisor finding."""
    from flink_join_scaling_spark.functions.text import tokens_ws
    from flink_join_scaling_spark.streaming.filters import _norm_tokens_py

    spark = streaming_spark
    nasty = [
        "\tleading tab",
        "\nleading newline\r",
        "  spaces  both  ends  ",
        "non\u00a0breaking\u00a0space",  # NBSP: token chars to Java \\s
        "ideographic\u3000space",
        "line\u2028sep\u2029para",
        "mixed \t\n inner \x0b\x0c runs",
        "UPPER Case MiX",
        "",
        "   ",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(nasty)], "i int, t string")
    jvm = {
        r.i: list(r.toks)
        for r in df.select("i", tokens_ws(F.col("t")).alias("toks")).collect()
    }
    for i, t in enumerate(nasty):
        assert _norm_tokens_py(t) == jvm[i], (i, t, _norm_tokens_py(t), jvm[i])


def test_stream_dsir_weights_converged_equals_batch(streaming_spark, tmp_path):
    """Continuous DSIR: converged per-doc weights equal the batch
    q_dsir_weights bit-for-bit — the bucket models ride stream-static
    joins and the weight expression is shared with the batch query."""
    from flink_join_scaling_spark.plans.registry import QUERIES
    from flink_join_scaling_spark.plans.select_q import _bucket_spark
    from flink_join_scaling_spark.streaming.filters import stream_dsir_weights
    from flink_join_scaling_spark.streaming.harness import converged

    spark = streaming_spark
    sf = SF_SMALL
    want = {
        r.doc_id: (r.n_toks, r.weight_e6)
        for r in QUERIES["q_dsir_weights"].fn(spark, sf).collect()
    }
    d = load_table(spark, sf, "documents")
    wb = d.select(
        "doc_id", "lang", F.explode(tx.tokens_ws(F.col("text"))).alias("w")
    ).select("doc_id", "lang", _bucket_spark("w").alias("b"))
    tcnt = (
        wb.where(F.col("lang") == "en")
        .groupBy("b").agg(F.count("*").cast("bigint").alias("ct"))
        .localCheckpoint(eager=True)
    )
    rcnt = wb.groupBy("b").agg(
        F.count("*").cast("bigint").alias("cr")
    ).localCheckpoint(eager=True)
    nt = wb.where(F.col("lang") == "en").count()
    nr = wb.count()
    s = chunked_parquet_stream(
        spark, d.select("doc_id", "text"), str(tmp_path), n_chunks=4
    )
    em = collect_emissions(
        stream_dsir_weights(s, tcnt, rcnt, nt, nr), output_mode="update"
    )
    conv = converged(em, ["doc_id"])
    got = {
        int(r.doc_id): (int(r.n_toks), int(r.weight_e6))
        for _, r in conv.iterrows()
    }
    assert got == want and len(want) > 0


def test_stream_trained_gate_then_route_composes(streaming_spark, tmp_path):
    """The trained pipeline's ingest half runs CONTINUOUSLY in one
    streaming query: the stateless classifier gate (inlined weights)
    filters arriving documents, and the NB router scores the survivors
    through the stream-static model join — one stateful operator total,
    so Spark accepts the composition. Converged (doc -> pred) equals
    the batch gate∩route of q_pipeline_trained's first two stages."""
    from flink_join_scaling_spark.operators import classifier as clf
    from flink_join_scaling_spark.operators import nb
    from flink_join_scaling_spark.plans.classifier_q import (
        _labeled_frame,
        _LR_ITERS,
        _LR_RATE,
    )
    from flink_join_scaling_spark.plans.select_q import (
        _NB_LANGS,
        _nb_pred_frame,
    )
    from flink_join_scaling_spark.streaming.filters import (
        stream_nb_lang,
        stream_quality_score,
    )
    from flink_join_scaling_spark.streaming.harness import converged

    spark = streaming_spark
    sf = SF_SMALL
    # batch-trained artifacts (the train-once half)
    lab = _labeled_frame(spark, sf)
    w = clf.train_lr(lab.select("y", *clf.FEATURES), _LR_ITERS, _LR_RATE)
    d = load_table(spark, sf, "documents")
    words = d.select(
        "doc_id", "lang", F.explode(tx.tokens_ws(F.col("text"))).alias("w")
    )
    model = nb.nb_model(words, _NB_LANGS).localCheckpoint(eager=True)
    totals = nb.nb_totals(words, _NB_LANGS).first().asDict()
    priors = nb.nb_priors(d, _NB_LANGS).first().asDict()

    # batch reference: gate then route (q_pipeline_trained stages 1-2)
    feats = clf.feature_columns(F.col("text"))
    gate_ids = {
        r.doc_id
        for r in d.select("doc_id", *[c.alias(n) for n, c in feats.items()])
        .where(clf.logit(w) >= 0)
        .collect()
    }
    want = {
        r.doc_id: r.pred_lang
        for r in _nb_pred_frame(spark, sf).collect()
        if r.doc_id in gate_ids
    }

    # the rule-based Gopher gate composes in front (the order real
    # pipelines run: cheap rules, then the trained gate, then routing)
    from flink_join_scaling_spark.operators.classifier import (
        gopher_rules_frame,
    )
    from flink_join_scaling_spark.streaming.filters import stream_gopher_rules

    gopher_ids = {
        r.doc_id
        for r in gopher_rules_frame(d.select("doc_id", "text"))
        .where(F.col("keep"))
        .select("doc_id")
        .collect()
    }
    want = {i: p for i, p in want.items() if i in gopher_ids}

    s = chunked_parquet_stream(
        spark, d.select("doc_id", "text"), str(tmp_path), n_chunks=3
    )
    pre = stream_gopher_rules(s).select("doc_id", "text")
    gated = stream_quality_score(pre, w).drop("logit")
    routed = stream_nb_lang(gated, model, totals, priors, _NB_LANGS)
    em = collect_emissions(routed, output_mode="update")
    conv = converged(em, ["doc_id"])
    got = {int(r.doc_id): r.pred_lang for _, r in conv.iterrows()}
    assert got == want and len(want) > 0


def test_stream_dsir_weights_scores_unseen_buckets(streaming_spark, tmp_path):
    """Train-once / score-forever regression: a streaming document whose
    tokens hash to buckets ABSENT from the batch-fitted models must
    still be scored, with each unseen bucket contributing ln(0+1)=0 on
    both model sides (add-1 OOV). Before the left-join fix an absent
    rcnt bucket silently DROPPED the token row — undercounting n_toks —
    and a document made only of unseen buckets vanished from the output
    entirely. The converged==batch test can't see this because it
    scores the training corpus itself."""
    import math

    from flink_join_scaling_spark.plans.select_q import _DSIR_B, _bucket_spark
    from flink_join_scaling_spark.streaming.filters import stream_dsir_weights
    from flink_join_scaling_spark.streaming.harness import converged

    spark = streaming_spark
    # batch-fitted models over a 2-doc corpus: en "aaa aaa", de "bbb".
    # Buckets: aaa=1479, bbb=38, foo=2267, bar=3353 (md5[:8] % 4096) —
    # foo/bar are unseen by BOTH models.
    train = spark.createDataFrame(
        [(1, "en", "aaa aaa"), (2, "de", "bbb")], "doc_id long, lang string, text string"
    )
    wb = train.select(
        "doc_id", "lang", F.explode(tx.tokens_ws(F.col("text"))).alias("w")
    ).select("doc_id", "lang", _bucket_spark("w").alias("b"))
    tcnt = (
        wb.where(F.col("lang") == "en")
        .groupBy("b").agg(F.count("*").cast("bigint").alias("ct"))
        .localCheckpoint(eager=True)
    )
    rcnt = wb.groupBy("b").agg(
        F.count("*").cast("bigint").alias("cr")
    ).localCheckpoint(eager=True)
    nt, nr = 2, 3

    new = spark.createDataFrame(
        [(10, "foo bar"), (11, "aaa foo")], "doc_id long, text string"
    )
    s = chunked_parquet_stream(spark, new, str(tmp_path), n_chunks=1)
    em = collect_emissions(
        stream_dsir_weights(s, tcnt, rcnt, nt, nr), output_mode="update"
    )
    conv = converged(em, ["doc_id"])
    got = {
        int(r.doc_id): (int(r.n_toks), int(r.weight_e6))
        for _, r in conv.iterrows()
    }

    def w_e6(a_t, a_r, n):
        v = (
            sum(math.log(x + 1.0) for x in a_t)
            - sum(math.log(x + 1.0) for x in a_r)
            + n * (math.log(nr + _DSIR_B) - math.log(nt + _DSIR_B))
        ) * 1e6
        return int(math.copysign(math.floor(abs(v) + 0.5), v))

    # doc 10: both tokens unseen by both models; doc 11: one seen
    # (ct=2, cr=2), one unseen — n_toks counts ALL tokens either way
    assert got == {
        10: (2, w_e6([0, 0], [0, 0], 2)),
        11: (2, w_e6([0, 2], [0, 2], 2)),
    }


def test_stream_dedup_phash_matches_batch(streaming_spark, tmp_path):
    """Continuous image near-dup detection: converged verified pair
    set equals batch phash_dedup_pairs on the same images (cap lifted)
    — real PNG decode + dHash on arrival, band-membership state, and
    the 64-bit XOR mask (dHash uses the sign bit; an unmasked Python
    popcount of a negative xor would be wrong — this test plants pairs
    whose hashes exercise that path)."""
    from flink_join_scaling_spark.operators import dedup as dd
    from flink_join_scaling_spark.operators import multimodal as mmod
    from flink_join_scaling_spark.streaming import chunked_parquet_stream
    from flink_join_scaling_spark.streaming.dedup import stream_dedup_phash
    from flink_join_scaling_spark.streaming.harness import run_to_memory

    spark = streaming_spark
    ids = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    imgs = mmod.attach_synth_png(ids, "doc_id")
    batch = {
        (r.id_a, r.id_b, r.hamming)
        for r in dd.phash_dedup_pairs(imgs, "doc_id", max_hamming=3).collect()
    }
    assert len(batch) >= 12, "fixture must produce the planted pairs"

    sdf = chunked_parquet_stream(spark, imgs, str(tmp_path / "chunks"), n_chunks=4)
    em = run_to_memory(
        stream_dedup_phash(sdf, "doc_id", max_bucket=1 << 20),
        output_mode="update",
    )
    got = {(r.id_a, r.id_b, r.hamming) for r in em.collect()}
    assert got == batch


def test_stream_dedup_phash_mixed_codecs_matches_batch(streaming_spark, tmp_path):
    """Cross-CODEC continuous image dedup: the mixed fixture encodes
    every planted near-duplicate pair as one PNG and one baseline
    JPEG, so each streaming match REQUIRES the arriving JPEG to decode
    (real Huffman entropy decode on arrival) and band-collide with the
    PNG already in state — the re-hosted-image scenario, continuously.
    Converged pair set equals the batch pipeline's on the same mixed
    payloads (cap lifted)."""
    from flink_join_scaling_spark.operators import dedup as dd
    from flink_join_scaling_spark.operators import multimodal as mmod
    from flink_join_scaling_spark.streaming import chunked_parquet_stream
    from flink_join_scaling_spark.streaming.dedup import stream_dedup_phash
    from flink_join_scaling_spark.streaming.harness import run_to_memory

    spark = streaming_spark
    ids = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    imgs = mmod.attach_synth_mixed(ids, "doc_id")
    batch = {
        (r.id_a, r.id_b, r.hamming)
        for r in dd.phash_dedup_pairs(imgs, "doc_id", max_hamming=3).collect()
    }
    assert batch and all(
        a % 2 == 0 and b == a + 1 for a, b, _h in batch
    ), "every planted pair must straddle the PNG/JPEG boundary"

    sdf = chunked_parquet_stream(spark, imgs, str(tmp_path / "chunks"), n_chunks=4)
    em = run_to_memory(
        stream_dedup_phash(sdf, "doc_id", max_bucket=1 << 20),
        output_mode="update",
    )
    got = {(r.id_a, r.id_b, r.hamming) for r in em.collect()}
    assert got == batch


def test_stream_dedup_phash_progressive_codings_matches_batch(
    streaming_spark, tmp_path
):
    """Cross-ENTROPY-CODING continuous image dedup (r13): the
    progressive fixture encodes every planted pair as one
    baseline-sequential and one PROGRESSIVE (SOF2) JPEG, so each
    streaming match requires the arriving progressive payload to run
    the real multi-scan refinement decode on arrival and band-collide
    with the baseline sibling already in state. Converged pair set
    equals the batch pipeline's on the same payloads (cap lifted)."""
    from flink_join_scaling_spark.operators import dedup as dd
    from flink_join_scaling_spark.operators import multimodal as mmod
    from flink_join_scaling_spark.streaming import chunked_parquet_stream
    from flink_join_scaling_spark.streaming.dedup import stream_dedup_phash
    from flink_join_scaling_spark.streaming.harness import run_to_memory

    spark = streaming_spark
    ids = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    imgs = mmod.attach_synth_progressive(ids, "doc_id")
    batch = {
        (r.id_a, r.id_b, r.hamming)
        for r in dd.phash_dedup_pairs(imgs, "doc_id", max_hamming=3).collect()
    }
    assert batch and all(
        a % 2 == 0 and b == a + 1 for a, b, _h in batch
    ), "every planted pair must straddle the baseline/progressive boundary"

    sdf = chunked_parquet_stream(spark, imgs, str(tmp_path / "chunks"), n_chunks=4)
    em = run_to_memory(
        stream_dedup_phash(sdf, "doc_id", max_bucket=1 << 20),
        output_mode="update",
    )
    got = {(r.id_a, r.id_b, r.hamming) for r in em.collect()}
    assert got == batch


def test_stream_dedup_audiohash_matches_batch(streaming_spark, tmp_path):
    """Continuous audio near-dup detection: converged verified pair
    set equals batch audiohash_dedup_pairs on the same WAV payloads
    (cap lifted) — real decode + envelope hash on arrival, shared
    band-membership state, 64-bit XOR mask."""
    from flink_join_scaling_spark.operators import dedup as dd
    from flink_join_scaling_spark.operators import multimodal as mmod
    from flink_join_scaling_spark.streaming import chunked_parquet_stream
    from flink_join_scaling_spark.streaming.dedup import stream_dedup_audiohash
    from flink_join_scaling_spark.streaming.harness import run_to_memory

    spark = streaming_spark
    ids = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    auds = mmod.attach_synth_wav(ids, "doc_id")
    batch = {
        (r.id_a, r.id_b, r.hamming)
        for r in dd.audiohash_dedup_pairs(auds, "doc_id", max_hamming=3).collect()
    }
    assert len(batch) >= 12

    sdf = chunked_parquet_stream(spark, auds, str(tmp_path / "chunks"), n_chunks=4)
    em = run_to_memory(
        stream_dedup_audiohash(sdf, "doc_id", max_bucket=1 << 20),
        output_mode="update",
    )
    got = {(r.id_a, r.id_b, r.hamming) for r in em.collect()}
    assert got == batch


def test_stream_dedup_frames_matches_batch(streaming_spark, tmp_path):
    """Continuous FRAME-level near-dup detection over animated
    containers: converged verified pair set equals the batch
    hash64_band_pairs over the same frame hashes (cap lifted) — each
    arriving APNG decoded once, all frames hashed from one walk,
    composite node ids in the shared band-membership state."""
    from flink_join_scaling_spark.operators import dedup as dd
    from flink_join_scaling_spark.operators import multimodal as mmod
    from flink_join_scaling_spark.streaming import chunked_parquet_stream
    from flink_join_scaling_spark.streaming.dedup import stream_dedup_frames
    from flink_join_scaling_spark.streaming.harness import run_to_memory

    spark = streaming_spark
    ids = spark.range(0, 16).select(F.col("id").alias("doc_id"))
    anims = mmod.attach_synth_apng_group(ids, "doc_id")
    fh = mmod.apng_frame_hashes(anims, "doc_id").localCheckpoint(eager=True)
    batch = {
        (r.id_a, r.id_b, r.hamming)
        for r in dd.hash64_band_pairs(
            fh.select("node", "fhash"), "node", "fhash", max_hamming=3
        ).collect()
    }
    assert len(batch) >= 16, "fixture must produce the planted frame pairs"

    sdf = chunked_parquet_stream(spark, anims, str(tmp_path / "chunks"), n_chunks=4)
    em = run_to_memory(
        stream_dedup_frames(sdf, "doc_id", max_bucket=1 << 20),
        output_mode="update",
    )
    got = {(r.id_a, r.id_b, r.hamming) for r in em.collect()}
    assert got == batch


def _sem_fixture(spark):
    """Three well-separated embedding clusters (orthogonal axes, small
    in-cluster perturbations): every within-cluster pair's e6 cosine
    clears 850000, every cross-cluster cosine is ~0."""
    rows = []
    for g in range(3):
        for j in range(4):
            v = [0.0] * 6
            v[g * 2] = 1.0
            v[g * 2 + 1] = 0.02 * j
            rows.append((g * 10 + j, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = []
    for g in range(3):
        c = [0.0] * 6
        c[g * 2] = 1.0
        cents.append(c)
    return df, cents


def test_stream_dedup_semantic_matches_exact(streaming_spark, tmp_path):
    """Continuous embedding near-dup detection: the converged verified
    pair set equals the exact quadratic reference generator at BOTH
    documented equivalence points — nprobe=1 (clusters aligned to the
    fixed centroids, so home-cell routing loses nothing) and the
    exhaustive nprobe=len(centroids) — including the e6 cosine values
    (the stream scores with the same round_half_away integers as the
    batch Arrow scorer)."""
    from flink_join_scaling_spark.operators.dedup import (
        embedding_dedup_pairs_exact,
    )
    from flink_join_scaling_spark.streaming import chunked_parquet_stream
    from flink_join_scaling_spark.streaming.dedup import stream_dedup_semantic
    from flink_join_scaling_spark.streaming.harness import run_to_memory

    spark = streaming_spark
    df, cents = _sem_fixture(spark)
    batch = {
        (r.id_a, r.id_b, r.cosine_e6)
        for r in embedding_dedup_pairs_exact(
            df, "vec_id", "embedding", threshold=0.85, emit_e6=True
        ).collect()
    }
    assert len(batch) == 3 * 6  # C(4,2) per cluster

    for nprobe in (1, 3):
        sdf = chunked_parquet_stream(
            spark, df, str(tmp_path / f"chunks{nprobe}"), n_chunks=3
        )
        em = run_to_memory(
            stream_dedup_semantic(
                sdf, "vec_id", "embedding", cents, nprobe=nprobe
            ),
            output_mode="update",
        )
        got = {(r.id_a, r.id_b, r.cosine_e6) for r in em.collect()}
        assert got == batch, f"nprobe={nprobe}"
