"""Trained-BPE tokenizer: hand-checked merges, greedy-apply
semantics, and the count-without-materializing identity."""

from pyspark.sql import functions as F

from flink_join_scaling_spark.operators import bpe


def _words(spark, rows):
    df = spark.createDataFrame(rows, ["text"])
    return bpe.word_table(df, "text")


def test_train_hand_computed(spark):
    # corpus: "low" x3, "lower" x2  →  pair counts over chars:
    # (l,o)=5 (o,w)=5 → tie broken by a ASC: (l,o) first;
    # then (lo,w)=5; then (low,e)=2 (e,r)=2 → (e,r) first ((e<low)).
    rows = [("low low low",), ("lower lower",)]
    merges = bpe.train(_words(spark, rows), 4)
    assert [(a, b) for a, b, _ in merges] == [
        ("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er"),
    ]
    assert [c for _, _, c in merges] == [5, 5, 2, 2]


def test_train_stops_when_no_pairs(spark):
    # single-char words only → no adjacent pairs, zero merges
    merges = bpe.train(_words(spark, [("a b c a",)]), 3)
    assert merges == []


def test_apply_greedy_overlap(spark):
    # merge (a,a) over 'aaa' must give [aa, a] (left-to-right greedy),
    # and the merged symbol participates in later merges
    df = spark.createDataFrame([("aaa",)], ["w"])
    out = df.select(
        bpe.apply_merges(bpe.char_state(F.col("w")), [("a", "a", 0)]).alias("s")
    ).first()
    assert out.s == " aa  a "


def test_doc_state_boundary_blocks_merges(spark):
    # "ab" + "ba" pre-tokens: merge (b,a) must NOT fire across the
    # pre-token boundary
    df = spark.createDataFrame([("ab ba",)], ["t"])
    out = df.select(
        bpe.apply_merges(bpe.doc_state(F.col("t")), [("b", "a", 0)]).alias("s")
    ).first()
    assert out.s == " a  b | ba "


def test_token_count_matches_materialized_tokens(spark):
    # identity check: n_bpe_tokens == count of actual tokens when the
    # state is split out, across mixed letter/digit/punct docs
    rows = [
        ("the cat, the hat 42",),
        ("",),
        ("12345 !!",),
        ("aaa aaa bbb",),
    ]
    df = spark.createDataFrame(rows, ["text"])
    merges = bpe.train(bpe.word_table(df, "text"), 3)
    n_pre, n_bpe = bpe.token_count(F.col("text"), merges)
    state = bpe.apply_merges(bpe.doc_state(F.col("text")), merges)
    # materialize: split state on '|' then each piece on '  '
    letter_toks = F.when(F.length(state) == 0, F.lit(0)).otherwise(
        F.aggregate(
            F.split(state, r"\|"),
            F.lit(0),
            lambda acc, piece: acc + F.size(F.split(F.trim(piece), "  ")),
        )
    )
    import flink_join_scaling_spark.functions.text as tx

    n_other = F.size(tx.tokens_bpe_ish(F.col("text"))) - F.size(
        F.filter(tx.tokens_bpe_ish(F.col("text")), lambda w: w.rlike(bpe.LETTER_RUN))
    )
    got = df.select(
        n_pre.alias("n_pre"),
        n_bpe.alias("n_bpe"),
        (letter_toks + n_other).cast("bigint").alias("n_mat"),
    ).collect()
    for r in got:
        assert r.n_bpe == r.n_mat, r


def test_fused_trainer_matches_distributed(spark):
    # the r17 size-adaptive fused trainer (all rounds in one Arrow
    # task) must reproduce the distributed per-round loop's exact
    # trajectory — merges, tie-breaks, and selection-time counts —
    # including overlap-heavy and tie-heavy corpora
    corpora = [
        ["low low low", "lower lower"],
        ["aaa aaaa aa a", "banana bandana"],
        ["the cat the hat", "xyzzy xyzzy plugh", "ababab ba ab"],
    ]
    for rows in corpora:
        wt = _words(spark, [(t,) for t in rows]).localCheckpoint(eager=True)
        fused = bpe._train_fused(wt, 6)
        # force the distributed loop by making the fused gate fail
        orig = bpe._FUSED_VOCAB_MAX
        bpe._FUSED_VOCAB_MAX = -1
        try:
            dist = bpe.train(wt, 6)
        finally:
            bpe._FUSED_VOCAB_MAX = orig
        assert fused == dist, (rows, fused, dist)


def test_merged_tokens_reconstruct_words(spark):
    # applying merges never loses characters: joining a word's final
    # symbols reproduces the word
    df = spark.createDataFrame([("tokenize tokens token",)], ["text"])
    wt = bpe.word_table(df, "text")
    merges = bpe.train(wt, 5)
    final = wt.select(
        "word",
        F.array_join(
            F.split(F.trim(bpe.apply_merges(F.col("state"), merges)), "  "), ""
        ).alias("rejoined"),
    ).collect()
    assert all(r.word == r.rejoined for r in final)
