"""Trained byte-pair-encoding tokenizer: distributed train + apply.

Beyond-reference operator (the reference repo has no text surface;
its data model stops at ``(t, id, v)`` joins — see
``versionDeduplicator.scala:1``); this is part of the engine's
training-data-pipeline extension alongside ``functions/text.py``'s
BPE-ish *pre*-tokenizer.

Representation: each word's tokenization state is the string
``' s1  s2  ...  sk '`` — symbols joined by TWO spaces, padded with
one space on each side. Applying merge ``(a, b)`` is then the plain
(non-regex) string replace ``' a  b ' → ' ab '``:

- boundary-safe: a symbol can only match between separators, never
  inside a longer symbol (``' xa  b '`` does not contain ``' a  b '``);
- adjacent occurrences stay matchable: in ``' a  b  a  b '`` the two
  ``' a  b '`` matches don't share characters, so non-overlapping
  left-to-right replacement — the semantics of both Spark's
  ``replace`` and DuckDB's — merges both, which is exactly greedy BPE
  merge order (overlaps like ``(a,a)`` on ``[a,a,a]`` give
  ``[aa, a]`` in both engines and in reference BPE).

Scale shape (the reason BPE training is feasible at 100 TB): training
never iterates over the corpus. One corpus-sized shuffle builds the
distinct-word frequency table (vocabulary-bounded — ~1e6 rows no
matter the corpus size); every merge round is a narrow
transform + small keyed aggregation over THAT table, and only the
argmax pair (one row per round) is collected — the merge list is the
same driver-resident artifact every production BPE trainer produces.
Apply is map-only: the merge list broadcasts as ``num_merges`` chained
JVM ``replace`` expressions inside whole-stage codegen; the corpus
streams once with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_join_scaling_spark.functions import text as tx

#: train only over lowercased letter-run pre-tokens; digit/punct
#: pre-tokens pass through apply as single unmerged atoms.
LETTER_RUN = "^[A-Za-z]+$"


def char_state(col: Column) -> Column:
    """Initial BPE state of a word: characters as symbols —
    ``'ab' → ' a  b '`` (one global regexp_replace, JVM-side)."""
    return F.regexp_replace(col, "(.)", " $1 ")


def word_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, wc, state): distinct lowercased letter-run pre-tokens
    with corpus frequency — the ONLY corpus-sized pass in training."""
    w = (
        df.select(F.explode(tx.tokens_bpe_ish(F.col(text_col))).alias("w"))
        .where(F.col("w").rlike(LETTER_RUN))
        .select(F.lower("w").alias("word"))
    )
    return (
        w.groupBy("word")
        .agg(F.count("*").cast("bigint").alias("wc"))
        .withColumn("state", char_state(F.col("word")))
    )


def adjacent_pairs(state_col: Column) -> Column:
    """array<struct<a,b>> of adjacent symbol pairs in a state string.
    Narrow JVM expressions: split on the double-space separator, then
    transform over an index sequence (guarded for 1-symbol states,
    where ``sequence(0, -1)`` would count downward)."""
    syms = F.split(F.trim(state_col), "  ")
    pairs = F.transform(
        F.sequence(F.lit(0), F.size(syms) - 2),
        lambda i: F.struct(
            F.element_at(syms, i + 1).alias("a"),
            F.element_at(syms, i + 2).alias("b"),
        ),
    )
    return F.when(F.size(syms) >= 2, pairs).otherwise(
        F.array().cast("array<struct<a:string,b:string>>")
    )


def merge_expr(state_col: Column, a: str, b: str) -> Column:
    """One merge application: ``' a  b ' → ' ab '`` (literal replace)."""
    return F.replace(state_col, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))


#: merge rounds between localCheckpoint pins of the evolving word
#: table — caps plan depth (and per-round recompute) at this constant
#: instead of growing linearly with the merge count
_RECHECKPOINT_EVERY = 32


def train(words: DataFrame, num_merges: int) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges from a (word, wc, state) table.

    Each round: wc-weighted adjacent-pair counts (one small shuffle on
    the vocab table), argmax with the deterministic
    (count DESC, a ASC, b ASC) tiebreak, then a narrow replace. Only
    the single best row per round reaches the driver — the collected
    merge list is bounded by ``num_merges``, not by data size.

    ``cur`` is re-localCheckpointed every ``_RECHECKPOINT_EVERY``
    merges: without the pin, round r's aggregation re-executes r
    chained replace expressions over the checkpointed base — O(K²)
    expression work and ever-deeper plans, invisible at K=12 but fatal
    at real-tokenizer K (tens of thousands). The checkpoint is
    vocab-sized (the word table), so the pin costs one small
    materialization per window.
    """
    cur = words.localCheckpoint(eager=True)  # vocab-sized; pins lineage
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        if merges and len(merges) % _RECHECKPOINT_EVERY == 0:
            cur = cur.localCheckpoint(eager=True)
        pairs = cur.select(
            "wc", F.explode(adjacent_pairs(F.col("state"))).alias("p")
        )
        best = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("wc").cast("bigint").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((a, b, cnt))
        cur = cur.withColumn("state", merge_expr(F.col("state"), a, b))
    return merges


def apply_merges(state_col: Column, merges: list[tuple[str, str, int]]) -> Column:
    """Chain the learned merges over a state column — ``len(merges)``
    literal replaces, all inside whole-stage codegen (map-only)."""
    out = state_col
    for a, b, _cnt in merges:
        out = merge_expr(out, a, b)
    return out


def doc_state(text_col: Column) -> Column:
    """Whole-document initial state: each letter-run pre-token's char
    state, concatenated with ``'|'`` between pre-tokens. ``'|'`` never
    appears in a symbol and carries only single spaces around it, so
    merges cannot cross pre-token boundaries — the standard BPE
    pre-tokenization contract."""
    letters = F.filter(
        tx.tokens_bpe_ish(text_col), lambda w: w.rlike(LETTER_RUN)
    )
    return F.array_join(
        F.transform(letters, lambda w: char_state(F.lower(w))), "|"
    )


def token_count(
    text_col: Column, merges: list[tuple[str, str, int]]
) -> tuple[Column, Column]:
    """(n_pretokens, n_bpe_tokens) under the trained tokenizer.

    Token counting without materializing token arrays: within a
    pre-token of m symbols the state holds m-1 double-space
    separators, and the ``'|'`` boundaries hold none, so
    letter-token total = (#double-spaces) + (#letter pre-tokens).
    Non-letter pre-tokens count 1 atom each.
    """
    pre = tx.tokens_bpe_ish(text_col)
    letters = F.filter(pre, lambda w: w.rlike(LETTER_RUN))
    state = apply_merges(doc_state(text_col), merges)
    n_pre = F.size(pre).cast("bigint")
    n_letters = F.size(letters)
    dspaces = F.length(state) - F.length(
        F.replace(state, F.lit("  "), F.lit(" "))
    )
    n_letter_tok = F.when(n_letters == 0, F.lit(0)).otherwise(
        dspaces + n_letters
    )
    n_bpe = (n_letter_tok + (F.size(pre) - n_letters)).cast("bigint")
    return n_pre, n_bpe
