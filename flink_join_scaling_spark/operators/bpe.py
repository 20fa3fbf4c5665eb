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
    from flink_join_scaling_spark.partitioning import widen_if_narrow

    # the regexp pre-tokenize + explode is the pass's map cost; widen a
    # single-split scan so it parallelizes (no-op at real scale)
    df = widen_if_narrow(df.select(F.col(text_col)))
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

#: vocabulary-size ceiling for the FUSED single-task trainer: below
#: this, all merge rounds run inside one Arrow task over the gathered
#: word table (one Spark job) instead of one aggregation job per
#: round. The same runtime size-based call as connected_components'
#: driver union-find — the word table is vocabulary-bounded (~1e6
#: distinct letter-run words for real corpora), so this is the common
#: case; a truly huge vocabulary falls back to the distributed loop.
_FUSED_VOCAB_MAX = 2_000_000


def _train_merges_py(
    vocab: list[tuple[int, list[str]]], num_merges: int
) -> list[tuple[str, str, int]]:
    """The merge loop on a gathered (wc, symbols) word table — EXACTLY
    the distributed rounds' semantics, in one process:

    - pair counts: every adjacent symbol position counts (overlapping
      occurrences included), weighted by wc — the same enumeration as
      ``adjacent_pairs``; exact ints, so accumulation order is moot;
    - argmax: (count DESC, a ASC, b ASC); symbols are lowercase-ASCII
      (``LETTER_RUN`` + lower), where Python/Java/UTF-8 string orders
      coincide;
    - merge: left-to-right non-overlapping — the module-docstring
      argument for why the ``' a  b ' → ' ab '`` string replace has
      these semantics applies verbatim to this token-list scan.

    Counts are maintained incrementally (classic BPE trainer): one full
    pass builds the pair table, each merge re-counts only the words
    that contain the merged pair (tracked in an occurrence index).
    """
    from collections import defaultdict

    counts: dict[tuple[str, str], int] = defaultdict(int)
    occ: dict[tuple[str, str], set[int]] = defaultdict(set)
    for idx, (wc, syms) in enumerate(vocab):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] += wc
            occ[p].add(idx)
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        best_key = None
        best_pair = None
        for p, c in counts.items():
            if c <= 0:
                continue
            key = (-c, p[0], p[1])
            if best_key is None or key < best_key:
                best_key, best_pair = key, p
        if best_pair is None:
            break
        a, b = best_pair
        merges.append((a, b, counts[best_pair]))
        ab = a + b
        # occ entries can be stale (a word may have lost the pair in an
        # earlier merge); the no-change scan below just skips those
        for idx in sorted(occ.get(best_pair, ())):
            wc, syms = vocab[idx]
            m = len(syms)
            out: list[str] = []
            j = 0
            changed = False
            while j < m:
                if j < m - 1 and syms[j] == a and syms[j + 1] == b:
                    out.append(ab)
                    j += 2
                    changed = True
                else:
                    out.append(syms[j])
                    j += 1
            if not changed:
                continue
            for i in range(m - 1):
                counts[(syms[i], syms[i + 1])] -= wc
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                counts[p] += wc
                occ[p].add(idx)
            vocab[idx] = (wc, out)
    return merges


def _train_fused(words: DataFrame, num_merges: int) -> list[tuple[str, str, int]]:
    """All merge rounds in ONE Spark job: gather the (vocab-bounded)
    word table onto a single task, run :func:`_train_merges_py`, emit
    the ≤ ``num_merges``-row merge table. Only the merge list reaches
    the driver — the same bounded artifact the per-round loop collects
    one row at a time."""
    import pandas as pd

    def run(batches):
        vocab: list[tuple[int, list[str]]] = []
        for pdf in batches:
            for wc, state in zip(pdf["wc"], pdf["state"]):
                vocab.append((int(wc), state.split()))
        merges = _train_merges_py(vocab, num_merges)
        yield pd.DataFrame(
            {
                "merge_rank": pd.Series(
                    range(1, len(merges) + 1), dtype="int64"
                ),
                "a": pd.Series([m[0] for m in merges], dtype="object"),
                "b": pd.Series([m[1] for m in merges], dtype="object"),
                "cnt": pd.Series([m[2] for m in merges], dtype="int64"),
            }
        )

    rows = (
        words.select("wc", "state")
        .coalesce(1)
        .mapInPandas(run, "merge_rank bigint, a string, b string, cnt bigint")
        .collect()
    )
    rows.sort(key=lambda r: r["merge_rank"])
    return [(r["a"], r["b"], int(r["cnt"])) for r in rows]


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
    # size-adaptive (r17): a vocabulary that fits one task trains FUSED
    # — every round inside one Arrow job — instead of one aggregation
    # job (plus plan build) per round; identical trajectory by the
    # _train_merges_py equivalence argument, differentially tested in
    # tests/test_bpe.py
    if cur.count() <= _FUSED_VOCAB_MAX:
        return _train_fused(cur, num_merges)
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
