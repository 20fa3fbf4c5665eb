"""Text-analysis column builders for the training-data pipeline surface.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM,
whole-stage codegen) — no Python UDFs. Every builder has an exact
DuckDB-SQL twin used by the oracle queries in ``plans/llmdata.py``;
where an engine-specific primitive would diverge (hash functions,
regex flavors) we restrict to the common deterministic subset
(md5 hex strings, character classes valid in both Java regex and RE2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
#: Valid and identical in Java regex (Spark) and DuckDB's RE2.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Language-marker stopwords (tiny deterministic language-ID heuristic).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "a", "is"),
    "es": ("el", "la", "de", "que", "y", "los", "es"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein"),
    "fr": ("le", "la", "et", "les", "des", "est", "une"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3"),
}

_PUNCT_CLASS = r"[.,!?;:]"


def norm_text(col: Column) -> Column:
    """lower + trim + collapse whitespace — the canonical form used by
    exact dedup and shingling."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def tokens_ws(col: Column) -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(norm_text(col), " ")


def tokens_bpe_ish(col: Column) -> Column:
    """BPE-style pre-tokenization via regexp_extract_all."""
    return F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0)


def exploded_shingles(df, id_col: str, text_col: str, n: int = 3,
                      widen: bool = True):
    """(id, shingle) rows — distinct word n-grams per document.

    JVM-side higher-order functions (transform over sequence, 0-based
    lambda indexing); empty array (no rows) when < n tokens.

    The input is widened first (r17): tokenize+shingle+explode is a
    compute-heavy map stage, and a small parquet file scans as one
    split — widen_if_narrow spreads it across cores at bench/test
    scale and is a no-op on a real multi-split scan (or when the
    caller already widened, or on a streaming frame). Callers whose
    frame is BENCHMARK-sized and destined for a broadcast/collect
    pass ``widen=False``: repartitioning an eval-suite-sized side
    only delays the broadcast build behind an extra shuffle
    (measured r17: q_decontaminate 0.78 → 1.13 s from widening the
    2%-slice bench side; the corpus side's widening is the win).
    """
    df = df.select(F.col(id_col), F.col(text_col))
    if widen:
        from flink_join_scaling_spark.partitioning import widen_if_narrow

        df = widen_if_narrow(df)
    with_toks = df.select(F.col(id_col), tokens_ws(F.col(text_col)).alias("__shingle_toks"))
    return with_toks.select(
        F.col(id_col), F.explode(shingles_from_tokens("__shingle_toks", n)).alias("shingle")
    )


def shingles_from_tokens(tok_col: str, n: int = 3) -> Column:
    gram = "concat(" + ", ' ', ".join([f"{tok_col}[i + {d}]" for d in range(n)]) + ")"
    return F.expr(
        f"CASE WHEN size({tok_col}) >= {n} "
        f"THEN array_distinct(transform(sequence(0, size({tok_col}) - {n}), i -> {gram})) "
        f"ELSE array() END"
    )


def n_tokens_ws(col: Column) -> Column:
    return F.size(tokens_ws(col)).cast("bigint")


def n_tokens_bpe_ish(col: Column) -> Column:
    return F.size(tokens_bpe_ish(col)).cast("bigint")


def punct_count(col: Column) -> Column:
    return (F.length(col) - F.length(F.regexp_replace(col, _PUNCT_CLASS, ""))).cast("bigint")


def lang_scores(col: Column) -> dict[str, Column]:
    """Marker-stopword hit count per language over whitespace tokens."""
    toks = tokens_ws(col)

    def member_of(markers: tuple[str, ...]):
        # NB: the lambda must be unary — pyspark binds a second
        # parameter to the array index
        return lambda x: x.isin(*markers)

    return {
        lang: F.size(F.filter(toks, member_of(markers))).cast("bigint")
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: Column) -> Column:
    """argmax language with deterministic priority order on ties
    (en > es > de > fr > zh), 'und' when no marker hits at all."""
    scores = lang_scores(col)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[scores[lang] for lang in langs])
    out = F.lit("und")
    for lang in reversed(langs):
        out = F.when(scores[lang] == best, lang).otherwise(out)
    return F.when(best == 0, "und").otherwise(out)


def quality_score_raw(col: Column) -> Column:
    """Unrounded quality heuristic. The raw double is bit-identical
    across engines (pure IEEE +,*,/ and min/max in a fixed order), so
    ORDERING by it is engine-stable; only the decimal display rounding
    of :func:`quality_score` carries a cross-engine midpoint risk —
    rank on this, display via round or an e4 integer quantization."""
    n_chars = F.length(col).cast("double")
    toks = tokens_ws(col)
    n_toks = F.greatest(F.size(toks).cast("double"), F.lit(1.0))
    mean_wlen = n_chars / n_toks
    stop_ratio = lang_scores(col)["en"].cast("double") / n_toks
    punct_ratio = punct_count(col).cast("double") / F.greatest(n_chars, F.lit(1.0))
    len_term = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    wlen_term = F.when((mean_wlen >= 3.0) & (mean_wlen <= 10.0), 1.0).otherwise(0.5)
    stop_term = F.least(stop_ratio * 5.0, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio * 10.0, F.lit(1.0))
    return 0.3 * len_term + 0.2 * wlen_term + 0.3 * stop_term + 0.2 * punct_term


def quality_score(col: Column) -> Column:
    """Deterministic [0,1]-ish quality heuristic: favors moderate
    length, real word lengths, some stopwords, low punctuation noise."""
    return F.round(quality_score_raw(col), 4)


#: modulus for the rolling fingerprint (fits comfortably in int64 sums)
FP_MOD = 1_000_000_007


def token_value(tok: Column) -> Column:
    """Deterministic small int per token, computable identically in
    DuckDB: length * 131 + ascii(first char)."""
    return (F.length(tok) * 131 + F.ascii(F.substring(tok, 1, 1))).cast("bigint")


def chunk_spans(tok_col: str | Column, size: int, stride: int) -> Column:
    """Array of [start, len] spans covering the token array with
    windows of ``size`` every ``stride`` tokens (the canonical
    training-data chunking op). Pure JVM array expressions — no UDF.

    Spans start at 0, stride apart, while start < n_tokens; the last
    span is truncated (never empty)."""
    toks = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    return F.filter(
        F.transform(
            starts, lambda s: F.array(s, F.least(F.lit(size), n - s))
        ),
        lambda span: span[1] > 0,
    )


def chunk_text(df, id_col: str, text_col: str, size: int = 64, stride: int = 48):
    """Explode documents into overlapping token-window chunks:
    (id, chunk_idx, n_chunk_tokens, chunk_text). ``stride < size``
    gives overlap; narrow transform + explode, no shuffle."""
    toks = df.select(
        F.col(id_col), tokens_ws(F.col(text_col)).alias("__toks")
    ).withColumn("__spans", chunk_spans("__toks", size, stride))
    ex = toks.select(
        id_col, "__toks", F.posexplode("__spans").alias("chunk_idx", "span")
    )
    return ex.select(
        F.col(id_col),
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.col("span")[1].cast("bigint").alias("n_chunk_tokens"),
        F.array_join(
            F.slice(F.col("__toks"), F.col("span")[0] + 1, F.col("span")[1]), " "
        ).alias("chunk_text"),
    )


#: PII patterns for redaction — restricted to constructs valid and
#: identical in Java regex (Spark) and RE2 (DuckDB): character
#: classes, bounded repetition, word boundaries. Ordered dict → the
#: redaction pass applies them in this order.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_count(col: Column) -> Column:
    """Total PII matches across all patterns (bigint)."""
    total = F.lit(0).cast("bigint")
    for pat in PII_PATTERNS.values():
        total = total + F.regexp_count(col, F.lit(pat)).cast("bigint")
    return total


def redact_pii(col: Column) -> Column:
    """Replace every PII match with ``<PII:kind>``. Patterns apply in
    ``PII_PATTERNS`` order (email first, so the ipv4 rule can't eat a
    dotted mail host remnant)."""
    out = col
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<PII:{kind}>")
    return out
