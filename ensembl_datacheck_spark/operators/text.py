"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All expressed with built-in `pyspark.sql.functions` (JVM, codegen) so the
hot path has zero Python; formulas use integer counts + one final
division, making them exactly reproducible in an ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------


def word_count(col: Column) -> Column:
    """size(split on whitespace) — the simple exact count."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish token estimate: count of `\\w+|[^\\w\\s]` matches (words +
    standalone punctuation) — the standard regex pre-tokenizer shape."""
    return F.size(F.regexp_extract_all(col, F.lit(r"\w+|[^\w\s]"), 0))


# ---------------------------------------------------------------------------
# language ID (stopword n-gram heuristic)
# ---------------------------------------------------------------------------

STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "dans", "une", "pour"],
    "es": ["el", "la", "que", "los", "del", "las", "por", "con", "una", "para"],
}


def stopword_hits(col: Column, stopwords: list[str]) -> Column:
    """Number of words in the text that are in the stopword list —
    array_intersect-free exact count via filter over the word array."""
    ws = F.split(F.lower(F.trim(col)), r"\s+")
    sw = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(ws, lambda w: F.array_contains(sw, w)))


def lang_id(col: Column, langs: dict[str, list[str]] | None = None) -> Column:
    """Predicted language = argmax stopword-hit count; 'und' (undetermined)
    when no list scores > 0.  Deterministic tie-break: language name order."""
    langs = langs or STOPWORDS
    pairs = [(lang, stopword_hits(col, sws)) for lang, sws in sorted(langs.items())]
    best = F.greatest(*[p[1] for p in pairs]) if len(pairs) > 1 else pairs[0][1]
    expr = F.lit("und")
    for lang, score in reversed(pairs):  # earlier langs win ties
        expr = F.when((score == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Attach integer quality features: n_chars, n_words, n_alpha,
    n_digit, n_punct, n_stopword_en, mean_word_len — all exact counts."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(c, r"[^!-/:-@\[-`{-~]", ""))
    return (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_words", word_count(c))
        .withColumn("n_alpha", n_alpha)
        .withColumn("n_digit", n_digit)
        .withColumn("n_punct", n_punct)
        .withColumn("n_stopword_en", stopword_hits(c, STOPWORDS["en"]))
    )


def quality_score(df: DataFrame, text_col: str) -> DataFrame:
    """Composite quality score in [0,1]: alpha ratio × length factor ×
    stopword presence — the shape of standard heuristic quality filters
    (length / punctuation / stopword ratios)."""
    feat = quality_features(df, text_col)
    alpha_ratio = F.col("n_alpha") / F.greatest(F.col("n_chars"), F.lit(1))
    punct_ratio = F.col("n_punct") / F.greatest(F.col("n_chars"), F.lit(1))
    stop_ratio = F.col("n_stopword_en") / F.greatest(F.col("n_words"), F.lit(1))
    length_factor = F.least(F.col("n_words") / F.lit(20.0), F.lit(1.0))
    score = (
        alpha_ratio * F.lit(0.4)
        + (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0))) * F.lit(0.2)
        + F.least(stop_ratio * 5, F.lit(1.0)) * F.lit(0.2)
        + length_factor * F.lit(0.2)
    )
    return feat.withColumn("quality_score", score)


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------

_FP_MOD = (1 << 31) - 1  # Mersenne prime: acc*BASE stays in int64
_FP_BASE = 1000003


def content_fingerprint(col: Column) -> Column:
    """md5 content digest (exact-dup key)."""
    return F.md5(col)


def rolling_fingerprint(col: Column) -> Column:
    """Order-sensitive polynomial rolling hash over words, computed
    JVM-side with `aggregate`: acc = (acc*BASE + hash(word)) mod 2^31-1.
    Detects reordered content that md5 of the raw text would miss only
    via whitespace normalization (hash is over normalized words)."""
    ws = F.split(F.lower(F.trim(col)), r"\s+")
    return F.aggregate(
        ws,
        F.lit(0).cast("long"),
        lambda acc, w: F.pmod(
            acc * F.lit(_FP_BASE) + F.pmod(F.xxhash64(w), F.lit(_FP_MOD)),
            F.lit(_FP_MOD),
        ),
    )


def fingerprint_documents(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    return df.select(
        F.col(id_col),
        content_fingerprint(F.col(text_col)).alias("md5"),
        rolling_fingerprint(F.col(text_col)).alias("rolling_fp"),
    )


def portable_rolling_fingerprint(col: Column) -> Column:
    """Order-sensitive polynomial rolling hash over lowercased words whose
    per-word hash is md5-derived (first 8 hex digits as an integer), so the
    identical value is computable in any engine with md5 — used for
    cross-engine content-fingerprint reconciliation (the reference compares
    checksums across databases, SequenceChecksum.pm:46-148):

        acc = (acc * 1000003 + int(md5(word)[:8], 16)) mod (2^31 - 1)
    """
    ws = F.split(F.lower(F.trim(col)), r"\s+")
    word_hash = lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long")
    return F.aggregate(
        ws,
        F.lit(0).cast("long"),
        lambda acc, w: F.pmod(
            acc * F.lit(_FP_BASE) + word_hash(w), F.lit(_FP_MOD)
        ),
    )


def normalize_text(col):
    """Canonical text normalization for dedup/fingerprint pipelines:
    lowercase, trim, strip C0/DEL control characters, collapse runs of
    whitespace to one space.  Pure JVM regexp (codegen); the same two
    regexes run verbatim in DuckDB (with the 'g' flag) for oracle
    parity.  Unicode NFC normalization is deliberately NOT included —
    Spark has no built-in normalizer, and a Python UDF here would put
    interpreted code in front of every downstream shingle/hash
    operator; run ICU normalization upstream at ingest if required."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(F.lower(F.trim(c)), "[\\x00-\\x1f\\x7f]", "")
    return F.regexp_replace(stripped, "\\s+", " ")


# ---------------------------------------------------------------------------
# repetition signals (Gopher-style quality filters)
# ---------------------------------------------------------------------------


def repetition_signals(
    df: DataFrame, id_col: str, text_col: str, ngram: int = 2
) -> DataFrame:
    """Per-document repetition quality signals, the published repetition
    filter family of large-scale corpus curation (duplicate-line and
    top-/duplicated-n-gram fractions, cf. the Gopher/MassiveText rules):

    * ``n_lines`` — non-empty lines;
    * ``dup_line_frac`` — fraction of lines whose content occurs more
      than once in the document;
    * ``dup_line_char_frac`` — fraction of line characters inside those
      duplicated lines;
    * ``top_ngram_frac`` — fraction of word-``ngram`` characters covered
      by the single most frequent n-gram (ties: lexicographically
      largest, so the pick is deterministic);
    * ``dup_ngram_frac`` — fraction of n-gram characters inside n-grams
      occurring more than once.

    Documents whose text yields no lines / no n-grams get 0 counts and
    NULL fractions (0/0), preserved by the left joins so every input id
    stays present.

    Scale shape: two explode→count→combine pipelines (one per unit), each
    a pair of hash aggregations with map-side partial combine, keyed by
    (id, unit) then id — both uniform.  No self-joins, no window over the
    whole corpus, no Python.  The reference's kin is its per-row sweep
    checks; this is the corpus-hygiene extension of the same shape.
    """
    from ensembl_datacheck_spark.operators.dedup import word_ngrams_multiset

    ident = F.col(id_col).alias("__id")

    lines = df.select(
        ident, F.explode(F.split(F.col(text_col), "\n")).alias("line")
    ).filter(F.trim("line") != "")
    lc = lines.groupBy("__id", "line").agg(F.count(F.lit(1)).alias("cnt"))
    # try_divide: a document with zero qualifying units yields NULL
    # fractions (0/0) instead of an ANSI-mode divide error
    line_agg = lc.groupBy("__id").agg(
        F.sum("cnt").cast("bigint").alias("n_lines"),
        F.try_divide(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)),
            F.sum("cnt"),
        ).alias("dup_line_frac"),
        F.try_divide(
            F.sum(
                F.when(
                    F.col("cnt") > 1, F.col("cnt") * F.length("line")
                ).otherwise(0)
            ),
            F.sum(F.col("cnt") * F.length("line")),
        ).alias("dup_line_char_frac"),
    )

    from ensembl_datacheck_spark.operators.dedup import words

    # docs with fewer than `ngram` words have NO n-grams: gate them out
    # so the left join yields the documented NULL fractions —
    # word_ngrams_multiset's whole-text fallback gram would otherwise
    # score every 1..ngram-1-word doc as top_ngram_frac=1.0 (maximally
    # repetitive), and a Gopher-style threshold filter would reject them
    grams = df.filter(F.size(words(F.col(text_col))) >= ngram).select(
        ident, F.explode(word_ngrams_multiset(F.col(text_col), ngram)).alias("g")
    ).filter(F.length("g") > 0)  # ngram=1 edge: '' "word" of empty text
    gc = grams.groupBy("__id", "g").agg(F.count(F.lit(1)).alias("cnt"))
    gchars = F.col("cnt") * F.length("g")
    gram_agg = gc.groupBy("__id").agg(
        F.try_divide(
            F.max(F.struct(F.col("cnt"), F.col("g"))).getField("cnt")
            * F.length(F.max(F.struct(F.col("cnt"), F.col("g"))).getField("g")),
            F.sum(gchars),
        ).alias("top_ngram_frac"),
        F.try_divide(
            F.sum(F.when(F.col("cnt") > 1, gchars).otherwise(0)), F.sum(gchars)
        ).alias("dup_ngram_frac"),
    )

    base = df.select(F.col(id_col), F.col(id_col).alias("__id"))
    out = (
        base.join(line_agg, "__id", "left")
        .join(gram_agg, "__id", "left")
        .drop("__id")
        .withColumn("n_lines", F.coalesce(F.col("n_lines"), F.lit(0)))
    )
    return out
