"""Token-rarity scoring: per-document unigram-frequency statistics under
the corpus's own (or a supplied) vocabulary histogram.

This is the integer-exact cousin of a CCNet-style LM-quality filter
(Wenzek et al. 2020, arXiv:1911.00359 — public): instead of a trained
LM's perplexity, each document is scored by the corpus-frequency of its
own tokens.  A document whose tokens are mostly corpus-hapaxes (count 1)
is garbled text, OCR noise, or a tokenizer fault; a document whose mean
token frequency is enormous is boilerplate.  Both are exactly the
outlier rows the reference surfaces as per-row violation diagnostics
(Test/DataCheck.pm:283-365 row-total/tolerance machinery;
ComparePreviousVersionProbes.pm:51-60 drift kin) — here over the
input_hint's token payload.

All math is integer counts plus ONE final IEEE division, so every column
is bit-exactly reproducible by an ANSI-SQL oracle (the module-wide
convention, see operators/text.py).

Scale shape (the 100 TB story):

* the vocabulary histogram is ``drift.unigram_profile`` — explode with
  map-side partial aggregation, shuffle bounded by vocab size, never by
  corpus size;
* a real BPE/unigram-LM vocabulary tops out around 2^18 rows, so the
  join back onto the exploded token stream is an explicit ``broadcast``
  (map-side, zero shuffle);
* the per-document aggregation partially aggregates in the same stage as
  the explode+join — each document's tokens live in one input partition,
  so the shuffle carries ~one row per document, not per token.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ensembl_datacheck_spark.operators.drift import unigram_profile

__all__ = ["token_rarity_scores", "vocab_rarity_summary"]


def token_rarity_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    vocab: DataFrame | None = None,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document rarity statistics against a ``(token, count)`` vocab.

    ``vocab`` defaults to the corpus's own unigram histogram
    (``drift.unigram_profile(df)`` — self-scoring, where every token
    matches and ``oov_n`` is 0).  Pass a FOREIGN vocabulary (e.g. the
    baseline snapshot's) to measure out-of-vocabulary drift per document.

    Output columns (one row per document that has ≥1 scoreable token —
    NULL/empty arrays and NULL/negative elements are skipped with the
    same hygiene as ``unigram_profile``, whose counts must line up
    element-for-element with this scan):

    * ``n_scored``   BIGINT — tokens scored (incl. OOV);
    * ``oov_n``      BIGINT — tokens absent from ``vocab`` (0 when
      self-scoring);
    * ``sum_count``  BIGINT — Σ vocab-count over matched tokens (exact);
    * ``min_count``  BIGINT — rarest matched token's corpus count (NULL
      when every token is OOV);
    * ``hapax_n``    BIGINT — matched tokens whose corpus count is 1;
    * ``mean_count`` DOUBLE — sum_count / (n_scored - oov_n); ONE IEEE
      division of exact integers (bit-identical in any engine); NULL
      when every token is OOV.

    ``broadcast_vocab`` keeps the token→count join map-side (real
    vocabularies are ≤2^18 rows); set False only for a pathological
    billion-row "vocabulary", where the join falls back to sort-merge on
    the token key.
    """
    if vocab is None:
        vocab = unigram_profile(df, tokens_col)
    vocab = vocab.select(
        F.col("token").alias("__v_token"), F.col("count").alias("__v_count")
    )
    if broadcast_vocab:
        vocab = F.broadcast(vocab)

    tok = (
        df.filter(F.col(tokens_col).isNotNull() & (F.size(tokens_col) > 0))
        .select(F.col(id_col), F.explode(tokens_col).alias("__token"))
        .filter(F.col("__token").isNotNull() & (F.col("__token") >= 0))
    )
    joined = tok.join(
        vocab, tok["__token"] == vocab["__v_token"], "left_outer"
    )
    matched = F.col("__v_count").isNotNull()
    n_scored = F.count(F.lit(1)).alias("n_scored")
    oov_n = F.sum(F.when(~matched, 1).otherwise(0)).cast("long").alias("oov_n")
    sum_count = (
        F.sum(F.coalesce(F.col("__v_count"), F.lit(0)))
        .cast("long")
        .alias("sum_count")
    )
    min_count = F.min("__v_count").cast("long").alias("min_count")
    hapax_n = (
        F.sum(F.when(F.col("__v_count") == 1, 1).otherwise(0))
        .cast("long")
        .alias("hapax_n")
    )
    agg = joined.groupBy(id_col).agg(n_scored, oov_n, sum_count, min_count, hapax_n)
    n_matched = F.col("n_scored") - F.col("oov_n")
    return agg.withColumn(
        "mean_count",
        F.when(
            n_matched > 0,
            F.col("sum_count").cast("double") / n_matched.cast("double"),
        ),
    )


def vocab_rarity_summary(vocab: DataFrame) -> DataFrame:
    """One-row corpus summary of a ``(token, count)`` vocabulary.

    * ``vocab_size``           BIGINT — distinct tokens;
    * ``hapax_vocab_n``        BIGINT — tokens seen exactly once;
    * ``total_tokens``         BIGINT — Σ count (corpus token volume);
    * ``hapax_vocab_fraction`` DOUBLE — hapax_vocab_n / vocab_size;
    * ``hapax_token_mass``     DOUBLE — hapax_vocab_n / total_tokens.

    A healthy Zipfian text corpus has hapax_vocab_fraction ≈ 0.4-0.6; a
    value near 1.0 means the "vocabulary" is noise (random ids, broken
    tokenizer), near 0.0 a tiny closed vocabulary.  Both fractions are a
    single IEEE division of exact BIGINTs — oracle-bit-exact.

    One aggregate over the vocab-sized histogram: O(vocab) work no
    matter the corpus size (the corpus was already folded by
    ``unigram_profile``'s map-side combine).
    """
    hapax = F.sum(F.when(F.col("count") == 1, 1).otherwise(0)).cast("long")
    agg = vocab.agg(
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        hapax.alias("hapax_vocab_n"),
        F.sum("count").cast("long").alias("total_tokens"),
    )
    return agg.select(
        "vocab_size",
        "hapax_vocab_n",
        "total_tokens",
        (
            F.col("hapax_vocab_n").cast("double")
            / F.col("vocab_size").cast("double")
        ).alias("hapax_vocab_fraction"),
        (
            F.col("hapax_vocab_n").cast("double")
            / F.col("total_tokens").cast("double")
        ).alias("hapax_token_mass"),
    )
