"""Property-based tests (hypothesis) for the driver-side statistics and
tolerance logic, plus seeded-random equivalence checks for the salted
aggregation plans (SURVEY.md §7.3: per-partition partials must combine to
exactly the global statistic)."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from ensembl_datacheck_spark.operators.drift import (
    Tolerance,
    chi2_sf,
    drift_statistics,
)

bins = st.dictionaries(
    st.text(alphabet="abcdefgh", min_size=1, max_size=3),
    st.integers(min_value=0, max_value=10_000),
    min_size=1,
    max_size=12,
)


@given(bins)
@settings(max_examples=200)
def test_identical_histograms_have_zero_drift(h):
    if sum(h.values()) == 0:
        return
    stats = drift_statistics(list(h.items()), list(h.items()))
    assert stats.chi2 <= 1e-9
    assert stats.ks <= 1e-12
    assert stats.l1 <= 1e-12
    assert stats.chi2_pvalue > 0.99


@given(bins, bins)
@settings(max_examples=200)
def test_drift_statistics_bounds_and_symmetry(h1, h2):
    if sum(h1.values()) == 0 or sum(h2.values()) == 0:
        return
    s12 = drift_statistics(list(h1.items()), list(h2.items()))
    s21 = drift_statistics(list(h2.items()), list(h1.items()))
    assert 0.0 <= s12.ks <= 1.0
    assert 0.0 <= s12.l1 <= 1.0
    # total variation dominates KS on the same binning (KS is the max
    # CDF gap; TV is half the total absolute share gap)
    assert s12.l1 >= s12.ks - 1e-9
    assert s12.chi2 >= 0.0
    # two-sample chi2, KS, and L1 are symmetric in the two samples
    assert abs(s12.chi2 - s21.chi2) < 1e-6 * max(s12.chi2, 1.0)
    assert abs(s12.ks - s21.ks) < 1e-12
    assert abs(s12.l1 - s21.l1) < 1e-12


@given(bins, st.integers(min_value=2, max_value=8), st.randoms())
@settings(max_examples=100)
def test_partition_combine_exactness(h, n_parts, rnd):
    """Splitting a histogram's counts across partitions and recombining
    (sum per bin — what groupBy(bin) does) must reproduce the global
    statistic exactly."""
    if sum(h.values()) == 0:
        return
    partials: list[dict[str, int]] = [dict() for _ in range(n_parts)]
    for b, c in h.items():
        remaining = c
        for i in range(n_parts - 1):
            take = rnd.randint(0, remaining)
            if take:
                partials[i][b] = partials[i].get(b, 0) + take
            remaining -= take
        if remaining:
            partials[-1][b] = partials[-1].get(b, 0) + remaining
    combined: dict[str, int] = {}
    for p in partials:
        for b, c in p.items():
            combined[b] = combined.get(b, 0) + c
    assert combined == {b: c for b, c in h.items() if c or b in combined}
    base = {b: c * 2 + 1 for b, c in h.items()}
    s_global = drift_statistics(list(h.items()), list(base.items()))
    s_combined = drift_statistics(list(combined.items()), list(base.items()))
    assert s_global.chi2 == s_combined.chi2
    assert s_global.ks == s_combined.ks


@given(
    st.floats(min_value=0.0, max_value=1e4),
    st.floats(min_value=0.0, max_value=1e4),
    st.integers(min_value=1, max_value=50),
)
@settings(max_examples=200)
def test_chi2_sf_monotone(a, b, dof):
    lo, hi = sorted((a, b))
    assert chi2_sf(hi, dof) <= chi2_sf(lo, dof) + 1e-12
    assert 0.0 <= chi2_sf(a, dof) <= 1.0


@given(
    st.floats(min_value=0.0, max_value=1e6),
    st.floats(min_value=0.0, max_value=1e6),
    st.floats(min_value=0.01, max_value=1.0),
)
@settings(max_examples=200)
def test_tolerance_min_proportion_semantics(base, cur, p):
    t = Tolerance(min_proportion=p)
    assert t.violated(base, cur) == (cur < base * p)


def test_salted_distinct_equals_plain_distinct(spark):
    """Seeded-random equivalence: the three-stage salted plan returns the
    same per-group distinct counts as COUNT(DISTINCT) for skewed data."""
    from pyspark.sql import functions as F

    from ensembl_datacheck_spark.operators.uniqueness import (
        exact_count_distinct_salted,
    )

    rnd = random.Random(1234)
    rows = []
    for _ in range(20_000):
        g = "hot" if rnd.random() < 0.7 else f"g{rnd.randint(0, 5)}"
        v = rnd.randint(0, 3_000)
        rows.append((g, v))
    df = spark.createDataFrame(rows, "g string, v long")
    salted = {
        r["group_key"]: r["n_distinct"]
        for r in exact_count_distinct_salted(df, "g", "v", n_salt=8).collect()
    }
    plain = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert salted == plain


def test_asof_join_matches_pandas_merge_asof(spark):
    """Randomized cross-validation of asof_join against pandas
    merge_asof (an independent reference implementation), both strict
    and non-strict, across several seeds."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ensembl_datacheck_spark.operators.asof import asof_join

    for seed in (0, 1, 2):
        rnd = random.Random(seed)
        base = 1_700_000_000
        left_rows = [
            (u, base + rnd.randrange(0, 10_000), i)
            for i, u in enumerate(rnd.choices(range(5), k=60))
        ]
        right_rows = [
            (u, base + rnd.randrange(0, 10_000), 100 + i)
            for i, u in enumerate(rnd.choices(range(6), k=40))
        ]
        # dedup right per (u, ts): keep max value — both engines then
        # resolve ties identically
        rdict = {}
        for u, ts, v in right_rows:
            rdict[(u, ts)] = max(v, rdict.get((u, ts), -1))
        right_rows = [(u, ts, v) for (u, ts), v in rdict.items()]

        ldf = spark.createDataFrame(left_rows, "u long, epoch long, lid long") \
            .withColumn("ts", F.col("epoch").cast("timestamp"))
        rdf = spark.createDataFrame(right_rows, "u long, epoch long, snap long") \
            .withColumn("ts", F.col("epoch").cast("timestamp"))

        for strict in (False, True):
            got = {
                r["lid"]: r["snap"]
                for r in asof_join(
                    ldf.select("u", "ts", "lid"),
                    rdf.select("u", "ts", "snap"),
                    by=["u"], strict=strict, right_cols=["snap"],
                ).collect()
            }
            lp = pd.DataFrame(left_rows, columns=["u", "t", "lid"]).sort_values("t")
            rp = pd.DataFrame(right_rows, columns=["u", "t", "snap"]).sort_values("t")
            m = pd.merge_asof(
                lp, rp, on="t", by="u", direction="backward",
                allow_exact_matches=not strict,
            )
            want = {
                int(r.lid): (None if pd.isna(r.snap) else int(r.snap))
                for r in m.itertuples()
            }
            assert got == want, (seed, strict)


def test_minhash_exact_dup_inclusion_property(spark):
    """Property: identical content ALWAYS collides (signature equality is
    deterministic, so exact duplicates are never missed by any band) —
    across several seeds and doc set shapes."""
    from pyspark.sql import functions as F

    from ensembl_datacheck_spark.operators.dedup import minhash_lsh_candidates

    rnd = random.Random(99)
    words = [f"w{i}" for i in range(500)]
    for trial in range(3):
        docs = []
        for i in range(30):
            docs.append((i, " ".join(rnd.choice(words) for _ in range(40))))
        # plant exact dups of the first 5 docs
        for i in range(5):
            docs.append((100 + i, docs[i][1]))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(
            df, "doc_id", "text", ngram=3, n_hashes=16, n_bands=8).collect()}
        for i in range(5):
            assert (i, 100 + i) in pairs, f"trial {trial}: exact dup {i} missed"


@given(
    n=st.integers(min_value=1, max_value=2**34),
    n2=st.integers(min_value=0, max_value=2**20),
)
@settings(max_examples=200, deadline=None)
def test_simhash_band_bits_monotone_and_bounded(n, n2):
    """The adaptive band selector (operators/dedup.simhash_band_bits) is
    monotone in corpus size and, whenever a non-saturated ladder step is
    returned, honors its own promise: expected birthday collisions
    n_bands * C(n,2) / 2^bits <= 1 per doc."""
    from ensembl_datacheck_spark.operators.dedup import simhash_band_bits

    bits = simhash_band_bits(n)
    assert bits in (16, 32)
    # monotone: a larger corpus never gets a narrower band
    assert simhash_band_bits(n + n2) >= bits
    if bits < 32:  # non-saturated -> the bound must actually hold
        n_bands = 64 // bits
        assert n_bands * n * (n - 1) / 2.0 / 2.0**bits <= n
    # 60-bit portable ladder obeys the same contract
    bits60 = simhash_band_bits(n, sig_bits=60, ladder=(15, 20, 30))
    assert bits60 in (15, 20, 30)
    assert simhash_band_bits(n + n2, sig_bits=60, ladder=(15, 20, 30)) >= bits60
    if bits60 < 30:
        n_bands = 60 // bits60
        assert n_bands * n * (n - 1) / 2.0 / 2.0**bits60 <= n


def test_lm_cross_entropy_matches_reference_on_random_corpora(spark):
    """Seeded-random cross-validation of the LM scorer against an
    independent pure-python reference, across several corpus shapes
    (skewed vocab, hapax-heavy, short docs, OOV-rich fit slices)."""
    import math
    from collections import Counter

    from pyspark.sql import functions as F

    from ensembl_datacheck_spark.operators import lm as LM

    rnd = random.Random(20260821)
    for shape in range(4):
        docs = []
        vocab_hi = [50, 2000, 12, 300][shape]
        for i in range(120):
            n = rnd.randint(1, [12, 40, 3, 25][shape])
            docs.append((i, [rnd.randint(0, vocab_hi) for _ in range(n)]))
        df = spark.createDataFrame(docs, "doc_id long, tokens array<long>")
        fit_pred = F.col("doc_id") % [2, 3, 5, 4][shape] == 0
        fit = LM.fit_unigram_lm(df.filter(fit_pred))
        got = {r.doc_id: r for r in LM.lm_cross_entropy(df, fit).collect()}

        fit_ids = {i for i, _ in docs if i % [2, 3, 5, 4][shape] == 0}
        cnt = Counter(t for i, toks in docs if i in fit_ids for t in toks)
        T, V = sum(cnt.values()), len(cnt)
        for i, toks in docs:
            ce = math.log(T + (V + 1)) - sum(
                math.log(cnt.get(t, 0) + 1.0) for t in toks
            ) / len(toks)
            assert abs(got[i].ce_nats - ce) < 1e-11, (shape, i)
            assert got[i].oov_n == sum(1 for t in toks if t not in cnt)


def test_temperature_sample_nested_and_anchor_kept_random(spark):
    """Seeded-random structural properties of temperature sampling over
    random source-size profiles: kept sets are nested in tau, tau=1 is
    the identity, and the smallest source is always kept whole."""
    from ensembl_datacheck_spark.operators import corpus

    rnd = random.Random(99)
    rows = []
    sizes = {}
    for s in range(6):
        n = rnd.choice([5, 20, 80, 250])
        sizes[f"s{s}"] = n
        rows += [(s * 10_000 + i, f"s{s}") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, source string").cache()
    kept = {}
    for tau in (0.0, 0.25, 0.5, 0.75, 1.0):
        kept[tau] = {
            r.doc_id
            for r in corpus.temperature_source_sample(
                df, "doc_id", "source", tau=tau
            ).collect()
        }
    taus = sorted(kept)
    for lo, hi in zip(taus, taus[1:]):
        assert kept[lo] <= kept[hi], (lo, hi)
    assert len(kept[1.0]) == len(rows)
    smallest = min(sizes, key=lambda s: sizes[s])
    anchor_ids = {i for i, s in rows if s == smallest}
    for tau in taus:
        assert anchor_ids <= kept[tau], tau


def test_gumbel_top_k_shift_invariant(spark):
    """Gumbel-top-k selection depends only on weight DIFFERENCES: adding
    any constant to every log_weight must select the identical set (the
    Gumbel keys shift uniformly) — the invariance that makes the
    sampler insensitive to the normalization term's absolute value."""
    from pyspark.sql import functions as F

    from ensembl_datacheck_spark.operators import importance as IMP

    rnd = random.Random(7)
    rows = [(i, rnd.randint(1, 40), rnd.uniform(-5, 5)) for i in range(200)]
    w = spark.createDataFrame(
        rows, "doc_id long, n_feat_obs long, log_weight double"
    ).cache()
    base = sorted(r.doc_id for r in IMP.gumbel_top_k(w, 20, salt="x").collect())
    for c in (123.456, -77.0):
        shifted = w.withColumn("log_weight", F.col("log_weight") + c)
        got = sorted(
            r.doc_id for r in IMP.gumbel_top_k(shifted, 20, salt="x").collect()
        )
        assert got == base, c
