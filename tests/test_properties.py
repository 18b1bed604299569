"""Property-based tests (hypothesis) for algebraic invariants that
example-based tests can't sweep: GEOID round-trips, salted-agg exactness
over arbitrary key/value distributions, coerce-cast agreement with the
pandas reference semantics."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from census_data_pipeline_spark.operators import geoid, skew
from census_data_pipeline_spark.operators.rates import safe_rate

fips2 = st.integers(1, 99).map(lambda i: f"{i:02d}")
fips3 = st.integers(0, 999).map(lambda i: f"{i:03d}")
fips6 = st.integers(0, 999999).map(lambda i: f"{i:06d}")
fips1 = st.integers(0, 9).map(str)


@given(fips2, fips3, fips6, fips1)
def test_geoid_roundtrip_property(s, c, t, bg):
    g = geoid.build_geoid(s, c, t, bg)
    parsed = geoid.parse_geoid(g)
    assert parsed == {"state": s, "county": c, "tract": t, "block_group": bg}
    assert len(g) == geoid.GEOID_LENGTHS["block_group"]


@pytest.mark.slow
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]),
                  st.floats(-1e6, 1e6, allow_nan=False)),
        min_size=1, max_size=40,
    )
)
def test_salted_agg_equals_direct_property(spark, rows):
    df = spark.createDataFrame(rows, "k string, v double").repartition(4)
    from pyspark.sql import functions as F

    direct = {
        r.k: (r.s, r.c, r.lo, r.hi)
        for r in df.groupBy("k").agg(
            F.sum("v").alias("s"), F.count("v").alias("c"),
            F.min("v").alias("lo"), F.max("v").alias("hi"),
        ).collect()
    }
    salted = {
        r.k: (r.s, r.c, r.lo, r.hi)
        for r in skew.salted_agg(
            df, ["k"],
            [("sum", "v", "s"), ("count", "v", "c"),
             ("min", "v", "lo"), ("max", "v", "hi")],
            n_salts=4,
        ).collect()
    }
    assert set(direct) == set(salted)
    for k in direct:
        ds, dc, dlo, dhi = direct[k]
        ss, sc, slo, shi = salted[k]
        assert (dc, dlo, dhi) == (sc, slo, shi)
        assert ss == pytest.approx(ds, rel=1e-9)


@pytest.mark.slow
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(
            st.floats(-1e9, 1e9, allow_nan=False),
            st.floats(-1e3, 1e3, allow_nan=False),
        ),
        min_size=1, max_size=30,
    )
)
def test_safe_rate_matches_pandas_reference(spark, pairs):
    """The zero-policy contract vs the reference's pandas arithmetic
    (transformers.py:100-108): raw division then policy replacement."""
    df = spark.createDataFrame(pairs, "num double, den double")
    got = df.select(
        safe_rate("num", "den", 100.0, "nan").alias("r_nan"),
        safe_rate("num", "den", 100.0, "zero").alias("r_zero"),
    ).collect()
    pdf = pd.DataFrame(pairs, columns=["num", "den"])
    # actual pandas reference arithmetic: raw division (0/0 -> NaN,
    # x/0 -> ±inf), then the 'zero' policy replaces only ±inf with 0
    # (transformers.py:100-108) — 0/0 stays NaN.
    import numpy as np

    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        raw = pdf["num"].to_numpy() / pdf["den"].to_numpy() * 100.0
    exp_zero = np.where(np.isinf(raw), 0.0, raw)
    for row, (n, d), ez in zip(got, pairs, exp_zero):
        if d == 0:
            assert row.r_nan is None  # 'nan' policy: NULL on zero denom
            if np.isnan(ez):
                assert row.r_zero != row.r_zero  # NaN (0/0 parity)
            else:
                assert row.r_zero == ez
        else:
            expected = n / d * 100.0
            assert row.r_nan == expected and row.r_zero == expected
    assert len(got) == len(pdf)


@pytest.mark.slow
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.tuples(st.sampled_from(["hot", "hot", "hot", "b", "c"]),
                       st.integers(0, 100)), min_size=1, max_size=30),
    st.lists(st.tuples(st.sampled_from(["hot", "b", "c", "d"]),
                       st.integers(0, 100)), min_size=0, max_size=10),
    st.sampled_from(["inner", "left"]),
)
def test_salted_join_equals_direct_property(spark, brows, srows, how):
    """salted_join == plain join for arbitrary (skewed) inputs, inner and
    left — replication + per-row salt must not change the result set."""
    big = spark.createDataFrame(brows, "k string, bv long")
    small = spark.createDataFrame(srows, "k string, sv long") if srows else \
        spark.createDataFrame([], "k string, sv long")
    direct = sorted(map(tuple, big.join(small, ["k"], how).collect()))
    salted = sorted(
        map(tuple, skew.salted_join(big, small, ["k"], n_salts=4, how=how).collect())
    )
    assert salted == direct


@pytest.mark.slow
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.lists(st.sampled_from(["w", "x", "y", "z"]), min_size=1,
                 max_size=12).map(" ".join),
        min_size=1, max_size=10,
    )
)
def test_span_dedup_invariants_property(spark, texts):
    """span_dedup invariants over arbitrary small corpora: (1) per doc,
    n_kept <= n_spans and the reassembled text is a subsequence of the
    doc's spans; (2) every distinct span content survives EXACTLY once
    across the whole corpus; (3) kept-span multiset == first-occurrence
    rule applied sequentially."""
    from census_data_pipeline_spark.functions.dedup import span_dedup

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = {r.doc_id: r for r in span_dedup(df, span_tokens=3).collect()}

    def spans_of(t):
        toks = t.split(" ")
        return [" ".join(toks[i:i + 3]) for i in range(0, len(toks), 3)]

    seen, expect_kept = set(), {}
    for i, t in enumerate(texts):
        kept = []
        for sp in spans_of(t):
            if sp not in seen:
                seen.add(sp)
                kept.append(sp)
        expect_kept[i] = kept
    for i, t in enumerate(texts):
        r = out[i]
        assert r.n_spans == len(spans_of(t))
        assert r.n_kept == len(expect_kept[i])
        assert r.text_dedup == " ".join(expect_kept[i])
    # every distinct span content survives exactly once corpus-wide
    all_kept = [sp for i in out for sp in
                (out[i].text_dedup.split(" ") and
                 _respan(out[i].text_dedup))]
    assert sorted(all_kept) == sorted(seen)


def _respan(text_dedup):
    if not text_dedup:
        return []
    toks = text_dedup.split(" ")
    return [" ".join(toks[i:i + 3]) for i in range(0, len(toks), 3)]


@pytest.mark.slow
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 99)),
             min_size=0, max_size=12),
)
def test_apply_changes_idempotent_property(spark, feed):
    """apply_changes invariants: applying the same (deduped-by-seq) feed
    twice equals applying it once, and result keys = (snapshot keys −
    deletes) ∪ upserts."""
    from census_data_pipeline_spark.operators.change import apply_changes

    snap = spark.createDataFrame(
        [(k, float(k)) for k in range(4)], "id long, val double"
    )
    rows = [("D" if seq % 3 == 0 else "U", k, seq, float(seq))
            for k, seq in feed]
    if not rows:
        return
    changes = spark.createDataFrame(
        rows, "op string, id long, seq long, val double"
    )
    once = apply_changes(snap, changes, ["id"], seq_col="seq")
    twice = apply_changes(once, changes, ["id"], seq_col="seq")
    r1 = sorted((r.id, r.val) for r in once.collect())
    r2 = sorted((r.id, r.val) for r in twice.collect())
    assert r1 == r2
    # reference merge
    latest = {}
    for op, k, seq, v in rows:
        if k not in latest or seq > latest[k][1] or (
                seq == latest[k][1] and k > k):
            latest[k] = (op, seq, v)
    want = {k: float(k) for k in range(4)}
    for k, (op, _seq, v) in latest.items():
        if op == "D":
            want.pop(k, None)
        else:
            want[k] = v
    assert dict(r1) == want


@pytest.mark.slow
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.lists(
            st.text(alphabet="ab", min_size=1, max_size=5),
            min_size=1, max_size=6,
        ).map(" ".join),
        min_size=1, max_size=5,
    ),
)
def test_bpe_train_matches_reference_fuzz(spark, texts):
    """The double-space replace merge must equal reference greedy
    left-to-right BPE on arbitrary two-letter corpora — runs like
    'abab'/'aaaa' and single-char words are exactly the adjacent-pattern
    edge cases the string trick must survive."""
    from collections import Counter

    from census_data_pipeline_spark.functions.text import bpe_train

    def ref(texts, num_merges):
        words = Counter()
        for t in texts:
            for w in t.split(" "):
                if w:
                    words[w] += 1
        seqs = {w: list(w) for w in words}
        merges = []
        for step in range(1, num_merges + 1):
            pc = Counter()
            for w, freq in words.items():
                s = seqs[w]
                for i in range(len(s) - 1):
                    pc[(s[i], s[i + 1])] += freq
            if not pc:
                break
            (a, b), weight = min(
                pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((step, a, b, a + b, weight))
            for w, s in seqs.items():
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                seqs[w] = out
        return merges

    expected = ref(texts, 3)
    if not expected:
        return  # corpus with no pairs anywhere: nothing to train
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.step, r.lhs, r.rhs, r.merged, r.weight)
        for r in bpe_train(df, num_merges=len(expected))
        .orderBy("step").collect()
    ]
    assert got == expected


@pytest.mark.slow
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        min_size=1, max_size=60,
    ),
    st.integers(1, 60),
    st.integers(2, 6),
)
def test_exact_kth_scalable_fuzz(spark, values, k_raw, n_buckets):
    """Range narrowing must return EXACTLY the k-th sorted value for
    arbitrary doubles (duplicates, negatives, tight clusters) at any
    bucket count, with a tail threshold small enough to force the
    loop."""
    from census_data_pipeline_spark.operators.rollup import (
        exact_kth_scalable,
    )

    k = ((k_raw - 1) % len(values)) + 1
    df = spark.createDataFrame([(v,) for v in values], "v double")
    got = exact_kth_scalable(df, "v", k, n_buckets=n_buckets,
                             tail_threshold=3)
    assert got == sorted(values)[k - 1]


@pytest.mark.slow
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.tuples(st.integers(0, 200), st.sampled_from(["s1", "s2"]),
                       st.integers(1, 12)),
             min_size=1, max_size=40, unique_by=lambda t: t[0]),
    st.integers(1, 40),
)
def test_token_budget_sample_fuzz(spark, rows, budget):
    """Quota filling must equal the Python reference: per source, walk
    docs in (9-hex md5 prefix, id) order accumulating token counts;
    keep while the EXCLUSIVE prefix is under budget."""
    import hashlib

    from census_data_pipeline_spark.functions.sampling import (
        token_budget_sample,
    )

    data = [(i, s, "w " * (nt - 1) + "w") for i, s, nt in rows]
    df = spark.createDataFrame(data, "doc_id long, source string, text string")
    got = {(r.doc_id, r.cum_tokens) for r in token_budget_sample(
        df, budget_tokens=budget, seed=11).collect()}
    want = set()
    by_src = {}
    for i, s, nt in rows:
        by_src.setdefault(s, []).append((i, nt))
    for s, docs in by_src.items():
        docs.sort(key=lambda d: (
            hashlib.md5(f"11:{d[0]}".encode()).hexdigest()[:9], d[0]))
        cum = 0
        for i, nt in docs:
            if cum < budget:
                cum += nt
                want.add((i, cum))
            else:
                break
    assert got == want


@pytest.mark.slow
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.tuples(st.integers(1, 8), st.sampled_from(list("abcd"))),
             min_size=1, max_size=30),
)
def test_association_rules_fuzz(spark, rows):
    """Support/confidence/lift must match the brute-force reference over
    arbitrary basket shapes (repeats, singleton baskets, skew)."""
    from collections import defaultdict

    from census_data_pipeline_spark.operators.basket import (
        association_rules,
    )

    df = spark.createDataFrame(rows, "basket int, item string")
    got = {(r.antecedent, r.consequent):
           (r.n_both, r.support, r.confidence, r.lift)
           for r in association_rules(df, "basket", "item",
                                      min_co=1, k=1000).collect()}
    baskets = defaultdict(set)
    for b, i in rows:
        baskets[b].add(i)
    nb = len(baskets)
    n_item = defaultdict(int)
    n_pair = defaultdict(int)
    for items in baskets.values():
        for i in items:
            n_item[i] += 1
        for a in items:
            for c in items:
                if a < c:
                    n_pair[(a, c)] += 1
    want = {}
    for (a, c), n in n_pair.items():
        for ant, con in ((a, c), (c, a)):
            want[(ant, con)] = (
                n, round(n / nb, 6), round(n / n_item[ant], 6),
                round(n * nb / (n_item[ant] * n_item[con]), 6),
            )
    assert got == want


@pytest.mark.slow
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.lists(st.sampled_from(list("xyz")), min_size=1,
                      max_size=8).map(" ".join),
             min_size=1, max_size=8),
    st.lists(st.lists(st.sampled_from(list("xyz")), min_size=1,
                      max_size=3).map(" ".join),
             min_size=1, max_size=5, unique=True),
)
def test_tag_keywords_fuzz(spark, texts, phrases):
    """Gram-join tagging must equal the sliding-window reference
    (overlapping token windows, per-length matching, short-doc
    whole-text fallback)."""
    from census_data_pipeline_spark.functions.text import tag_keywords

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    pdf = spark.createDataFrame([(p,) for p in phrases], "phrase string")
    got = {(r.id, r.phrase): r.n_hits
           for r in tag_keywords(docs, pdf).collect()}
    want = {}
    for i, t in enumerate(texts):
        toks = [w for w in t.split(" ") if w != ""]
        for p in phrases:
            plen = len(p.split(" "))
            if len(toks) < plen:
                grams = [" ".join(toks)]    # whole-text fallback
            else:
                grams = [" ".join(toks[j:j + plen])
                         for j in range(len(toks) - plen + 1)]
            n = sum(1 for g in grams if g == p)
            if n:
                want[(i, p)] = n
    assert got == want
