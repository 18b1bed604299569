"""Round-5 operator units: BPE vocabulary training, document-level PMI,
hard-negative mining, and the composited-GIF/equi-depth levers' query
plumbing (the GIF and histogram tests themselves live in
test_functions_ext.py / test_round4_ops.py)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F


# -- BPE training ---------------------------------------------------------
def _ref_bpe(texts, num_merges):
    """Reference BPE (Sennrich et al. 2016): word-frequency table,
    overlapping pair counts, greedy left-to-right merge application.
    Tiebreak = (max weight, lexicographically smallest pair)."""
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


def test_bpe_train_matches_reference(spark):
    from census_data_pipeline_spark.functions.text import bpe_train

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "aaaa aaaa aa baa",          # runs: greedy non-overlap matters
        "wide wider widest",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = [
        (r.step, r.lhs, r.rhs, r.merged, r.weight)
        for r in bpe_train(df, num_merges=6).orderBy("step").collect()
    ]
    assert got == _ref_bpe(texts, 6)


def test_bpe_train_run_semantics(spark):
    """'aaaa' under merge (a,a) must become [aa, aa] (greedy
    left-to-right, new symbol can't re-merge within the round) — the
    double-space replace trick's core case."""
    from census_data_pipeline_spark.functions.text import bpe_train

    df = spark.createDataFrame([(1, "aaaa aaaa ab")],
                               "doc_id long, text string")
    rows = bpe_train(df, num_merges=2).orderBy("step").collect()
    # round 1: (a,a) weight 6 (3 overlapping pairs x 2 words)
    assert (rows[0].lhs, rows[0].rhs, rows[0].weight) == ("a", "a", 6)
    # round 2: after [aa, aa], pair (aa,aa) weight 2 beats (a,b) weight 1
    assert (rows[1].lhs, rows[1].rhs, rows[1].merged) == ("aa", "aa", "aaaa")
    with pytest.raises(ValueError):
        bpe_train(df, num_merges=0)


# -- PMI ------------------------------------------------------------------
def test_pmi_topk_exact(spark):
    from census_data_pipeline_spark.functions.text import pmi_topk

    import math

    # 6 docs; (x,y) co-occur in 3, x in 4, y in 3; (x,z) in 1 doc only
    docs = [
        (1, "x y k"),
        (2, "x y k"),
        (3, "x y"),
        (4, "x z"),
        (5, "y q"),
        (6, "k q"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        (r.token_a, r.token_b): r
        for r in pmi_topk(df, vocab_size=10, min_pairs=2, top_k=10).collect()
    }
    r = out[("x", "y")]
    assert (r.n_docs_a, r.n_docs_b, r.n_docs_both) == (4, 4, 3)
    assert r.pmi == round(math.log(3 * 6 / (4 * 4)), 6)
    # min_pairs=2 prunes the single-doc pairs
    assert ("x", "z") not in out
    # vocabulary cap bounds the fanout: vocab_size=2 keeps only k,x (df 4,4
    # beat y? y df=4 too -> tie broken by token: k,x,y all df... compute)
    capped = pmi_topk(df, vocab_size=2, min_pairs=1, top_k=10).collect()
    toks = {t for r in capped for t in (r.token_a, r.token_b)}
    assert toks <= {"k", "x", "y"} and len(toks) <= 2


# -- hard negatives -------------------------------------------------------
def test_hard_negatives_exact(spark):
    from census_data_pipeline_spark.functions.similarity import (
        hard_negatives,
        knn_bruteforce,
    )

    vecs = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.99, 0.1, 0.0], 0),   # same label: NOT a negative
        (2, [0.9, 0.2, 0.0], 1),    # different label, very close: hardest
        (3, [0.0, 1.0, 0.0], 1),
        (4, [-1.0, 0.0, 0.0], 2),
    ]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    anchors = df.filter("vec_id = 0")
    out = hard_negatives(df, anchors, k=2).orderBy("rank").collect()
    assert [r.neighbor_id for r in out] == [2, 3]
    assert all(r.neighbor_label != 0 for r in out)
    assert out[0].rank == 1 and out[0].cosine_sim > out[1].cosine_sim
    # scores agree with knn_bruteforce on the same pair
    knn = {r.neighbor_id: r.cosine_sim
           for r in knn_bruteforce(df, anchors, k=4).collect()}
    assert out[0].cosine_sim == knn[2]


# -- reciprocal rank fusion ----------------------------------------------
def test_rrf_fuse_exact(spark):
    from census_data_pipeline_spark.functions.search import rrf_fuse

    lex = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    sem = spark.createDataFrame(
        [(20, 1), (40, 2), (10, 3)], "doc_id long, rank int"
    )
    out = {r.doc_id: r for r in rrf_fuse([lex, sem], rrf_k=60, k=10).collect()}
    # doc 20: 1/62 + 1/61; doc 10: 1/61 + 1/63; singletons keep one term
    assert out[20].rrf_score == round(1 / 62 + 1 / 61, 6)
    assert out[10].rrf_score == round(1 / 61 + 1 / 63, 6)
    assert out[30].rrf_score == round(1 / 63, 6)
    assert (out[20].n_retrievers, out[20].best_rank) == (2, 1)
    assert (out[40].n_retrievers, out[40].best_rank) == (1, 2)
    # fused order: overlap beats singletons
    ordered = rrf_fuse([lex, sem], rrf_k=60, k=2).collect()
    assert [r.doc_id for r in ordered] == [20, 10]
    with pytest.raises(ValueError):
        rrf_fuse([])


def test_bpe_segment_counts(spark):
    """Train+apply: per-doc BPE token counts must equal the reference
    segmentation applied to each document's words."""
    from census_data_pipeline_spark.functions.text import bpe_segment

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "aaaa aaaa aa baa",
        "wide wider widest",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    # reference final segmentation after 6 merges
    words = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                words[w] += 1
    seqs = {w: list(w) for w in words}
    for step in range(6):
        pc = Counter()
        for w, freq in words.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += freq
        if not pc:
            break
        (a, b), _ = min(pc.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
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
    got = {r.doc_id: r for r in bpe_segment(df, num_merges=6).collect()}
    for i, t in enumerate(texts):
        ws = [w for w in t.split(" ") if w]
        n_bpe = sum(len(seqs[w]) for w in ws)
        n_chars = sum(len(w) for w in ws)
        assert got[i].n_words == len(ws)
        assert got[i].n_chars == n_chars
        assert got[i].n_bpe_tokens == n_bpe
        assert got[i].chars_per_token == round(n_chars / n_bpe, 6)


def test_bpe_exhaustion_keeps_vocabulary(spark):
    """If mergeable pairs run out before num_merges, later rounds must
    be no-ops (empty argmax LEFT-joined, not cross-joined away): the
    merge table stops early and segmentation still covers every word."""
    from census_data_pipeline_spark.functions.text import (
        bpe_segment,
        bpe_train,
    )

    # 'aa aa': one merge possible, then every word is a single symbol
    df = spark.createDataFrame([(1, "aa aa")], "doc_id long, text string")
    merges = bpe_train(df, num_merges=4).collect()
    assert [(r.step, r.lhs, r.rhs) for r in merges] == [(1, "a", "a")]
    seg = bpe_segment(df, num_merges=4).collect()[0]
    assert (seg.n_words, seg.n_bpe_tokens, seg.n_chars) == (2, 2, 4)
    # no pairs at all: zero merges, segmentation = one char per token
    df2 = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    assert bpe_train(df2, num_merges=2).count() == 0
    seg2 = bpe_segment(df2, num_merges=2).collect()[0]
    assert (seg2.n_words, seg2.n_bpe_tokens) == (3, 3)


def test_token_budget_sample_semantics(spark):
    """Quota filling: docs kept in seeded-hash order until the budget is
    reached; the crossing doc is included; later docs dropped; a source
    under budget keeps everything."""
    import hashlib

    from census_data_pipeline_spark.functions.sampling import (
        token_budget_sample,
    )

    rows = [(i, "s1", "w " * 9 + "w") for i in range(10)]       # 10 tokens
    rows += [(100, "s2", "a b c")]                              # 3 tokens
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = token_budget_sample(df, budget_tokens=25, key_col="doc_id",
                              seed=7).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    # s1: 10-token docs -> cum 10, 20, 30: third doc crosses 25, included
    s1 = sorted(by_src["s1"], key=lambda r: r.cum_tokens)
    assert [r.cum_tokens for r in s1] == [10, 20, 30]
    # the kept set follows the md5('7:'||id) order exactly
    order = sorted(range(10), key=lambda i: (
        hashlib.md5(f"7:{i}".encode()).hexdigest()[:9], i))
    assert [r.doc_id for r in s1] == order[:3]
    # s2 total (3) < budget: kept whole
    assert [r.cum_tokens for r in by_src["s2"]] == [3]
    with pytest.raises(ValueError):
        token_budget_sample(df, budget_tokens=0)


def test_dedup_index_matches_direct_and_appends(spark, tmp_path):
    """The materialized dedup index must reproduce minhash_dedup_against
    EXACTLY; append mode grows it to the union reference; parameter
    mismatch on append is refused."""
    from census_data_pipeline_spark.functions.dedup import (
        minhash_dedup_against,
        minhash_dedup_against_index,
        write_dedup_index,
    )

    shared1 = "alpha beta gamma delta epsilon zeta eta theta"
    shared2 = "one two three four five six seven eight"
    ref1 = spark.createDataFrame(
        [(100, shared1), (101, "reference only words here nothing")],
        "doc_id long, text string",
    )
    ref2 = spark.createDataFrame(
        [(200, shared2)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, shared1), (2, shared2), (3, "fresh crawl novel content")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "dedup_index")
    write_dedup_index(ref1, path, n=3)
    got1 = {(r.id, r.ref_id, r.jaccard) for r in
            minhash_dedup_against_index(new, path, threshold=0.5).collect()}
    want1 = {(r.id, r.ref_id, r.jaccard) for r in
             minhash_dedup_against(new, ref1, n=3, threshold=0.5).collect()}
    assert got1 == want1 == {(1, 100, 1.0)}

    # append the second curated batch: index == dedup vs ref1 UNION ref2
    write_dedup_index(ref2, path, n=3, mode="append")
    got2 = {(r.id, r.ref_id, r.jaccard) for r in
            minhash_dedup_against_index(new, path, threshold=0.5).collect()}
    want2 = {(r.id, r.ref_id, r.jaccard) for r in minhash_dedup_against(
        new, ref1.unionAll(ref2), n=3, threshold=0.5).collect()}
    assert got2 == want2 == {(1, 100, 1.0), (2, 200, 1.0)}

    # capped probe still flags everything here (small buckets)
    capped = {(r.id, r.ref_id) for r in minhash_dedup_against_index(
        new, path, threshold=0.5, bucket_cap=4).collect()}
    assert capped == {(1, 100), (2, 200)}

    # parameter guard: appending with different shingle n is refused
    with pytest.raises(ValueError):
        write_dedup_index(ref2, path, n=4, mode="append")
    with pytest.raises(ValueError):
        write_dedup_index(ref2, path, mode="frobnicate")


def test_tag_keywords_semantics(spark):
    from census_data_pipeline_spark.functions.text import tag_keywords

    docs = spark.createDataFrame(
        [(1, "hash join beats nested loop hash join"),
         (2, "full table scan again"),
         (3, "nothing relevant here"),
         (4, "scan")],                      # shorter than the 2-gram
        "doc_id long, text string",
    )
    phrases = spark.createDataFrame(
        [("hash join",), ("table scan",), ("scan",)], "phrase string"
    )
    out = {(r.id, r.phrase): r.n_hits
           for r in tag_keywords(docs, phrases).collect()}
    assert out[(1, "hash join")] == 2      # multiplicity counted
    assert out[(2, "table scan")] == 1
    assert out[(2, "scan")] == 1           # 1-gram matches inside doc 2
    assert out[(4, "scan")] == 1
    assert all(k[0] != 3 for k in out)     # no-hit docs absent
    import pytest as _pytest
    with _pytest.raises(ValueError):
        tag_keywords(docs, phrases.filter("phrase = 'zzz-none'"))


def test_normalize_unicode_forms(spark):
    """Real Unicode work (the corpus is ASCII, so the unit test carries
    the non-trivial cases): decomposed e+combining-acute -> composed é
    under NFC; the ﬁ ligature survives NFC but splits under NFKC; None
    passes through."""
    from census_data_pipeline_spark.functions.text import normalize_unicode

    decomposed = "café"        # cafe + combining acute
    ligature = "ﬁne"                  # ﬁne
    df = spark.createDataFrame(
        [(1, decomposed), (2, ligature), (3, None), (4, "plain ascii")],
        "doc_id long, text string",
    )
    nfc = {r.doc_id: r for r in normalize_unicode(df, form="NFC").collect()}
    assert nfc[1].text_norm == "café"
    assert nfc[1].changed and nfc[1].n_cp_before == 5 and nfc[1].n_cp_after == 4
    assert nfc[2].text_norm == ligature and not nfc[2].changed
    assert nfc[3].text_norm is None and nfc[3].changed is None
    assert nfc[4].text_norm == "plain ascii" and not nfc[4].changed
    nfkc = {r.doc_id: r for r in normalize_unicode(df, form="NFKC").collect()}
    assert nfkc[2].text_norm == "fine" and nfkc[2].changed
    import pytest as _pytest
    with _pytest.raises(ValueError):
        normalize_unicode(df, form="NFX")


def test_kmeans_lloyd_matches_reference(spark):
    """Two Lloyd rounds vs a pure-Python reference with the same seeded
    init, rounded means, and lowest-cell tie break."""
    from census_data_pipeline_spark.functions.similarity import kmeans_lloyd

    vecs = [(i, [float((i * 13 + j * 7) % 10 - 5) for j in range(4)])
            for i in range(30)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")

    def ref(vectors, k, iterations):
        cents = [list(map(float, v)) for _, v in vectors[:k]]
        assign = {}
        for _ in range(iterations + 1):  # final pass assigns only
            assign = {}
            for vid, x in vectors:
                best = min(
                    range(len(cents)),
                    key=lambda c: (
                        sum(a * a for a in x)
                        - 2 * sum(a * b for a, b in zip(x, cents[c]))
                        + sum(b * b for b in cents[c]),
                        c,
                    ),
                )
                assign[vid] = best
            new = {}
            for vid, x in vectors:
                new.setdefault(assign[vid], []).append(x)
            cents_map = {
                c: [round(sum(col) / len(col), 6) for col in zip(*xs)]
                for c, xs in new.items()
            }
            keys = sorted(cents_map)
            remap = {c: i for i, c in enumerate(keys)}
            cents = [cents_map[c] for c in keys]
            assign = {vid: remap[c] for vid, c in assign.items()}
        return assign

    # NOTE: the reference recomputes means after the final assignment
    # too, but cells only relabel when one empties — with none empty
    # here, labels are stable; compare final assignment only
    got = {r.id: r.cell for r in kmeans_lloyd(df, k=3, iterations=2).collect()}
    vectors = [(i, v) for i, v in vecs]
    want = ref(vectors, 3, 2)
    assert got == want
    # every id assigned exactly once, cells within range
    assert set(got) == set(range(30)) and set(got.values()) <= {0, 1, 2}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        kmeans_lloyd(df, k=0)


def test_training_shards_round_trip_and_verify(spark, tmp_path):
    """JSONL shard export round-trips with a verified manifest; a
    corrupted line is DETECTED on load (the order-independent xor
    fingerprint), not silently trained on."""
    import glob
    import os

    from census_data_pipeline_spark.sources.exporters import (
        read_training_shards,
        write_training_shards,
    )

    df = spark.createDataFrame(
        [(i, i % 3, f"doc {i} text tokens here") for i in range(30)],
        "doc_id long, shard int, text string",
    )
    path = str(tmp_path / "shards")
    manifest = {r.shard: (r.n_docs, r.n_tokens)
                for r in write_training_shards(df, path).collect()}
    assert manifest == {0: (10, 50), 1: (10, 50), 2: (10, 50)}
    # one directory per shard, JSONL lines inside
    assert sorted(os.path.basename(p) for p in glob.glob(path + "/shard=*")) \
        == ["shard=0", "shard=1", "shard=2"]

    loaded = read_training_shards(spark, path)
    assert loaded.count() == 30
    assert {r.doc_id for r in loaded.collect()} == set(range(30))

    # corrupt one line -> verified load raises. The local filesystem's
    # CRC sidecar would catch a plain overwrite first, so remove it —
    # the manifest must catch what the transport layer cannot (object
    # stores have no .crc)
    victim = glob.glob(path + "/shard=1/*.json")[0]
    crc = os.path.join(os.path.dirname(victim),
                       "." + os.path.basename(victim) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)
    lines = open(victim).read().splitlines()
    lines[0] = lines[0].replace("tokens", "tampered")
    with open(victim, "w") as f:
        f.write("\n".join(lines) + "\n")
    with pytest.raises(ValueError, match="manifest mismatch.*1"):
        read_training_shards(spark, path)
    # unverified load still works (explicit opt-out)
    assert read_training_shards(spark, path, verify=False).count() == 30


def test_benford_audit_semantics(spark):
    """Digits from the half-up-rounded cents string: 1.994 -> 199 cents
    -> digit 1; 0.005 -> 1 cent -> digit 1 (magnitude-free); zero/
    negative/null excluded; chi2 term zero when observed == expected
    cannot happen with 9 digits but the shares must sum to 1."""
    from census_data_pipeline_spark.operators.quality import benford_audit

    df = spark.createDataFrame(
        [(1.994,), (0.005,), (8.21,), (92.0,), (None,), (-5.0,), (0.0,)],
        "v double",
    )
    out = {r.digit: r for r in benford_audit(df, "v").collect()}
    assert set(out) == {1, 8, 9}
    assert (out[1].n, out[8].n, out[9].n) == (2, 1, 1)
    assert abs(sum(r.observed_p for r in out.values()) - 1.0) < 1e-9
    import math
    assert out[1].expected_p == round(math.log10(2), 6)
    assert all(r.chi2_term >= 0 for r in out.values())
    import pytest as _pytest
    with _pytest.raises(ValueError):
        benford_audit(df, "v", scale=0)


def test_exact_kth_scalable_narrowing(spark):
    """Force the range-narrowing loop (tiny tail threshold) and verify
    exactness against sorted ground truth: extremes, duplicates, even/
    odd medians, all-equal collapse, and validation errors."""
    from census_data_pipeline_spark.operators.rollup import (
        exact_kth_scalable,
        exact_median_scalable,
    )

    vals = sorted(((i * 37) % 101) * 0.5 for i in range(101))
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    for k in (1, 2, 50, 51, 100, 101):
        got = exact_kth_scalable(df, "v", k, n_buckets=8, tail_threshold=4)
        assert got == vals[k - 1], (k, got, vals[k - 1])
    # interpolated median, odd n
    m = exact_median_scalable(df, "v").collect()[0]
    assert (m.n, m.median) == (101, round(vals[50], 6))
    # even n with nulls excluded
    df2 = spark.createDataFrame(
        [(1.0,), (3.0,), (2.0,), (None,), (10.0,)], "v double"
    )
    m2 = exact_median_scalable(df2, "v").collect()[0]
    assert (m2.n, m2.median) == (4, 2.5)
    # all-equal bucket collapses immediately
    df3 = spark.createDataFrame([(7.5,)] * 50, "v double")
    assert exact_kth_scalable(df3, "v", 25, n_buckets=4,
                              tail_threshold=2) == 7.5
    with pytest.raises(ValueError):
        exact_kth_scalable(df, "v", 0)
    with pytest.raises(ValueError):
        exact_kth_scalable(df, "v", 102)
    with pytest.raises(ValueError):
        exact_median_scalable(df2.filter("v IS NULL"), "v")


def test_chi2_drift_semantics(spark):
    """Hand-computed 2x2 chi-square; one-sided categories contribute
    with observed=0 instead of dropping."""
    from census_data_pipeline_spark.operators.drift import chi2_drift

    ref = spark.createDataFrame(
        [("a",)] * 30 + [("b",)] * 10, "c string"
    )
    cur = spark.createDataFrame(
        [("a",)] * 10 + [("b",)] * 30 + [("z",)] * 2, "c string"
    )
    out = {r.c: r for r in chi2_drift(ref, cur, "c").collect()}
    # expected for 'a': e_ref = 40*40/82, e_cur = 42*40/82
    e_ref = 40 * 40 / 82
    e_cur = 42 * 40 / 82
    want = (30 - e_ref) ** 2 / e_ref + (10 - e_cur) ** 2 / e_cur
    assert out["a"].contribution == round(want, 6)
    assert (out["a"].n_ref, out["a"].n_cur) == (30, 10)
    # 'z' exists only on the current side: contributes, not dropped
    ez_ref, ez_cur = 40 * 2 / 82, 42 * 2 / 82
    wz = (0 - ez_ref) ** 2 / ez_ref + (2 - ez_cur) ** 2 / ez_cur
    assert out["z"].n_ref == 0 and out["z"].contribution == round(wz, 6)


def test_ranking_metrics_semantics(spark):
    from census_data_pipeline_spark.functions.similarity import (
        ranking_metrics,
    )

    truth = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2)],
        "query_id long, neighbor_id long, rank int",
    )
    approx = spark.createDataFrame(
        [(1, 99, 1), (1, 11, 2), (1, 12, 3),   # 2 of 3 relevant; first at 2
         (2, 98, 1), (2, 97, 2)],              # nothing relevant
        "query_id long, neighbor_id long, rank int",
    )
    out = {r.query_id: r for r in
           ranking_metrics(approx, truth, k=3).collect()}
    assert (out[1].n_relevant, out[1].n_hit) == (3, 2)
    assert out[1].recall_at_k == round(2 / 3, 6)
    assert out[1].rr == 0.5            # first relevant at approx rank 2
    assert (out[2].n_hit, out[2].recall_at_k, out[2].rr) == (0, 0.0, 0.0)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        ranking_metrics(approx, truth, k=0)


def test_association_rules_semantics(spark):
    """Hand-computed support/confidence/lift; within-basket repeats
    count once; the min_co floor prunes; direction matters."""
    from census_data_pipeline_spark.operators.basket import (
        association_rules,
    )

    rows = []
    for b in range(1, 9):
        rows += [(b, "bread"), (b, "butter")]       # together in 8
    rows += [(9, "bread"), (9, "bread")]            # repeat counts once
    rows += [(10, "butter"), (10, "jam"), (11, "jam")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {(r.antecedent, r.consequent): r
           for r in association_rules(df, "basket", "item",
                                      min_co=2, k=10).collect()}
    r = out[("bread", "butter")]
    # n_baskets=11, bread in 9, butter in 9, both in 8
    assert r.n_both == 8
    assert r.support == round(8 / 11, 6)
    assert r.confidence == round(8 / 9, 6)
    assert r.lift == round(8 * 11 / (9 * 9), 6)
    # direction flips the antecedent count (same here), but the
    # butter->jam rule (1 co-basket) is pruned by min_co=2
    assert ("butter", "jam") not in out and ("jam", "butter") not in out
    import pytest as _pytest
    with _pytest.raises(ValueError):
        association_rules(df, "basket", "item", min_co=0)


def test_token_budget_sample_rejects_output_column_clash(spark):
    from census_data_pipeline_spark.functions.sampling import (
        token_budget_sample,
    )

    df = spark.createDataFrame(
        [(1, "s", "a b", 5)],
        "doc_id long, source string, text string, n_tokens long",
    )
    with pytest.raises(ValueError, match="n_tokens"):
        token_budget_sample(df, budget_tokens=10)


def test_nearest_site_join_semantics(spark):
    from census_data_pipeline_spark.operators.geo import nearest_site_join

    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 50.0, 10.0)], "id long, lat double, lon double"
    )
    sites = spark.createDataFrame(
        [(100, 1.0, 1.0), (200, 49.0, 9.0), (300, -40.0, 120.0)],
        "site_id long, lat double, lon double",
    )
    out = {r.id: r for r in nearest_site_join(pts, sites).collect()}
    assert out[1].site_id == 100 and out[2].site_id == 200
    assert out[1].dist_km > 0 and out[2].dist_km > 0
    # equidistant tie -> smallest site id wins deterministically
    sites2 = spark.createDataFrame(
        [(7, 10.0, 0.0), (5, -10.0, 0.0)],
        "site_id long, lat double, lon double",
    )
    tied = nearest_site_join(pts.filter("id = 1"), sites2).collect()[0]
    assert tied.site_id == 5


def test_hard_negatives_ivf_full_probe_equivalence_and_recall_floor(spark):
    """Beyond-broadcast hard-negative mining (VERDICT r5 #5): with
    n_probes == n_centroids the IVF path must be OUTPUT-IDENTICAL to the
    broadcast form; with partial probes, recall vs exact must clear a
    floor on clustered data (the regime IVF is built for)."""
    import math

    from census_data_pipeline_spark.functions.similarity import (
        hard_negatives,
        hard_negatives_ivf,
    )

    # 4 well-separated direction clusters x 24 vectors, labels split
    # within each cluster so near-misses exist inside every cluster
    rows = []
    dirs = [(1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0),
            (0.577, 0.577, 0.577)]
    vid = 0
    for ci, (dx, dy, dz) in enumerate(dirs):
        for j in range(24):
            e = 0.05 * math.sin(vid * 2.39996)
            f = 0.05 * math.cos(vid * 1.17)
            rows.append(
                (vid, [dx + e, dy + f, dz + 0.03 * ((j % 5) - 2)],
                 (ci * 2 + j % 2))
            )
            vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    anchors = df.filter("vec_id % 6 = 0")  # 16 anchors across clusters

    exact = hard_negatives(df, anchors, k=3).collect()
    full = hard_negatives_ivf(
        df, anchors, k=3, n_centroids=8, n_probes=8
    ).collect()
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    as_map = lambda rs: {  # noqa: E731
        key(r): (r.neighbor_id, r.neighbor_label, r.cosine_sim) for r in rs
    }
    assert as_map(full) == as_map(exact)  # full probing == broadcast form

    part = hard_negatives_ivf(
        df, anchors, k=3, n_centroids=8, n_probes=3
    ).collect()
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact}
    part_pairs = {(r.query_id, r.neighbor_id) for r in part}
    recall = len(part_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.8, recall
    # contract columns/ordering identical to the broadcast form
    assert part and set(part[0].asDict()) == set(exact[0].asDict())
