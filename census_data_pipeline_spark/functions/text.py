"""Text-analysis operators for the LLM-data-pipeline tier (SURVEY.md §2.11).

Not in the reference (it has only lower+contains catalog search,
census_pipeline.py:444-455); required by the north star. Everything here is
**pure Catalyst expressions** — split/transform/aggregate array functions,
no Python UDFs — so the whole text path stays inside whole-stage codegen
and scales linearly with input at 100 TB.

Design notes:
- tokenization = whitespace split (documents are pre-normalized); a
  BPE-ish fallback regex splits punctuation off tokens for raw text.
- fingerprints/minhash use md5, which is deterministic, available in both
  Spark and standard SQL engines (oracle-comparable), and uniformly
  distributed — fine for sketching (not for security).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from census_data_pipeline_spark.sources.catalog import ensure_parallelism

# Tiny deterministic stopword set used for quality scoring / lang-id.
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")

# BPE-ish tokenizer: splits on whitespace after separating punctuation runs.
TOKEN_REGEX = r"\s+"
PUNCT_REGEX = r"([\p{Punct}])"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of a pre-normalized text column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def tokens_bpeish(col: Column | str) -> Column:
    """Tokenizer for raw text: lowercase, isolate punctuation, split on
    whitespace runs, drop empties."""
    c = F.col(col) if isinstance(col, str) else col
    separated = F.regexp_replace(F.lower(c), PUNCT_REGEX, r" $1 ")
    return F.filter(F.split(F.trim(separated), TOKEN_REGEX), lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(col)))


def shingles(col: Column | str, n: int = 3) -> Column:
    """Deduplicated word n-gram shingles as an array column: the
    dedup/minhash unit. Documents shorter than n words yield a single
    whole-text shingle so no row silently drops out of dedup. Shares the
    codegen-friendly regex gram builder (see ``word_grams`` for why)."""
    return F.array_distinct(word_grams(col, n))


def word_grams(col: Column | str, n: int) -> Column:
    """Positional word n-grams WITH multiplicity (contrast ``shingles``,
    which dedups for set-based sketching): repetition analysis needs the
    duplicate occurrences. Documents shorter than n words yield a single
    whole-text gram.

    Built with an anchored overlapping-lookahead regex rather than
    ``transform``+``slice`` lambdas: higher-order functions drop the whole
    projection out of whole-stage codegen and cost ~µs of interpreted lambda
    dispatch per element — measured 3.5× slower end-to-end on the sf0.1
    corpus. The regex form assumes single-space-normalized text, the same
    contract ``tokens`` already relies on. ``(?:^| )`` pins each match to a
    token boundary; the zero-width lookahead keeps matches overlapping."""
    c = F.col(col) if isinstance(col, str) else col
    pattern = r"(?:^| )(?=(" + r" ".join([r"\S+"] * n) + r"))"
    grams = F.regexp_extract_all(c, F.lit(pattern), 1)
    return F.when(F.size(grams) > 0, grams).otherwise(F.array(c))


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 2,
    dup_n: int = 3,
) -> DataFrame:
    """Gopher-style repetition quality signals per document (Rae et al.
    2021 §A1.1; not in the reference, which has no text-quality surface):

    - ``top_gram_frac``: occurrences of the single most frequent ``top_n``-gram
      divided by total ``top_n``-grams — catches boilerplate/spam pages that
      repeat one phrase.
    - ``dup_gram_frac``: fraction of ``dup_n``-grams that are repeats of an
      earlier occurrence — catches templated/looped text.

    Scale shape: ``dup_gram_frac`` is a narrow per-row array expression
    (codegen, zero shuffle). ``top_gram_frac`` needs a per-(doc, gram) count,
    which no per-row array form computes in linear time, so it explodes and
    aggregates — shuffle volume ≈ corpus token count with map-side partial
    aggregation, the same linear shape every distributed word-count has. The
    final doc-level join is AQE-handled (both sides hash on ``id_col``).
    Both fractions are exact integer ratios — deterministic across engines.
    """
    gid = F.col(id_col)
    top = (
        df.select(gid, F.explode(word_grams(text_col, top_n)).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg((F.max("c") / F.sum("c")).alias("top_gram_frac"))
    )
    g_dup = word_grams(text_col, dup_n)
    narrow = df.select(
        gid,
        (
            (F.size(g_dup) - F.size(F.array_distinct(g_dup))) / F.size(g_dup)
        ).alias("dup_gram_frac"),
    )
    return narrow.join(top, id_col)


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    t = tokens(col)
    stops = F.filter(t, lambda x: x.isin(*stopwords))
    return F.size(stops) / F.size(t)


def quality_score(col: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic: rewards reasonable length and
    penalizes extreme stopword ratios. Pure arithmetic (no transcendentals)
    so any SQL engine reproduces it bit-for-bit."""
    n = token_count(col).cast("double")
    length_term = F.least(n / F.lit(100.0), F.lit(1.0))
    stop = stopword_ratio(col)
    # ideal stopword band around ~0.25; linear penalty outside it
    stop_term = F.greatest(F.lit(0.0), F.lit(1.0) - F.abs(stop - F.lit(0.25)) * F.lit(2.0))
    return F.round(F.lit(0.6) * length_term + F.lit(0.4) * stop_term, 6)


# Marker-token heuristic language ID: deterministic, SQL-expressible.
# Real systems use char-n-gram profiles (e.g. CLD); the engine keeps the
# decision surface identical across engines for oracle checking.
LANG_MARKERS: tuple[tuple[str, str], ...] = (
    ("en", "the"),
    ("es", "el"),
    ("fr", "le"),
    ("de", "der"),
)


def lang_id(col: Column | str, default: str = "und") -> Column:
    t = tokens(col)
    expr: Column | None = None
    for lang, marker in LANG_MARKERS:
        cond = F.array_contains(t, marker)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit(default))


def fingerprint(col: Column | str, n: int = 3) -> Column:
    """Document fingerprint: minimum md5 over word-shingles (1-permutation
    minhash). Identical documents → identical fingerprint; near-identical
    documents collide with probability = their shingle-Jaccard."""
    return F.array_min(F.transform(shingles(col, n), F.md5))


def chunk_texts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    training-sample generator of an LLM data pipeline (context-length
    packing input). Chunk i covers tokens [i*stride+1, i*stride+chunk_size];
    the final chunk keeps the tail (shorter than chunk_size when the
    document doesn't divide evenly). Documents with <= chunk_size tokens
    yield exactly one chunk.

    Pure Catalyst (sequence/transform/slice + posexplode): the fan-out is
    narrow, codegen-fused, shuffle-free — at 100 TB it's a map-only stage,
    unlike a row-at-a-time UDTF doing the same thing.
    """
    if chunk_size < 1 or stride < 1:
        raise ValueError("chunk_size and stride must be >= 1")
    t = tokens(text_col)
    n = F.size(t)
    n_chunks = (
        F.ceil(F.greatest(n - chunk_size, F.lit(0)) / F.lit(float(stride))) + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(t, i * stride + 1, chunk_size)),
    )
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            "chunk_text",
            F.size(F.split("chunk_text", " ")).cast("long").alias("chunk_tokens"),
        )
    )


def add_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience projection: token/char/distinct counts + quality."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(c),
            "n_distinct_tokens": distinct_token_count(c),
            "n_chars_computed": F.length(c),
            "quality": quality_score(c),
        }
    )


# PII scrubbing: conservative patterns that parse identically under Java
# regex (Spark) and RE2 (DuckDB) — no lookarounds, no backrefs, so the
# DuckDB oracle can replicate redaction exactly.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "phone": r"\(?[0-9]{3}\)?[ -]?[0-9]{3}-[0-9]{4}",
}


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    output_col: str | None = None,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Redact PII spans (training-data hygiene): each pattern class is
    counted (``n_<class>`` columns) and replaced with ``[<CLASS>]``.
    Pure ``regexp_extract_all``/``regexp_replace`` — codegen, no UDF, one
    narrow pass. Patterns are applied in dict order; counts are taken
    BEFORE any replacement so overlapping classes count independently."""
    out = output_col or text_col
    pats = patterns or PII_PATTERNS
    counts = {
        f"n_{name}": F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
        ).cast("long")
        for name, pat in pats.items()
    }
    cleaned = F.col(text_col)
    for name, pat in pats.items():
        cleaned = F.regexp_replace(cleaned, pat, f"[{name.upper()}]")
    return df.withColumns({**counts, out: cleaned})


def pack_token_bins(
    df: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    group_cols: tuple[str, ...] = ("source",),
    order_col: str = "doc_id",
    scalable: bool = False,
) -> DataFrame:
    """Concat-and-cut sequence packing (training-batch prep): documents
    are laid end-to-end in ``order_col`` order within each group and cut
    into bins of ``budget`` tokens; a document's bin is where its FIRST
    token lands (documents may straddle bin boundaries — the downstream
    chunker handles splits, see ``chunk_texts``). One window cumsum per
    group — the deterministic, shuffle-once formulation; true first-fit
    bin packing is inherently sequential and not worth the coordination
    at 100 TB.

    ``scalable=True`` swaps the direct window for the two-phase parallel
    prefix sum (operators/prefixsum.running_sum_scalable) so a single hot
    group no longer serializes one task — results are identical
    (property-tested, and the oracle-checked query runs the scalable path
    against a plain-window SQL oracle)."""
    if scalable:
        from census_data_pipeline_spark.operators.prefixsum import (
            running_sum_scalable,
        )

        cummed = running_sum_scalable(
            df, order_col, tokens_col,
            group_cols=list(group_cols), output_col="__cum",
        )
        return cummed.withColumn(
            "bin_id",
            F.floor((F.col("__cum") - F.col(tokens_col)) / F.lit(budget))
            .cast("long"),
        ).drop("__cum")
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(order_col)
    cum = F.sum(tokens_col).over(w)
    return df.withColumn(
        "bin_id",
        F.floor((cum - F.col(tokens_col)) / F.lit(budget)).cast("long"),
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unigram language-model scoring — the CCNet-style perplexity proxy
    used to quality-rank corpora: fit the MLE unigram model on the corpus
    itself (token frequencies / total tokens) and score every document by
    its mean token log-probability. Low ``avg_logprob`` (high
    ``ppl_proxy``) = unusual token distribution — boilerplate, code
    dumps, lorem-ipsum, non-language noise; the standard filter keeps the
    middle of the distribution.

    Scale shape: one exploded token pass (checkpointed — it feeds the
    frequency model, the total, and the scoring join), one groupBy(token)
    frequency model, a shuffle join tokens⋈freq on the token (the model
    is vocabulary-sized — broadcast-able for small vocabularies, and AQE
    decides), one groupBy(doc). ``ppl_proxy`` is exp(−avg) computed from
    the ALREADY-ROUNDED average so both engines derive it from identical
    inputs (fp discipline)."""
    tok = (
        ensure_parallelism(df)
        .select(F.col(id_col), F.explode(tokens(text_col)).alias("__t"))
        .localCheckpoint(eager=False)
    )
    freq = tok.groupBy("__t").agg(F.count("*").alias("__c"))
    total = tok.agg(F.count("*").alias("__n"))
    scored = (
        tok.join(freq, "__t")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            F.log(F.col("__c") / F.col("__n")).alias("__lp"),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(F.avg("__lp"), 6).alias("avg_logprob"),
        )
    )
    return scored.withColumn(
        "ppl_proxy", F.round(F.exp(-F.col("avg_logprob")), 4)
    )


def dsir_logratio(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    resolution: int = 4096,
) -> DataFrame:
    """DSIR-style importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023, arXiv:2302.03169): fit hashed
    bag-of-words unigram models over a curated TARGET subset (rows where
    ``target`` is true) and over the raw corpus, then score every
    document by its log-likelihood ratio Σ_tokens ln(p_target/p_raw) —
    the importance weight DSIR resamples by (pair with
    ``sampling.temperature_resample``-style keep rates or a top-k cut for
    the selection step).

    Features are md5-prefix hash buckets (3 hex chars = 4096 buckets) —
    the same engine-parity trick as ``sampling``: the bucket is a string
    both engines derive identically, so no integer-conversion dialect
    drift. ``alpha`` is add-α smoothing over the bucket space (unseen
    target buckets get mass α / (N_t + α·R)).

    Scale shape: one exploded token pass (checkpointed — feeds both
    models and the scoring join), two bucket-count aggs (≤``resolution``
    rows each), and a scoring join tokens⋈weights where the weight frame
    is AT MOST ``resolution`` rows — broadcast, so the corpus never
    shuffles for scoring; the only wide exchange is the groupBy(doc)."""
    if resolution != 4096:
        raise ValueError("resolution must be 4096 (3 md5 hex chars)")
    tok = (
        ensure_parallelism(df)
        .select(
            F.col(id_col),
            target.alias("__tgt"),
            F.explode(tokens(text_col)).alias("__t"),
        )
        .select(
            id_col, "__tgt",
            F.substring(F.md5("__t"), 1, 3).alias("__b"),
        )
        .localCheckpoint(eager=False)
    )
    raw = tok.groupBy("__b").agg(F.count("*").alias("__ca"))
    tgt = tok.filter("__tgt").groupBy("__b").agg(F.count("*").alias("__ct"))
    n_raw = tok.agg(F.count("*").alias("__na"))
    n_tgt = tok.filter("__tgt").agg(F.count("*").alias("__nt"))
    r = float(resolution)
    weights = (
        raw.join(tgt, "__b", "left")
        .crossJoin(F.broadcast(n_raw))
        .crossJoin(F.broadcast(n_tgt))
        .select(
            "__b",
            (
                F.log((F.coalesce("__ct", F.lit(0)) + alpha)
                      / (F.col("__nt") + alpha * r))
                - F.log((F.col("__ca") + alpha)
                        / (F.col("__na") + alpha * r))
            ).alias("__lw"),
        )
    )
    return (
        tok.join(F.broadcast(weights), "__b")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(F.sum("__lw"), 6).alias("logratio"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
) -> DataFrame:
    """Interpolated bigram LM scoring — the next step up from
    ``unigram_logprob`` on the CCNet-style quality ladder:

        p(w | prev) = λ · c(prev, w)/c(prev·) + (1−λ) · c(w)/N

    fit on the corpus itself (MLE counts; ``c(prev·)`` is the count of
    ``prev`` as a bigram context, so the conditional sums to 1), scored
    as each document's mean ln p over its bigram positions. Repetitive
    or templated text scores HIGH (its transitions are predictable);
    token-salad noise scores LOW — ranking by this catches what unigram
    frequency cannot (scrambled words keep their unigram score).

    Documents with fewer than two tokens have no bigram positions and
    are omitted (no row), matching the SQL oracle's inner-join shape.

    Scale: the bigram explode is narrow (arrays_zip of two slices);
    both count models are groupBy aggs bounded by the observed bigram
    vocabulary; scoring joins on the bigram key then the unigram key —
    AQE broadcasts whichever model frame is small. The exploded frame
    is checkpointed once and feeds models and scoring."""
    toks = tokens(text_col)
    n = F.size(toks)
    big = (
        ensure_parallelism(df)
        .select(
            F.col(id_col),
            F.explode(
                F.arrays_zip(
                    F.slice(toks, 1, n - 1).alias("prev"),
                    F.slice(toks, 2, n - 1).alias("w"),
                )
            ).alias("__b"),
        )
        .select(id_col, F.col("__b.prev").alias("__p"),
                F.col("__b.w").alias("__w"))
        .localCheckpoint(eager=False)
    )
    uni = (
        ensure_parallelism(df)
        .select(F.explode(toks).alias("__w"))
        .localCheckpoint(eager=False)
    )
    c2 = big.groupBy("__p", "__w").agg(F.count("*").alias("__c2"))
    c1 = big.groupBy("__p").agg(F.count("*").alias("__c1"))
    cu = uni.groupBy("__w").agg(F.count("*").alias("__cu"))
    nt = uni.agg(F.count("*").alias("__n"))
    p = (
        F.lit(lam) * (F.col("__c2") / F.col("__c1"))
        + F.lit(1.0 - lam) * (F.col("__cu") / F.col("__n"))
    )
    return (
        big.join(c2, ["__p", "__w"])
        .join(c1, "__p")
        .join(cu, "__w")
        .crossJoin(F.broadcast(nt))
        .select(id_col, F.log(p).alias("__lp"))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(F.avg("__lp"), 6).alias("avg_logprob2"),
        )
    )


def chi2_feature_selection(
    df: DataFrame,
    class_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 5,
) -> DataFrame:
    """Per-class χ² feature selection over document-level token presence
    (Manning/Schütze/Raghavan IR ch. 13 — the classic supervised
    vocabulary pruner): for each (token, class) contingency table

        n11 docs-in-class containing t,   n10 other docs containing t,
        n01 docs-in-class without t,      n00 the rest,

        χ² = N · (n11·n00 − n10·n01)² / ((n11+n01)(n11+n10)(n10+n00)(n01+n00))

    and the ``top_k`` tokens per class by χ² (ties by token). All counts
    are exact integers; the χ² arithmetic runs in double (at web scale
    the integer products overflow int64 — doubles are exact up to 2^53
    and both engines evaluate the identical expression tree).

    Scale shape: doc-level presence explode (array_distinct, narrow) →
    one groupBy((token, class)) count + one groupBy(token) count — both
    word-count shapes; class totals and N are a broadcast frame; the
    per-class top-k is a bounded groupBy-window over ~vocab rows."""
    from pyspark.sql import Window

    pres = ensure_parallelism(df).select(
        F.col(id_col),
        F.col(class_col).alias("__c"),
        F.explode(F.array_distinct(tokens(text_col))).alias("__t"),
    ).localCheckpoint(eager=False)
    n_tc = pres.groupBy("__t", "__c").agg(
        F.count("*").cast("double").alias("__n11")
    )
    n_t = pres.groupBy("__t").agg(F.count("*").cast("double").alias("__nt"))
    n_c = df.groupBy(F.col(class_col).alias("__c")).agg(
        F.count("*").cast("double").alias("__nc")
    )
    n = df.agg(F.count("*").cast("double").alias("__n"))
    t = (
        n_tc.join(n_t, "__t")
        .join(F.broadcast(n_c), "__c")
        .crossJoin(F.broadcast(n))
    )
    n11 = F.col("__n11")
    n10 = F.col("__nt") - n11
    n01 = F.col("__nc") - n11
    n00 = F.col("__n") - F.col("__nt") - F.col("__nc") + n11
    num = F.col("__n") * F.pow(n11 * n00 - n10 * n01, 2)
    den = (n11 + n01) * (n11 + n10) * (n10 + n00) * (n01 + n00)
    scored = t.select(
        F.col("__c").alias("class"),
        F.col("__t").alias("token"),
        F.when(den != 0, F.round(num / den, 6)).otherwise(0.0).alias("chi2"),
    )
    w = Window.partitionBy("class").orderBy(
        F.col("chi2").desc(), F.col("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select("class", "token", "chi2", "rank")
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
) -> DataFrame:
    """Byte-Pair-Encoding vocabulary training (Sennrich et al. 2016) as
    DataFrame ops — the tokenizer-training step of an LLM data pipeline.
    Returns the learned merge table: one row per merge step,
    ``(step, lhs, rhs, merged, weight)`` where ``weight`` is the
    frequency-weighted count of the winning adjacent symbol pair.

    Classic BPE trains on the WORD-FREQUENCY table, not the corpus: the
    single corpus-scale pass here is the whitespace-tokenize + groupBy
    word count (one shuffle on the word); every merge round then works
    on the vocabulary-bounded word frame — at 100 TB the corpus pass
    dominates and the training loop is effectively free. Per round: one
    pair-count aggregation over the word frame, a deterministic global
    argmax (max weight, then lexicographically smallest pair), and one
    broadcast-merge applied via string ``replace``.

    Engine-parity trick (what makes this SQL-oracle-checkable): each
    word's symbol sequence is one string with DOUBLE-space delimiters
    ("␠␠a␠␠b␠␠"). The merge pattern "␠a␠␠b␠" consumes only the INNER
    space of each boundary pair, so a single left-to-right
    ``replace`` pass implements BPE's greedy non-overlapping merge
    (including runs like "aaaa" → "aa","aa") and restores the
    double-space invariant — identical semantics in Spark and DuckDB,
    no per-row recursion. Rounds are separated by eager
    ``localCheckpoint`` (the iterative-algorithm discipline: without it
    each round's 1-row argmax would re-derive every prior round)."""
    merge_rows, _syms = _bpe_rounds(_bpe_words(df, text_col), num_merges)
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionAll(m)
    return out


def _bpe_words(df: DataFrame, text_col: str) -> DataFrame:
    """(w, freq) word-frequency table — the one corpus-scale pass."""
    return (
        ensure_parallelism(df)
        .select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )


def _bpe_rounds(words: DataFrame, num_merges: int):
    """Shared BPE merge loop over a (w, freq) frame. Returns
    (merge_rows, final_syms) where merge_rows is a list of 1-row
    (step, lhs, rhs, merged, weight) frames and final_syms keeps
    (w, s, freq) — the word key rides along so `bpe_segment` can join
    the learned segmentation back onto the corpus."""
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    syms = words.select(
        "w",
        F.concat(
            F.lit("  "),
            F.array_join(
                F.expr("transform(sequence(1, length(w)), "
                       "i -> substring(w, i, 1))"),
                "  ",
            ),
            F.lit("  "),
        ).alias("s"),
        "freq",
    ).localCheckpoint(eager=True)

    merge_rows = []
    for step in range(1, num_merges + 1):
        pairs = syms.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(split(trim(s), '  ')) >= 2 THEN "
                    "transform(sequence(1, size(split(trim(s), '  ')) - 1), "
                    "i -> struct(element_at(split(trim(s), '  '), i) AS a, "
                    "element_at(split(trim(s), '  '), i + 1) AS b)) "
                    "ELSE array() END"
                )
            ).alias("p"),
            "freq",
        )
        best = (
            pairs.groupBy(F.col("p.a").alias("lhs"), F.col("p.b").alias("rhs"))
            .agg(F.sum("freq").alias("weight"))
            .orderBy(F.col("weight").desc(), "lhs", "rhs")
            .limit(1)
            .select(
                F.lit(step).alias("step"), "lhs", "rhs",
                F.concat("lhs", "rhs").alias("merged"), "weight",
            )
            .localCheckpoint(eager=True)
        )
        merge_rows.append(best)
        # LEFT join on true (not crossJoin): if pairs ran out this round,
        # ``best`` is EMPTY and a cross join would wipe the vocabulary —
        # the null-lhs branch keeps every word's segmentation as-is
        # (mirrors the reference implementation's loop break)
        syms = (
            syms.join(F.broadcast(best.select("lhs", "rhs")),
                      F.lit(True), "left")
            .select(
                "w",
                F.when(F.col("lhs").isNull(), F.col("s"))
                .otherwise(
                    F.expr(
                        "replace(s, ' ' || lhs || '  ' || rhs || ' ', "
                        "' ' || lhs || rhs || ' ')"
                    )
                )
                .alias("s"),
                "freq",
            )
            .localCheckpoint(eager=True)
        )
    return merge_rows, syms


def bpe_segment(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_merges: int = 8,
) -> DataFrame:
    """Train BPE on the corpus (``bpe_train``'s loop) and APPLY the
    learned segmentation back to every document — the token-counting
    step a training pipeline runs before packing/budgeting. Returns
    (id, n_words, n_chars, n_bpe_tokens, chars_per_token) where
    ``n_bpe_tokens`` is the document's token count under the learned
    vocabulary and ``chars_per_token`` the achieved compression.

    Scale shape: the word-frequency pass (one corpus shuffle), the
    vocabulary-bounded merge rounds, then ONE more corpus pass — tokens
    joined to the vocab-sized (word → subtoken-count) frame (AQE
    broadcasts it) and a per-doc aggregate. The corpus never carries
    symbol strings; only the word key moves."""
    words = _bpe_words(df, text_col)
    _merges, syms = _bpe_rounds(words, num_merges)
    vocab = syms.select(
        "w",
        F.size(F.split(F.trim(F.col("s")), "  ")).cast("long").alias("__nsub"),
    )
    tok = (
        ensure_parallelism(df)
        .select(F.col(id_col), F.explode(F.split(F.col(text_col), " "))
                .alias("w"))
        .filter(F.col("w") != "")
    )
    return (
        tok.join(vocab, "w")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.length("w")).alias("n_chars"),
            F.sum("__nsub").alias("n_bpe_tokens"),
            F.round(
                F.sum(F.length("w")) / F.sum("__nsub"), 6
            ).alias("chars_per_token"),
        )
    )


def pmi_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 50,
    min_pairs: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Pointwise mutual information over document-level co-occurrence —
    the collocation/word-association surface (phrase discovery, topic
    seeds, embedding sanity checks). For the ``vocab_size`` highest-
    document-frequency tokens, PMI(a,b) = ln(N·c_ab / (c_a·c_b)) where
    counts are document PRESENCE (a doc contributes a pair once). Output:
    the ``top_k`` pairs by (pmi desc, token_a, token_b) with
    ``c_ab >= min_pairs``, columns (token_a, token_b, n_docs_a,
    n_docs_b, n_docs_both, pmi).

    Scale shape: one exploded-distinct presence pass (one shuffle on the
    token), a vocab_size-row top frame broadcast back to prune the
    presence frame, then a per-document self-join whose fan-out is
    bounded at C(vocab_size, 2) per doc BY CONSTRUCTION (the vocabulary
    restriction is the hot-bucket cap of this operator — without it a
    long document goes quadratic in its distinct tokens). Both top-k
    cuts are ``orderBy().limit()`` = TakeOrderedAndProject (per-partition
    top-k, merge at the driver) — never an unpartitioned rank window
    over the corpus vocabulary. Final aggregation is vocab²-bounded."""
    pres = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("__d"),
                F.explode(tokens(text_col)).alias("__t"))
        .filter(F.col("__t") != "")
        .distinct()
        .localCheckpoint(eager=False)
    )
    dfreq = pres.groupBy("__t").agg(F.count("*").alias("__c"))
    top = (
        dfreq.orderBy(F.col("__c").desc(), "__t")
        .limit(vocab_size)
        .select("__t", "__c")
    )
    pv = pres.join(F.broadcast(top), "__t")
    n_docs = df.agg(F.countDistinct(id_col).alias("__n"))
    a = pv.select(F.col("__d"), F.col("__t").alias("token_a"),
                  F.col("__c").alias("n_docs_a"))
    b = pv.select(F.col("__d"), F.col("__t").alias("token_b"),
                  F.col("__c").alias("n_docs_b"))
    pairs = (
        a.join(b, "__d")
        .filter(F.col("token_a") < F.col("token_b"))
        .groupBy("token_a", "token_b", "n_docs_a", "n_docs_b")
        .agg(F.count("*").alias("n_docs_both"))
        .filter(F.col("n_docs_both") >= min_pairs)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token_a", "token_b", "n_docs_a", "n_docs_b", "n_docs_both",
            F.round(
                F.log(
                    F.col("n_docs_both") * F.col("__n")
                    / (F.col("n_docs_a") * F.col("n_docs_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return pairs.orderBy(
        F.col("pmi").desc(), "token_a", "token_b"
    ).limit(top_k)


def tag_keywords(
    df: DataFrame,
    phrases: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    phrase_col: str = "phrase",
) -> DataFrame:
    """Dictionary / gazetteer tagging at scale — which documents mention
    which dictionary phrases, and how often (blocklists, PII term lists,
    topic gazetteers, entity lexicons). The Spark-first matcher: instead
    of compiling a million-entry dictionary into one regex (driver-side
    blowup, per-row scan cost ∝ dictionary), documents are cut into word
    n-grams per DISTINCT PHRASE LENGTH and matched with a plain
    equi-JOIN on the gram string — the dictionary is just another
    (broadcastable) table, and matching cost is ∝ corpus grams ×
    distinct lengths, independent of dictionary size.

    Returns (id, phrase, n_hits) with one row per (document, matched
    phrase); overlapping occurrences count per gram window (token-level
    sliding, the standard gazetteer semantics). The distinct phrase
    lengths are collected to the driver — a few integers (the loop
    bound), the same driver-bounded pattern as BPE's round count."""
    lengths = sorted(
        r[0]
        for r in phrases.select(
            F.size(F.split(F.col(phrase_col), " ")).alias("L")
        ).distinct().collect()
    )
    if not lengths:
        raise ValueError("phrases frame is empty")
    if lengths[0] < 1:
        raise ValueError("phrases must contain at least one token")
    out = None
    for L in lengths:
        p = phrases.filter(
            F.size(F.split(F.col(phrase_col), " ")) == L
        ).select(F.col(phrase_col).alias("__g")).distinct()
        grams = ensure_parallelism(df).select(
            F.col(id_col).alias("id"),
            F.explode(word_grams(text_col, L)).alias("__g"),
        )
        hits = grams.join(p, "__g").groupBy("id", "__g").agg(
            F.count("*").alias("n_hits")
        )
        out = hits if out is None else out.unionAll(hits)
    return out.select("id", F.col("__g").alias(phrase_col), "n_hits")


def normalize_unicode(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    form: str = "NFC",
) -> DataFrame:
    """Unicode normalization — the first step of real-world text
    curation (web crawls mix composed/decomposed accents, ligatures,
    width variants; dedup and tokenization both need one canonical
    form). Returns (id, text_norm, changed, n_cp_before, n_cp_after).

    No Catalyst builtin performs Unicode normalization, so this is an
    Arrow ``mapInPandas`` stage over stdlib ``unicodedata`` — the same
    executor discipline as the media tier: the helper ships BY VALUE in
    the closure (no package import on executors), batches stay
    columnar, and the op is total (None text passes through as None).
    ``form`` ∈ NFC/NFKC/NFD/NFKD; NFC matches DuckDB's
    ``nfc_normalize`` for the oracle."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError("form must be one of NFC/NFKC/NFD/NFKD")
    out_schema = (
        f"{id_col} long, text_norm string, changed boolean, "
        "n_cp_before long, n_cp_after long"
    )

    def run(batches):
        import unicodedata as _ud

        import pandas as _pd

        for batch in batches:
            texts = batch[text_col]
            norm = [
                None if t is None else _ud.normalize(form, t) for t in texts
            ]
            yield _pd.DataFrame(
                {
                    id_col: batch[id_col],
                    "text_norm": norm,
                    "changed": [
                        None if t is None else (t != v)
                        for t, v in zip(texts, norm)
                    ],
                    "n_cp_before": [
                        None if t is None else len(t) for t in texts
                    ],
                    "n_cp_after": [
                        None if v is None else len(v) for v in norm
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)


def char_grams(col: Column | str, n: int = 3) -> Column:
    """Character n-grams of a lowercased text column (array<string>,
    positional, duplicates kept — NB counts token occurrences). Texts
    shorter than ``n`` characters yield an empty array (an explicit
    guard: Spark's ``sequence(1, 0)`` would DESCEND, not return empty).
    Pure Catalyst — identical grams are expressible in DuckDB via
    list_transform(range(...), i -> substr(...)) for oracle parity."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    m = F.length(c) - (n - 1)
    return F.when(
        m >= 1,
        F.transform(F.sequence(F.lit(1), m), lambda i: F.substring(c, i, n)),
    ).otherwise(F.array().cast("array<string>"))


def char_grams_sql(text_expr: str, n: int = 3) -> str:
    """DuckDB replica of ``char_grams`` (range is end-exclusive there)."""
    c = f"lower({text_expr})"
    return (
        f"CASE WHEN length({c}) >= {n} THEN "
        f"list_transform(range(1, length({c}) - {n} + 2), "
        f"i -> substr({c}, CAST(i AS INT), {n})) "
        f"ELSE [] END"
    )


def nb_langid_train(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    n: int = 3,
    alpha: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Train a char-n-gram multinomial naive-Bayes language classifier
    IN the engine (VERDICT r5 #7 — the trained upgrade over the
    marker-token ``lang_id`` heuristic). Returns ``(model, priors)``:

    - model:  (gram, lang, logprob) over the FULL vocab × langs grid,
      logprob = ln((count + α) / (total_l + α·V)) with add-α smoothing
      (unseen gram-in-lang cells get the α floor via the grid, so
      scoring needs no per-row fallback logic);
    - priors: (lang, logprior) = ln(docs_l / docs_total).

    Fit = one exploded-gram pass feeding a (lang, gram) count, a
    vocab-distinct, and per-lang totals — the same one-shuffle
    SQL-replicable discipline as ``unigram_logprob``. Model size is
    bounded by charset^n × n_langs regardless of corpus size, so the
    grid crossJoin and the scoring join below stay broadcast-scale at
    100 TB."""
    grams = (
        ensure_parallelism(df)
        .select(
            F.col(label_col).alias("lang"),
            F.explode(char_grams(text_col, n)).alias("gram"),
        )
        .localCheckpoint(eager=False)
    )
    counts = grams.groupBy("lang", "gram").agg(F.count("*").alias("__c"))
    totals = grams.groupBy("lang").agg(F.count("*").alias("__t"))
    vocab = grams.select("gram").distinct()
    v_size = vocab.agg(F.count("*").alias("__v"))
    model = (
        vocab.crossJoin(totals)
        .join(counts, ["lang", "gram"], "left")
        .crossJoin(F.broadcast(v_size))
        .select(
            "gram", "lang",
            F.log(
                (F.coalesce(F.col("__c"), F.lit(0)) + F.lit(float(alpha)))
                / (F.col("__t") + F.lit(float(alpha)) * F.col("__v"))
            ).alias("logprob"),
        )
    )
    n_docs = df.groupBy(F.col(label_col).alias("lang")).agg(
        F.count("*").alias("__d")
    )
    n_total = df.agg(F.count("*").alias("__n"))
    priors = (
        n_docs.crossJoin(F.broadcast(n_total))
        .select("lang", F.log(F.col("__d") / F.col("__n")).alias("logprior"))
    )
    return model, priors


def nb_langid_score(
    df: DataFrame,
    model: DataFrame,
    priors: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Apply a trained NB language model: per document, argmax over
    langs of logprior + Σ_grams logprob(gram|lang). Output
    (id, lang_pred, nb_score) with nb_score the winning rounded
    log-posterior (6 dp BEFORE the argmax; ties → smallest lang string
    via min-struct over (−score, lang) — engine-identical winners
    despite last-ulp ln/sum drift).

    Grams unseen at training time are dropped by the inner join (OOV
    contributes equally-unknown mass to every class under the shared-
    vocab grid, so dropping is rank-neutral in the uniform-α case).
    Scale: the model frame is vocab×langs-bounded — broadcast — so the
    corpus never shuffles for scoring; the wide exchanges are the two
    groupBy(doc) aggregations."""
    grams = ensure_parallelism(df).select(
        F.col(id_col), F.explode(char_grams(text_col, n)).alias("gram")
    )
    per_lang = (
        grams.join(F.broadcast(model), "gram")
        .groupBy(id_col, "lang")
        .agg(F.sum("logprob").alias("__s"))
        .join(F.broadcast(priors), "lang")
        .select(
            id_col,
            F.struct(
                (-F.round(F.col("logprior") + F.col("__s"), 6)).alias("__neg"),
                F.col("lang").alias("__lang"),
            ).alias("__cand"),
        )
    )
    return (
        per_lang.groupBy(id_col)
        .agg(F.min("__cand").alias("__m"))
        .select(
            id_col,
            F.col("__m.__lang").alias("lang_pred"),
            (-F.col("__m.__neg")).alias("nb_score"),
        )
    )


# Gopher-rule thresholds (Rae et al. 2021, arXiv:2112.11446 Table A1 —
# the document-quality heuristics most LLM curation stacks start from).
GOPHER_DEFAULTS = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.1,
    "max_bullet_line_ratio": 0.9,
    "max_ellipsis_line_ratio": 0.3,
    "min_alpha_word_ratio": 0.8,
    "min_stopword_hits": 2,
}


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    thresholds: dict | None = None,
) -> DataFrame:
    """Gopher-style document-quality rule suite — the standard LLM
    pre-training filter battery (word-count band, mean word length band,
    symbol-to-word ratio, bullet/ellipsis line ratios, alphabetic-word
    ratio, stopword presence), each emitted as its own boolean column
    plus the conjunction ``gopher_pass``, so a curation pipeline can
    report WHICH rule rejected a document (reject-reason histograms are
    how these thresholds get tuned).

    Pure Catalyst array/aggregate expressions over one projection — a
    map-only stage, no shuffle, no UDF; every measure and flag is
    replicated in ANSI SQL by the ``text_gopher_rules`` oracle. Ratios
    are rounded to 6 dp BEFORE comparison in both engines so boundary
    documents flag identically."""
    t = thresholds or GOPHER_DEFAULTS
    toks = tokens(text_col)
    n_words = F.size(toks)
    safe_n = F.greatest(n_words, F.lit(1)).cast("double")
    mean_wl = F.round(
        F.aggregate(
            F.transform(toks, F.length), F.lit(0),
            lambda a, x: a + x,
        )
        / safe_n,
        6,
    )
    sym_ratio = F.round(
        (
            F.size(F.filter(toks, lambda x: x.startswith("#")))
            + F.size(F.filter(toks, lambda x: x.contains("...")))
        )
        / safe_n,
        6,
    )
    alpha_ratio = F.round(
        F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]"))) / safe_n, 6
    )
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_ratio = F.round(
        F.size(
            F.filter(
                lines,
                lambda ln: ln.startswith("-") | ln.startswith("*")
                | ln.startswith("•"),
            )
        )
        / n_lines,
        6,
    )
    ellipsis_ratio = F.round(
        F.size(F.filter(lines, lambda ln: ln.endswith("..."))) / n_lines, 6
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(s) for s in STOPWORDS]),
        )
    )
    flags = {
        "ok_word_count": (n_words >= t["min_words"])
        & (n_words <= t["max_words"]),
        "ok_mean_word_len": (mean_wl >= t["min_mean_word_len"])
        & (mean_wl <= t["max_mean_word_len"]),
        "ok_symbol_ratio": sym_ratio <= t["max_symbol_word_ratio"],
        "ok_bullet_lines": bullet_ratio <= t["max_bullet_line_ratio"],
        "ok_ellipsis_lines": ellipsis_ratio <= t["max_ellipsis_line_ratio"],
        "ok_alpha_words": alpha_ratio >= t["min_alpha_word_ratio"],
        "ok_stopwords": stop_hits >= t["min_stopword_hits"],
    }
    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_word_ratio"),
        alpha_ratio.alias("alpha_word_ratio"),
        stop_hits.alias("stopword_hits"),
        *[c.alias(nm) for nm, c in flags.items()],
    )
    passing = F.col("ok_word_count")
    for nm in list(flags)[1:]:
        passing = passing & F.col(nm)
    return out.withColumn("gopher_pass", passing)


def textrank_keywords(
    df: DataFrame,
    text_col: str = "text",
    min_len: int = 4,
    iterations: int = 5,
    damping: float = 0.85,
    k: int = 20,
) -> DataFrame:
    """Corpus-level TextRank keyword extraction (Mihalcea & Tarau 2004):
    PageRank over the word co-occurrence graph built from ADJACENT
    token pairs, keeping content words (length >= ``min_len``). Returns
    the top-``k`` (word, score) rows, score rounded to 6 dp, ties
    broken by word ascending.

    A pure composition: tokenization + pair explode (map-only), one
    DISTINCT over the pair set (the only data-scale shuffle — the graph
    is vocab-bounded after it, |V| ≤ vocab, |E| ≤ vocab²), then the
    fixed-iteration ``graph.pagerank`` on the symmetrized edge list
    with ranks broadcast (the node set is vocabulary-sized by
    construction, so the executor-sized hint is always right here).
    The final top-k compiles to TakeOrderedAndProject — no global sort
    materializes."""
    from census_data_pipeline_spark.functions import graph

    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    pairs = (
        ensure_parallelism(df)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice(toks, 1, n - 1).alias("a"),
                    F.slice(toks, 2, n - 1).alias("b"),
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .filter(
            (F.length("a") >= min_len)
            & (F.length("b") >= min_len)
            & (F.col("a") != F.col("b"))
        )
        .distinct()
    )
    sym = pairs.union(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    pr = graph.pagerank(
        sym, iterations=iterations, damping=damping,
        src="a", dst="b", broadcast_ranks=True,
    )
    return (
        pr.select(F.col("id").alias("word"),
                  F.round("rank", 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("word").asc())
        .limit(k)
    )


def zipf_fit(
    docs: DataFrame, text_col: str = "text", top_n: int = 1000
) -> DataFrame:
    """Zipf's-law fit over the corpus token distribution — the one-row
    corpus diagnostic a curation pipeline checks before trusting token
    statistics (natural text slopes near −1 on the log-log rank/
    frequency line; heavily templated or deduplicated corpora bend away
    from it): count whitespace tokens (one data-scale explode +
    partial-aggregated groupBy), keep the ``top_n`` most frequent with
    the (count DESC, token ASC) total order, rank them, and fit
    ln(freq) ~ ln(rank) by the closed-form OLS of
    ``rollup.grouped_ols_trend``. Returns one row (n_tokens, slope,
    intercept, r2), 6-dp rounded.

    Scale shape: the token count is the only data-scale pass; the
    ranked top-N frame is model-sized (the row_number window runs over
    ≤ top_n rows — bounded, so the single-partition window is fine)."""
    from pyspark.sql.window import Window

    from census_data_pipeline_spark.operators.rollup import (
        grouped_ols_trend,
    )

    if top_n < 2:
        raise ValueError("top_n must be >= 2")
    counts = (
        docs.select(F.explode(tokens(text_col)).alias("__tok"))
        .filter(F.col("__tok") != "")
        .groupBy("__tok")
        .agg(F.count("*").alias("__c"))
    )
    top = counts.orderBy(
        F.col("__c").desc(), F.col("__tok").asc()
    ).limit(top_n)
    ranked = top.select(
        F.row_number()
        .over(Window.orderBy(F.col("__c").desc(), F.col("__tok").asc()))
        .alias("__rank"),
        "__c",
    ).select(
        F.lit("corpus").alias("__g"),
        F.log(F.col("__rank").cast("double")).alias("__x"),
        F.log(F.col("__c").cast("double")).alias("__y"),
    )
    return grouped_ols_trend(ranked, ["__g"], "__x", "__y").select(
        F.col("n").alias("n_tokens"), "slope", "intercept", "r2"
    )


def zipf_fit_oracle_sql(
    table: str, text_sql: str = "text", top_n: int = 1000
) -> str:
    """DuckDB replica of ``zipf_fit`` — identical token counts, total
    order, rank, and closed-form OLS arithmetic."""
    from census_data_pipeline_spark.operators.rollup import (
        grouped_ols_oracle_sql,
    )

    src = f"""(WITH counts AS (
      SELECT tok, count(*) AS c FROM (
        SELECT unnest(string_split({text_sql}, ' ')) AS tok
        FROM {table}) u
      WHERE tok <> '' GROUP BY tok),
    top AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok ASC)
                     AS rnk
            FROM counts ORDER BY c DESC, tok ASC LIMIT {top_n})
    SELECT 'corpus' AS g, ln(CAST(rnk AS DOUBLE)) AS x,
           ln(CAST(c AS DOUBLE)) AS y
    FROM top) src"""
    inner = grouped_ols_oracle_sql(src, ["g"], "x", "y")
    return f"""SELECT n AS n_tokens, slope, intercept, r2
    FROM ({inner}) q"""


def js_divergence(
    df: DataFrame,
    cohort: Column,
    text_col: str = "text",
    resolution: int = 4096,
) -> DataFrame:
    """Jensen–Shannon divergence between two corpus slices' unigram
    distributions — the TEXT-level distribution-shift score beside the
    numeric/categorical drift trio (KS/PSI/χ², operators/drift.py) and
    the selection-oriented DSIR log-ratio: cohort A = rows where
    ``cohort`` is true, B the rest;
    JSD = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m) with m = (p+q)/2, bounded by
    ln 2, symmetric, and finite even on disjoint vocabularies (where
    KL explodes — the reason JSD is the corpus-comparison standard).
    Returns ONE row: (n_tokens_a, n_tokens_b, n_buckets_a,
    n_buckets_b, jsd_nats, jsd_normalized = jsd/ln 2); NULL scores
    when either slice is empty.

    Tokens are md5-prefix hash buckets (3 hex chars = 4096) — the DSIR
    parity trick: bounded feature space at any corpus size and a
    bucket id both engines derive identically. Zero-mass buckets
    contribute exactly 0 (no smoothing needed — m > 0 whenever either
    side is present).

    Scale shape: one exploded token pass partial-aggregates straight
    to ≤``resolution`` bucket rows with BOTH sides' counts
    (conditional agg — one shuffle, model-sized); totals arrive as a
    1-row broadcast crossJoin; the JSD sum runs on the bucket frame.
    The corpus never shuffles by document. Cite: reference has no
    text tier; extends SURVEY §2.11 beside dsir_logratio/drift."""
    if resolution != 4096:
        raise ValueError("resolution must be 4096 (3 md5 hex chars)")
    tok = (
        ensure_parallelism(df)
        .select(
            cohort.alias("__a"),
            F.explode(tokens(text_col)).alias("__t"),
        )
        .select("__a", F.substring(F.md5("__t"), 1, 3).alias("__b"))
    )
    buckets = tok.groupBy("__b").agg(
        F.count(F.when(F.col("__a"), 1)).alias("__ca"),
        F.count(F.when(~F.col("__a"), 1)).alias("__cb"),
    )
    totals = buckets.agg(
        F.sum("__ca").alias("__na"), F.sum("__cb").alias("__nb")
    )
    p = F.col("__ca") / F.col("__na").cast("double")
    q = F.col("__cb") / F.col("__nb").cast("double")
    m = (p + q) / 2
    contrib = (
        F.when(F.col("__ca") > 0, p * F.log(p / m) / 2).otherwise(0.0)
        + F.when(F.col("__cb") > 0, q * F.log(q / m) / 2).otherwise(0.0)
    )
    agg = (
        buckets.crossJoin(F.broadcast(totals))
        .agg(
            F.max("__na").alias("n_tokens_a"),
            F.max("__nb").alias("n_tokens_b"),
            F.count(F.when(F.col("__ca") > 0, 1)).alias("n_buckets_a"),
            F.count(F.when(F.col("__cb") > 0, 1)).alias("n_buckets_b"),
            F.sum(contrib).alias("__jsd"),
        )
    )
    ok = (F.col("n_tokens_a") > 0) & (F.col("n_tokens_b") > 0)
    import math as _math

    return agg.select(
        F.col("n_tokens_a").cast("long").alias("n_tokens_a"),
        F.col("n_tokens_b").cast("long").alias("n_tokens_b"),
        F.col("n_buckets_a").cast("long").alias("n_buckets_a"),
        F.col("n_buckets_b").cast("long").alias("n_buckets_b"),
        F.when(ok, F.round(F.col("__jsd"), 6))
        .otherwise(F.lit(None).cast("double")).alias("jsd_nats"),
        F.when(ok, F.round(F.col("__jsd") / F.lit(_math.log(2.0)), 6))
        .otherwise(F.lit(None).cast("double")).alias("jsd_normalized"),
    )


def js_divergence_oracle_sql(
    table: str,
    cohort_sql: str,
    text_sql: str = "text",
) -> str:
    """DuckDB replica of ``js_divergence``: identical md5 bucketing,
    conditional bucket counts, zero-mass handling, and ln-2
    normalization."""
    return f"""WITH jst AS (
      SELECT CAST(({cohort_sql}) AS BOOLEAN) AS a,
             substring(md5(u.t), 1, 3) AS b
      FROM {table}, unnest(string_split({text_sql}, ' ')) AS u(t)),
    jsb AS (
      SELECT b,
             count(*) FILTER (WHERE a) AS ca,
             count(*) FILTER (WHERE NOT a) AS cb
      FROM jst GROUP BY b),
    jstot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM jsb),
    jsagg AS (
      SELECT MAX(na) AS n_tokens_a, MAX(nb) AS n_tokens_b,
             count(*) FILTER (WHERE ca > 0) AS n_buckets_a,
             count(*) FILTER (WHERE cb > 0) AS n_buckets_b,
             SUM(
               CASE WHEN ca > 0 THEN
                 (ca / CAST(na AS DOUBLE))
                 * ln((ca / CAST(na AS DOUBLE))
                      / ((ca / CAST(na AS DOUBLE)
                          + cb / CAST(nb AS DOUBLE)) / 2)) / 2
               ELSE 0.0 END
               + CASE WHEN cb > 0 THEN
                 (cb / CAST(nb AS DOUBLE))
                 * ln((cb / CAST(nb AS DOUBLE))
                      / ((ca / CAST(na AS DOUBLE)
                          + cb / CAST(nb AS DOUBLE)) / 2)) / 2
               ELSE 0.0 END) AS jsd
      FROM jsb, jstot)
    SELECT CAST(n_tokens_a AS BIGINT) AS n_tokens_a,
           CAST(n_tokens_b AS BIGINT) AS n_tokens_b,
           CAST(n_buckets_a AS BIGINT) AS n_buckets_a,
           CAST(n_buckets_b AS BIGINT) AS n_buckets_b,
           CASE WHEN n_tokens_a > 0 AND n_tokens_b > 0
                THEN ROUND(jsd, 6) END AS jsd_nats,
           CASE WHEN n_tokens_a > 0 AND n_tokens_b > 0
                THEN ROUND(jsd / ln(2.0), 6) END AS jsd_normalized
    FROM jsagg"""


def readability_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document Flesch reading-ease — the curation-side
    readability member of the quality-score family (Gopher rules gate
    on structure, this scores STYLE): flesch = 206.835 −
    1.015·(words/sentences) − 84.6·(syllables/words), with the
    standard closed-vocabulary-free heuristics — words = single-space
    tokens (the module's tokenizer convention), sentences = runs of
    [.!?] clamped to ≥ 1, syllables = vowel-GROUP count ([aeiouy]+ of
    the lowercased text; the classic approximation — within ~10% of
    dictionary syllabification on English prose, meaningless on
    non-Latin scripts, documented). ``band`` labels the ROUNDED score
    by the condensed Flesch bands (≥90 very_easy / ≥70 easy / ≥50
    medium / ≥30 difficult / else very_difficult — unbounded both
    ways by construction on degenerate text, also documented).

    Returns (id, n_words, n_sentences, n_syllables, flesch, band),
    flesch 6-dp rounded.

    Scale shape: pure per-row codegen expressions — no shuffle, no
    UDF, no window; the scan stays whole-stage. Cite: reference has no
    text tier; extends SURVEY §2.11 beside quality_scores/
    gopher_rules."""
    t = F.col(text_col)
    words = F.size(F.split(t, " ")).cast("double")
    sentences = F.greatest(
        F.size(F.expr(f"regexp_extract_all({text_col}, '[.!?]+', 0)")),
        F.lit(1),
    ).cast("double")
    syllables = F.size(
        F.expr(f"regexp_extract_all(lower({text_col}), '[aeiouy]+', 0)")
    ).cast("double")
    flesch = F.round(
        F.lit(206.835)
        - F.lit(1.015) * (words / sentences)
        - F.lit(84.6) * (syllables / words),
        6,
    )
    return docs.na.drop(subset=[text_col]).select(
        F.col(id_col),
        words.cast("long").alias("n_words"),
        sentences.cast("long").alias("n_sentences"),
        syllables.cast("long").alias("n_syllables"),
        flesch.alias("flesch"),
        F.when(flesch >= 90, F.lit("very_easy"))
        .when(flesch >= 70, F.lit("easy"))
        .when(flesch >= 50, F.lit("medium"))
        .when(flesch >= 30, F.lit("difficult"))
        .otherwise(F.lit("very_difficult")).alias("band"),
    )


def readability_oracle_sql(
    table: str, text_sql: str = "text", id_sql: str = "doc_id"
) -> str:
    """DuckDB replica of ``readability_scores`` — identical token,
    sentence-run, and vowel-group counts and band thresholds."""
    return f"""WITH rdm AS (
      SELECT {id_sql} AS id,
             CAST(len(string_split({text_sql}, ' ')) AS DOUBLE) AS w,
             CAST(greatest(len(regexp_extract_all({text_sql},
                                                  '[.!?]+')), 1)
                  AS DOUBLE) AS s,
             CAST(len(regexp_extract_all(lower({text_sql}),
                                         '[aeiouy]+')) AS DOUBLE) AS y
      FROM {table} WHERE ({text_sql}) IS NOT NULL),
    rdf AS (
      SELECT id, w, s, y,
             round(206.835 - 1.015 * (w / s) - 84.6 * (y / w), 6) AS f
      FROM rdm)
    SELECT id AS {id_sql}, CAST(w AS BIGINT) AS n_words,
           CAST(s AS BIGINT) AS n_sentences,
           CAST(y AS BIGINT) AS n_syllables,
           f AS flesch,
           CASE WHEN f >= 90 THEN 'very_easy'
                WHEN f >= 70 THEN 'easy'
                WHEN f >= 50 THEN 'medium'
                WHEN f >= 30 THEN 'difficult'
                ELSE 'very_difficult' END AS band
    FROM rdf"""
