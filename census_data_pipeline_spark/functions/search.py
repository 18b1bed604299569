"""Keyword search: exact-statistics BM25 scoring over the corpus
(SURVEY.md §2.11 ⊕ — the retrieval complement of the vector knn family).

BM25 (Robertson/Spärck Jones) ranks documents for a SMALL literal set of
query terms. With the term list known at plan time the whole pipeline is
pure Catalyst and needs NO inverted index, explode, or join on terms:

- per-doc term frequencies are array expressions over the token array
  (one narrow map stage, codegen-fused);
- corpus statistics (N, avgdl, per-term document frequencies) are ONE
  global aggregate producing a single row, broadcast back with a
  crossJoin — the classic tiny-dimension pattern;
- the score is a fixed-order sum over the literal terms, so Spark and an
  ANSI-SQL oracle produce bit-identical doubles;
- top-k is ``orderBy(score).limit(k)`` → TakeOrderedAndProject (per-
  partition heap + driver merge), never a data-scale unpartitioned
  window.

At 100 TB this is two passes over the corpus (stats, then score) with
only one 1-row exchange between them; for a *persistent* search surface
you'd materialize the stats row once and reuse it across queries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from census_data_pipeline_spark.functions.text import tokens
from census_data_pipeline_spark.operators.topk import top_k
from census_data_pipeline_spark.sources.catalog import ensure_parallelism


def _tf(toks: Column, term: str) -> Column:
    """Occurrences of ``term`` in the token array (exact match)."""
    return F.size(F.filter(toks, lambda x: x == F.lit(term)))


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BM25 score for ``terms``:

        score = Σ_t idf_t · tf_t·(k1+1) / (tf_t + k1·(1−b+b·dl/avgdl))
        idf_t = ln(1 + (N − df_t + 0.5)/(df_t + 0.5))

    with the sum left-associated in ``terms`` order. Emits ``score``
    (rounded to 6 dp — ranked on AFTER rounding so cross-engine ranking
    is exact) and ``n_matched`` (how many query terms hit)."""
    if not terms:
        raise ValueError("terms must be non-empty")
    base = ensure_parallelism(docs).select(
        F.col(id_col), tokens(text_col).alias("__toks")
    ).withColumn("__dl", F.size("__toks").cast("long"))
    for i, term in enumerate(terms):
        base = base.withColumn(f"__tf{i}", _tf(F.col("__toks"), term))
    stats = base.agg(
        F.count("*").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("int")).cast("long")
            .alias(f"__df{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("__n") - F.col(f"__df{i}") + F.lit(0.5))
            / (F.col(f"__df{i}") + F.lit(0.5))
        )
        tf = F.col(f"__tf{i}")
        part = idf * (tf * F.lit(k1 + 1.0)) / (
            tf + F.lit(k1) * (
                F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl")
            )
        )
        score = part if score is None else score + part
    n_matched = None
    for i in range(len(terms)):
        hit = (F.col(f"__tf{i}") > 0).cast("int")
        n_matched = hit if n_matched is None else n_matched + hit
    return scored.select(
        id_col,
        F.round(score, 6).alias("score"),
        n_matched.cast("long").alias("n_matched"),
        F.col("__dl").alias("n_tokens"),
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k BM25 hits, ties broken by document id (TakeOrderedAndProject
    — no global sort, no unpartitioned window)."""
    scored = bm25_scores(docs, terms, k1=k1, b=b,
                         text_col=text_col, id_col=id_col)
    return top_k(scored, by="score", k=k, tiebreak=[id_col])


def bm25_oracle_sql(
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
) -> str:
    """DuckDB replica: same tf/df/idf expressions, same left-associated
    sum, same round-before-rank — generated from the SAME parameters so
    the two engines cannot drift."""
    tf_cols = ",\n                 ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n                 ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(terms))
    )
    denom = f"(1.0 - {b!r} + {b!r} * dl / avgdl)"
    score = " + ".join(
        f"ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5))"
        f" * (tf{i} * {k1 + 1.0!r}) / (tf{i} + {k1!r} * {denom})"
        for i in range(len(terms))
    )
    matched = " + ".join(
        f"CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END" for i in range(len(terms))
    )
    return f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM {table}),
    d AS (SELECT doc_id, len(toks) AS dl,
                 {tf_cols}
          FROM t),
    st AS (SELECT count(*) AS n, avg(dl) AS avgdl,
                 {df_cols}
           FROM d),
    s AS (SELECT doc_id,
                 round({score}, 6) AS score,
                 CAST({matched} AS BIGINT) AS n_matched,
                 CAST(dl AS BIGINT) AS n_tokens
          FROM d CROSS JOIN st)
    SELECT doc_id, score, n_matched, n_tokens
    FROM s ORDER BY score DESC, doc_id LIMIT {k}
    """


def rrf_fuse(
    ranked: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rrf_k: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Büttcher 2009) — the
    standard hybrid-retrieval combiner (RAG pipelines fuse BM25 and
    vector ranks this way): score(d) = Σ_r 1/(rrf_k + rank_r(d)) over
    the retrievers that returned d. Rank-based, so the retrievers'
    incomparable score scales never need calibration. Output:
    (id_col, rrf_score, n_retrievers, best_rank), top ``k`` by
    (rrf_score desc, id).

    Scale shape: each input is an already-truncated top-k frame (a few
    dozen rows), so the union + groupBy + TakeOrderedAndProject here is
    driver-trivial; the heavy lifting happened inside the retrievers,
    which keep their own scale disciplines."""
    if not ranked:
        raise ValueError("ranked must be non-empty")
    tagged = [
        df.select(F.col(id_col).alias("__id"),
                  F.col(rank_col).cast("long").alias("__rnk"))
        for df in ranked
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionAll(t)
    fused = u.groupBy("__id").agg(
        F.round(F.sum(F.lit(1.0) / (F.lit(rrf_k) + F.col("__rnk"))), 6)
        .alias("rrf_score"),
        F.count("*").alias("n_retrievers"),
        F.min("__rnk").alias("best_rank"),
    )
    return top_k(
        fused, by="rrf_score", k=k, tiebreak=["__id"]
    ).withColumnRenamed("__id", id_col).select(
        id_col, "rrf_score", "n_retrievers", "best_rank"
    )


def ndcg_for_terms(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    rel_cap: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Ranking-quality evaluation for the retrieval family: per-term
    nDCG@k of the BM25 ranking against capped-tf graded relevance
    (rel = min(tf, ``rel_cap``) — the TREC-style 0..3 grade derived
    deterministically from the corpus itself, so the metric needs no
    external judgments). Linear-gain DCG (gain = rel, discount
    1/log₂(pos+1)) — the original Järvelin–Kekäläinen form, which also
    keeps every value small enough for exact cross-engine arithmetic.

    Per term: the BM25 ranking's top-k (round-before-rank 6 dp, doc-id
    tiebreak) gives DCG@k; the relevance-ordered top-k gives IDCG@k;
    nDCG = DCG/IDCG (0 when no relevant docs exist). Output one row per
    term: (term, dcg_at_k, idcg_at_k, ndcg).

    Scale shape: ONE tokenize+tf pass over the corpus (shared by all
    terms, lazily checkpointed) and one global stats row; each term
    then costs two TakeOrderedAndProject top-k passes over the scored
    projection — no global sort, no unpartitioned data-scale window
    (positions are assigned on the k-row frames)."""
    if not terms:
        raise ValueError("terms must be non-empty")
    if k < 1:
        raise ValueError("k must be >= 1")
    base = ensure_parallelism(docs).select(
        F.col(id_col), tokens(text_col).alias("__toks")
    ).withColumn("__dl", F.size("__toks").cast("long"))
    for i, term in enumerate(terms):
        base = base.withColumn(f"__tf{i}", _tf(F.col("__toks"), term))
    base = base.drop("__toks").localCheckpoint(eager=False)
    stats = base.agg(
        F.count("*").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("int")).cast("long")
            .alias(f"__df{i}")
            for i in range(len(terms))
        ],
    )
    rows = []
    for i, term in enumerate(terms):
        idf = F.log(
            F.lit(1.0)
            + (F.col("__n") - F.col(f"__df{i}") + F.lit(0.5))
            / (F.col(f"__df{i}") + F.lit(0.5))
        )
        tf = F.col(f"__tf{i}")
        score = idf * (tf * F.lit(k1 + 1.0)) / (
            tf + F.lit(k1) * (
                F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl")
            )
        )
        scored = base.crossJoin(F.broadcast(stats)).select(
            id_col,
            F.round(score, 6).alias("__s"),
            F.least(tf, F.lit(rel_cap)).alias("__rel"),
        )
        gains = []
        for by, lbl in (("__s", "__dcg"), ("__rel", "__idcg")):
            hits = top_k(scored, by=by, k=k, tiebreak=[id_col])
            pos = F.row_number().over(
                Window.orderBy(F.col(by).desc(), F.col(id_col))
            )
            gains.append(
                hits.withColumn("__pos", pos).agg(
                    F.round(
                        F.sum(F.col("__rel") / F.log2(F.col("__pos") + 1)),
                        6,
                    ).alias(lbl)
                )
            )
        rows.append(
            gains[0].crossJoin(F.broadcast(gains[1])).select(
                F.lit(term).alias("term"),
                F.col("__dcg").alias("dcg_at_k"),
                F.col("__idcg").alias("idcg_at_k"),
                F.when(F.col("__idcg") == 0, F.lit(0.0))
                .otherwise(F.round(F.col("__dcg") / F.col("__idcg"), 6))
                .alias("ndcg"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def ndcg_oracle_sql(
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    rel_cap: int = 3,
    table: str = "documents",
) -> str:
    """DuckDB replica of ``ndcg_for_terms`` — same tf/df/idf text, same
    round-before-rank, same doc-id tiebreaks, same linear-gain DCG."""
    tf_cols = ",\n                 ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n                 ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(terms))
    )
    denom = f"(1.0 - {b!r} + {b!r} * dl / avgdl)"
    ctes = [
        f"t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM {table})",
        f"""d AS (SELECT doc_id, len(toks) AS dl,
                 {tf_cols}
          FROM t)""",
        f"""st AS (SELECT count(*) AS n, avg(dl) AS avgdl,
                 {df_cols}
           FROM d)""",
    ]
    selects = []
    for i, term in enumerate(terms):
        score = (
            f"ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5))"
            f" * (tf{i} * {k1 + 1.0!r}) / (tf{i} + {k1!r} * {denom})"
        )
        ctes.append(
            f"""s{i} AS (SELECT doc_id, round({score}, 6) AS s,
                 least(tf{i}, {rel_cap}) AS rel
           FROM d CROSS JOIN st)"""
        )
        for by, tag in (("s", "g"), ("rel", "ig")):
            ctes.append(
                f"""{tag}h{i} AS (SELECT rel, row_number() OVER (
                 ORDER BY {by} DESC, doc_id) AS pos
           FROM (SELECT * FROM s{i}
                 ORDER BY {by} DESC, doc_id LIMIT {k}) q)"""
            )
            ctes.append(
                f"""{tag}{i} AS (SELECT round(sum(rel / log2(pos + 1)), 6)
                 AS v FROM {tag}h{i})"""
            )
        selects.append(
            f"""SELECT '{term}' AS term, g{i}.v AS dcg_at_k,
             ig{i}.v AS idcg_at_k,
             CASE WHEN ig{i}.v = 0 THEN 0.0
                  ELSE round(g{i}.v / ig{i}.v, 6) END AS ndcg
      FROM g{i} CROSS JOIN ig{i}"""
        )
    return (
        "WITH " + ",\n    ".join(ctes)
        + "\n    " + "\n    UNION ALL ".join(selects)
    )
