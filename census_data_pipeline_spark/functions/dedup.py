"""Deduplication operators (SURVEY.md §2.11 ⊕; north-star requirement).

Four tiers, all shuffle-shaped for 100 TB:

1. **Exact** — hash-groupBy on md5(text): one shuffle on a 16-byte key.
2. **N-gram Jaccard** — shingle-explode + self-equi-join on shingle +
   pair-count / sizes. Exact pairwise Jaccard; cost is bounded by shingle
   co-occurrence, so at scale it runs on an id-sampled or LSH-prefiltered
   candidate set.
3. **MinHash + LSH** — k minhashes (min over md5(seed||shingle)), banded
   into b bands; candidates are pairs sharing a band bucket — the classic
   sub-quadratic near-dup join. Band buckets are an equi-join key, so the
   whole pipeline is scan → explode → shuffle-on-bucket → verify.
4. **SimHash** — 32-bit sign-aggregated token hash; hamming-close docs
   collide on band substrings.

All built from Catalyst expressions (md5/transform/aggregate); no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from census_data_pipeline_spark.functions.text import shingles, tokens


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content-hash groupBy: keeps the minimum id per
    distinct text; ``n_copies`` reports group size."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").alias("n_copies"),
        )
    )


def dedup_rows(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Plain ``dropDuplicates`` passthrough (exact tier on arbitrary keys)."""
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()


def _pair_ids(a: Column, b: Column) -> tuple[Column, Column]:
    return F.least(a, b), F.greatest(a, b)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact pairwise Jaccard over word-n-gram shingle sets for all document
    pairs sharing >= 1 shingle. Output: (id_a, id_b, jaccard) with
    id_a < id_b and jaccard >= threshold.

    Plan shape: explode distinct shingles → self equi-join on shingle →
    groupBy pair count(intersection) → join per-doc sizes → filter. Every
    step is a hash shuffle on a compact key.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(text_col, n)).alias("shingle"),
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "n_shingles": "size_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_shingles": "size_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_signature(text_col: Column | str, num_hashes: int = 8,
                      n: int = 3) -> Column:
    """k-permutation minhash signature as array<string>: element i is
    min(md5('seed<i>|' || shingle)). Seeded-md5 keeps every hash family
    member deterministic and reproducible in any engine."""
    sh = shingles(text_col, n)
    return F.array(
        *[
            F.array_min(
                F.transform(sh, lambda s, i=i: F.md5(F.concat(F.lit(f"seed{i}|"), s)))
            )
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 2,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH near-dup join: band the signature (b = k/band_size
    bands), bucket-join on (band_idx, band_hash), then verify candidates
    with exact shingle Jaccard. Output (id_a, id_b, jaccard >= threshold).

    Scale: candidate generation is an equi-join on band buckets — no
    all-pairs comparison; verification touches only bucket-colliding pairs.
    """
    n_bands = num_hashes // band_size
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(text_col, num_hashes, n).alias("sig"),
    )
    bands = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|", *[F.col("sig")[bi * band_size + r] for r in range(band_size)]
                            )
                        ).alias("bucket"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")

    x, y = bands.alias("x"), bands.alias("y")
    candidates = (
        x.join(y, on=["band", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )

    # verify with exact jaccard on the candidate set
    sh = df.select(F.col(id_col).alias("id"), shingles(text_col, n).alias("sh"))
    verified = (
        candidates.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.size("sh_a") + F.size("sh_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def simhash32(text_col: str) -> Column:
    """32-bit SimHash over whitespace tokens: per bit j, sum +1/-1 weighted
    by whether bit j of md5(token)'s first 32 bits is set; simhash bit j = 1
    if the sum > 0. Hamming-near signatures <=> cosine-similar bags of
    tokens. Pure generated SQL expression (md5 → conv → bit tests →
    aggregate) so it stays codegen'd and engine-reproducible."""
    hv = (
        f"transform(split({text_col}, ' '), "
        "x -> cast(conv(substring(md5(x), 1, 8), 16, 10) as bigint))"
    )
    terms = " + ".join(
        f"(CASE WHEN aggregate({hv}, 0, (acc, v) -> acc + "
        f"(CASE WHEN (shiftright(v, {j}) & 1) = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN cast({1 << j} as bigint) ELSE cast(0 as bigint) END)"
        for j in range(32)
    )
    return F.expr(f"cast({terms} as bigint)")


def simhash_table(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    return df.select(F.col(id_col), simhash32(text_col).alias("simhash"))
