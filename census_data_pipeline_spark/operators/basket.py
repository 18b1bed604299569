"""Market-basket association rules — the rule-mining extension of the
co-occurrence recommender (`copurchase_topk` counts pairs; this scores
directed rules A→B with the classic support/confidence/lift triple).

Scale shape: presence is deduplicated per (basket, item) first (one
shuffle), the pair join fans out quadratically PER BASKET — bounded for
short baskets, and cappable upstream (sampling.cap_per_group) exactly
like the LSH hot-bucket guard for long ones. Item counts join back on
the item key; the global basket count is a 1-row broadcast. The final
cut is TakeOrderedAndProject. All metrics are exact integer ratios in
double precision, rounded to 6 — engine-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from census_data_pipeline_spark.operators.topk import top_k


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_co: int = 3,
    k: int = 50,
) -> DataFrame:
    """Top-``k`` directed rules (antecedent → consequent) by lift:

        support    = n_both / n_baskets
        confidence = n_both / n_antecedent
        lift       = confidence / (n_consequent / n_baskets)

    over DISTINCT per-basket presence (an item repeated inside one
    basket counts once). Rules below ``min_co`` co-baskets are pruned
    before scoring (the support floor that keeps noise rules out and
    the pair frame small). Ties break on (antecedent, consequent)."""
    if min_co < 1 or k < 1:
        raise ValueError("min_co and k must be >= 1")
    pres = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    n_items = pres.groupBy("__i").agg(F.count("*").alias("__n"))
    n_baskets = pres.agg(F.countDistinct("__b").alias("__nb"))
    a = pres.withColumnsRenamed({"__i": "__ia"})
    b = pres.withColumnsRenamed({"__i": "__ib"})
    pairs = (
        a.join(b, "__b")
        .filter(F.col("__ia") < F.col("__ib"))
        .groupBy("__ia", "__ib")
        .agg(F.count("*").alias("n_both"))
        .filter(F.col("n_both") >= min_co)
    )
    directed = pairs.select(
        F.col("__ia").alias("antecedent"),
        F.col("__ib").alias("consequent"), "n_both",
    ).unionByName(pairs.select(
        F.col("__ib").alias("antecedent"),
        F.col("__ia").alias("consequent"), "n_both",
    ))
    scored = (
        directed
        .join(n_items.withColumnsRenamed({"__i": "antecedent",
                                          "__n": "__na"}), "antecedent")
        .join(n_items.withColumnsRenamed({"__i": "consequent",
                                          "__n": "__nc"}), "consequent")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent", "consequent", "n_both",
            F.round(F.col("n_both") / F.col("__nb"), 6).alias("support"),
            F.round(F.col("n_both") / F.col("__na"), 6).alias("confidence"),
            F.round(
                (F.col("n_both") * F.col("__nb"))
                / (F.col("__na") * F.col("__nc")), 6
            ).alias("lift"),
        )
    )
    return top_k(scored, by="lift", k=k,
                 tiebreak=["antecedent", "consequent"])
