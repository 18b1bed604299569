"""Wildcard-blocked edit-distance-1 linkage (functions/linkage.py)."""

from __future__ import annotations

from census_data_pipeline_spark.functions.linkage import edit1_pairs


def test_edit1_pairs_substitutions_only(spark):
    df = spark.createDataFrame(
        [(1, "abcd"), (2, "abed"), (3, "abcd"), (4, "xyzw"), (5, "abee")],
        "id long, name string",
    )
    out = {(r.id_a, r.id_b) for r in edit1_pairs(df, "id", "name").collect()}
    # 2 is one substitution from both copies of "abcd" (1 and 3) and from
    # 5; the exact-duplicate pair 1-3 is excluded (levenshtein 0); 4
    # matches nothing; 1-5 differ by two substitutions.
    assert out == {(1, 2), (2, 3), (2, 5)}


def test_edit1_pairs_emits_each_pair_once(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaab")], "id long, name string"
    )
    rows = edit1_pairs(df, "id", "name").collect()
    assert len(rows) == 1  # pair shares exactly ONE wildcard slot, no dup
    assert rows[0].name_a == "aaaa" and rows[0].name_b == "aaab"
