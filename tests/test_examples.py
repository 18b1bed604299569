"""The two reference example pipelines, re-expressed on the engine, must
run end-to-end offline (reference: examples/ — the de-facto smoke corpus,
SURVEY.md §5)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_tract_level_analysis_runs(spark, tmp_path):
    from examples import tract_level_analysis

    assert tract_level_analysis.main(str(tmp_path)) > 0
    assert os.path.exists(tmp_path / "ohio_tracts_2022.parquet")


def test_multi_state_comparison_runs(spark, tmp_path):
    from examples import multi_state_comparison

    n_states = multi_state_comparison.main(str(tmp_path))
    assert n_states == 6
    assert os.path.exists(tmp_path / "midwest_counties_2022.csv")


def test_llm_corpus_pipeline_runs(spark):
    from examples import llm_corpus_pipeline

    n_final = llm_corpus_pipeline.main("/root/testdata/sf0.001")
    assert n_final > 0


def test_events_analytics_runs(spark):
    from examples import events_analytics

    n_bought = events_analytics.main("/root/testdata/sf0.001")
    assert n_bought >= 0
