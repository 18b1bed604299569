"""Python DataSource V2 structure (census_api.CensusDataSource): per-state
partitions replace the reference's thread pool (census_pipeline.py:279-322).
Network reads are not exercised — partitions/schema/registration are."""

from __future__ import annotations

import pytest

from census_data_pipeline_spark.sources import census_api


pytestmark = pytest.mark.skipif(
    not census_api.HAS_DATASOURCE_V2, reason="needs Spark 4 datasource API"
)


def _ds(options):
    return census_api.CensusDataSource(options=options)


def test_partitions_one_per_state():
    ds = _ds({"variables": "B01003_001E", "geography": "county",
              "states": "06,48,36"})
    reader = ds.reader(ds.schema())
    parts = reader.partitions()
    assert [p.state_fips for p in parts] == ["06", "48", "36"]


def test_schema_tracks_geography_level():
    county = _ds({"variables": "B01,B02", "geography": "county"}).schema()
    assert "county string" in county and "tract" not in county
    bg = _ds({"variables": "B01", "geography": "block group"}).schema()
    assert "`block group` string" in bg and "tract string" in bg


def test_registration(spark):
    assert census_api.register_census_datasource(spark) is True
