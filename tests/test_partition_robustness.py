"""Partition-count invariance: the driver's SparkSession shape is not
ours to choose, so query results must not depend on parallelism. This
runs a slice of the most shape-sensitive queries (global top-k,
two-phase prefix structures, windows, shard assignment, packing) under
a deliberately awkward session — local[3], 7 shuffle partitions — in a
SUBPROCESS (one JVM per process; the fixture session can't be
reshaped) and compares full value sets against DuckDB."""

from __future__ import annotations

import subprocess
import sys

# chosen for shape-sensitivity: global top-k, prefix-sum shards/packing,
# windows, the bucketed skyline/KS decompositions, banded LSH, CC
QUERIES = [
    "topk_per_nation",
    "shuffle_shard_assign",
    "text_pack_bins",
    "skyline_parts",
    "drift_ks_click_vs_error",
    "sample_weighted_docs",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "events_rolling_median",
    "scd2_user_status",
    # r5: iterative vocab argmax, prefix-sum budget fill, tie-broken
    # top-k fusion, and the four-stage composite — all shape-sensitive
    "text_bpe_merges",
    "sample_token_budget",
    "search_hybrid_rrf",
    "mix_build_e2e",
]

_SCRIPT = r"""
import sys, math
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master('local[3]')
         .config('spark.sql.shuffle.partitions', '7')
         .config('spark.ui.showConsoleProgress', 'false')
         .config('spark.ui.enabled', 'false')
         .appName('shape-robustness').getOrCreate())
spark.sparkContext.setLogLevel('ERROR')
import __spark_entry__ as e
qs, osql = e.queries(), e.oracle_sql()
import duckdb
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders',
          'lineitem','events','documents','embeddings']:
    con.execute(
        f"CREATE VIEW {{t}} AS SELECT * FROM "
        f"'/root/testdata/sf0.001/{{t}}.parquet'")
def norm(v):
    if isinstance(v, float):
        return 'NaN' if math.isnan(v) else round(v, 9)
    if hasattr(v, 'isoformat'):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v
bad = []
for name in {names!r}:
    sdf = qs[name](spark, '/root/testdata/sf0.001')
    srows = sorted([tuple(norm(x) for x in r) for r in sdf.collect()],
                   key=repr)
    drows = sorted([tuple(norm(x) for x in r)
                    for r in con.execute(osql[name]).fetchall()], key=repr)
    if srows != drows:
        bad.append(name)
print('BAD=' + ','.join(bad))
"""


def test_results_invariant_under_odd_session_shape():
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _SCRIPT.format(repo=repo, names=QUERIES)
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=540,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    marker = [ln for ln in out.stdout.splitlines() if ln.startswith("BAD=")]
    assert marker, out.stdout[-2000:]
    assert marker[0] == "BAD=", f"shape-sensitive queries: {marker[0]}"
