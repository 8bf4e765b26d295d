"""Driver-session robustness: the grading driver hands ``queries()``
callables a PLAIN SparkSession (no conf from our session factory —
no nanosAsLong, no pinned timezone, whatever Arrow default ships).
Every session-sensitive code path must therefore self-configure.

This spawns a subprocess (the in-process conftest session would
otherwise be returned by ``getOrCreate``) that builds a bare session
and runs one representative query per session-sensitive family
through the exact-value oracle compare:

* events ts normalization (flagship + epoch math),
* the Arrow/pandas-UDF path,
* Structured Streaming drain,
* localCheckpoint-based dedup,
* array-typed results.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPRESENTATIVES = (
    "daily_events",
    "asof_join_click_purchase",
    "knn_pandas_udf",
    "streaming_windowed_counts",
    "dedup_minhash_lsh",
    "tokenize_to_ids",
)

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tests!r})
from pyspark.sql import SparkSession
from harness import compare, duck_connection
from de_project_airflow_etl_spark.registry import all_queries

spark = (SparkSession.builder.master("local[4]")
         .appName("vanilla").getOrCreate())
duck = duck_connection({sf_dir!r})
qs = all_queries()
failures = []
for name in {names!r}:
    q = qs[name]
    try:
        problems = compare(q.fn(spark, {sf_dir!r}),
                           duck.execute(q.oracle).fetchdf(), name)
    except Exception as exc:  # noqa: BLE001 - report, don't die
        problems = [f"{{name}}: raised {{exc!r}}"]
    failures.extend(problems)
print("FAILURES:", len(failures))
for p in failures:
    print(p[:500])
sys.exit(1 if failures else 0)
"""


def test_queries_match_oracle_on_bare_session(sf_dir):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _SCRIPT.format(repo=repo, tests=os.path.join(repo, "tests"),
                            sf_dir=sf_dir, names=REPRESENTATIVES)
    env = dict(os.environ)
    # make sure nothing from the parent test session leaks in
    env.pop("PYSPARK_SUBMIT_ARGS", None)
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=420,
                          env=env)
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-2000:]}")
