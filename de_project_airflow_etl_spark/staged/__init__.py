"""Staged (round-5) queries: implemented and locally verified, but NOT
yet registered in the driver-facing registry.

The driver verifies exactly ~50 registry queries per round and round
4's window is already full (50 pinned unverified entries). Registering
more queries now would push some past the window and cost them their
only hard verification signal (CLAUDE.md, "Registry growth is
window-bounded"). These entries therefore live in a parallel
``STAGED`` dict with the exact same ``Query`` shape; round 5 promotes
them by moving the ``staged_query`` decorators to ``registry.query``
once CORRECTNESS_r04.json confirms the r4 window went green.

Until promotion they are exercised by ``tests/test_staged_r5.py``
through the same harness the registry uses (exact value compare vs
DuckDB at the correctness scale factor).
"""

from de_project_airflow_etl_spark.staged.round5 import STAGED  # noqa: F401
