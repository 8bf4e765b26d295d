"""Machine-checked environment gate for the Spark-4 ``transformWithState``
surface (VERDICT r4 #8): streaming/stateful.py documents that the
typed-state API is blocked here because its python worker needs
``google.protobuf`` / Spark Connect needs ``grpcio``. This test turns
that prose into a probe: WHEN the dependencies exist it actually
drives a minimal transformWithStateInPandas query and asserts the
result (so a future environment upgrade silently ACTIVATES the
coverage); until then it records the precise missing dependency as a
skip reason instead of an unverifiable claim."""

from __future__ import annotations

import pytest


def _typed_state_available() -> str | None:
    """Return a skip reason, or None when the surface is usable."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        return "google.protobuf not installed (transformWithState " \
               "python worker requires it)"
    try:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
    except ImportError:
        return "pyspark.sql.streaming.stateful_processor unavailable"
    return None


def test_transform_with_state_or_documented_gate(spark, tmp_path):
    reason = _typed_state_available()
    if reason is not None:
        pytest.skip(reason)

    # Dependencies present: drive the real surface — running count per
    # user via typed ValueState, availableNow drain, batch oracle.
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        LongType, StructField, StructType,
    )

    class RunningCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState(
                "count", StructType([StructField("n", LongType())]))

        def handleInputRows(self, key, rows, timerValues):
            n = sum(len(pdf) for pdf in rows)
            prev = self._count.get()
            total = (prev[0] if prev else 0) + n
            self._count.update((total,))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

        def close(self) -> None:
            pass

    src = str(tmp_path / "src")
    spark.range(100).selectExpr("id % 7 AS user_id").write.parquet(src)
    stream = spark.readStream.schema("user_id bigint").parquet(src)
    out = (stream.groupBy("user_id")
           .transformWithStateInPandas(
               RunningCount(),
               outputStructType="user_id bigint, n_events bigint",
               outputMode="Update",
               timeMode="None")
           .writeStream.format("memory").queryName("twstate")
           .outputMode("update").trigger(availableNow=True).start())
    assert out.awaitTermination(120)
    got = {r["user_id"]: r["n_events"]
           for r in spark.table("twstate").collect()}
    expect = {u: (100 + 6 - u) // 7 for u in range(7)}
    assert got == expect
