"""Property-based tests (hypothesis): invariants that hold for ANY
input, not just the fixed testdata — gap-sessionization laws, exact
cents aggregation, and rolling-hash agreement with a reference
implementation.

Each property runs a real (tiny) Spark job per example, so example
counts are deliberately small and deadlines disabled.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

GAP_US = 30 * 60 * 1_000_000
BASE = datetime(2024, 1, 1)

prop = settings(max_examples=12, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(offsets=st.lists(
    st.integers(min_value=0, max_value=6 * 3600), min_size=1, max_size=40,
    unique=True))
@prop
def test_session_window_partitions_events_by_gap(spark, offsets):
    """session_window(30m) must (a) keep every event, (b) never split
    a <gap pair, (c) never join a >=gap pair."""
    ts = sorted(BASE + timedelta(seconds=o) for o in offsets)
    df = spark.createDataFrame([(t,) for t in ts], "ts timestamp")
    sessions = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("w"))
          .agg(F.count(F.lit(1)).alias("n"),
               F.min("ts").alias("start"), F.max("ts").alias("end"))
          .orderBy("start")
          .collect()
    )
    assert sum(r["n"] for r in sessions) == len(ts)          # (a)
    # reference sessionization: split where gap >= 30 min
    expected = 1
    for a, b in zip(ts, ts[1:]):
        if (b - a) >= timedelta(minutes=30):
            expected += 1
    assert len(sessions) == expected                          # (b)+(c)
    for prev, nxt in zip(sessions, sessions[1:]):
        assert nxt["start"] - prev["end"] >= timedelta(minutes=30)


@given(vals=st.lists(
    st.integers(min_value=-10_000_00, max_value=10_000_00),  # cents
    min_size=1, max_size=50))
@prop
def test_cents_sum_is_exact(spark, vals):
    """dsum over 2-decimal doubles equals exact Decimal arithmetic for
    any accumulation order (the determinism contract of util.cents)."""
    from de_project_airflow_etl_spark.queries.util import dsum
    doubles = [c / 100.0 for c in vals]
    df = spark.createDataFrame([(v,) for v in doubles], "x double")
    got = df.agg(dsum("x", "s")).first()["s"]
    expected = float(sum(Decimal(c) for c in vals) / 100)
    assert got == expected  # bit-exact, not approximate


@given(words=st.lists(
    st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1, max_size=6),
    min_size=4, max_size=12))
@prop
def test_rolling_hash_matches_reference(spark, words):
    """The SQL rolling hash must equal a straight python Rabin-Karp."""
    from de_project_airflow_etl_spark.operators.text import RH_BASE, RH_MOD
    text = " ".join(words)
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(F.expr(
        f"aggregate(transform(split(text, ''), c -> ascii(c)),"
        f" cast(0 as bigint),"
        f" (acc, x) -> (acc * {RH_BASE} + x) % {RH_MOD})").alias("h")
    ).first()["h"]
    expected = 0
    for ch in text:
        expected = (expected * RH_BASE + ord(ch)) % RH_MOD
    assert got == expected


@given(payload=st.binary(min_size=0, max_size=64))
@settings(max_examples=200, deadline=None)
def test_decode_image_total_over_arbitrary_bytes(payload):
    """decode_image's error contract: ANY byte string either parses to
    a metadata dict or raises ValueError — never struct.error /
    IndexError (which would crash a mapInPandas worker outside the
    documented contract; ADVICE r2 multimodal.py:58)."""
    from de_project_airflow_etl_spark.operators.multimodal import (
        decode_image,
    )
    try:
        meta = decode_image(bytes(payload))
        assert {"width", "height", "channels", "format"} <= set(meta)
    except ValueError:
        pass


def test_pack_sequences_offsets_are_contiguous(spark, sf_dir):
    """Within each source shard: offsets start at 0, every next doc
    starts exactly where the previous ended, and bin ranges are
    consistent with the budget."""
    from de_project_airflow_etl_spark.operators.curation import (
        PACK_BUDGET, pack_sequences,
    )
    rows = pack_sequences(spark, sf_dir).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    assert by_source
    for source, docs in by_source.items():
        docs.sort(key=lambda r: r["doc_id"])
        expect = 0
        for r in docs:
            assert r["start_offset"] == expect, (source, r)
            assert r["n_tokens"] >= 1
            assert r["first_bin"] == r["start_offset"] // PACK_BUDGET
            end = r["start_offset"] + r["n_tokens"]
            assert r["last_bin"] == (end - 1) // PACK_BUDGET
            assert r["first_bin"] <= r["last_bin"]
            expect = end


def test_hash_split_is_stable_across_scale_factors(spark):
    """A document's split is a pure function of doc_id: the sf0.001
    subset must agree with sf0.01 row-for-row (re-running the split on
    a grown corpus never reshuffles old docs across splits — the
    property that makes hash splits train-safe)."""
    from de_project_airflow_etl_spark.operators.curation import (
        _SPLIT_EXPR,
    )
    from de_project_airflow_etl_spark.tables import load

    def assign(sf):
        return {r["doc_id"]: r["split"]
                for r in load(spark, sf, "documents")
                .selectExpr("doc_id", f"{_SPLIT_EXPR} AS split").collect()}

    small = assign("/root/testdata/sf0.001")
    big = assign("/root/testdata/sf0.01")
    assert small  # non-empty
    for doc_id, split in small.items():
        assert big.get(doc_id, split) == split, doc_id


def test_shuffle_shards_positions_are_dense_and_balanced(spark, sf_dir):
    """Every shard's positions are exactly 1..len(shard) (a training
    loader can seek by position), and the hash sharding is roughly
    balanced (no shard more than 2x the mean)."""
    from de_project_airflow_etl_spark.operators.curation import (
        corpus_shuffle_shards,
    )
    rows = corpus_shuffle_shards(spark, sf_dir).collect()
    shards: dict[int, list[int]] = {}
    for r in rows:
        shards.setdefault(r["shard"], []).append(r["pos_in_shard"])
    mean = len(rows) / len(shards)
    for shard, poss in shards.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
        assert len(poss) <= 2 * mean, (shard, len(poss), mean)


def test_contamination_pairs_share_a_trigram(spark, sf_dir):
    """Spot-check the inverted-index join: every reported pair really
    shares >= n_shared distinct word trigrams (recomputed in Python)."""
    from de_project_airflow_etl_spark.operators.curation import (
        NGRAM_N, contamination_check,
    )
    from de_project_airflow_etl_spark.tables import load
    pairs = contamination_check(spark, sf_dir).collect()
    assert pairs  # the eval set must collide at trigram level
    texts = {r["doc_id"]: r["text"]
             for r in load(spark, sf_dir, "documents").collect()}

    def grams(doc_id):
        toks = texts[doc_id].split(" ")
        return {" ".join(toks[i:i + NGRAM_N])
                for i in range(len(toks) - NGRAM_N + 1)}

    for r in pairs[:50]:
        shared = grams(r["doc_id"]) & grams(r["eval_doc_id"])
        assert len(shared) == r["n_shared_ngrams"], r
