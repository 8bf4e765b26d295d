"""Interleaved warm A/B: hex-string vs 16-byte-binary word-3-gram
digests (`curation._ngram_hashes`) across every consumer — the r10
`_lsh_verified` binary-digest precedent applied to the gram-keyed
exchanges (containment self-join, novelty groupBy+join, overlap
groupBy, contamination join, manifest decontamination index).

Equality: hex<->binary is a bijection, so grouping/joining on the
binary digest yields row-identical outputs; asserted per query.

Usage: python scripts/r11_ab_binarygram.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import de_project_airflow_etl_spark.operators.curation as curation
import de_project_airflow_etl_spark.queries.analytics as analytics
from de_project_airflow_etl_spark.operators.dedup import clear_pairs_cache
from de_project_airflow_etl_spark.registry import all_queries
from de_project_airflow_etl_spark.session import get_spark

NGRAM_N = curation.NGRAM_N


def hex_hashes() -> F.Column:
    return F.expr(f"""
        array_distinct(transform(
          sequence(1, size(toks) - {NGRAM_N - 1}),
          i -> md5(concat_ws(' ', slice(toks, i, {NGRAM_N})))))
    """)


def bin_hashes() -> F.Column:
    return F.expr(f"""
        array_distinct(transform(
          sequence(1, size(toks) - {NGRAM_N - 1}),
          i -> unhex(md5(concat_ws(' ', slice(toks, i, {NGRAM_N}))))))
    """)


QUERIES = [
    "containment_dup_pairs",
    "ngram_novelty_score",
    "source_overlap_matrix",
    "contamination_check",
    "corpus_release_manifest",
]


def set_variant(fn) -> None:
    curation._ngram_hashes = fn
    analytics._ngram_hashes = fn


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r11-ab-binarygram")
    reg = all_queries()

    # equality first, at sf0.01 (fast): sorted collected rows match
    eq_dir = "/root/testdata/sf0.01"
    for name in QUERIES:
        rows = {}
        for label, fn in (("hex", hex_hashes), ("bin", bin_hashes)):
            set_variant(fn)
            spark.catalog.clearCache(); clear_pairs_cache()
            df = reg[name].fn(spark, eq_dir)
            rows[label] = sorted(map(tuple, df.collect()))
        assert rows["hex"] == rows["bin"], f"{name}: outputs differ"
        print(f"rows_equal {name}: True ({len(rows['hex'])} rows)",
              flush=True)

    best = {name: {"hex": float("inf"), "bin": float("inf")}
            for name in QUERIES}
    for r in range(rounds):
        for label, fn in (("hex", hex_hashes), ("bin", bin_hashes)):
            set_variant(fn)
            for name in QUERIES:
                spark.catalog.clearCache(); clear_pairs_cache()
                spark.sparkContext.setJobDescription(
                    f"ab:{name}:{label}:r{r}")
                t0 = time.perf_counter()
                (reg[name].fn(spark, sf_dir)
                 .write.format("noop").mode("overwrite").save())
                dt = time.perf_counter() - t0
                best[name][label] = min(best[name][label], dt)
                print(f"  r{r} {label:3s} {name}: {dt:.3f}s", flush=True)
    print("---- best-of-%d ----" % rounds, flush=True)
    for name in QUERIES:
        h, b = best[name]["hex"], best[name]["bin"]
        print(f"{name}: hex {h:.3f}s bin {b:.3f}s "
              f"({(h - b) / h * 100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
