"""Round-23 staged bank: two graph/DP operators over text and
behavior sequences — TextRank keyphrase extraction (weighted PageRank
over the within-document term-adjacency graph, in the engine's
established exact fixed-point integer iteration) and LZ78 phrase
complexity of per-user event sequences (the incremental-parsing
dictionary fold — a sequence-compressibility profile; low phrase
count = repetitive scripted behavior, high = diverse organic paths).

Both follow the repo's exactness contract: BIGINT fixed-point with
floor division for the iterative rank (the pagerank_dup_graph
precedent, dedup.py:644), and an array fold on Spark vs a
recursive-CTE position stepper on DuckDB for the DP (the DTW /
Needleman-Wunsch precedent, round15/round20).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de_project_airflow_etl_spark.staged import staged_query
from de_project_airflow_etl_spark.tables import load

TR_SCALE = 10**12   # fixed-point rank unit (1.0 == 10^12)
TR_ITERS = 3        # unrolled iterations (pagerank precedent)
TR_V = 300          # keep-list: top-V corpus terms
TR_TOP = 20         # keyphrases reported

LZ_CAP = 32         # per-user sequence cap (first 32 events by key)

# One edge's contribution in a rank round. The PRODUCT is widened to
# DECIMAL(38,0)/HUGEINT before the floor division: a rank near
# TR_SCALE (10^12) times a co-occurrence edge weight past ~9.2e6
# overflows int64 (the recorded sum(cents^2) overflow class —
# invisible at sf0.1, an ANSI abort at corpus scale). Post-division
# the value is back at rank scale, so the cast to BIGINT and the
# downstream SUM are safe.
TR_CONTRIB_SPARK = ("CAST((CAST(r AS DECIMAL(38,0)) * w) div wt"
                    " AS BIGINT)")


def _tr_contrib_sql(r: str, w: str, wt: str) -> str:
    """DuckDB twin of ``TR_CONTRIB_SPARK`` (HUGEINT product)."""
    return f"CAST((CAST({r} AS HUGEINT) * {w}) // {wt} AS BIGINT)"


# ---------------------------------------------------------------------
# TextRank keyphrases.

_SQL_TR_GRAPH = f"""
        d AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), t -> t <> '')
                   AS toks
          FROM documents
        ),
        tok AS (SELECT unnest(toks) AS term FROM d),
        keep AS (
          SELECT term FROM (
            SELECT term,
                   ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, term)
                     AS rnk
            FROM tok GROUP BY term
          ) WHERE rnk <= {TR_V}
        ),
        adj AS (
          SELECT unnest(list_zip(toks[:-1], toks[2:])) AS pr FROM d
          WHERE len(toks) >= 2
        ),
        raw_e AS (
          SELECT pr[1] AS a, pr[2] AS b FROM adj
          WHERE pr[1] <> pr[2]
            AND pr[1] IN (SELECT term FROM keep)
            AND pr[2] IN (SELECT term FROM keep)
        ),
        edges AS (
          SELECT a AS src, b AS dst, CAST(COUNT(*) AS BIGINT) AS w
          FROM (SELECT a, b FROM raw_e
                UNION ALL SELECT b, a FROM raw_e)
          GROUP BY 1, 2
        ),
        nodes AS (SELECT DISTINCT src AS term FROM edges),
        n_cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
        wout AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wt
                 FROM edges GROUP BY src)"""


def _sql_tr_iter(prev: str, out: str) -> str:
    """One unrolled weighted-PageRank round in BIGINT fixed point."""
    return f"""
        c_{out} AS (
          SELECT e.dst AS term,
                 SUM({_tr_contrib_sql('r.r', 'e.w', 'wo.wt')}) AS s
          FROM edges e
          JOIN {prev} r ON e.src = r.term
          JOIN wout wo ON e.src = wo.src
          GROUP BY e.dst
        ),
        {out} AS (
          SELECT n.term,
                 (15 * {TR_SCALE}) // (100 * (SELECT n FROM n_cnt))
                 + (85 * COALESCE(c.s, 0)) // 100 AS r
          FROM nodes n LEFT JOIN c_{out} c ON n.term = c.term
        )"""


@staged_query(
    "textrank_keyphrases",
    oracle=f"""
        WITH {_SQL_TR_GRAPH},
        r0 AS (
          SELECT term,
                 CAST({TR_SCALE} AS BIGINT)
                   // (SELECT n FROM n_cnt) AS r
          FROM nodes
        ),
        {_sql_tr_iter('r0', 'r1')},
        {_sql_tr_iter('r1', 'r2')},
        {_sql_tr_iter('r2', 'r3')},
        ranked AS (
          SELECT term, CAST(r AS BIGINT) AS rank_e12,
                 ROW_NUMBER() OVER (ORDER BY r DESC, term) AS rk
          FROM r3
        )
        SELECT term, rank_e12, CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= {TR_TOP}
    """,
    doc="TextRank keyphrase extraction: weighted PageRank (damping "
        "0.85, 3 rounds) over the within-document term-adjacency "
        f"graph restricted to the top-{TR_V} corpus terms — the "
        "graph-centrality keyword ranker (Mihalcea-Tarau) that "
        "surfaces CONNECTIVE corpus vocabulary rather than merely "
        "frequent terms, the keyword complement to the registered "
        "RAKE phrase extractor. Adjacency comes from one zero-"
        "shuffle zip_with over each document's token array (both "
        "endpoints keep-listed, self-loops dropped); edge weights "
        "are co-occurrence counts; every rank rides BIGINT 10^12 "
        "fixed point with floor division, so the Spark loop and the "
        "oracle's unrolled SQL rounds agree EXACTLY (the "
        "pagerank_dup_graph precedent — double-based PageRank could "
        "never hash-match). Each round is one edge->rank broadcast "
        "join + one aggregate on dst over the VOCAB-CAP-bounded "
        "edge list; localCheckpoint keeps the plan flat per round. "
        "Plan: one tokenize-explode term count (the only corpus-"
        "scale work) + one adjacency explode, then bounded "
        "iteration; top-20 rows out.",
    tags=("staged", "text", "graph", "iterative"),
)
def textrank_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (load(spark, sf_dir, "documents")
         .select(F.expr("filter(split(text, ' '), t -> t <> '')")
                  .alias("toks")))
    tok = d.select(F.explode("toks").alias("term"))
    keep = (tok.groupBy("term").agg(F.count(F.lit(1)).alias("tot"))
               .select("term", F.row_number().over(
                   Window.orderBy(F.desc("tot"), "term")).alias("rnk"))
               .filter(F.col("rnk") <= TR_V)
               .select("term"))
    # size(toks) >= 2 guard BEFORE the sequence-driven slice lambda
    # (recorded rule: slice(toks, 1, size-1) on an empty token array
    # hard-fails with INVALID_PARAMETER_VALUE.LENGTH); term counts in
    # `keep` above deliberately still see 1-token documents, so the
    # guard applies to the adjacency path only, on both engines.
    adj = (d.filter(F.expr("size(toks) >= 2"))
            .select(F.explode(F.expr(
                "zip_with(slice(toks, 1, size(toks) - 1),"
                " slice(toks, 2, size(toks) - 1),"
                " (a, b) -> struct(a, b))"))
                .alias("pr"))
            .selectExpr("pr.a AS a", "pr.b AS b"))
    raw_e = (adj.filter("a <> b")
                .join(F.broadcast(keep.selectExpr("term AS a")), "a")
                .join(F.broadcast(keep.selectExpr("term AS b")), "b"))
    edges = (raw_e.selectExpr("a AS src", "b AS dst")
                  .union(raw_e.selectExpr("b AS src", "a AS dst"))
                  .groupBy("src", "dst")
                  .agg(F.count(F.lit(1)).cast("long").alias("w"))
                  .localCheckpoint())  # vocab-cap-bounded; 4 consumers
    wout = edges.groupBy("src").agg(F.sum("w").cast("long").alias("wt"))
    nodes = edges.select(F.col("src").alias("term")).distinct()
    n = nodes.count()  # one driver scalar, mirrored by oracle n_cnt
    base = (15 * TR_SCALE) // (100 * n)
    r = (nodes.withColumn("r", F.lit(TR_SCALE // n))
              .localCheckpoint())
    for _ in range(TR_ITERS):
        contrib = (edges.join(r, edges.src == r.term)
                        .join(wout, "src")
                        .select(F.col("dst").alias("term"),
                                F.expr(TR_CONTRIB_SPARK).alias("c")))
        sums = contrib.groupBy("term").agg(F.sum("c").alias("s"))
        r = (nodes.join(sums, "term", "left")
                  .select("term",
                          (F.lit(base)
                           + F.expr("(85 * coalesce(s, 0)) div 100"))
                          .alias("r"))
                  .localCheckpoint())
    ranked = r.select(
        "term", F.col("r").cast("long").alias("rank_e12"),
        F.row_number().over(
            Window.orderBy(F.desc("r"), "term")).alias("rk"))
    return (ranked.filter(F.col("rk") <= TR_TOP)
                  .selectExpr("term", "rank_e12",
                              "CAST(rk AS BIGINT) AS rk"))


# ---------------------------------------------------------------------
# LZ78 phrase complexity of per-user event-type sequences.

_LZ_KEY_SPARK = ("CAST(unix_micros(ts) AS DECIMAL(38,0))"
                 " * 10000000000 + event_id")
_LZ_KEY_SQL = ("CAST(epoch_us(ts) AS HUGEINT) * 10000000000"
               " + event_id")


@staged_query(
    "lz78_event_sequence_complexity",
    oracle=f"""
        WITH RECURSIVE seqs AS (
          SELECT user_id,
                 (list(event_type ORDER BY {_LZ_KEY_SQL}))[:{LZ_CAP}]
                   AS toks
          FROM events GROUP BY user_id
        ),
        step AS (
          SELECT user_id, 0 AS pos,
                 CAST([] AS VARCHAR[]) AS seen,
                 CAST('' AS VARCHAR) AS cur,
                 0 AS cnt, toks
          FROM seqs
          UNION ALL
          SELECT user_id, pos + 1,
                 CASE WHEN list_contains(seen,
                        cur || '|' || toks[pos + 1]) THEN seen
                      ELSE list_append(seen,
                        cur || '|' || toks[pos + 1]) END,
                 CASE WHEN list_contains(seen,
                        cur || '|' || toks[pos + 1])
                      THEN cur || '|' || toks[pos + 1]
                      ELSE '' END,
                 cnt + CASE WHEN list_contains(seen,
                        cur || '|' || toks[pos + 1]) THEN 0 ELSE 1 END,
                 toks
          FROM step WHERE pos < len(toks)
        ),
        final AS (
          SELECT user_id,
                 CAST(len(toks) AS BIGINT) AS seq_len,
                 CAST(cnt + CASE WHEN cur <> '' THEN 1 ELSE 0 END
                      AS BIGINT) AS n_phrases
          FROM step WHERE pos = len(toks)
        )
        SELECT seq_len, n_phrases,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM final GROUP BY 1, 2
    """,
    doc="LZ78 phrase complexity of each user's event-type sequence "
        f"(first {LZ_CAP} events in exact (epoch-micros, event_id) "
        "key order): the incremental-parsing dictionary fold — each "
        "step extends the current phrase by one symbol and emits a "
        "NEW dictionary phrase when the extension is unseen — whose "
        "phrase count is the classical sequence-compressibility "
        "measure (low = scripted/repetitive behavior like "
        "view-view-view..., high = diverse organic paths; the "
        "bot-detection complement to the registered session-path and "
        "Bandt-Pompe census operators). Spark runs the parse as ONE "
        "in-array aggregate() fold inside codegen (dictionary "
        "capped at the sequence length, <= "
        f"{LZ_CAP} entries); DuckDB steps positions via a recursive "
        "CTE carrying the dictionary list (the DTW/Needleman-Wunsch "
        "dual-engine DP precedent — list-valued accumulators do not "
        "thread through list_reduce, the recorded round-8 rule). "
        "Output is the bounded (seq_len, n_phrases) census, exact "
        "integers. Plan: one shuffle on user_id into a "
        "map-side-combinable sorted-list aggregate, the fold as a "
        "projection, one bounded census rollup.",
    tags=("staged", "sequence", "statistics"),
)
def lz78_event_sequence_complexity(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    seqs = (load(spark, sf_dir, "events")
            .selectExpr("user_id", "event_type",
                        f"{_LZ_KEY_SPARK} AS k")
            .groupBy("user_id")
            .agg(F.expr(
                "slice(transform(array_sort(collect_list("
                "struct(k, event_type))), s -> s.event_type),"
                f" 1, {LZ_CAP}) AS toks")))
    folded = seqs.selectExpr(
        "CAST(size(toks) AS BIGINT) AS seq_len",
        """
        aggregate(
          toks,
          named_struct('seen', CAST(array() AS ARRAY<STRING>),
                       'cur', CAST('' AS STRING), 'cnt', 0),
          (acc, t) -> CASE
            WHEN array_contains(acc.seen, concat(acc.cur, '|', t))
            THEN named_struct('seen', acc.seen,
                              'cur', concat(acc.cur, '|', t),
                              'cnt', acc.cnt)
            ELSE named_struct(
                   'seen', array_append(acc.seen,
                                        concat(acc.cur, '|', t)),
                   'cur', CAST('' AS STRING), 'cnt', acc.cnt + 1) END,
          acc -> acc.cnt + IF(acc.cur <> '', 1, 0)
        ) AS n_phrases_i
        """)
    return (folded.selectExpr(
        "seq_len", "CAST(n_phrases_i AS BIGINT) AS n_phrases")
        .groupBy("seq_len", "n_phrases")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users")))
