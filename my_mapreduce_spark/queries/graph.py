"""Graph analytics beyond connected components (SURVEY.md §2D depth;
the CC family lives in queries/dedup.py).

``q_pagerank`` runs a FIXED number of power iterations so the result
is exactly reproducible by a non-recursive SQL oracle (one CTE chain
per iteration) — the same trick the CC queries play with a recursive
CTE, but here the iteration count is part of the query's contract,
which is also how production batch PageRank is actually run (fixed
iteration budget, not convergence detection, so the job's cost is
known in advance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.registry import register

_DAMP = 0.85
_ITERS = 3
_TOP = 20


def _pagerank_oracle() -> str:
    it = """,
    s{i} AS (
        SELECT e.dst AS node, SUM(r{p}.r / outdeg.deg) AS s
        FROM edges e
        JOIN r{p} ON r{p}.node = e.src
        JOIN outdeg ON outdeg.src = e.src
        GROUP BY e.dst),
    r{i} AS (
        SELECT node, (1.0 - {d}) / n.n + {d} * s AS r
        FROM s{i} CROSS JOIN n)"""
    iters = "".join(
        it.format(i=i, p=i - 1, d=_DAMP) for i in range(1, _ITERS + 1))
    return f"""
    WITH el AS (
        SELECT DISTINCT 'c' || o.o_custkey AS src, 's' || l.l_suppkey AS dst
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    edges AS (SELECT src, dst FROM el
              UNION ALL SELECT dst AS src, src AS dst FROM el),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    n AS (SELECT COUNT(*) AS n FROM nodes),
    outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT node, 1.0 / n.n AS r FROM nodes CROSS JOIN n){iters},
    ranked AS (
        SELECT node, ROUND(r, 6) AS pagerank,
               ROW_NUMBER() OVER (ORDER BY ROUND(r, 6) DESC, node) AS rnk
        FROM r{_ITERS})
    SELECT node, pagerank, rnk FROM ranked WHERE rnk <= {_TOP}
    """


@register(
    "q_pagerank",
    oracle=_pagerank_oracle(),
    tags=("graph", "pagerank", "iterative"),
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 power iterations) over the
    bidirected customer<->supplier trade graph derived from
    lineitem x orders; top-20 nodes by rank.

    The graph is symmetrized (each trade edge emitted both ways) so
    every node has out-degree >= 1 — no dangling-mass correction
    term, which keeps the per-iteration algebra a pure
    join-aggregate. One iteration = equi-join ranks onto the edge
    list, hash-aggregate incoming contributions per dst, add the
    teleport term. The edge list is repartitioned by src ONCE and
    the out-degree is fused on with a src-partitioned WINDOW count —
    which reuses that same partitioning, so degree attachment costs
    zero additional edge shuffles (vs groupBy+join-back, which costs
    two). The persisted relation's hash partitioning survives the
    cache, so every subsequent iteration shuffles only the rank
    relation (nodes, 2 doubles) — never the edges. At 100 TB
    the per-iteration cost is one node-keyed shuffle of the rank
    vector; iteration count is fixed, so total cost is 3 such
    shuffles regardless of data size. Ordering ties are broken on
    ROUND(rank, 6) then node id, so structurally-identical nodes
    (equal true rank, float-sum wiggle) order deterministically.

    Reference parity: the reference has no graph surface at all; this
    extends the same iterative pattern as q_dedup_clusters
    (mr/worker.go:39's fixed map/reduce alternation is the closest
    native analogue of an iteration schedule).
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    el = (li.join(o, li.l_orderkey == o.o_orderkey)
          .select(F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
                  F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"))
          .distinct())
    edges = el.unionAll(el.select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst")))
    # edges+degree, hash-partitioned on the join key once for all
    # iterations; persist() preserves the partitioning for the planner
    ed = (edges.repartition(F.col("src"))
          .withColumn("deg", F.count(F.lit(1))
                      .over(Window.partitionBy("src")))
          .persist())

    n = ed.select("src").distinct().count()
    if n == 0:  # empty graph: typed empty result, not a crash
        return spark.createDataFrame(
            [], "node string, pagerank double, rnk int")
    r = ed.select(F.col("src").alias("node")).distinct() \
          .withColumn("r", F.lit(1.0 / n))
    for _ in range(_ITERS):
        contrib = (ed.join(r, ed.src == r.node)
                   .groupBy("dst")
                   .agg(F.sum(F.col("r") / F.col("deg")).alias("s")))
        r = contrib.select(
            F.col("dst").alias("node"),
            (F.lit((1.0 - _DAMP) / n) + _DAMP * F.col("s")).alias("r"))

    w = Window.orderBy(F.col("pagerank").desc(), "node")
    return (r.select("node", F.round("r", 6).alias("pagerank"))
            .orderBy(F.col("pagerank").desc(), "node").limit(_TOP)
            .withColumn("rnk", F.row_number().over(w)))


@register(
    "q_degree_distribution",
    oracle="""
    WITH el AS (
        SELECT DISTINCT 'c' || o.o_custkey AS src, 's' || l.l_suppkey AS dst
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    edges AS (SELECT src, dst FROM el
              UNION ALL SELECT dst AS src, src AS dst FROM el),
    deg AS (SELECT src AS node, COUNT(*) AS degree FROM edges GROUP BY 1),
    bucketed AS (
        SELECT CASE WHEN substr(node, 1, 1) = 'c'
                    THEN 'customer' ELSE 'supplier' END AS side,
               CAST(length(format('{:b}', degree)) AS INT) AS log2_bucket,
               degree
        FROM deg)
    SELECT side, log2_bucket,
           COUNT(*) AS n_nodes,
           MIN(degree) AS min_deg, MAX(degree) AS max_deg
    FROM bucketed GROUP BY 1, 2
    """,
    tags=("graph", "stats"),
)
def q_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed degree distribution of the bidirected trade
    graph, split by node side — the skew census run BEFORE any graph
    algorithm: a heavy tail here is exactly what pagerank/CC
    partitioning must salt around (and what AQE's skew handling
    absorbs). Same edge relation as q_pagerank
    (graph.py:40); one degree agg + a tiny (side × ~20 buckets) agg;
    bucket index is exact integer bit-length, matching
    q_gap_log_histogram's convention.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                      "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    el = (li.join(o, li.l_orderkey == o.o_orderkey)
          .select(F.concat(F.lit("c"), "o_custkey").alias("src"),
                  F.concat(F.lit("s"), "l_suppkey").alias("dst"))
          .distinct())
    edges = el.unionAll(el.select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst")))
    deg = edges.groupBy(F.col("src").alias("node")) \
        .agg(F.count("*").alias("degree"))
    return (
        deg.select(
            F.when(F.substring("node", 1, 1) == "c", "customer")
             .otherwise("supplier").alias("side"),
            F.length(F.bin("degree")).cast("int").alias("log2_bucket"),
            "degree")
        .groupBy("side", "log2_bucket")
        .agg(F.count(F.lit(1)).alias("n_nodes"),
             F.min("degree").alias("min_deg"),
             F.max("degree").alias("max_deg"))
    )


_SSSP_ROUNDS = 4
_SSSP_TOP = 20


def _sssp_oracle() -> str:
    it = """,
    d{i} AS (
        SELECT node, MIN(dist) AS dist FROM (
            SELECT node, dist FROM d{p}
            UNION ALL
            SELECT e.dst AS node, d{p}.dist + e.w AS dist
            FROM edges e JOIN d{p} ON d{p}.node = e.src) GROUP BY node)"""
    iters = "".join(
        it.format(i=i, p=i - 1) for i in range(1, _SSSP_ROUNDS + 1))
    return f"""
    WITH el AS (
        SELECT 'c' || o.o_custkey AS src, 's' || l.l_suppkey AS dst,
               COUNT(*) AS cnt
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2),
    ew AS (SELECT src, dst,
                  1 + CAST(FLOOR(1000000.0 / cnt) AS BIGINT) AS w
           FROM el),
    edges AS (SELECT src, dst, w FROM ew
              UNION ALL SELECT dst AS src, src AS dst, w FROM ew),
    d0 AS (SELECT MIN(src) AS node, CAST(0 AS BIGINT) AS dist
           FROM edges){iters},
    ranked AS (
        SELECT node, dist,
               ROW_NUMBER() OVER (ORDER BY dist, node) AS rnk
        FROM d{_SSSP_ROUNDS} WHERE node IS NOT NULL)
    SELECT node, dist, rnk FROM ranked WHERE rnk <= {_SSSP_TOP}
    """


@register(
    "q_sssp_bellman_ford",
    oracle=_sssp_oracle(),
    tags=("graph", "shortest-path", "iterative"),
)
def q_sssp_bellman_ford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths (distributed
    Bellman-Ford, 4 fixed relaxation rounds) over the bidirected
    customer<->supplier trade graph; the 20 closest nodes to the
    lexicographically-first node. Edge weight = 1 +
    floor(1e6 / trade-count): high-volume relationships are cheap
    hops, so distance reads as "degrees of commercial separation".

    Weights and therefore distances are EXACT integers — no float
    accumulation across path lengths, so the oracle (the same fixed
    relaxation schedule unrolled as CTEs) matches bit-for-bit.
    Engine shape per round: equi-join the current tentative-distance
    relation onto the edge list, hash-aggregate MIN per node — the
    same join-agg skeleton as q_pagerank, reusing the edge
    relation's src hash partitioning every round, so each of the 4
    rounds shuffles only the distance vector (node, one bigint),
    never the edges. Fixed rounds, not convergence detection: the
    cost is known in advance and the result is a deterministic
    contract (nodes beyond 4 hops are absent on both engines).

    Reference parity: none — the reference cannot iterate
    (mr/worker.go runs one map/reduce pass); north-star §2D graph
    depth alongside q_pagerank and the CC family.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                      "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey",
                                                   "o_custkey")
    el = (li.join(o, li.l_orderkey == o.o_orderkey)
          .groupBy(F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
                   F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"))
          .agg(F.count(F.lit(1)).alias("cnt"))
          .select("src", "dst",
                  (F.lit(1) + F.floor(F.lit(1000000.0) / F.col("cnt"))
                   .cast("bigint")).alias("w")))
    edges = (el.unionAll(el.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst"), "w"))
             .repartition(F.col("src")).persist())
    d = (edges.agg(F.min("src").alias("node"))
         .withColumn("dist", F.lit(0).cast("bigint")))
    for _ in range(_SSSP_ROUNDS):
        relaxed = (edges.join(d, edges.src == d.node)
                   .select(F.col("dst").alias("node"),
                           (F.col("dist") + F.col("w")).alias("dist")))
        # eager localCheckpoint, not persist: d feeds BOTH the union
        # branch and the relaxation join, so an uncached double
        # reference re-executes geometrically — but a mere cache
        # still leaves every prior round in the LOGICAL plan, and
        # analysis re-walks that 2^rounds-shaped tree before any
        # cache hit resolves (the q_kcore_peel finding; ~25% of this
        # query's wall was plan analysis). Truncating lineage per
        # round keeps each analysis edge-sized; the vector is
        # O(nodes) x (string, bigint), blocks released by the
        # harness release_caches contract.
        d = (d.unionAll(relaxed)
             .groupBy("node").agg(F.min("dist").alias("dist"))
             .localCheckpoint(eager=True))
    top = (d.where(F.col("node").isNotNull())
           .orderBy("dist", "node").limit(_SSSP_TOP))
    w_rank = Window.orderBy("dist", "node")
    return top.withColumn("rnk", F.row_number().over(w_rank).cast("bigint"))


_HITS_TOP = 10


def _hits_oracle() -> str:
    return f"""
    WITH el AS (
        SELECT DISTINCT 'c' || o.o_custkey AS src, 's' || l.l_suppkey AS dst
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    a1 AS (SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS score
           FROM el GROUP BY dst),
    h1 AS (SELECT el.src AS node, CAST(SUM(a1.score) AS BIGINT) AS score
           FROM el JOIN a1 ON a1.node = el.dst GROUP BY el.src),
    a2 AS (SELECT el.dst AS node, CAST(SUM(h1.score) AS BIGINT) AS score
           FROM el JOIN h1 ON h1.node = el.src GROUP BY el.dst),
    h2 AS (SELECT el.src AS node, CAST(SUM(a2.score) AS BIGINT) AS score
           FROM el JOIN a2 ON a2.node = el.dst GROUP BY el.src),
    ra AS (SELECT 'authority' AS role, node, score,
                  ROW_NUMBER() OVER (ORDER BY score DESC, node) AS rnk
           FROM a2),
    rh AS (SELECT 'hub' AS role, node, score,
                  ROW_NUMBER() OVER (ORDER BY score DESC, node) AS rnk
           FROM h2)
    SELECT role, node, score, rnk FROM ra WHERE rnk <= {_HITS_TOP}
    UNION ALL
    SELECT role, node, score, rnk FROM rh WHERE rnk <= {_HITS_TOP}
    """


@register(
    "q_hits_hub_authority",
    oracle=_hits_oracle(),
    tags=("graph", "hits", "iterative", "ranking"),
)
def q_hits_hub_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (hubs & authorities, 2 unnormalized iterations) on the
    DIRECTED customer->supplier trade graph: suppliers score as
    authorities (bought from by well-connected customers), customers
    as hubs (buying from high-authority suppliers); top-10 of each.

    The key design choice is UNNORMALIZED iterations from an
    all-ones hub vector: every intermediate score is then an exact
    BIGINT (auth_1 = in-degree, hub_1 = sums of in-degrees, ...), so
    the oracle matches bit-for-bit with no float-rounding seam at
    all — same trick as q_sssp_bellman_ford's integer weights.
    Normalization only rescales within an iteration, so rankings are
    identical to textbook HITS; 2 iterations of growth stay far
    inside 64 bits (score <= E * max_deg^2).

    Engine shape per half-iteration: one equi-join of the score
    vector onto the edge list + one hash aggregate — the pagerank
    skeleton, 4 times. Only the (node, bigint) score vector ever
    shuffles. Reference parity: none; north-star §2D graph depth.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                      "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey",
                                                   "o_custkey")
    el = (li.join(o, li.l_orderkey == o.o_orderkey)
          .select(F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
                  F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"))
          .distinct().persist())

    def push(scores: DataFrame, key: str, out: str) -> DataFrame:
        """One half-iteration: join scores on `key`, sum per `out`."""
        return (el.join(scores, el[key] == scores.node)
                .groupBy(F.col(out).alias("node"))
                .agg(F.sum("score").cast("bigint").alias("score")))

    a1 = (el.groupBy(F.col("dst").alias("node"))
          .agg(F.count(F.lit(1)).cast("bigint").alias("score")))
    h1 = push(a1, "dst", "src")
    a2 = push(h1, "src", "dst")
    h2 = push(a2, "dst", "src")

    def top(scores: DataFrame, role: str) -> DataFrame:
        t = scores.orderBy(F.col("score").desc(), "node").limit(_HITS_TOP)
        w = Window.orderBy(F.col("score").desc(), "node")
        return t.select(F.lit(role).alias("role"), "node", "score",
                        F.row_number().over(w).cast("bigint").alias("rnk"))

    return top(a2, "authority").unionAll(top(h2, "hub"))


_KCORE_K = 4
_KCORE_ROUNDS = 3


def _kcore_oracle() -> str:
    rounds = []
    for i in range(1, _KCORE_ROUNDS + 1):
        p = i - 1
        rounds.append(f""",
    deg{i} AS (SELECT src, COUNT(*) AS d FROM edges{p} GROUP BY src),
    keep{i} AS (SELECT src AS node FROM deg{i} WHERE d >= {_KCORE_K}),
    edges{i} AS (
        SELECT e.src, e.dst FROM edges{p} e
        JOIN keep{i} a ON e.src = a.node
        JOIN keep{i} b ON e.dst = b.node)""")
    stats = "\n    UNION ALL\n".join(
        f"""    SELECT CAST({i} AS INT) AS round,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM keep{i}) AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM edges{i}) AS n_edges"""
        for i in range(1, _KCORE_ROUNDS + 1))
    return f"""
    WITH el AS (
        SELECT DISTINCT 'c' || o.o_custkey AS src, 's' || l.l_suppkey AS dst
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    edges0 AS (SELECT src, dst FROM el
               UNION ALL SELECT dst AS src, src AS dst FROM el)
    {"".join(rounds)}
{stats}
    """


@register(
    "q_kcore_peel",
    oracle=_kcore_oracle(),
    tags=("graph", "kcore", "iterative"),
)
def q_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-core peeling (k = 4, 3 fixed rounds) on the bidirected
    trade graph: each round drops every node with current degree
    < k and the edges touching it, reporting (round, surviving
    nodes, surviving directed edges) — the densification trajectory
    toward the 4-core. The k-core is the standard "dense engaged
    subgraph" extraction (spam rings, power users, co-purchase
    cores); the trajectory rows also show HOW FAST it converges,
    which is the production signal for choosing an iteration budget.

    All quantities are exact integers (degrees and counts), so the
    unrolled-CTE oracle matches bit-for-bit. Engine shape per
    round: one degree aggregate + one semi-join-shaped filter of
    the edge list against the keep set on BOTH endpoints — edges
    shrink monotonically, so per-round cost falls; the keep set is
    (node)-only and is what shuffles. The per-round (nodes, edges)
    stats stay LAZY — each round contributes a 1-row aggregate pair
    (their crossJoin is the whitelisted 1-row scalar shape), all
    rounds union into ONE job instead of 2 driver actions per round;
    the persisted intermediates are shared across the union's
    branches within that job (9.7 s -> 5.0 s at sf0.1, and on a real
    cluster one scheduling wave instead of six). Reference parity:
    none; north-star §2D graph depth.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                      "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey",
                                                   "o_custkey")
    el = (li.join(o, li.l_orderkey == o.o_orderkey)
          .select(F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
                  F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"))
          .distinct())
    # per-round eager localCheckpoint, not persist: a persisted round
    # keeps every prior round in its LOGICAL plan, and Spark resolves
    # cache hits only after analyzing the full tree — with keep
    # referenced twice per round the final union re-walked a
    # 2^rounds-shaped plan (the q_dedup_funnel lesson). Truncating
    # lineage each round keeps every analysis edge-sized: measured
    # 3.7 s -> 1.4 s at sf0.001 / 6.2 s -> 4.0 s at sf0.1, results
    # identical. (The earlier single-job persist design had itself
    # beaten 2-actions-per-round at 9.7 s -> 5.0 s; this keeps its
    # lazy-union shape — stats branches now read checkpoint blocks —
    # and removes the analysis tax it still paid.)
    # Adjudicated fixture-scale byte delta (COST gate, this round):
    # the old persisted keep carried cache size stats, so AQE
    # auto-broadcast it and the fixture's edge list never shuffled
    # (amplification 2.1); checkpointed relations expose no stats,
    # so the keep-joins plan as sort-merge (4.3). At 100 TB keep is
    # node-sized — NEITHER version can broadcast it — so the
    # at-scale shuffle bytes are identical, while the analysis tax
    # the truncation removes is a per-round driver cost at ANY
    # scale. A repartition-before-checkpoint variant (hoping the
    # preserved partitioning would de-shuffle the degree agg) was
    # measured WORSE (5.2: the repartition IS an extra full
    # shuffle) and rejected.
    edges = el.unionAll(el.select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst"))) \
        .localCheckpoint(eager=True)
    stats = []
    for i in range(1, _KCORE_ROUNDS + 1):
        keep = (edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
                .where(F.col("d") >= _KCORE_K)
                .select(F.col("src").alias("node"))
                .localCheckpoint(eager=True))
        edges = (edges.join(keep.withColumnRenamed("node", "src"),
                            "src")
                 .join(keep.withColumnRenamed("node", "dst"), "dst")
                 .select("src", "dst").localCheckpoint(eager=True))
        stats.append(
            keep.agg(F.count(F.lit(1)).alias("n_nodes")).crossJoin(
                edges.agg(F.count(F.lit(1)).alias("n_edges")))
            .select(F.lit(i).cast("int").alias("round"),
                    "n_nodes", "n_edges"))
    out = stats[0]
    for s in stats[1:]:
        out = out.unionAll(s)
    # localCheckpoint (not collect+createDataFrame): materialized
    # executor-side, never round-tripped via the driver; the blocks
    # above are released by the harness release_caches contract.
    return out.localCheckpoint(eager=True)


_LPA_ITERS = 3
_LPA_TOP = 20


def _lpa_cte() -> str:
    """Shared WITH-body computing the bidirected trade graph and the
    LPA fixpoint ``l{_LPA_ITERS}`` (node, label) — reused by the
    q_label_propagation and q_graph_modularity oracles so both gate
    the SAME deterministic synchronous-LPA semantics."""
    it = """,
    c{i} AS (
        SELECT e.dst AS node, l.label, COUNT(*) AS c
        FROM edges e JOIN l{p} l ON l.node = e.src
        GROUP BY 1, 2),
    l{i} AS (
        SELECT node, label FROM c{i}
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY node ORDER BY c DESC, label) = 1)"""
    iters = "".join(it.format(i=i, p=i - 1)
                    for i in range(1, _LPA_ITERS + 1))
    return f"""
    el AS (
        SELECT DISTINCT 'c' || o.o_custkey AS src, 's' || l.l_suppkey AS dst
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    edges AS (SELECT src, dst FROM el
              UNION ALL SELECT dst AS src, src AS dst FROM el),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges){iters}"""


def _lpa_oracle() -> str:
    return f"""
    WITH {_lpa_cte()},
    sz AS (SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS size
           FROM l{_LPA_ITERS} GROUP BY 1)
    SELECT community, size,
           ROW_NUMBER() OVER (ORDER BY size DESC, community) AS rnk
    FROM sz
    QUALIFY rnk <= {_LPA_TOP}
    """


def _lpa_labels(spark: SparkSession, sf_dir: str):
    """Shared synchronous-LPA fixpoint: returns (edges, labels) —
    the src-partitioned persisted bidirected edge list (caller
    releases via the harness release_caches contract) and the
    (node, label) relation after ``_LPA_ITERS`` deterministic
    plurality rounds. Consumed by q_label_propagation (community
    sizes) and q_graph_modularity (partition quality)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                      "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey",
                                                   "o_custkey")
    el = (li.join(o, li.l_orderkey == o.o_orderkey)
          .select(F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
                  F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"))
          .distinct())
    edges = (el.unionAll(el.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
             .repartition(F.col("src")).persist())
    labels = (edges.select(F.col("src").alias("node")).distinct()
              .withColumn("label", F.col("node")))
    for _ in range(_LPA_ITERS):
        votes = (edges.join(labels, edges.src == labels.node)
                 .groupBy(F.col("dst").alias("node"), "label")
                 .agg(F.count(F.lit(1)).alias("c")))
        labels = (votes
                  .groupBy("node")
                  .agg(F.min(F.struct((-F.col("c")).alias("nc"),
                                      F.col("label").alias("label")))
                       .alias("best"))
                  .select("node", F.col("best.label").alias("label")))
    return edges, labels


@register(
    "q_label_propagation",
    oracle=_lpa_oracle(),
    tags=("graph", "community", "iterative"),
)
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection via synchronous label propagation (3
    rounds) over the bidirected customer<->supplier trade graph:
    every node starts labeled with its own id; each round it adopts
    its neighbors' PLURALITY label (ties broken by highest count
    then lexicographically smallest label — the rule that makes
    synchronous LPA fully deterministic, which stock
    random-order LPA is not). Top-20 communities by final size.

    Distinct from the CC family (queries/dedup.py): min-label
    propagation converges to connected components; plurality voting
    finds DENSE groups inside one component — the
    customer-supplier bipartite clusters that share most of their
    trade volume.

    Engine shape per round: one equi-join of the O(nodes) label
    relation onto the src-partitioned edge list, one (node, label)
    hash aggregate, then the plurality argmax as a SECOND hash
    aggregate — ``min(struct(-c, label))`` picks highest count then
    smallest label, the exact QUALIFY tie-break, with map-side
    partial aggregation and no window sort (3.8 s -> 2.5 s at
    sf0.1) — all keyed shuffles of node-sized relations; the edge
    list is partitioned+persisted ONCE (caller releases,
    caching.release_caches). Iteration count is fixed, so at 100 TB
    total cost is 3 label-vector shuffles, the pagerank posture.
    The unrolled-CTE oracle reproduces every round bit-for-bit
    (counts and string comparisons only — no float seam anywhere).

    Reference parity: none; north-star §2D graph depth
    (mr/worker.go:39's fixed map/reduce alternation is the closest
    native analogue of a fixed iteration schedule).
    """
    edges, labels = _lpa_labels(spark, sf_dir)
    sz = (labels.groupBy(F.col("label").alias("community"))
          .agg(F.count(F.lit(1)).alias("size")))
    w_rank = Window.orderBy(F.col("size").desc(), "community")
    return (sz.orderBy(F.col("size").desc(), "community").limit(_LPA_TOP)
            .withColumn("rnk", F.row_number().over(w_rank).cast("bigint")))


@register(
    "q_graph_modularity",
    oracle="""
    WITH {LPA_CTE},
    lab AS (
        SELECT 'lpa' AS p, node, label FROM l{N}
        UNION ALL
        SELECT 'nation', 'c' || c_custkey, 'n' || c_nationkey
        FROM customer
        UNION ALL
        SELECT 'nation', 's' || s_suppkey, 'n' || s_nationkey
        FROM supplier),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
            FROM edges GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS ee FROM edges),
    inn AS (  -- bidirected edges with both endpoints in the community
        SELECT a.p, a.label AS community, CAST(COUNT(*) AS BIGINT) AS in2
        FROM edges e
        JOIN lab a ON e.src = a.node
        JOIN lab b ON e.dst = b.node AND b.p = a.p
        WHERE a.label = b.label
        GROUP BY 1, 2),
    dc AS (  -- degree mass per community (only graph nodes join deg)
        SELECT lab.p, lab.label AS community,
               CAST(SUM(deg.d) AS BIGINT) AS dsum
        FROM lab JOIN deg ON lab.node = deg.node
        GROUP BY 1, 2),
    terms AS (
        SELECT dc.p, dc.community,
               CAST(ROUND(COALESCE(inn.in2, 0) * 1.0 / tot.ee
                          - (dc.dsum * 1.0 / tot.ee)
                            * (dc.dsum * 1.0 / tot.ee), 9)
                    AS DECIMAL(38,9)) AS term
        FROM dc
        LEFT JOIN inn ON dc.p = inn.p AND dc.community = inn.community
        CROSS JOIN tot)
    SELECT p AS partitioning,
           CAST(COUNT(*) AS BIGINT) AS n_communities,
           (SELECT ee // 2 FROM tot) AS m_edges,
           ROUND(CAST(SUM(term) AS DOUBLE), 6) AS modularity
    FROM terms GROUP BY p
    """.replace("{LPA_CTE}", _lpa_cte()).replace("{N}", str(_LPA_ITERS)),
    tags=("graph", "community", "modularity"),
)
def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q = SUM_c (in_c/2m - (d_c/2m)^2) of TWO
    partitions of the trade graph, side by side: the LPA fixpoint
    (q_label_propagation's labels, via the shared _lpa_labels) and
    the natural nation partition (every customer/supplier labeled by
    its nation). This is the quality score that turns "some
    communities" into a measured clustering — and the comparison is
    the real analytics: on this graph the 3-round LPA fixpoint
    COLLAPSES toward a giant label (Q < 0, worse than random — the
    plurality cascade on a dense bipartite graph), while the nation
    partition scores near zero (trade crosses nations almost
    uniformly). A pipeline alerts on exactly this contrast when an
    ingest change reshapes the graph.

    Exactness: edge counts and degree sums are exact bigints; the
    only cross-community float fold (the per-community term sum) is
    rounded to 9 decimals and folded as DECIMAL(38,9) — exact,
    order-free (the q_anova_oneway discipline); one final
    ROUND(,6). The oracle re-runs the full unrolled LPA fixpoint
    through the SHARED _lpa_cte() body, so both queries gate
    identical label semantics.

    Engine shape: the LPA fixpoint is localCheckpoint'ed (eager)
    before fan-out — it feeds the label union TWICE (both endpoint
    joins); without truncation each consumer would re-run all three
    label-vector shuffles (the q_dedup_funnel plan-constant
    lesson). Then one union with the O(nodes) nation labels, two
    label joins onto the persisted edge list, one degree agg —
    everything keyed, community-bounded after the aggregates.
    Reference parity: none; north-star §2D graph depth.
    """
    edges, labels = _lpa_labels(spark, sf_dir)
    # eager checkpoint: the fixpoint feeds both endpoint joins; a
    # lazy LPA would re-run its 3 rounds per consumer branch
    lpa = labels.localCheckpoint(eager=True)
    cust = (load_table(spark, sf_dir, "customer")
            .select(F.concat(F.lit("c"), F.col("c_custkey")).alias("node"),
                    F.concat(F.lit("n"), F.col("c_nationkey"))
                    .alias("nat")))
    supp = (load_table(spark, sf_dir, "supplier")
            .select(F.concat(F.lit("s"), F.col("s_suppkey")).alias("node"),
                    F.concat(F.lit("n"), F.col("s_nationkey"))
                    .alias("nat")))
    # ONE label map carrying BOTH partitions per node: the edge list
    # is joined once per endpoint (not once per endpoint PER
    # partition — the union-doubled shape cost 2x the join work),
    # then the per-partition rows stack via a 2-element explode
    # eager checkpoint: 'both' is consumed three times (two endpoint
    # joins + node_stack) — without truncation the customer∪supplier
    # scan and its join against the LPA labels re-execute per
    # consumer; it is O(nodes) x 3 narrow cols (round-8 advice seam)
    both = (cust.unionByName(supp)
            .join(lpa.withColumnRenamed("node", "n2"),
                  F.col("node") == F.col("n2"), "left")
            .select("node", "nat", F.col("label").alias("lpa"))
            .localCheckpoint(eager=True))
    deg = edges.groupBy(F.col("src").alias("node")) \
        .agg(F.count(F.lit(1)).alias("d"))
    tot = edges.agg(F.count(F.lit(1)).alias("ee"))
    joined = (edges
              .join(both.select(F.col("node").alias("src"),
                                F.col("lpa").alias("la_l"),
                                F.col("nat").alias("la_n")), "src")
              .join(both.select(F.col("node").alias("dst"),
                                F.col("lpa").alias("lb_l"),
                                F.col("nat").alias("lb_n")), "dst"))
    stacked = joined.select(F.explode(F.array(
        F.struct(F.lit("lpa").alias("p"), F.col("la_l").alias("la"),
                 F.col("lb_l").alias("lb")),
        F.struct(F.lit("nation").alias("p"), F.col("la_n").alias("la"),
                 F.col("lb_n").alias("lb")))).alias("e")) \
        .select("e.p", "e.la", "e.lb")
    inn = (stacked.where(F.col("la") == F.col("lb"))
           .groupBy("p", F.col("la").alias("community"))
           .agg(F.count(F.lit(1)).alias("in2")))
    node_stack = both.join(deg, "node").select(
        "d", F.explode(F.array(
            F.struct(F.lit("lpa").alias("p"), F.col("lpa").alias("label")),
            F.struct(F.lit("nation").alias("p"),
                     F.col("nat").alias("label")))).alias("s")) \
        .select("d", "s.p", "s.label")
    dc = (node_stack
          .groupBy("p", F.col("label").alias("community"))
          .agg(F.sum("d").alias("dsum")))
    terms = (dc.join(inn, ["p", "community"], "left")
             .crossJoin(F.broadcast(tot))
             .select("p", F.round(
                 F.coalesce(F.col("in2"), F.lit(0)) / F.col("ee")
                 - (F.col("dsum") / F.col("ee"))
                 * (F.col("dsum") / F.col("ee")), 9)
                 .cast("decimal(38,9)").alias("term")))
    m_edges = tot.select((F.col("ee") / 2).cast("bigint").alias("m_edges"))
    return (terms.groupBy(F.col("p").alias("partitioning"))
            .agg(F.count(F.lit(1)).alias("n_communities"),
                 F.round(F.sum("term").cast("double"), 6)
                 .alias("modularity"))
            .crossJoin(F.broadcast(m_edges))
            .select("partitioning", "n_communities", "m_edges",
                    "modularity"))


_LP_MAX_DEG = 40     # hub cap: customers linked to > 40 suppliers carry
                     # ~no signal (1/deg tiny) but deg^2 pair fan-out
_LP_TOP = 50
_LP_SCALE = 1_000_000


def _linkpred_oracle() -> str:
    return f"""
    WITH cs AS (
        SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    deg AS (SELECT cust, CAST(COUNT(*) AS BIGINT) AS d
            FROM cs GROUP BY cust),
    mid AS (SELECT cs.cust, cs.supp, deg.d FROM cs
            JOIN deg ON cs.cust = deg.cust
            WHERE deg.d BETWEEN 2 AND {_LP_MAX_DEG}),
    pairs AS (
        SELECT a.supp AS supp_a, b.supp AS supp_b,
               CAST(COUNT(*) AS BIGINT) AS common_neighbors,
               CAST(SUM({_LP_SCALE} // a.d) AS BIGINT) AS ra_score_scaled
        FROM mid a JOIN mid b
          ON a.cust = b.cust AND a.supp < b.supp
        GROUP BY 1, 2)
    SELECT supp_a, supp_b, common_neighbors, ra_score_scaled,
           ROW_NUMBER() OVER (ORDER BY ra_score_scaled DESC,
                              supp_a, supp_b) AS rnk
    FROM pairs
    QUALIFY rnk <= {_LP_TOP}
    """


@register(
    "q_linkpred_resource_alloc",
    oracle=_linkpred_oracle(),
    tags=("graph", "link-prediction", "bipartite"),
)
def q_linkpred_resource_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the bipartite customer->supplier trade
    graph: for every supplier pair sharing at least one customer,
    the Resource-Allocation index (Zhou/Lu/Zhang 2009, the
    strongest of the classic local similarity indices) =
    sum over shared customers z of 1/deg(z) — here INTEGER-SCALED
    as sum(1000000 DIV deg) so the distributed sum is exact
    integer arithmetic with no float accumulation-order seam —
    plus the raw common-neighbor count. Top-50 predicted links by
    score. 'Suppliers who share low-degree (selective) customers
    are likely substitutes/competitors' is the recommendation and
    assortment-planning signal.

    Scale shape: the pair generation fans out per customer as
    deg^2, so customers above the hub cap (deg > 40) are DROPPED
    before the self-join — the standard production guard: hubs
    contribute ~nothing to the score (1/deg -> 0) but dominate the
    fan-out; the cap makes per-key work bounded and the whole
    relation collision-sized rather than |customers| x max-deg^2.
    Degree attaches via one combiner-reduced agg + equi-join; the
    final top-50 is TakeOrderedAndProject (rank window runs on the
    50-row bounded relation only). Reference parity: none;
    north-star §2D graph depth.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                      "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey",
                                                   "o_custkey")
    cs = (li.join(o, li.l_orderkey == o.o_orderkey)
          .select(F.col("o_custkey").alias("cust"),
                  F.col("l_suppkey").alias("supp"))
          .distinct())
    deg = (cs.groupBy("cust").agg(F.count(F.lit(1)).alias("d"))
           .where(F.col("d").between(2, _LP_MAX_DEG)))
    mid = cs.join(deg, "cust")
    pairs = (mid.alias("a")
             .join(mid.alias("b"),
                   (F.col("a.cust") == F.col("b.cust"))
                   & (F.col("a.supp") < F.col("b.supp")))
             .groupBy(F.col("a.supp").alias("supp_a"),
                      F.col("b.supp").alias("supp_b"))
             .agg(F.count(F.lit(1)).alias("common_neighbors"),
                  F.sum(F.expr(f"{_LP_SCALE} DIV a.d")).alias(
                      "ra_score_scaled")))
    top = pairs.orderBy(F.col("ra_score_scaled").desc(),
                        "supp_a", "supp_b").limit(_LP_TOP)
    w = Window.orderBy(F.col("ra_score_scaled").desc(), "supp_a", "supp_b")
    return top.select("supp_a", "supp_b", "common_neighbors",
                      "ra_score_scaled",
                      F.row_number().over(w).cast("bigint").alias("rnk"))


@register(
    "q_clustering_coefficient",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '[^a-z0-9]+'),
                           x -> x <> '') AS w
        FROM documents),
    s AS (
        SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
        FROM t, UNNEST(range(1, len(w) - 1)) AS u(i)
        WHERE len(w) >= 3),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
    p0 AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM s a JOIN s b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    e AS (
        SELECT doc_a AS a, doc_b AS b FROM p0
        JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
        WHERE n_common * 1.0 / (x.n + y.n - n_common) >= 0.6),
    sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY u),
    tri AS (
        SELECT e1.a, e1.b, e2.b AS c
        FROM e e1 JOIN e e2 ON e1.b = e2.a
                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
    tn AS (
        SELECT u, CAST(COUNT(*) AS BIGINT) AS n_tri
        FROM (SELECT a AS u FROM tri UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri)
        GROUP BY u)
    SELECT deg.u AS doc_id, deg.deg,
           COALESCE(tn.n_tri, 0) AS n_tri,
           ROUND(2.0 * COALESCE(tn.n_tri, 0) / (deg.deg * (deg.deg - 1)), 6)
               AS lcc
    FROM deg LEFT JOIN tn ON deg.u = tn.u
    WHERE deg.deg >= 2
    """,
    tags=("graph", "clustering-coefficient", "dedup", "triangles"),
)
def q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient over the near-duplicate graph:
    for each document with >= 2 near-dup neighbors, the fraction of
    its neighbor pairs that are ALSO near-dups — lcc = 2*tri /
    (deg*(deg-1)). This is the cluster-cohesion audit that decides
    whether a dedup component is a tight clique (lcc ~ 1, safe to
    collapse to one survivor) or a borderline chain (lcc ~ 0,
    collapsing merges documents that never matched each other) —
    the per-NODE refinement of q_dedup_triangles' global census.

    Plan: edges come from the already-thresholded Jaccard pair join
    (reused as a subroutine and cached once; caller releases);
    triangles are the same a<b<c oriented double self-join as
    q_dedup_triangles, exploded to their three corners for a
    per-node hash-agg; degrees are one hash-agg over the
    symmetrized edge list. Everything is pairs-sized, never
    corpus-sized — at 100 TB the near-dup graph is orders of
    magnitude smaller than the corpus (that is the point of
    dedup), and the oriented join bounds the enumeration fan-out.
    Reference parity: none; north-star §2D graph/dedup depth.
    """
    from my_mapreduce_spark.queries.dedup import exact_jaccard_pairs

    jpairs, jsets = exact_jaccard_pairs(spark, sf_dir)
    # localCheckpoint: a cached skeleton would cascade-drop when the
    # generator's shingle cache is released (see q_dedup_clusters)
    e = (jpairs
         .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
         .localCheckpoint(eager=True))
    jsets.unpersist()
    sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (e1.join(e2, F.col("e1.b") == F.col("e2.a"))
           .join(e3, (F.col("e3.a") == F.col("e1.a"))
                 & (F.col("e3.b") == F.col("e2.b")))
           .select(F.col("e1.a").alias("a"), F.col("e1.b").alias("b"),
                   F.col("e2.b").alias("c")))
    tn = (tri.select(F.col("a").alias("u"))
          .unionAll(tri.select(F.col("b").alias("u")))
          .unionAll(tri.select(F.col("c").alias("u")))
          .groupBy("u").agg(F.count(F.lit(1)).alias("n_tri")))
    n_tri = F.coalesce(F.col("n_tri"), F.lit(0))
    return (deg.join(tn, "u", "left")
            .where(F.col("deg") >= 2)
            .select(F.col("u").alias("doc_id"), "deg",
                    n_tri.alias("n_tri"),
                    F.round(2.0 * n_tri
                            / (F.col("deg") * (F.col("deg") - 1)), 6)
                    .alias("lcc")))


@register(
    "q_graph_assortativity",
    oracle="""
    WITH el AS (
        SELECT DISTINCT 'c' || o.o_custkey AS src, 's' || l.l_suppkey AS dst
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    edges AS (SELECT src, dst FROM el
              UNION ALL SELECT dst AS src, src AS dst FROM el),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
            FROM edges GROUP BY 1),
    ex AS (
        SELECT dx.d AS x, dy.d AS y
        FROM edges e JOIN deg dx ON e.src = dx.node
                     JOIN deg dy ON e.dst = dy.node),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM ex)
    SELECT (SELECT CAST(COUNT(DISTINCT node) AS BIGINT) FROM deg) AS n_nodes,
           CAST(m // 2 AS BIGINT) AS n_edges,
           ROUND((m * 1.0 * sxy - sx * 1.0 * sy)
                 / sqrt((m * 1.0 * sxx - sx * 1.0 * sx)
                        * (m * 1.0 * syy - sy * 1.0 * sy)), 6)
               AS assortativity
    FROM m
    """,
    tags=("graph", "assortativity", "degree"),
)
def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002) of the customer–supplier
    trade graph: the Pearson correlation of endpoint degrees over
    all directed edge orientations. Negative r = disassortative
    (hubs attach to leaves — typical of bipartite commerce and web
    graphs), positive = assortative (hubs cluster — social graphs);
    the single number that says which sampling and partitioning
    strategies will see skew amplified vs damped.

    Exactness: degrees are bigints, so the six moments (m, Sx, Sy,
    Sxx, Syy, Sxy) are exact integer sums; r is one final closed
    form — the q_ab_test_welch no-accumulation-seam discipline
    applied to graph structure.

    Plan: one distinct edge derivation (fact-fact join), one degree
    hash-agg, two degree joins back onto edges (both sides shuffle
    on node id — co-located), one 6-number global aggregate.
    Linear in edges at 100 TB; no window, no iteration.
    Reference parity: none; north-star §2D graph depth.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                      "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey",
                                                   "o_custkey")
    el = (li.join(o, li.l_orderkey == o.o_orderkey)
          .select(F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
                  F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"))
          .distinct())
    edges = el.unionAll(el.select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst")))
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d"))
    ex = (edges.join(deg.select(F.col("node").alias("src"),
                                F.col("d").alias("x")), "src")
          .join(deg.select(F.col("node").alias("dst"),
                           F.col("d").alias("y")), "dst"))
    m = ex.agg(F.count(F.lit(1)).alias("m"),
               F.sum("x").alias("sx"), F.sum("y").alias("sy"),
               F.sum(F.col("x") * F.col("x")).alias("sxx"),
               F.sum(F.col("y") * F.col("y")).alias("syy"),
               F.sum(F.col("x") * F.col("y")).alias("sxy"))
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    num = F.col("m") * 1.0 * F.col("sxy") - F.col("sx") * 1.0 * F.col("sy")
    den = F.sqrt(
        (F.col("m") * 1.0 * F.col("sxx") - F.col("sx") * 1.0 * F.col("sx"))
        * (F.col("m") * 1.0 * F.col("syy") - F.col("sy") * 1.0 * F.col("sy")))
    return (m.crossJoin(F.broadcast(n_nodes))
            .select("n_nodes",
                    (F.col("m") / 2).cast("bigint").alias("n_edges"),
                    F.round(num / den, 6).alias("assortativity")))


_WALK_STEPS = 3
_WALK_START_MOD = 100  # walkers start from c_custkey % 100 == 0


def _walk_oracle() -> str:
    """Chained argmin CTEs — one per walk step; DuckDB's arg_min on
    the md5 draw mirrors Spark's min(struct(md5, node))."""
    steps = []
    for i in range(1, _WALK_STEPS + 1):
        p = i - 1
        steps.append(f""",
    w{i} AS (
        SELECT w.start_node, arg_min(e.dst,
                   md5(w.n{p} || '|' || e.dst || '|{i}')) AS n{i}
               {', ' + ', '.join(f'w.n{j}' for j in range(1, i))
                if i > 1 else ''}
        FROM w{p} w JOIN edges e ON e.src = w.n{p}
        GROUP BY ALL)""")
    cols = ", ".join(f"n{i}" for i in range(1, _WALK_STEPS + 1))
    return f"""
    WITH el AS (
        SELECT DISTINCT 'c' || o.o_custkey AS src, 's' || l.l_suppkey AS dst
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    edges AS (SELECT src, dst FROM el
              UNION ALL SELECT dst AS src, src AS dst FROM el),
    w0 AS (
        SELECT DISTINCT 'c' || o_custkey AS start_node,
               'c' || o_custkey AS n0
        FROM orders WHERE o_custkey % {_WALK_START_MOD} = 0){"".join(steps)}
    SELECT start_node, {cols},
           start_node || '>' || {" || '>' || ".join(
               f"n{i}" for i in range(1, _WALK_STEPS + 1))} AS walk
    FROM w{_WALK_STEPS}
    """


@register(
    "q_random_walks",
    oracle=_walk_oracle(),
    tags=("graph", "random-walk", "node2vec", "embedding-prep"),
)
def q_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeepWalk/node2vec-style walk corpus generation over the
    customer–supplier graph: every 100th customer starts a 3-step
    walk, and each step moves to the neighbor minimizing
    md5(current || '|' || neighbor || '|' || step) — a DETERMINISTIC
    pseudo-random draw (the md5-as-randomness contract every
    sampling query here uses), so the walk corpus is reproducible
    bit-for-bit across engines and cluster layouts, which is
    exactly what you want when the walks feed a skip-gram trainer
    (q_skipgram_cooc) and the run must be replayable. Walk length
    is the unrolled constant 3; each step is one frontier-edges
    join + one argmin hash-agg (min over a struct of (draw, node) —
    ties impossible, md5 collisions aside, and broken by the draw
    string itself).

    Plan: the frontier stays |walkers| rows; each step shuffles
    frontier x out-degree candidate rows, aggregated back to
    |walkers| by the argmin — the same bounded-frontier shape as
    q_recursive_cte_reachability. At 100 TB: walkers partition
    freely, the edge relation is hash-partitioned once on src (the
    q_pagerank discipline), and step count is a constant — walk
    generation is embarrassingly parallel in walkers.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                      "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey",
                                                   "o_custkey")
    el = (li.join(o, li.l_orderkey == o.o_orderkey)
          .select(F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
                  F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"))
          .distinct())
    edges = el.unionAll(el.select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst"))) \
        .repartition(F.col("src")).persist()
    w = (o.select(F.concat(F.lit("c"), F.col("o_custkey"))
                  .alias("start_node"))
         .where(F.expr(f"o_custkey % {_WALK_START_MOD} = 0"))
         .distinct()
         .withColumn("n0", F.col("start_node")))
    prev_cols = ["start_node"]
    for i in range(1, _WALK_STEPS + 1):
        draw = F.md5(F.concat(F.col(f"n{i-1}"), F.lit("|"),
                              F.col("dst"), F.lit(f"|{i}")))
        w = (w.join(edges, w[f"n{i-1}"] == edges.src)
             .groupBy(*prev_cols, f"n{i-1}")
             .agg(F.min(F.struct(draw.alias("d"),
                                 F.col("dst").alias("v"))).alias("m"))
             .select(*prev_cols, f"n{i-1}", F.col("m.v").alias(f"n{i}")))
        prev_cols.append(f"n{i-1}")
    step_cols = [f"n{i}" for i in range(1, _WALK_STEPS + 1)]
    return w.select(
        "start_node", *step_cols,
        F.concat_ws(">", "start_node", *step_cols).alias("walk"))
