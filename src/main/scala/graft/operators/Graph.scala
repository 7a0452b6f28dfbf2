package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph centrality over the transaction graph — the web-graph
  * importance-weighting machinery of corpus curation (PageRank-style
  * quality priors over a link graph; Brin & Page 1998) expressed as
  * iterated co-partitioned joins, DataFrame-native.
  *
  * The graph: customers and suppliers as nodes, an undirected edge per
  * distinct (customer, supplier) trading pair from lineitem ⋈ orders —
  * the bipartite interaction graph every marketplace / crawl-host /
  * citation corpus has an analog of.
  *
  * Determinism contract: scores live in integer PARTS-PER-BILLION and
  * every step is integer arithmetic (`div`, no float) with a fixed
  * iteration count, so Spark and the DuckDB oracle (the same
  * recurrence unrolled as 10 CTE layers — SQL-expressible without
  * recursive-CTE aggregation, which standard SQL forbids) agree
  * bit-for-bit. Integer-division remainders leak a little mass per
  * round; both engines leak identically, and ranking is unaffected.
  *
  * Scale shape (the PageRank-at-scale canon — replicate the dense
  * vector, keep the matrix put): per round the score vector is
  * BROADCAST into a join against the persisted, dst-clustered edge
  * list (no edge exchange; the dst-clustering lets map-side combine
  * collapse the contribution shuffle to ~one row per node per
  * partition), then one partial-agg groupBy. Past the node count
  * where the vector stops fitting an executor, the same algebra runs
  * as a shuffle join against a src-partitioned edge cache — the
  * branch is a one-line threshold. Each round is `localCheckpoint`ed:
  * iterative lineage otherwise compounds into a plan the driver
  * cannot compile (the [[Dedup.clustersFrom]] lesson). Dangling nodes
  * don't exist by construction (edges are symmetric); isolated nodes
  * ride the teleport term only.
  */
object Graph {

  private val G = 1000000000L        // one unit of total mass, in ppb
  private val DampNum = 85L          // damping 0.85 as an exact ratio
  private val DampDen = 100L

  /** 10-iteration integer PageRank over the customer–supplier graph.
    * Output: one row per node with its entity type/id and final score
    * in ppb. */
  def pageRank(spark: SparkSession, sf: String, iters: Int = 10): DataFrame = {
    val pairs = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.load(spark, sf, "orders")
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
      .distinct()
    val edges = pairs
      .select((col("ck") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
      .union(pairs.select((col("sk") * 2 + 1).as("src"), (col("ck") * 2).as("dst")))
    val nodes = Tables.load(spark, sf, "customer")
      .select((col("c_custkey") * 2).as("node"))
      .union(Tables.load(spark, sf, "supplier")
        .select((col("s_suppkey") * 2 + 1).as("node")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nn = nodes.count()
    // The score vector is nodes-sized — orders of magnitude smaller
    // than the edge list. While it fits an executor (it does into the
    // hundreds of millions of nodes), BROADCAST it each round: the
    // edge join then needs no exchange at all (edges stay put,
    // persisted), and a round costs ONE shuffle (the dst aggregation).
    // Past that size, fall back to the shuffle join against a
    // SRC-partitioned edge cache — same algebra, and the per-round
    // join reuses the cache's partitioning so only the (small) score
    // side shuffles. The threshold is a conf so tests can force the
    // fallback and pin it bit-identical to the broadcast path
    // (OperatorSpec), not dead code waiting for its first 10M-node
    // corpus.
    val broadcastScore = nn <= spark.conf
      .get("spark.graft.pagerank.broadcastMaxNodes", "10000000").toLong
    // degree folded onto each edge ONCE; the persisted clustering
    // matches the round's join strategy: broadcast rounds cluster by
    // DST so the map-side partial agg collapses each partition's
    // contributions to one row per node (the per-round shuffle
    // carries ~|nodes| rows, not |edges|); shuffle-join rounds
    // cluster by SRC so the join exchanges only the score vector
    val edgesDeg = edges
      .join(edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
      .repartition(if (broadcastScore) col("dst") else col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // driver-side integer scalars — identical to the oracle's
    // (G // nn) / ((G·(1−damp)) // nn) CTE terms
    val s0 = G / nn
    val base = (G * (DampDen - DampNum) / DampDen) / nn
    var score = nodes.select(col("node"), lit(s0).as("s")).localCheckpoint()
    (1 to iters).foreach { _ =>
      // the teleport term rides a zero-contribution row per node
      // through the SAME aggregation, so nodes without in-edges need
      // no second join to be re-materialized
      val renamed = score.withColumnRenamed("node", "src")
        .withColumnRenamed("s", "src_s")
      score = edgesDeg
        .join(if (broadcastScore) broadcast(renamed) else renamed, "src")
        .select(col("dst").as("node"), expr("src_s div outdeg").as("c"))
        .union(nodes.select(col("node"), lit(0L).as("c")))
        .groupBy(col("node")).agg(sum(col("c")).as("s_in"))
        .select(col("node"),
          (lit(base) + expr(s"($DampNum * s_in) div $DampDen")).as("s"))
        .localCheckpoint()
    }
    edgesDeg.unpersist(); nodes.unpersist()
    score.select(col("node"),
        when(col("node") % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("node_type"),
        expr("node div 2").as("entity_id"),
        col("s").as("score_ppb"))
      .orderBy(col("node"))
  }

  /** The DuckDB oracle: the identical integer recurrence with the
    * iteration loop unrolled into CTE layers (standard SQL forbids
    * aggregation in a recursive CTE term, so unrolling IS the SQL
    * form of a fixed-iteration loop). */
  def pageRankOracle(iters: Int = 10): String = {
    // literals derived from the SAME constants as the Scala side, so
    // retuning G or the damping ratio can never desynchronize the two
    val baseMass = G * (DampDen - DampNum) / DampDen
    val layers = (1 to iters).map { k =>
      val prev = s"pr${k - 1}"
      s"""pr$k AS (
         SELECT n2.node,
           CAST(($baseMass // nn) + ($DampNum * COALESCE(inc.s_in, 0)) // $DampDen AS BIGINT) AS s
         FROM nodes n2 CROSS JOIN nc
         LEFT JOIN (
           SELECT e.dst AS node, CAST(sum(p.s // d.outdeg) AS BIGINT) AS s_in
           FROM $prev p JOIN edges e ON p.node = e.src JOIN deg d ON d.src = e.src
           GROUP BY e.dst) inc ON inc.node = n2.node)"""
    }.mkString(",\n")
    s"""WITH pairs AS (
       SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
     edges AS (
       SELECT ck*2 AS src, sk*2+1 AS dst FROM pairs
       UNION ALL SELECT sk*2+1, ck*2 FROM pairs),
     nodes AS (SELECT c_custkey*2 AS node FROM customer
       UNION ALL SELECT s_suppkey*2+1 AS node FROM supplier),
     nc AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM nodes),
     deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
     pr0 AS (SELECT node, CAST($G // nn AS BIGINT) AS s
       FROM nodes CROSS JOIN nc),
     $layers
     SELECT node,
       CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
       CAST(node // 2 AS BIGINT) AS entity_id, s AS score_ppb
     FROM pr$iters ORDER BY node"""
  }
}
