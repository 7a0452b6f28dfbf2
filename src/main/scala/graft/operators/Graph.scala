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
    (1 to iters).foreach { i =>
      // the teleport term rides a zero-contribution row per node
      // through the SAME aggregation, so nodes without in-edges need
      // no second join to be re-materialized
      val renamed = score.withColumnRenamed("node", "src")
        .withColumnRenamed("s", "src_s")
      val next = edgesDeg
        .join(if (broadcastScore) broadcast(renamed) else renamed, "src")
        .select(col("dst").as("node"), expr("src_s div outdeg").as("c"))
        .union(nodes.select(col("node"), lit(0L).as("c")))
        .groupBy(col("node")).agg(sum(col("c")).as("s_in"))
        .select(col("node"),
          (lit(base) + expr(s"($DampNum * s_in) div $DampDen")).as("s"))
      // checkpoint every OTHER round (r18): the checkpoint is a pure
      // materialization boundary (bit-identical output), so halving
      // the eager jobs halves per-round scheduling overhead at a
      // bounded cost — lineage depth never exceeds two rounds, far
      // under the compounding that motivated per-round checkpoints
      // (the Dedup.clustersFrom lesson was unbounded depth)
      score =
        if (i % 2 == 0 || i == iters) next.localCheckpoint() else next
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

  /** Minimum shared orders for a supplier co-occurrence edge — the
    * edge-weight floor that keeps the co-occurrence graph from
    * degenerating into a clique of one-off coincidences (the same
    * role as a minimum co-citation count in a citation graph).
    * Interpolated into both engines. */
  val TriMinCoOrders = 2

  /** q_triangles: triangle census + local clustering coefficient over
    * the supplier CO-OCCURRENCE graph (suppliers joined when they
    * serve ≥ [[TriMinCoOrders]] common orders) — the community-
    * structure probe next to [[pageRank]]'s centrality: a supplier
    * whose neighbors also trade with each other (high clustering)
    * sits inside a cohesive cluster; a high-degree, low-clustering
    * node is a hub bridging communities. On a crawl/citation corpus
    * the same census drives spam-farm detection (artificial link
    * cliques are triangle-dense).
    *
    * Scale shape — the Schank–Wagner / MapReduce-canon construction:
    *   1. co-occurrence pairs explode per order with fan-out bounded
    *      by order SIZE (≤ 7 lineitems in this schema — Σ k², the
    *      blocking-cost argument, never corpus²), then one partial-agg
    *      groupBy collapses them to weighted edges;
    *   2. every edge ORIENTS from its lower-(degree, id) endpoint —
    *      an acyclic total-order orientation, so each triangle is
    *      emitted by exactly one vertex and, decisively, wedge
    *      generation fans out from a node's OUT-degree, which the
    *      orientation caps at O(√m) on heavy nodes (a star's hub has
    *      huge degree but zero out-edges to lower-ranked nodes);
    *   3. wedges (two out-edges of one src) close by one equality
    *      join against the undirected edge set — three shuffles
    *      total, all on node keys, no window, no driver state.
    * Integer clustering coefficient: 2·triangles·10⁶ div deg·(deg−1)
    * ppm — engine-exact, no float division.
    */
  /** Supplier co-occurrence edge list (a < b, weight floor applied) —
    * the shared graph under [[triangles]] and [[kcore]]. One bounded
    * per-order pair explosion (Σ order-size², never corpus²) + one
    * partial-agg groupBy. */
  private def coEdges(spark: SparkSession, sf: String): DataFrame = {
    val so = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").cast("long").as("s"))
      .distinct()
    so.select(col("ok"), col("s").as("sa"))
      .join(so.select(col("ok"), col("s").as("sb")), "ok")
      .filter(col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("w"))
      .filter(col("w") >= TriMinCoOrders)
      .select(col("sa").as("a"), col("sb").as("b"))
  }

  def triangles(spark: SparkSession, sf: String): DataFrame = {
    val edges = graft.CachePool.swapOne("triangles-edges",
      coEdges(spark, sf))
    val deg = graft.CachePool.swapOne("triangles-deg",
      edges.select(col("a").as("v"))
        .unionByName(edges.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg")))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = edges
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
      .select(when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"))
    val orientedC = graft.CachePool.swapOne("triangles-oriented", oriented)
    val tri = orientedC.select(col("src"), col("dst").as("x"))
      .join(orientedC.select(col("src"), col("dst").as("y")), "src")
      .filter(col("x") < col("y"))
      .join(edges.select(col("a").as("x"), col("b").as("y")), Seq("x", "y"))
      .select(col("src").as("u"), col("x").as("v"), col("y").as("w"))
    val perNode = tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("v"), "left")
      .withColumn("tri", coalesce(col("n_tri"), lit(0L)))
      .select(col("v").as("suppkey"), col("deg"), col("tri").as("triangles"),
        when(col("deg") >= 2,
          expr("tri * 2000000 div (deg * (deg - 1))"))
          .otherwise(lit(0L)).cast("long").as("cc_ppm"))
      .orderBy(col("suppkey"))
  }

  /** DuckDB replay of [[triangles]]: identical pair explosion, weight
    * floor, degree orientation (same (deg, id) tie-break), wedge
    * close, and integer ppm coefficient. */
  def trianglesOracle: String =
    s"""WITH so AS (
         SELECT DISTINCT l_orderkey AS ok, CAST(l_suppkey AS BIGINT) AS s
         FROM lineitem),
       e0 AS (
         SELECT a.s AS a, b.s AS b, COUNT(*) AS w
         FROM so a JOIN so b ON a.ok = b.ok AND a.s < b.s
         GROUP BY 1, 2),
       edges AS (SELECT a, b FROM e0 WHERE w >= $TriMinCoOrders),
       deg AS (
         SELECT v, CAST(COUNT(*) AS BIGINT) AS deg
         FROM (SELECT a AS v FROM edges UNION ALL SELECT b FROM edges)
         GROUP BY v),
       orient AS (
         SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
                  THEN e.a ELSE e.b END AS src,
                CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
                  THEN e.b ELSE e.a END AS dst
         FROM edges e
         JOIN deg da ON da.v = e.a
         JOIN deg db ON db.v = e.b),
       tri AS (
         SELECT w1.src AS u, w1.dst AS v, w2.dst AS w
         FROM orient w1
         JOIN orient w2 ON w1.src = w2.src AND w1.dst < w2.dst
         JOIN edges c ON c.a = w1.dst AND c.b = w2.dst),
       pern AS (
         SELECT v, CAST(COUNT(*) AS BIGINT) AS triangles
         FROM (SELECT u AS v FROM tri
               UNION ALL SELECT v FROM tri
               UNION ALL SELECT w FROM tri)
         GROUP BY v)
       SELECT d.v AS suppkey, d.deg,
         CAST(COALESCE(p.triangles, 0) AS BIGINT) AS triangles,
         CAST(CASE WHEN d.deg >= 2
           THEN (COALESCE(p.triangles, 0) * 2000000) // (d.deg * (d.deg - 1))
           ELSE 0 END AS BIGINT) AS cc_ppm
       FROM deg d LEFT JOIN pern p ON p.v = d.v
       ORDER BY suppkey"""

  /** Core order for [[kcore]] — a node survives while it keeps ≥ K
    * neighbors that themselves survive. Interpolated into both
    * engines. */
  val KcoreK = 3

  /** Peel rounds. The peel is monotone (the alive set only shrinks),
    * so once a round removes nothing every later round is the
    * identity; [[KcoreRounds]] is sized above every fixture graph's
    * measured peel depth (≤ 10 at sf0.001/0.01/0.1) with slack, and
    * the spec asserts the fixture's true fixpoint depth fits so an
    * undersized R can never ship silently. */
  val KcoreRounds = 12

  /** Part co-purchase edge list for [[kcore]] (a < b, weight floor
    * [[TriMinCoOrders]]): parts that landed in ≥ 2 common orders —
    * the market-basket graph. Unlike the supplier projection (a
    * near-clique at every SF — each order touches most suppliers),
    * the part space grows with the corpus, so this graph keeps the
    * heavy-tailed sparse structure a k-core is FOR. Same bounded
    * per-order pair explosion (Σ order-size²). */
  private def partCoEdges(spark: SparkSession, sf: String): DataFrame =
    // SESSION-POOLED (r17): q_kcore and q_lpa_communities both derive
    // this graph — the lineitem self-join is the corpus-scale stage
    // of both rows; one derivation per (dataset, session), the edge
    // list itself is graph-sized (thresholded pairs).
    graft.CachePool.sessionCheckpoint("part-co-edges", spark, sf) {
      val po = Tables.load(spark, sf, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").cast("long").as("p"))
        .distinct()
      po.select(col("ok"), col("p").as("pa"))
        .join(po.select(col("ok"), col("p").as("pb")), "ok")
        .filter(col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("w"))
        .filter(col("w") >= TriMinCoOrders)
        .select(col("pa").as("a"), col("pb").as("b"))
    }

  /** q_kcore: K-core membership over the part co-purchase graph
    * ([[partCoEdges]]): iteratively peel nodes with degree <
    * [[KcoreK]] until fixpoint; the surviving subgraph is the K-core,
    * the standard "dense cohesive nucleus" extraction (Seidman 1983)
    * that a link-quality curation pass uses to separate structurally-
    * embedded hosts from peripheral one-off nodes (spam tails peel
    * away in the first rounds).
    *
    * Scale shape: each round is ONE partial-agg degree groupBy over
    * the still-alive edge list plus two semi-joins (`left_semi`) to
    * drop edges with a peeled endpoint — all equality shuffles on
    * node keys, no window, no driver-sized state; the driver loop
    * only orchestrates a FIXED [[KcoreRounds]] rounds (each round
    * `localCheckpoint`ed, the [[Dedup.clustersFrom]] lineage lesson).
    * FIXED rounds, not a convergence loop, because the DuckDB oracle
    * unrolls the same recurrence — both engines agree even on a graph
    * whose true peel depth exceeds R; production loops on the Pregel
    * halting test instead (count of removed nodes — a scalar per
    * round, not a collect). Output is one row per ORIGINAL node:
    * in_core flag and its degree inside the final core (0 outside) —
    * deterministic because the fixpoint is unique (the K-core is
    * order-independent).
    */
  def kcore(spark: SparkSession, sf: String,
      k: Int = KcoreK, rounds: Int = KcoreRounds): DataFrame =
    kcoreFrom(partCoEdges(spark, sf), k, rounds)
      .withColumnRenamed("v", "partkey")

  /** The peel kernel over an arbitrary (a, b) edge frame — split out
    * so the spec can drive it with crafted graphs of known core
    * structure (clique + pendant chain) in addition to the fixture. */
  private[graft] def kcoreFrom(edgeFrame: DataFrame,
      k: Int, rounds: Int): DataFrame = {
    val edges0 = graft.CachePool.swapOne("kcore-edges", edgeFrame)
    val allNodes = graft.CachePool.swapOne("kcore-nodes",
      edges0.select(col("a").as("v"))
        .unionByName(edges0.select(col("b").as("v")))
        .distinct())
    var edges = edges0
    var round = 0
    // Pregel halting test alongside the fixed-round bound: the peel is
    // MONOTONE (each round's edge set ⊆ the last), so an unchanged
    // edge COUNT means no edge was removed ⇒ same degrees ⇒ fixpoint,
    // and every further round — here or in the oracle's remaining
    // unrolled layers — is the identity. Early exit is therefore
    // bit-identical to running all `rounds`; the count is one scalar
    // job over the just-checkpointed frame, never a collect.
    var prevCount = -1L
    while (round < rounds && prevCount != 0L) {
      val deg = edges.select(col("a").as("v"))
        .unionByName(edges.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val alive = deg.filter(col("deg") >= k).select(col("v"))
      val next = edges
        .join(alive.select(col("v").as("a")), Seq("a"), "left_semi")
        .join(alive.select(col("v").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint()
      val n = next.count()
      if (prevCount == n) round = rounds // fixpoint — halt
      else { prevCount = n; round += 1 }
      edges = next
    }
    val coreDeg = edges.select(col("a").as("v"))
      .unionByName(edges.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("core_deg"))
    allNodes.join(coreDeg, Seq("v"), "left")
      .select(col("v"),
        when(col("core_deg").isNotNull, lit(1L)).otherwise(lit(0L))
          .as("in_core"),
        coalesce(col("core_deg"), lit(0L)).as("core_deg"))
      .orderBy(col("v"))
  }

  /** DuckDB replay of [[kcore]]: the identical peel unrolled as
    * [[KcoreRounds]] CTE layers (the [[pageRankOracle]] pattern —
    * fixed-iteration recurrences are SQL-expressible without
    * recursive-CTE aggregation). */
  def kcoreOracle: String = {
    // every e$r is MATERIALIZED: each layer references its
    // predecessor three times, and DuckDB's default CTE inlining
    // would otherwise expand the 12-layer chain exponentially
    // (3^12 scans of the base table — measured as an fd exhaustion,
    // not a slowdown)
    val layers = (1 to KcoreRounds).map { r =>
      s"""d$r AS MATERIALIZED (
           SELECT v, CAST(COUNT(*) AS BIGINT) AS deg
           FROM (SELECT a AS v FROM e${r - 1} UNION ALL SELECT b FROM e${r - 1})
           GROUP BY v),
         a$r AS MATERIALIZED (SELECT v FROM d$r WHERE deg >= $KcoreK),
         e$r AS MATERIALIZED (
           SELECT e.a, e.b FROM e${r - 1} e
           WHERE e.a IN (SELECT v FROM a$r)
             AND e.b IN (SELECT v FROM a$r))"""
    }.mkString(",\n       ")
    s"""WITH po AS (
         SELECT DISTINCT l_orderkey AS ok, CAST(l_partkey AS BIGINT) AS p
         FROM lineitem),
       w0 AS (
         SELECT a.p AS a, b.p AS b, COUNT(*) AS w
         FROM po a JOIN po b ON a.ok = b.ok AND a.p < b.p
         GROUP BY 1, 2),
       e0 AS MATERIALIZED (SELECT a, b FROM w0 WHERE w >= $TriMinCoOrders),
       nodes AS (
         SELECT DISTINCT v
         FROM (SELECT a AS v FROM e0 UNION ALL SELECT b FROM e0)),
       $layers,
       cd AS (
         SELECT v, CAST(COUNT(*) AS BIGINT) AS core_deg
         FROM (SELECT a AS v FROM e$KcoreRounds
               UNION ALL SELECT b FROM e$KcoreRounds)
         GROUP BY v)
       SELECT n.v AS partkey,
         CAST(CASE WHEN cd.v IS NULL THEN 0 ELSE 1 END AS BIGINT) AS in_core,
         CAST(COALESCE(cd.core_deg, 0) AS BIGINT) AS core_deg
       FROM nodes n LEFT JOIN cd ON cd.v = n.v
       ORDER BY partkey"""
  }

  /** Synchronous rounds for [[lpaCommunities]]. Fixed, because the
    * DuckDB oracle unrolls the same recurrence; the engine's early
    * exit (labels unchanged ⇒ every later round is the identity) is
    * bit-identical to running all of them. Sized above the measured
    * fixpoint depth of every fixture graph (≤ 7 rounds at
    * sf0.001/0.01/0.1 under self-inclusive voting) with slack — and
    * correctness does NOT depend on convergence: on a graph whose
    * true depth exceeds R, both engines still run exactly R rounds. */
  val LpaRounds = 8

  /** q_lpa_communities: community detection by synchronous LABEL
    * PROPAGATION (Raghavan, Albert & Kumara 2007) over the part
    * co-purchase graph — the near-linear community pass a curation
    * pipeline runs over a host/link graph to group mirrored sites and
    * content farms BEFORE per-community caps (q_domain_cap's graph
    * sibling: cap what the graph says is one community, not just one
    * hostname). Every node starts as its own label; each round every
    * node adopts the most frequent label among ITSELF + its
    * neighbors, ties to the smallest label — the deterministic
    * SELF-INCLUSIVE sync variant: classic LPA breaks ties randomly
    * and updates asynchronously, which no two engines replay alike;
    * deterministic sync + (count DESC, label ASC) makes the fixpoint
    * reproducible across engines, partitionings, and runs, and the
    * self vote damps the two-cycle oscillation plain sync LPA is
    * known for (measured here: neighbor-only voting left ~30% of
    * labels flipping forever at sf0.1; self-inclusive reached its
    * fixpoint in ≤ 7 rounds at every SF).
    *
    * Scale shape: a round is ONE equality join (symmetric edges ⋈
    * labels on the neighbor key) + two partial-agg groupBys (label
    * census per node, then the argmax via one packed `max(struct)` —
    * never a window) — all shuffles on node keys, Pregel-shaped;
    * rounds are `localCheckpoint`ed ([[Dedup.clustersFrom]] lineage
    * lesson) and the driver holds only the changed-count scalar.
    * Output: one row per graph node with its community label and the
    * community's size. */
  def lpaCommunities(spark: SparkSession, sf: String,
      rounds: Int = LpaRounds): DataFrame =
    lpaFrom(partCoEdges(spark, sf), rounds)
      .withColumnRenamed("v", "partkey")

  /** The propagation kernel over an arbitrary (a, b) edge frame —
    * split out so the spec can drive it with crafted graphs of known
    * community structure (two cliques + a bridge). */
  private[graft] def lpaFrom(edgeFrame: DataFrame, rounds: Int): DataFrame = {
    val edges = edgeFrame.persist(StorageLevel.MEMORY_AND_DISK)
    val sym0 = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(edges.select(col("b").as("src"), col("a").as("dst")))
    val nodes = sym0.select(col("src").as("v")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // r17, the [[pageRank]] round posture ported: the label vector is
    // NODE-sized — while it fits an executor, BROADCAST it each round
    // and the per-round edge join needs no exchange at all (sym stays
    // put, persisted clustered by SRC so the (v, label) vote census
    // partial-aggregates map-side and the round's one shuffle carries
    // ~|votes-collapsed| rows, never |edges| — before this, every
    // round re-shuffled the edge list on the neighbor key AND the raw
    // vote stream again on (v, label): 8.5 s → 5.4 s at sf0.1). Past
    // broadcast size, the conf flips to a DST-clustered edge cache
    // whose per-round join reuses the cache's partitioning so only the
    // label vector shuffles — same algebra, spec-pinned bit-identical.
    val nn = nodes.count()
    val broadcastLabels = nn <= edgeFrame.sparkSession.conf
      .get("spark.graft.lpa.broadcastMaxNodes", "10000000").toLong
    val sym = sym0
      .repartition(if (broadcastLabels) col("src") else col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = nodes.select(col("v"), col("v").as("label"))
      .localCheckpoint()
    var round = 0
    while (round < rounds) {
      val renamed = labels.select(col("v").as("u"), col("label"))
      // the old label rides INTO the checkpointed frame (r18): the
      // halting test used to run a separate join of two checkpointed
      // frames per round — folding the comparison into the round's
      // own materialization job makes the halting count a plain
      // filter-scan of the in-memory checkpoint, one shuffle fewer
      // per round, and bit-identical (the chg column is projected
      // away before the next round reads the labels)
      val next = sym.select(col("src").as("v"), col("dst").as("u"))
        .join(if (broadcastLabels) broadcast(renamed) else renamed, "u")
        .select(col("v"), col("label"))
        .unionByName(labels.select(col("v"), col("label"))) // the self vote
        .groupBy(col("v"), col("label")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("v"))
        .agg(max(struct(col("cnt"), (-col("label")).as("neg"))).as("b"))
        .select(col("v"), (-col("b.neg")).as("label"))
        .join(labels.select(col("v"), col("label").as("old")), "v")
        .select(col("v"), col("label"),
          (col("label") =!= col("old")).as("chg"))
        .localCheckpoint()
      val changed = next.filter(col("chg")).count()
      labels = next.select(col("v"), col("label"))
      if (changed == 0L) round = rounds else round += 1
    }
    // labels is localCheckpoint'ed (eager) — the returned plan no
    // longer references the graph frames, so the pins release here
    // rather than accreting in the session cache
    edges.unpersist(); sym.unpersist(); nodes.unpersist()
    val sizes = labels.groupBy(col("label"))
      .agg(count(lit(1)).as("community_size"))
    labels.join(sizes, "label")
      .select(col("v"), col("label").as("community"),
        col("community_size"))
      .orderBy(col("v"))
  }

  /** DuckDB replay of [[lpaCommunities]]: the identical deterministic
    * recurrence unrolled as [[LpaRounds]] MATERIALIZED CTE layers
    * (each layer references its predecessor through a join — default
    * inlining would expand the chain exponentially, the kcoreOracle
    * lesson). */
  def lpaOracle: String = {
    val layers = (1 to LpaRounds).map { r =>
      s"""c$r AS MATERIALIZED (
           SELECT v, label, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
             SELECT s.src AS v, p.label AS label
             FROM sym s JOIN l${r - 1} p ON p.v = s.dst
             UNION ALL SELECT v, label FROM l${r - 1})
           GROUP BY 1, 2),
         l$r AS MATERIALIZED (
           SELECT v, label FROM (
             SELECT v, label, ROW_NUMBER() OVER (PARTITION BY v
               ORDER BY cnt DESC, label) AS rk
             FROM c$r) WHERE rk = 1)"""
    }.mkString(",\n       ")
    s"""WITH po AS (
         SELECT DISTINCT l_orderkey AS ok, CAST(l_partkey AS BIGINT) AS p
         FROM lineitem),
       w0 AS (
         SELECT a.p AS a, b.p AS b, COUNT(*) AS w
         FROM po a JOIN po b ON a.ok = b.ok AND a.p < b.p
         GROUP BY 1, 2),
       e0 AS MATERIALIZED (SELECT a, b FROM w0 WHERE w >= $TriMinCoOrders),
       sym AS MATERIALIZED (
         SELECT a AS src, b AS dst FROM e0
         UNION ALL SELECT b, a FROM e0),
       l0 AS MATERIALIZED (
         SELECT DISTINCT src AS v, src AS label FROM sym),
       $layers,
       sz AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS community_size
              FROM l$LpaRounds GROUP BY label)
       SELECT l.v AS partkey, l.label AS community, sz.community_size
       FROM l$LpaRounds l JOIN sz USING (label)
       ORDER BY partkey"""
  }
}
