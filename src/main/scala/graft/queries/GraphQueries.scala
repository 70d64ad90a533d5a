package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.graph.GraphOps

/** M4 queries: temporal graph over an edge view derived from the TPC-H-ish
  * tables:
  *
  *   cust:<key>  -placed->       ord:<key>    (created at order date)
  *   ord:<key>   -contains->     part:<key>   (created at ship date,
  *                                             weight = quantity; RETURNED
  *                                             lines soft-deleted 30 days
  *                                             after shipping)
  *   part:<key>  -supplied_by->  supp:<key>   (distinct, created_at 1)
  *
  * The soft-deleted "returned" edges exercise time travel end-to-end.
  */
object GraphQueries {

  /** 1995-06-01T00:00:00Z — mid-range of the order dates. */
  val T0 = 801964800L

  /** Deployment shape: the edge view IS a stored state table — the
    * reference serves every graph op from its materialized graph, not by
    * re-deriving edges from raw order rows per query — so it's built once
    * per corpus through the shared layout store and every consumer
    * (traversals, gardener snapshots, hydration) reads the parquet.
    */
  def edgeView(s: SparkSession, dir: String): DataFrame =
    Layouts.stored(s, dir, "edge_view_full") { derivedEdgeView(s, dir) }

  /** The derivation the layout build runs (one pass over orders/lineitem). */
  private def derivedEdgeView(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    val placed = orders.select(
      concat(lit("cust:"), col("o_custkey")).as("src"),
      concat(lit("ord:"), col("o_orderkey")).as("dst"),
      lit("placed").as("rel"),
      lit(1.0).as("weight"),
      unix_timestamp(col("o_orderdate")).as("created_at"),
      lit(null).cast("long").as("deleted_at"))
    val contains = li.select(
      concat(lit("ord:"), col("l_orderkey")).as("src"),
      concat(lit("part:"), col("l_partkey")).as("dst"),
      lit("contains").as("rel"),
      col("l_quantity").as("weight"),
      unix_timestamp(col("l_shipdate")).as("created_at"),
      when(col("l_returnflag") === "R",
        unix_timestamp(col("l_shipdate")) + 30L * 86400L)
        .otherwise(lit(null)).cast("long").as("deleted_at"))
    val supplied = li.select(
        concat(lit("part:"), col("l_partkey")).as("src"),
        concat(lit("supp:"), col("l_suppkey")).as("dst"))
      .distinct()
      .select(col("src"), col("dst"), lit("supplied_by").as("rel"),
        lit(1.0).as("weight"), lit(1L).as("created_at"),
        lit(null).cast("long").as("deleted_at"))
    placed.unionByName(contains).unionByName(supplied)
  }

  private[queries] val edgeViewSql =
    """edges AS (
      |  SELECT 'cust:' || o_custkey AS src, 'ord:' || o_orderkey AS dst,
      |         'placed' AS rel, 1.0 AS weight,
      |         CAST(epoch(o_orderdate) AS BIGINT) AS created_at,
      |         CAST(NULL AS BIGINT) AS deleted_at
      |  FROM orders
      |  UNION ALL
      |  SELECT 'ord:' || l_orderkey, 'part:' || l_partkey, 'contains',
      |         l_quantity, CAST(epoch(l_shipdate) AS BIGINT),
      |         CASE WHEN l_returnflag = 'R'
      |              THEN CAST(epoch(l_shipdate) AS BIGINT) + 30 * 86400
      |              ELSE NULL END
      |  FROM lineitem
      |  UNION ALL
      |  SELECT DISTINCT 'part:' || l_partkey, 'supp:' || l_suppkey,
      |         'supplied_by', 1.0, 1, NULL
      |  FROM lineitem
      |)""".stripMargin

  private def activeSql(t: String): String =
    if (t == "0") "(deleted_at IS NULL OR deleted_at = 0)"
    else s"(created_at <= $t AND (deleted_at IS NULL OR deleted_at = 0 OR deleted_at > $t))"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // G3: per-relation active-edge counts now vs as-of T0.
    "g3_time_travel" -> ((s, dir) => {
      val e = edgeView(s, dir)
      // Bounded result (one row per rel): single-partition sort, no range
      // exchange (guide §2.4 — see [[Ordered.small]]).
      Ordered.small(e.groupBy(col("rel")).agg(
          sum(GraphOps.activeAt(0L).cast("long")).as("active_now"),
          sum(GraphOps.activeAt(T0).cast("long")).as("active_at_t")))(col("rel"))
    }),

    // G4: reverse lookup — who contains part:<k>? (count + total quantity)
    "g4_reverse" -> ((s, dir) => {
      val e = edgeView(s, dir)
      e.filter(col("rel") === "contains" && GraphOps.activeAt(0L))
        .filter(col("dst").isin((1 to 10).map(i => s"part:$i"): _*))
        .groupBy(col("dst"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("weight")), 2).as("total_qty"))
        .transform(Ordered.small(_)(col("dst"))) // ≤ 10 groups by construction
    }),

    // G6: dot-path traversal placed.contains from 5 customers (distinct
    // reached parts; returned lines excluded by the active-now predicate).
    "g6_traverse" -> ((s, dir) => {
      val e = edgeView(s, dir)
      import s.implicits._
      val roots = (1 to 5).map(i => s"cust:$i").toDF("root")
      GraphOps.traverse(e, roots, Seq("placed", "contains"))
        .distinct()
        // 5-root bounded reachable set: no range exchange needed.
        .transform(Ordered.small(_)(col("root"), col("node")))
    }),

    // G9: shortest paths from cust:1 (out), depth ≤ 3 — suppliers reached
    // through any order/part chain, with the lexicographically smallest path.
    "g9_shortest_paths" -> ((s, dir) => {
      val e = edgeView(s, dir)
      GraphOps.drained(GraphOps.shortestPathsT(e, "cust:1", maxDepth = 3))
        .filter(col("node").startsWith("supp:"))
        .select(col("node"), col("hops").cast("long").as("hops"),
          concat_ws(" ", col("path")).as("path"))
        // drained ⇒ already a driver-local relation; sorting it needs no
        // range exchange (the r19 verdict's g9 Exchange+Sort-over-
        // LocalTableScan finding).
        .transform(Ordered.small(_)(col("node")))
    }),

    // G8: subgraph membership around cust:3, both directions, depth 2.
    "g8_subgraph" -> ((s, dir) => {
      val e = edgeView(s, dir)
      val (t, _) = GraphOps.subgraphT(e, "cust:3", depth = 2)
      GraphOps.drained(t)
        .select(col("node"), col("depth").cast("long").as("depth"))
        .transform(Ordered.small(_)(col("node"))) // drained ⇒ driver-local
    }),

    // G10: auto-link derivation from the documents.source field.
    "g10_autolinks" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      GraphOps.autoLinks(
          docs.select(concat(lit("doc:"), col("doc_id")).as("id"), col("source")),
          "id", "source", "from_source")
        .groupBy(col("dst"), col("rel")).agg(count(lit(1)).as("n"))
        .orderBy(col("dst"))
    }),

    // G12: vacuum retention — tombstones purged before 1996-01-01.
    "g12_vacuum" -> ((s, dir) => {
      val e = edgeView(s, dir)
      val cutoff = 820454400L
      GraphOps.vacuum(e, cutoff)
        .groupBy(col("rel")).agg(count(lit(1)).as("n_kept"))
        .transform(Ordered.small(_)(col("rel"))) // one row per rel
    })
  )

  val oracleSql: Map[String, String] = Map(
    "g3_time_travel" ->
      s"""WITH $edgeViewSql
         |SELECT rel,
         |  CAST(sum(CASE WHEN ${activeSql("0")} THEN 1 ELSE 0 END) AS BIGINT) AS active_now,
         |  CAST(sum(CASE WHEN ${activeSql(T0.toString)} THEN 1 ELSE 0 END) AS BIGINT) AS active_at_t
         |FROM edges GROUP BY rel ORDER BY rel""".stripMargin,

    "g4_reverse" ->
      s"""WITH $edgeViewSql
         |SELECT dst, count(*) AS n_orders, round(sum(weight), 2) AS total_qty
         |FROM edges
         |WHERE rel = 'contains' AND ${activeSql("0")}
         |  AND dst IN (${(1 to 10).map(i => s"'part:$i'").mkString(",")})
         |GROUP BY dst ORDER BY dst""".stripMargin,

    "g6_traverse" ->
      s"""WITH $edgeViewSql,
         |roots AS (SELECT 'cust:' || k AS root FROM generate_series(1, 5) t(k)),
         |hop1 AS (
         |  SELECT r.root, e.dst AS node FROM roots r
         |  JOIN edges e ON e.src = r.root AND e.rel = 'placed' AND ${activeSql("0")}
         |),
         |hop2 AS (
         |  SELECT h.root, e.dst AS node FROM hop1 h
         |  JOIN edges e ON e.src = h.node AND e.rel = 'contains' AND ${activeSql("0")}
         |)
         |SELECT DISTINCT root, node FROM hop2 ORDER BY root, node""".stripMargin,

    "g9_shortest_paths" ->
      s"""WITH $edgeViewSql,
         |active AS (SELECT src, dst FROM edges WHERE ${activeSql("0")}),
         |p0 AS (SELECT 'cust:1' AS node, 0 AS hops, ['cust:1'] AS path),
         |p1 AS (SELECT a.dst AS node, 1 AS hops, list_append(p.path, a.dst) AS path
         |       FROM p0 p JOIN active a ON a.src = p.node
         |       WHERE NOT list_contains(p.path, a.dst)),
         |p2 AS (SELECT a.dst AS node, 2 AS hops, list_append(p.path, a.dst) AS path
         |       FROM p1 p JOIN active a ON a.src = p.node
         |       WHERE NOT list_contains(p.path, a.dst)),
         |p3 AS (SELECT a.dst AS node, 3 AS hops, list_append(p.path, a.dst) AS path
         |       FROM p2 p JOIN active a ON a.src = p.node
         |       WHERE NOT list_contains(p.path, a.dst)),
         |allp AS (SELECT * FROM p0 UNION ALL SELECT * FROM p1
         |         UNION ALL SELECT * FROM p2 UNION ALL SELECT * FROM p3),
         |minh AS (SELECT node, min(hops) AS hops FROM allp GROUP BY node),
         |best AS (
         |  SELECT a.node, a.hops,
         |         min(array_to_string(a.path, chr(9))) AS tpath
         |  FROM allp a JOIN minh m ON a.node = m.node AND a.hops = m.hops
         |  GROUP BY a.node, a.hops
         |)
         |SELECT node, CAST(hops AS BIGINT) AS hops, replace(tpath, chr(9), ' ') AS path
         |FROM best WHERE node LIKE 'supp:%' ORDER BY node""".stripMargin,

    "g8_subgraph" ->
      s"""WITH $edgeViewSql,
         |hops AS (
         |  SELECT src AS f, dst AS t FROM edges WHERE ${activeSql("0")}
         |  UNION ALL
         |  SELECT dst, src FROM edges WHERE ${activeSql("0")}
         |),
         |d0 AS (SELECT 'cust:3' AS node),
         |d1 AS (SELECT DISTINCT h.t AS node FROM hops h JOIN d0 ON h.f = d0.node
         |       WHERE h.t NOT IN (SELECT node FROM d0)),
         |d2 AS (SELECT DISTINCT h.t AS node FROM hops h JOIN d1 ON h.f = d1.node
         |       WHERE h.t NOT IN (SELECT node FROM d0)
         |         AND h.t NOT IN (SELECT node FROM d1))
         |SELECT node, CAST(0 AS BIGINT) AS depth FROM d0
         |UNION ALL SELECT node, 1 FROM d1
         |UNION ALL SELECT node, 2 FROM d2
         |ORDER BY node""".stripMargin,

    "g10_autolinks" ->
      """SELECT source AS dst, 'from_source' AS rel, count(*) AS n
        |FROM documents WHERE source IS NOT NULL
        |GROUP BY source ORDER BY source""".stripMargin,

    "g12_vacuum" ->
      s"""WITH $edgeViewSql
         |SELECT rel, count(*) AS n_kept FROM edges
         |WHERE deleted_at IS NULL OR deleted_at = 0 OR deleted_at >= 820454400
         |GROUP BY rel ORDER BY rel""".stripMargin
  )
}
