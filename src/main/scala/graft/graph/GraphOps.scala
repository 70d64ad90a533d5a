package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temporal property-graph operators over an append-only `edges` table
  * `(src, dst, rel, weight, props, created_at, deleted_at)` — the Spark
  * re-expression of the reference's sharded adjacency maps
  * (`pkg/core/graph.go`). Soft deletes + append-only give time travel for
  * free (SURVEY §1.1): the reference's 128-shard locking disappears because
  * the table is immutable per snapshot.
  *
  * Scale notes: traversals are iterative hash joins on node ids, one per
  * hop, with hard depth caps copied from the reference (5 for BFS/subgraph,
  * 10 for dot-path traversal, 4 default for shortest path). Frontiers are
  * deduplicated per level so joins stay bounded; with the edges table
  * bucketed by `src` the per-hop join is shuffle-free on a real cluster.
  */
object GraphOps {

  /** G3 active-at-time predicate — `isActiveAtTime` (`core/graph.go:350-362`):
    * `created_at <= t AND (deleted_at IS NULL/0 OR deleted_at > t)`;
    * t = 0 means "now" (every non-deleted edge).
    */
  def activeAt(t: Long): Column =
    if (t == 0L) col("deleted_at").isNull || col("deleted_at") === 0L
    else col("created_at") <= t &&
      (col("deleted_at").isNull || col("deleted_at") === 0L || col("deleted_at") > t)

  /** G4: edges pointing at `node` (the reference keeps a reverse index; a
    * predicate on the same table suffices — at scale, a dst-bucketed copy).
    */
  def inEdges(edges: DataFrame, node: String, rel: Option[String] = None,
              atTime: Long = 0L): DataFrame = {
    val base = edges.filter(col("dst") === node && activeAt(atTime))
    rel.fold(base)(r => base.filter(col("rel") === r))
  }

  def outEdges(edges: DataFrame, node: String, rel: Option[String] = None,
               atTime: Long = 0L): DataFrame = {
    val base = edges.filter(col("src") === node && activeAt(atTime))
    rel.fold(base)(r => base.filter(col("rel") === r))
  }

  /** G5 `GetAllRelations` (`core/graph.go:303-347`): rel → sorted targets,
    * out/in/both.
    */
  def relations(edges: DataFrame, node: String, direction: String = "both",
                atTime: Long = 0L): DataFrame = {
    val out = edges.filter(col("src") === node && activeAt(atTime))
      .select(col("rel"), col("dst").as("other"), lit("out").as("direction"))
    val in = edges.filter(col("dst") === node && activeAt(atTime))
      .select(col("rel"), col("src").as("other"), lit("in").as("direction"))
    val base = direction match {
      case "out"  => out
      case "in"   => in
      case _      => out.unionAll(in)
    }
    base.groupBy(col("rel"), col("direction"))
      .agg(sort_array(collect_list(col("other"))).as("targets"))
  }

  /** G6 `VTraverse` (`ops.go:594-696`): follow a dot-notation relation path
    * from a set of roots, one join per segment; depth capped at 10. Returns
    * `(root, node)` pairs at the end of the path.
    */
  def traverse(edges: DataFrame, roots: DataFrame, path: Seq[String],
               atTime: Long = 0L, maxDepth: Int = 10): DataFrame = {
    require(path.nonEmpty && path.size <= maxDepth,
      s"path depth ${path.size} exceeds cap $maxDepth")
    val active = edges.filter(activeAt(atTime))
    path.foldLeft(roots.select(col("root"), col("root").as("node"))) { (frontier, rel) =>
      val hop = active.filter(col("rel") === rel)
        .select(col("src").as("_from"), col("dst").as("_to"))
      frontier.join(hop, frontier("node") === hop("_from"))
        .select(frontier("root"), col("_to").as("node"))
    }
  }

  /** A traversal result plus a release handle: iterative ops cache the
    * active-edge projection and checkpoint each level, and those blocks back
    * the returned frame. Call `release()` once the result has been consumed
    * (written/collected) — after it, no RDD from the traversal stays cached.
    */
  final case class Traversal(result: DataFrame, release: () => Unit)

  /** Consume a traversal whose result is known-small (single-root reachable
    * set): materialize it into a local relation, release every cached block,
    * return the self-contained frame. The query layer uses this so no
    * traversal leaves RDDs cached behind it.
    */
  def drained(t: Traversal): DataFrame = {
    val local = graft.core.Local.materialized(t.result)
    t.release()
    local
  }

  /** Per-level materialization: checkpoint (truncates lineage — keeps the
    * plan linear in depth and kills self-join attribute ambiguity across
    * iterations) then count in one pass over the fresh cache. `reliable`
    * uses the SparkContext checkpoint dir (set `sc.setCheckpointDir` first)
    * so a traversal survives executor loss on a real cluster; the default
    * `localCheckpoint` is executor-volatile but avoids the HDFS round-trip.
    */
  private final case class Level(df: DataFrame, n: Long, release: () => Unit)

  private def materializeLevel(df: DataFrame, reliable: Boolean): Level = {
    val sc = df.sparkSession.sparkContext
    // localCheckpoint persists its RDD OUTSIDE the CacheManager, so
    // Dataset.unpersist can't release it — capture the concrete RDD ids the
    // checkpoint registered and unpersist those. (Reliable checkpoints live
    // as files in the checkpoint dir, not in the block store.)
    val before = sc.getPersistentRDDs.keySet
    val m = if (reliable) df.checkpoint(eager = true) else df.localCheckpoint(eager = true)
    val n = m.count()
    val added = sc.getPersistentRDDs.keySet -- before
    Level(m, n,
      () => added.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false))))
  }

  /** Nodes whose frontier/visited sets fit on the driver are traversed
    * INLINE: each level is one job — an `InSet` filter over the cached
    * active projection (the Spark analogue of the reference's in-memory
    * pointer walk, which also holds frontier + visited in one process).
    * Levels above this cardinality flip to the distributed join path.
    */
  val InlineFrontierLimit = 8192

  /** Above this many accumulated rows, the distributed regime stops
    * RE-BROADCASTING the monotonically-growing visited/best set on every
    * level and degrades that anti-join to a shuffle join (the per-level
    * frontier keeps broadcasting while it alone fits). 4M node ids ≈
    * low-hundreds of MB broadcast — past that, shipping the whole visited
    * set to every executor once per level is the scale-killer, while one
    * shuffle of the (small) candidate level is not.
    */
  val BroadcastVisitedLimit: Long = 4L * 1024 * 1024

  /** BFS frontier expansion (G7 `resolveGraphFilter` `engine/graph.go:173-247`
    * / G8 both-directions variant). Returns `(node, depth)` with the minimal
    * depth ≤ maxDepth at which each node is reached (roots at 0). Depth caps
    * come from the reference (5).
    *
    * Scale shape, two regimes:
    *   - **inline** (frontier ∧ visited ≤ [[InlineFrontierLimit]], the
    *     single-root case): per level ONE job scanning the cached active
    *     projection with an `InSet` predicate — no join, no broadcast
    *     exchange, no checkpoint; the reachable set lives on the driver,
    *     like the reference's own BFS state.
    *   - **distributed** (a level overflows, or multi-root bulk BFS): per
    *     level a checkpoint-materialized frame; frontier and visited are
    *     broadcast-joined against the cached active projection — the
    *     100 TB edge table is never shuffled; the only shuffle is the
    *     `distinct` over candidates. Set `broadcastFrontier = false` for
    *     genuinely unbounded frontiers (shuffle joins).
    * The traversal starts inline and degrades to distributed mid-flight on
    * overflow, re-expanding the overflowing level distributively.
    */
  def bfs(edges: DataFrame, roots: DataFrame, rels: Seq[String] = Nil,
          direction: String = "out", maxDepth: Int = 5,
          atTime: Long = 0L, reliable: Boolean = false,
          broadcastFrontier: Boolean = true,
          broadcastVisitedLimit: Long = BroadcastVisitedLimit): DataFrame =
    bfsT(edges, roots, rels, direction, maxDepth, atTime, reliable,
      broadcastFrontier, broadcastVisitedLimit).result

  /** [[bfs]] with a cache-release handle (see [[Traversal]]). */
  def bfsT(edges: DataFrame, roots: DataFrame, rels: Seq[String] = Nil,
           direction: String = "out", maxDepth: Int = 5,
           atTime: Long = 0L, reliable: Boolean = false,
           broadcastFrontier: Boolean = true,
           broadcastVisitedLimit: Long = BroadcastVisitedLimit): Traversal = {
    require(maxDepth <= 10, "depth cap")
    val spark = edges.sparkSession
    import spark.implicits._
    // The (src, dst) projection — NOT a both-directions union: doubling a
    // 100 TB table to avoid a second join is the wrong trade. NOT cached
    // for the inline regime (r19): a shallow traversal touches it ≤
    // 2·maxDepth times, and building + reading the columnar cache
    // measured SLOWER per level than re-scanning the column-pruned
    // parquet (~1.6 s vs ~0.25 s per pass on the sf0.1 edge view); the
    // distributed regime below persists it before its join-per-level
    // loop, where executor-local reuse does pay.
    val active = {
      val a = edges.filter(activeAt(atTime))
      (if (rels.isEmpty) a else a.filter(col("rel").isin(rels: _*)))
        .select(col("src"), col("dst"))
    }

    // Inline expansion through a BROADCAST HASH JOIN against the (tiny,
    // driver-resident) frontier (r19): the previous when/isin/explode
    // shape evaluated two InSet probes plus an array build per cached
    // edge row per level — the join is one hash probe per row, stays in
    // whole-stage codegen, and needs no explode. No shuffle: the frontier
    // broadcasts, the active side streams from cache.
    def inlineExpand(frontier: Seq[String]): DataFrame = {
      val f = broadcast(frontier.toDF("fnode"))
      def hop(hit: Column, emit: Column): DataFrame =
        active.join(f, hit === col("fnode")).select(emit.as("node"))
      direction match {
        case "out" => hop(col("src"), col("dst"))
        case "in"  => hop(col("dst"), col("src"))
        case _     => hop(col("src"), col("dst"))
          .unionAll(hop(col("dst"), col("src")))
      }
    }

    // Inline regime. Roots beyond the limit go straight to distributed.
    val rootNodes = roots.select(col("node")).limit(InlineFrontierLimit + 1)
      .as[String].collect()
    var inlineLevels = List.empty[(Seq[String], Int)]
    var visitedSet = rootNodes.toSet
    var frontier = rootNodes.toSeq.sorted
    var d = 1
    var done = false
    var overflow = rootNodes.length > InlineFrontierLimit
    while (d <= maxDepth && !done && !overflow && frontier.nonEmpty) {
      val next = inlineExpand(frontier)
        .filter(!col("node").isin(visitedSet.toSeq: _*))
        .distinct()
        .limit(InlineFrontierLimit + 1)
        .as[String].collect()
      if (next.isEmpty) done = true
      else if (next.length > InlineFrontierLimit ||
        visitedSet.size + next.length > 4 * InlineFrontierLimit) overflow = true
      else {
        inlineLevels ::= ((next.toSeq, d))
        visitedSet ++= next
        frontier = next.toSeq.sorted
        d += 1
      }
    }
    val inlineVisited = ((rootNodes.toSeq, 0) :: inlineLevels.reverse)
      .map { case (ns, dep) => ns.toDF("node").select(col("node"), lit(dep).as("depth")) }
      .reduce(_ unionAll _)
    if (!overflow)
      return Traversal(inlineVisited, () => ())

    active.persist()
    // Distributed regime, seeded with whatever the inline phase covered
    // (re-expands the level that overflowed). Broadcasts auto-degrade:
    // a side is only broadcast while its known row count stays under
    // `broadcastVisitedLimit` — the monotonically-growing visited set is
    // the one that flips first (re-broadcasting it per level is the
    // 100×-scale trap); the per-level frontier usually keeps broadcasting.
    def bc(df: DataFrame, rows: Long): DataFrame =
      if (broadcastFrontier && rows <= broadcastVisitedLimit) broadcast(df)
      else df
    def expand(fr: DataFrame, frRows: Long): DataFrame = {
      val f = bc(fr.select(col("node").as("fnode")), frRows)
      def viaSrc = active.join(f, col("src") === col("fnode"))
        .select(col("dst").as("node"))
      def viaDst = active.join(f, col("dst") === col("fnode"))
        .select(col("src").as("node"))
      direction match {
        case "out" => viaSrc
        case "in"  => viaDst
        case _     => viaSrc.unionAll(viaDst)
      }
    }
    var releases = List.empty[() => Unit]
    val rootsOverflow = rootNodes.length > InlineFrontierLimit
    // Exact running size of visited/frontier. The one count() on oversized
    // roots is a single cheap job before the level loop; every later size
    // comes free from materializeLevel.
    val nRoots = if (rootsOverflow) roots.count() else rootNodes.length.toLong
    var visited = if (rootsOverflow)
      roots.select(col("node"), lit(0).as("depth")) else inlineVisited
    var visitedRows = if (rootsOverflow) nRoots
      else nRoots + inlineLevels.map(_._1.size.toLong).sum
    var frontierDF = if (rootsOverflow)
      roots.select(col("node")) else frontier.toDF("node")
    var frontierRows = if (rootsOverflow) nRoots else frontier.size.toLong
    var go = true
    while (d <= maxDepth && go) {
      val plan = expand(frontierDF, frontierRows)
        .join(bc(visited.select(col("node").as("seen")), visitedRows),
          col("node") === col("seen"), "left_anti")
        .distinct()
        .select(col("node"), lit(d).as("depth"))
      val lvl = materializeLevel(plan, reliable)
      releases ::= lvl.release
      if (lvl.n == 0) go = false
      else {
        visited = visited.unionAll(lvl.df)
        visitedRows += lvl.n
        frontierDF = lvl.df.select(col("node"))
        frontierRows = lvl.n
        d += 1
      }
    }
    val out = visited
    val rels2 = releases
    Traversal(out, () => {
      active.unpersist(blocking = false)
      rels2.foreach(_.apply())
    })
  }

  /** G9 `FindPath` (`pkg/engine/pathfinding.go:16-148`): shortest path by
    * iterative expansion; returns one row per reachable target with the
    * minimal hop count and the lexicographically smallest path among minimal
    * ones (deterministic tie-break; the reference returns an arbitrary
    * shortest path).
    *
    * Tie-break without a per-level window: every candidate path to node `n`
    * at depth `d` is `best-path(parent) ++ [n]`, so the lexicographically
    * smallest one is `min` over parents of the parent's tab-joined path
    * string (tab sorts below all id chars, so string order == element-wise
    * array order — same trick the DuckDB oracle uses). That makes the
    * per-level reduction a `groupBy(node).agg(min(pstr))` — map-side partial
    * aggregation, no sort, no window shuffle of path arrays (VERDICT r03).
    * The explicit cycle check is subsumed by the anti-join: any node on the
    * parent's path was visited at a lower depth and is therefore in `best`.
    */
  def shortestPaths(edges: DataFrame, from: String, rels: Seq[String] = Nil,
                    maxDepth: Int = 4, direction: String = "out",
                    atTime: Long = 0L, reliable: Boolean = false,
                    broadcastFrontier: Boolean = true,
                    broadcastVisitedLimit: Long = BroadcastVisitedLimit): DataFrame =
    shortestPathsT(edges, from, rels, maxDepth, direction, atTime, reliable,
      broadcastFrontier, broadcastVisitedLimit).result

  /** [[shortestPaths]] with a cache-release handle (see [[Traversal]]). */
  def shortestPathsT(edges: DataFrame, from: String, rels: Seq[String] = Nil,
                     maxDepth: Int = 4, direction: String = "out",
                     atTime: Long = 0L, reliable: Boolean = false,
                     broadcastFrontier: Boolean = true,
                     broadcastVisitedLimit: Long = BroadcastVisitedLimit): Traversal = {
    require(maxDepth <= 6, "depth cap")
    val spark = edges.sparkSession
    import spark.implicits._
    // Uncached for the inline regime, persisted on overflow — same
    // rationale as [[bfsT]] (r19).
    val active = {
      val a = edges.filter(activeAt(atTime))
      (if (rels.isEmpty) a else a.filter(col("rel").isin(rels: _*)))
        .select(col("src"), col("dst"))
    }

    // Inline regime (see [[bfs]]): the frontier is a driver-side
    // node → best-path-string map; each level expands through a BROADCAST
    // HASH JOIN against the (tiny, driver-resident) frontier. The r19
    // rewrite: the previous shape looked paths up via element_at over an
    // N-entry literal map, and Catalyst's GetMapValue scans map keys
    // LINEARLY per row — a level with hundreds of frontier nodes cost
    // O(frontier × edges) string compares over the cached active set
    // (measured 9.6 s task time on g9). The hash join is the same lookup
    // at O(1) per row and stays inside whole-stage codegen; no shuffle —
    // the frontier side broadcasts, the active side streams from cache.
    def inlineExpand(frontier: Map[String, String]): DataFrame = {
      val f = broadcast(frontier.toSeq.sortBy(_._1).toDF("fnode", "fpstr"))
      def hop(hit: Column, emit: Column): DataFrame =
        active.join(f, hit === col("fnode"))
          .select(emit.as("node"),
            concat(col("fpstr"), lit("\t"), emit).as("pstr"))
      direction match {
        case "out" => hop(col("src"), col("dst"))
        case "in"  => hop(col("dst"), col("src"))
        case _     => hop(col("src"), col("dst"))
          .unionAll(hop(col("dst"), col("src")))
      }
    }

    var inlineLevels = List.empty[(Seq[(String, String)], Int)]
    var bestSet = Set(from)
    var frontier = Map(from -> from)
    var d = 1
    var done = false
    var overflow = false
    while (d <= maxDepth && !done && !overflow && frontier.nonEmpty) {
      val next = inlineExpand(frontier)
        .filter(!col("node").isin(bestSet.toSeq: _*))
        .groupBy(col("node"))
        .agg(min(col("pstr")).as("pstr"))
        .limit(InlineFrontierLimit + 1)
        .as[(String, String)].collect()
      if (next.isEmpty) done = true
      else if (next.length > InlineFrontierLimit ||
        bestSet.size + next.length > 4 * InlineFrontierLimit) overflow = true
      else {
        inlineLevels ::= ((next.toSeq, d))
        bestSet ++= next.map(_._1)
        frontier = next.toMap
        d += 1
      }
    }
    val inlineBest = ((Seq((from, from)), 0) :: inlineLevels.reverse)
      .map { case (ps, dep) => ps.toDF("node", "pstr")
        .select(col("node"), lit(dep).as("hops"), col("pstr")) }
      .reduce(_ unionAll _)
    def finish(bestDF: DataFrame, release: () => Unit): Traversal =
      Traversal(bestDF.withColumn("path", split(col("pstr"), "\t")).drop("pstr"),
        release)
    if (!overflow)
      return finish(inlineBest, () => ())

    active.persist()
    // Distributed regime, seeded with the inline-covered prefix; re-expands
    // the level that overflowed. Tie-break stays a map-side min over path
    // strings (see Scaladoc).
    // Broadcasts auto-degrade exactly as in [[bfsT]]: the growing `best`
    // set stops broadcasting once it crosses `broadcastVisitedLimit`.
    def bc(df: DataFrame, rows: Long): DataFrame =
      if (broadcastFrontier && rows <= broadcastVisitedLimit) broadcast(df)
      else df
    def expand(fr: DataFrame, frRows: Long): DataFrame = {
      val f = bc(fr.select(col("node").as("fnode"), col("pstr").as("fpstr")),
        frRows)
      def viaSrc = active.join(f, col("src") === col("fnode"))
        .select(col("dst").as("node"), col("fpstr"))
      def viaDst = active.join(f, col("dst") === col("fnode"))
        .select(col("src").as("node"), col("fpstr"))
      direction match {
        case "out" => viaSrc
        case "in"  => viaDst
        case _     => viaSrc.unionAll(viaDst)
      }
    }
    var releases = List.empty[() => Unit]
    var best = inlineBest
    var bestRows = 1L + inlineLevels.map(_._1.size.toLong).sum
    var frontierDF = frontier.toSeq.toDF("node", "pstr")
    var frontierRows = frontier.size.toLong
    var go = true
    while (d <= maxDepth && go) {
      val plan = expand(frontierDF, frontierRows)
        .join(bc(best.select(col("node").as("seen")), bestRows),
          col("node") === col("seen"), "left_anti")
        .groupBy(col("node"))
        .agg(min(concat(col("fpstr"), lit("\t"), col("node"))).as("pstr"))
        .select(col("node"), lit(d).as("hops"), col("pstr"))
      val lvl = materializeLevel(plan, reliable)
      releases ::= lvl.release
      if (lvl.n == 0) go = false
      else {
        best = best.unionAll(lvl.df)
        bestRows += lvl.n
        frontierDF = lvl.df.select(col("node"), col("pstr"))
        frontierRows = lvl.n
        d += 1
      }
    }
    val rels2 = releases
    finish(best, () => {
      active.unpersist(blocking = false)
      rels2.foreach(_.apply())
    })
  }

  /** G8 `VExtractSubgraph` (`engine/graph.go:296-390`): nodes within
    * `depth` of the root, both directions, plus the active edges among
    * them. Guided expansion (distance-to-guide-vector threshold) is applied
    * by passing a pre-filtered edges table.
    */
  def subgraph(edges: DataFrame, root: String, depth: Int = 2,
               atTime: Long = 0L): (DataFrame, DataFrame) = {
    val t = subgraphT(edges, root, depth, atTime)
    (t._1.result, t._2)
  }

  /** [[subgraph]] with a cache-release handle on the node frame. */
  def subgraphT(edges: DataFrame, root: String, depth: Int = 2,
                atTime: Long = 0L): (Traversal, DataFrame) = {
    require(depth <= 5, "depth cap (engine/graph.go:300)")
    val spark = edges.sparkSession
    import spark.implicits._
    val roots = Seq(root).toDF("node")
    val t = bfsT(edges, roots, Nil, "both", depth, atTime)
    val members = t.result.select(col("node"))
    val sub = edges.filter(activeAt(atTime))
      .join(members.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
      .join(members.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
    (Traversal(t.result, t.release), sub)
  }

  /** G10 auto-link derivation (`processAutoLinks` `ops.go:1699-1737`): for
    * each row where metadata field F is set, emit `id -[rel]-> meta[F]`.
    */
  def autoLinks(table: DataFrame, idCol: String, field: String, rel: String,
                createdAt: Column = lit(0L)): DataFrame =
    table.filter(col(field).isNotNull)
      .select(col(idCol).cast("string").as("src"),
        col(field).cast("string").as("dst"),
        lit(rel).as("rel"), lit(1.0f).as("weight"),
        createdAt.cast("long").as("created_at"),
        lit(null).cast("long").as("deleted_at"))

  /** G12 `VacuumGraph` (`core/graph.go:367-416`): physically purge edges
    * soft-deleted before `cutoff` (retention compaction).
    */
  def vacuum(edges: DataFrame, cutoff: Long): DataFrame =
    edges.filter(
      col("deleted_at").isNull || col("deleted_at") === 0L ||
        col("deleted_at") >= cutoff)

  /** G1 `AddEdge` versioning (`core/graph.go:112-182`): apply a batch of
    * links to the edges table. Existing active edges with identical
    * (src, dst, rel, weight, props) are untouched (idempotent); changed
    * weight/props soft-delete the old version and append the new one.
    *
    * `links` columns: src, dst, rel, weight, props, created_at.
    */
  def link(edges: DataFrame, links: DataFrame, now: Long): DataFrame = {
    val key = Seq("src", "dst", "rel")
    val active = edges.filter(activeAt(0L))
    // Active edges whose (weight, props) differ from an incoming link.
    val changed = active.alias("e")
      .join(links.alias("l"), key)
      .filter(col("e.weight") =!= col("l.weight") ||
        coalesce(col("e.props"), lit("")) =!= coalesce(col("l.props"), lit("")))
      .select(key.map(col) :+ lit(true).as("_changed"): _*)
    // Links that are genuinely new (no active edge with same key).
    val newLinks = links.join(active, key, "left_anti")
    // Links whose key exists but payload changed → new version rows.
    val newVersions = links.alias("l")
      .join(changed, key, "left_semi")
    val tombstoned = edges.alias("e")
      .join(changed, key, "left")
      .withColumn("deleted_at",
        when(col("_changed") && activeAt(0L), lit(now)).otherwise(col("e.deleted_at")))
      .drop("_changed")
    tombstoned.unionByName(
      newLinks.unionByName(newVersions)
        .withColumn("deleted_at", lit(null).cast("long")))
  }

  /** G2 `RemoveEdge` (`core/graph.go:187-240`): soft (default) or hard. */
  def unlink(edges: DataFrame, src: String, dst: String, rel: String,
             now: Long, hard: Boolean = false): DataFrame = {
    val hit = col("src") === src && col("dst") === dst && col("rel") === rel
    if (hard) edges.filter(!hit)
    else edges.withColumn("deleted_at",
      when(hit && activeAt(0L), lit(now)).otherwise(col("deleted_at")))
  }
}
