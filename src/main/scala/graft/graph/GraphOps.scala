package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** BFS frontier expansion (G7 `resolveGraphFilter` `engine/graph.go:173-247`
    * / G8 both-directions variant). Returns `(node, depth)` with the minimal
    * depth ≤ maxDepth at which each node is reached (roots at 0). Depth caps
    * come from the reference (5).
    */
  def bfs(edges: DataFrame, roots: DataFrame, rels: Seq[String] = Nil,
          direction: String = "out", maxDepth: Int = 5,
          atTime: Long = 0L): DataFrame = {
    require(maxDepth <= 10, "depth cap")
    val active = {
      val a = edges.filter(activeAt(atTime))
      if (rels.isEmpty) a else a.filter(col("rel").isin(rels: _*))
    }
    // Cache the (from, to) projection once: every level joins against it,
    // and recomputing the parquet scan + union per level is a repeated-full-
    // scan multiplier at scale. Unpersisted after the loop — every returned
    // row descends from an eagerly checkpointed frontier, not from `hops`.
    val hops: DataFrame = (direction match {
      case "out"  => active.select(col("src").as("from"), col("dst").as("to"))
      case "in"   => active.select(col("dst").as("from"), col("src").as("to"))
      case _      => active.select(col("src").as("from"), col("dst").as("to"))
        .unionAll(active.select(col("dst").as("from"), col("src").as("to")))
    }).persist()
    var visited = roots.select(col("node"), lit(0).as("depth"))
    var frontier = visited
    var d = 1
    while (d <= maxDepth && !frontier.isEmpty) {
      // localCheckpoint truncates lineage: avoids self-join ambiguity across
      // iterations and keeps the plan linear in depth; lazy (eager=false) so the
      // per-level isEmpty probe is the one materializing action, not a second
      // job on top of an eager checkpoint. (On a multi-executor
      // cluster prefer reliable `checkpoint` — localCheckpoint state dies
      // with a lost executor.)
      val next = frontier.join(hops, frontier("node") === hops("from"))
        .select(hops("to").as("node"), lit(d).as("depth"))
        .join(visited.select(col("node").as("seen")),
          col("node") === col("seen"), "left_anti")
        .distinct()
        .localCheckpoint(eager = false)
      visited = visited.unionAll(next)
      frontier = next
      d += 1
    }
    hops.unpersist(blocking = false)
    visited
  }

  /** G9 `FindPath` (`pkg/engine/pathfinding.go:16-148`): shortest path by
    * iterative expansion with per-node path tracking; returns one row per
    * reachable target with the minimal hop count and the lexicographically
    * smallest path among minimal ones (deterministic tie-break; the
    * reference returns an arbitrary shortest path).
    */
  def shortestPaths(edges: DataFrame, from: String, rels: Seq[String] = Nil,
                    maxDepth: Int = 4, direction: String = "out",
                    atTime: Long = 0L): DataFrame = {
    require(maxDepth <= 6, "depth cap")
    val active = {
      val a = edges.filter(activeAt(atTime))
      if (rels.isEmpty) a else a.filter(col("rel").isin(rels: _*))
    }
    // Cached for the loop (see bfs); released after the last checkpoint.
    val hops: DataFrame = (direction match {
      case "out"  => active.select(col("src").as("from"), col("dst").as("to"))
      case "in"   => active.select(col("dst").as("from"), col("src").as("to"))
      case _      => active.select(col("src").as("from"), col("dst").as("to"))
        .unionAll(active.select(col("dst").as("from"), col("src").as("to")))
    }).persist()
    val spark = edges.sparkSession
    import spark.implicits._
    var best = Seq((from, 0, Seq(from))).toDF("node", "hops", "path")
    var frontier = best
    var d = 1
    while (d <= maxDepth && !frontier.isEmpty) {
      val expanded = frontier.join(hops, frontier("node") === hops("from"))
        .filter(!array_contains(col("path"), col("to")))
        .select(col("to").as("node"), lit(d).as("hops"),
          concat(col("path"), array(col("to"))).as("path"))
      val next = expanded
        .join(best.select(col("node").as("seen")), col("node") === col("seen"), "left_anti")
      // One row per node: minimal path, ordered by the tab-joined path string
      // (tab sorts below all id chars, so this matches element-wise array
      // ordering and is reproducible in SQL engines).
      val w = Window.partitionBy(col("node")).orderBy(concat_ws("\t", col("path")))
      val nextBest = next.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
        .localCheckpoint(eager = false)
      best = best.unionAll(nextBest)
      frontier = nextBest
      d += 1
    }
    hops.unpersist(blocking = false)
    best
  }

  /** G8 `VExtractSubgraph` (`engine/graph.go:296-390`): nodes within
    * `depth` of the root, both directions, plus the active edges among
    * them. Guided expansion (distance-to-guide-vector threshold) is applied
    * by passing a pre-filtered edges table.
    */
  def subgraph(edges: DataFrame, root: String, depth: Int = 2,
               atTime: Long = 0L): (DataFrame, DataFrame) = {
    require(depth <= 5, "depth cap (engine/graph.go:300)")
    val spark = edges.sparkSession
    import spark.implicits._
    val roots = Seq(root).toDF("node")
    val nodes = bfs(edges, roots, Nil, "both", depth, atTime)
    val members = nodes.select(col("node"))
    val sub = edges.filter(activeAt(atTime))
      .join(members.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
      .join(members.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
    (nodes, sub)
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
