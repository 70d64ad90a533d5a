package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.dedup.Dedup

/** C1-C3 queries: gardener redundancy clustering, episodic→semantic
  * consolidation, knowledge gaps — all built on the bucketed cosine
  * similarity self-join (Dedup.cosineNearDups), never all-pairs.
  *
  * Planted clusters: 6 exact copies of vec 0 at ids 300003·c (c=1..6, all
  * ≡0 mod 3 → episodic layer) and 5 copies of vec 1 at 310001..310005
  * (mixed layers). Clustering is single-pass seed assignment
  * (cluster = min over direct ≥-threshold neighbors ∪ self) — exact on
  * cliques, which is what ≥0.90-similarity groups are.
  */
object ClusterQueries {

  def clusterCorpus(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val base = emb.select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val copiesA = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .crossJoin(s.range(1, 7))
      .select((lit(300000L) + col("id") * 3).as("vec_id"), col("embedding"))
    val copiesB = emb.filter(col("vec_id") === 1).select(col("embedding"))
      .crossJoin(s.range(1, 6))
      .select((lit(310000L) + col("id")).as("vec_id"), col("embedding"))
    base.unionByName(copiesA).unionByName(copiesB)
  }

  private val corpusSql =
    """ccorpus AS (
      |  SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT 300000 + 3 * c, (SELECT embedding FROM embeddings WHERE vec_id = 0)
      |  FROM range(1, 7) t(c)
      |  UNION ALL
      |  SELECT 310000 + c, (SELECT embedding FROM embeddings WHERE vec_id = 1)
      |  FROM range(1, 6) t(c)
      |)""".stripMargin

  /** DuckDB mirror of Dedup.cosineNearDups over `ccorpus`. */
  private def pairsSql(threshold: String): String =
    s"""dots AS (
       |  SELECT vec_id, j, sum(e * (((131 * j + 31 * (pos - 1)) % 17) - 8)) AS dot
       |  FROM (SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS e,
       |               generate_subscripts(embedding, 1) AS pos FROM ccorpus)
       |  CROSS JOIN range(8) t(j) GROUP BY vec_id, j),
       |buckets AS (
       |  SELECT vec_id, CAST(sum(CASE WHEN dot > 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
       |  FROM dots GROUP BY vec_id),
       |pairs AS (
       |  SELECT l.vec_id AS id1, r.vec_id AS id2,
       |    list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
       |                           CAST(b.embedding AS DOUBLE[])) AS sim
       |  FROM buckets l JOIN buckets r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
       |  JOIN ccorpus a ON a.vec_id = l.vec_id JOIN ccorpus b ON b.vec_id = r.vec_id),
       |sp AS (SELECT id1, id2, sim FROM pairs WHERE sim >= $threshold)""".stripMargin

  private val clusterSql =
    """sym AS (
      |  SELECT id1 AS node, id2 AS peer FROM sp
      |  UNION ALL SELECT id2, id1 FROM sp),
      |assign AS (
      |  SELECT node, least(node, min(peer)) AS cluster FROM sym GROUP BY node)""".stripMargin

  private def clusters(pairs: DataFrame): DataFrame = {
    val sym = pairs.select(col("id1").as("node"), col("id2").as("peer"))
      .unionByName(pairs.select(col("id2").as("node"), col("id1").as("peer")))
    sym.groupBy(col("node"))
      .agg(least(col("node"), min(col("peer"))).as("cluster"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("size"),
        concat_ws(",", sort_array(collect_list(col("node")))).as("members"))
  }

  private def layerCol(id: org.apache.spark.sql.Column) =
    element_at(array(lit("episodic"), lit("semantic"), lit("procedural")),
      (id % 3 + 1).cast("int"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C1: redundancy clusters — sim ≥ 0.95 cliques of size ≥ 5.
    "c1_redundancy_clusters" -> ((s, dir) => {
      val pairs = Dedup.cosineNearDups(clusterCorpus(s, dir), "vec_id", "embedding", 0.95)
      clusters(pairs)
        .filter(col("size") >= 5)
        .select(col("cluster").cast("long").as("cluster_id"),
          col("size").cast("long").as("size"), col("members"))
        .orderBy(col("cluster_id"))
    }),

    // C2: episodic→semantic consolidation — cluster within the episodic
    // layer only; summary node per cluster, members archived.
    "c2_consolidation" -> ((s, dir) => {
      val episodic = clusterCorpus(s, dir)
        .filter(layerCol(col("vec_id")) === "episodic")
      val pairs = Dedup.cosineNearDups(episodic, "vec_id", "embedding", 0.95)
      clusters(pairs)
        .filter(col("size") >= 5)
        .select(concat(lit("sum:ep:"), col("cluster")).as("summary_id"),
          lit("episodic").as("layer"), col("size").cast("long").as("n_members"),
          (col("size") - 1).cast("long").as("n_archived"))
        .orderBy(col("summary_id"))
    }),

    // C3: knowledge gaps — ≥0.85-similar pairs with NO direct edge in the
    // cites graph → suggested links.
    "c3_knowledge_gaps" -> ((s, dir) => {
      val pairs = Dedup.cosineNearDups(clusterCorpus(s, dir), "vec_id", "embedding", 0.85)
      val e = Tables.documents(s, dir).select(
        col("doc_id").cast("long").as("a"), (col("doc_id") + 3).cast("long").as("b"))
      pairs
        .join(e, pairs("id1") === e("a") && pairs("id2") === e("b"), "left_anti")
        .join(e, pairs("id1") === e("b") && pairs("id2") === e("a"), "left_anti")
        .select(col("id1"), col("id2"), round(col("sim"), 6).as("sim"))
        .orderBy(col("id1"), col("id2"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "c1_redundancy_clusters" ->
      s"""WITH $corpusSql, ${pairsSql("0.95")}, $clusterSql,
         |cl AS (
         |  SELECT cluster, CAST(count(*) AS BIGINT) AS size,
         |    array_to_string(list_sort(list(node)), ',') AS members
         |  FROM assign GROUP BY cluster)
         |SELECT CAST(cluster AS BIGINT) AS cluster_id, size, members
         |FROM cl WHERE size >= 5 ORDER BY cluster_id""".stripMargin,

    "c2_consolidation" ->
      s"""WITH ep AS (
         |  SELECT * FROM (
         |    SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding FROM embeddings
         |    UNION ALL
         |    SELECT 300000 + 3 * c, (SELECT embedding FROM embeddings WHERE vec_id = 0)
         |    FROM range(1, 7) t(c)
         |    UNION ALL
         |    SELECT 310000 + c, (SELECT embedding FROM embeddings WHERE vec_id = 1)
         |    FROM range(1, 6) t(c))
         |  WHERE vec_id % 3 = 0),
         |ccorpus AS (SELECT * FROM ep),
         |${pairsSql("0.95")}, $clusterSql,
         |cl AS (SELECT cluster, CAST(count(*) AS BIGINT) AS size FROM assign GROUP BY cluster)
         |SELECT 'sum:ep:' || cluster AS summary_id, 'episodic' AS layer,
         |  size AS n_members, CAST(size - 1 AS BIGINT) AS n_archived
         |FROM cl WHERE size >= 5 ORDER BY summary_id""".stripMargin,

    "c3_knowledge_gaps" ->
      s"""WITH $corpusSql, ${pairsSql("0.85")},
         |e AS (SELECT CAST(doc_id AS BIGINT) AS a, CAST(doc_id + 3 AS BIGINT) AS b
         |      FROM documents)
         |SELECT CAST(id1 AS BIGINT) AS id1, CAST(id2 AS BIGINT) AS id2,
         |  round(sim, 6) AS sim
         |FROM sp
         |WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = sp.id1 AND e.b = sp.id2)
         |  AND NOT EXISTS (SELECT 1 FROM e WHERE e.a = sp.id2 AND e.b = sp.id1)
         |ORDER BY id1, id2""".stripMargin
  )
}
