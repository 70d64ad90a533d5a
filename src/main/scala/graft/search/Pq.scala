package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Product quantization — the compressed-candidate stage beyond the int8
  * (4×) and f16 (2×) modes: each vector becomes m sub-space codes, one
  * byte-sized code per sub-space, so a 64-d f32 vector (256 B) compresses
  * to m = 8 codes (8 B, 32×). Search is asymmetric-distance (ADC): the
  * query precomputes a tiny per-sub-space lookup table against the
  * codebooks, and scanning a candidate costs m table reads + m adds — no
  * float vector is touched until (optional) exact rerank.
  *
  * Scale shape, in Spark terms:
  *   - codebooks are m × nCodes sub-vectors — a few KB, ALWAYS broadcast;
  *   - encoding is one scan: explode to (id, sub, subvec), broadcast-join
  *     the codebook, per-(id, sub) argmin, regroup to a codes array —
  *     keyed aggregations only, partitions like the corpus;
  *   - the ADC scan reads ONLY the codes column (column pruning leaves
  *     the f32 vectors on disk; at 100 TB the codes fit in memory where
  *     the vectors never could — the point of PQ);
  *   - reranking fetches full vectors for the top-R candidate ids alone.
  *
  * All distance math is sequential double accumulation (the [[VectorFunctions]]
  * kernels + an explicit fold over sub-spaces), so an external oracle can
  * reproduce every value bit-for-bit; ties break toward the lower code /
  * id everywhere, like the rest of the ANN module.
  *
  * Reference context: kektordb ships int8 and f16 compression
  * (`distance_go.go:106-147`); PQ extends that memory ladder one rung
  * further down, with the same deterministic-protocol discipline.
  */
object Pq {

  /** (id, sub, subvec): m contiguous dim/m slices per vector. */
  def subVectors(df: DataFrame, idCol: String, vecCol: String,
      m: Int, subDim: Int): DataFrame =
    df.select(col(idCol).as("id"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col(vecCol).as("v"))
      .select(col("id"), col("sub"),
        slice(col("v"), col("sub") * subDim + 1, lit(subDim)).as("subvec"))

  /** Sample-as-codebook: sub-vectors of the vectors with id < nCodes,
    * code = id. The deterministic protocol the oracle replicates (swap in
    * per-sub-space KMeans over [[Ivf.trainKMeansArrays]] for trained
    * codebooks when recall, not verifiability, is the goal).
    */
  def sampleCodebook(emb: DataFrame, idCol: String, vecCol: String,
      m: Int, subDim: Int, nCodes: Int): DataFrame =
    subVectors(emb.filter(col(idCol) < nCodes), idCol, vecCol, m, subDim)
      .select(col("sub"), col("id").cast("int").as("code"),
        col("subvec").as("cvec"))

  /** Encode every vector as its per-sub-space argmin code (ties → lower
    * code). Returns (id, codes array<int> ordered by sub) — m bytes of
    * information per row where the input was 4·dim.
    */
  def encode(emb: DataFrame, cb: DataFrame, idCol: String, vecCol: String,
      m: Int, subDim: Int): DataFrame =
    subVectors(emb, idCol, vecCol, m, subDim)
      .join(broadcast(cb), Seq("sub"))
      .withColumn("d", VectorFunctions.euclideanSqWide(col("subvec"), col("cvec")))
      .groupBy(col("id"), col("sub"))
      .agg(min(struct(col("d"), col("code"))).as("mc"))
      .groupBy(col("id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("mc.code").as("code")))),
        e => e.getField("code")).as("codes"))

  /** ADC top-k: per query, one flat LUT (sub-major, code-minor) of
    * ||q_sub − cb[sub][code]||²; a candidate's distance is the sequential
    * fold Σ_sub lut[sub·nCodes + codes[sub]]. The scored frame never
    * touches a float vector — only the broadcast LUT and the codes column.
    */
  def adcSearch(encoded: DataFrame, cb: DataFrame, queries: DataFrame,
      k: Int, m: Int, subDim: Int, nCodes: Int): DataFrame = {
    val lut = subVectors(queries, "qid", "qvec", m, subDim)
      .join(broadcast(cb), Seq("sub"))
      .withColumn("d", VectorFunctions.euclideanSqWide(col("subvec"), col("cvec")))
      .groupBy(col("id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code"), col("d")))),
        e => e.getField("d")).as("lut"))
      .select(col("id").as("qid"), col("lut"))
    val scored = encoded.crossJoin(broadcast(lut))
      .withColumn("dist",
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, s) =>
          acc + element_at(col("lut"),
            s * nCodes + element_at(col("codes"), s + 1) + 1)))
    rankTopK(scored, k)
  }

  /** Bounded top-k ranking (ascending (dist, id), 1-based rank) through the
    * [[graft.functions.TopK]] aggregate — map-side k-sized buffers, no
    * sort, no window (and so no empty-partition-spec hazard on
    * constant-qid frames).
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("qid"))
      .agg(graft.functions.TopK.topK(
        col("id").cast("long"), col("dist"), k).as("_tk"))
      .select(col("qid"), explode(col("_tk")).as("_e"))
      .select(col("qid"), col("_e.id").as("id"),
        col("_e.distance").as("dist"), col("_e.rank").as("rank"))

  /** Two-stage PQ serving: ADC selects rerankR candidates from codes
    * alone, then ONLY those ids fetch their f32 vectors for an exact
    * re-score — the standard recall repair, and at scale the only step
    * that reads the vector column at all.
    */
  def adcSearchRerank(encoded: DataFrame, cb: DataFrame, queries: DataFrame,
      emb: DataFrame, idCol: String, vecCol: String,
      k: Int, rerankR: Int, m: Int, subDim: Int, nCodes: Int): DataFrame = {
    val cand = adcSearch(encoded, cb, queries, rerankR, m, subDim, nCodes)
      .select(col("qid"), col("id"))
    rankTopK(
      cand
        .join(emb.select(col(idCol).as("id"), col(vecCol).as("v")), Seq("id"))
        .join(broadcast(queries.select(col("qid"), col("qvec"))), Seq("qid"))
        .withColumn("dist",
          VectorFunctions.euclideanSqWide(col("v"), col("qvec"))),
      k)
  }
}
