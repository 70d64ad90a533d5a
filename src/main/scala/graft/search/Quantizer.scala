package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** V9/V10 — symmetric int8 scalar quantization
  * (`pkg/core/distance/quantizer.go:49-190`).
  *
  * Training finds AbsMax = the |value| at sorted index floor(n·0.999) (an
  * index quantile, not interpolated — outlier clipping). Quantize maps
  * [-AbsMax, AbsMax] → [-127, 127] with clipping; dequantize inverts.
  *
  * The rank here is computed with an exact global sort (fine at test scale,
  * deterministic for the oracle); at 100 TB swap the ranked-window absMax
  * for `approx_percentile(abs(v), 0.999)` — the quantizer contract (a
  * scalar bound) is unchanged. Math is double on both engines (the
  * reference uses float32; parity scope is the Spark↔oracle pair).
  */
object Quantizer {

  /** One-row DataFrame (absmax: double) — the trained bound. */
  def train(vectors: DataFrame, vecCol: String): DataFrame = {
    val absv = vectors.select(explode(col(vecCol)).as("e"))
      .select(abs(col("e")).as("v"))
    absv
      .select(col("v"),
        row_number().over(Window.orderBy(col("v"))).as("rn"),
        count(lit(1)).over(Window.partitionBy()).as("cnt"))
      .filter(col("rn") === floor(col("cnt") * 0.999).cast("long") + 1)
      .select(col("v").cast("double").as("absmax"))
  }

  /** Quantized code for one component (double in → int code). */
  def code(x: Column, absMax: Column): Column =
    greatest(lit(-127L), least(lit(127L),
      round(x.cast("double") / absMax * 127.0, 0).cast("long")))

  /** Dequantized approximation of a code. */
  def dequant(q: Column, absMax: Column): Column =
    q.cast("double") / 127.0 * absMax

  /** Quantize a whole vector column (array<float> → array<long> codes),
    * given the broadcast one-row absmax frame.
    */
  def quantizeVectors(df: DataFrame, vecCol: String, absMaxDF: DataFrame): DataFrame =
    df.crossJoin(broadcast(absMaxDF))
      .withColumn("qcodes",
        transform(col(vecCol), x => code(x, col("absmax"))))

  /** Dequantized vector (array<double>) from codes. */
  def dequantized(qcodes: Column, absMax: Column): Column =
    transform(qcodes, q => dequant(q, absMax))
}
