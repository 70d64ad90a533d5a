package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** The shared clustered-synthetic embedding recipe behind every bench and
  * scale workload: `nClusters` latent hash-derived centers plus 25%
  * per-id noise — the structure real embedding corpora have and
  * uniform-random lacks. ONE definition on purpose: ScaleCheck's 1× vs
  * 10× serving ratios are only meaningful if they run exactly the corpus
  * recipe the bench measures, and five hand-tuned copies drifted apart is
  * how that silently stops being true.
  */
object SyntheticVectors {

  /** Deterministic hash-uniform in [-1, 1] — engine-independent, seeded. */
  def hashUniform(seed: Column, j: Column, salt: String): Column =
    (pmod(xxhash64(seed, j, lit(salt)), lit(2000001L)).cast("double")
      - 1000000.0) / 1000000.0

  /** Clustered vector for id `idc`: center = hash of (id mod nClusters),
    * noise = 25% per-id hash, optionally L2-normalized (cosine corpora). */
  def clusteredVec(idc: Column, dim: Int, nClusters: Long, noiseSalt: String,
                   normalized: Boolean = true): Column = {
    val raw = transform(sequence(lit(0), lit(dim - 1)), j =>
      (hashUniform(pmod(idc, lit(nClusters)), j, "ctr") +
        hashUniform(idc, j, noiseSalt) * lit(0.25)).cast("float"))
    if (normalized) VectorFunctions.normalize(raw) else raw
  }
}
