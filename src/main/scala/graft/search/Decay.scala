package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time-decay scoring — reference `search_utils.go:91-146` (models) and
  * `ops.go:1099-1186` (application rules).
  *
  * Everything is a pure column expression, and `now` is always a PARAMETER
  * (never wall-clock inside the plan) so results are deterministic and
  * testable — SURVEY §7.4 hard part 5.
  *
  * Per-row rules, in reference order:
  *   1. `_pinned` rows skip decay entirely.
  *   2. reference time = max(`_created_at`, `_last_accessed`); if ≤ 0 or
  *      absent, no decay.
  *   3. memory-layer half-life overrides the global one; a layer configured
  *      with half-life 0 disables decay for that layer.
  *   4. `_decay_model` metadata overrides the configured default model.
  *   5. age ≤ 0 or half-life ≤ 0 ⇒ factor 1.0.
  */
object Decay {

  /** Decay/memory configuration — the subset of the reference's per-index
    * `MemoryConfig` (`pkg/core/hnsw/config.go:147-231`) that affects
    * query-time scoring. `layers` maps memory_layer → half-life seconds
    * (0 disables decay for the layer).
    */
  final case class MemoryConfig(
      enabled: Boolean = false,
      halfLifeSeconds: Double = 604800.0, // 7 days, reference default
      model: String = "exponential",
      layers: Map[String, Double] = Map.empty)

  /** The four decay models (age and halfLife as columns; halfLife > 0 and
    * age > 0 are guaranteed by the caller).
    */
  def modelFactor(model: Column, age: Column, halfLife: Column, accessCount: Column): Column = {
    val exponential = pow(lit(2.0), -age / halfLife)
    val linear = greatest(lit(0.0), lit(1.0) - age / halfLife)
    val step = when(age < halfLife, lit(1.0)).otherwise(lit(0.0))
    // stability = hl * (1 + ln(1 + accessCount)); retention = e^(-age/S)
    val stability = halfLife * (lit(1.0) + log1p(coalesce(accessCount.cast("double"), lit(0.0))))
    val ebbinghaus = exp(-age / stability)
    when(model === "linear", linear)
      .when(model === "step", step)
      .when(model === "ebbinghaus", ebbinghaus)
      .otherwise(exponential) // "exponential" and unknown models
  }

  /** Full per-row decay factor.
    *
    * @param now          unix seconds, as a literal/column parameter
    * @param createdAt    `_created_at` column (unix seconds, nullable)
    * @param lastAccessed `_last_accessed` column (nullable)
    * @param pinned       `_pinned` column (boolean/nullable)
    * @param layer        `memory_layer` column (nullable → "episodic")
    * @param modelOverride `_decay_model` column (nullable/empty → config)
    * @param accessCount  `_access_count` column (nullable → 0)
    */
  def factor(
      cfg: MemoryConfig,
      now: Column,
      createdAt: Column,
      lastAccessed: Column,
      pinned: Column = lit(false),
      layer: Column = lit(null).cast("string"),
      modelOverride: Column = lit(null).cast("string"),
      accessCount: Column = lit(0)): Column = {
    if (!cfg.enabled) return lit(1.0)
    val globalHl = if (cfg.halfLifeSeconds <= 0) 604800.0 else cfg.halfLifeSeconds
    val effLayer = when(layer.isNull || layer === "", lit("episodic")).otherwise(layer)
    val layerHl = cfg.layers.foldLeft(lit(globalHl)) { case (acc, (name, hl)) =>
      when(effLayer === name, lit(hl)).otherwise(acc)
    }
    val defModel = if (cfg.model.isEmpty) "exponential" else cfg.model
    val model = when(modelOverride.isNull || modelOverride === "", lit(defModel))
      .otherwise(modelOverride)
    val refTime = greatest(
      coalesce(createdAt.cast("double"), lit(0.0)),
      coalesce(lastAccessed.cast("double"), lit(0.0)))
    val age = now.cast("double") - refTime
    val guarded = when(layerHl <= 0, lit(1.0))
      .when(age <= 0, lit(1.0))
      .otherwise(modelFactor(model, age, layerHl, accessCount))
    when(coalesce(pinned.cast("boolean"), lit(false)), lit(1.0))
      .when(refTime <= 0, lit(1.0))
      .otherwise(guarded)
  }
}
