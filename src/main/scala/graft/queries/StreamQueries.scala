package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.streaming.Streams

/** E1-E4 batch-equivalence queries: the streaming transforms are plain
  * DataFrame functions, so the DuckDB oracle checks the exact logic the
  * streaming queries run (StreamingSpec asserts stream == batch on the same
  * files).
  */
object StreamQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E1/E5: tumbling 1-hour event-time windows per event type.
    "e1_events_window" -> ((s, dir) => {
      Streams.eventWindowAgg(Tables.events(s, dir))
        .orderBy(col("window_start"), col("event_type"))
    }),

    // E3: adaptive think trigger replayed over the event log — per user,
    // every cycle the scheduler (≥5 writes since last AND ≥24h since last,
    // gardener.go:506-528 semantics with replay-scaled knobs) would fire.
    // The oracle recomputes the same state machine with an independent
    // recursive CTE — a genuine cross-check of the sequential fold.
    "e3_think_trigger" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("ts_ms", col("ts_sec") * 1000L)
      Streams.thinkTriggers(ev,
          keyCol = "user_id", tsMsCol = "ts_ms", seqCol = "event_id",
          writeThreshold = 5L, minIntervalMs = 86400000L)
        .groupBy(col("key").as("user_id"))
        .agg(count(lit(1)).as("n_cycles"),
          min(col("fire_ms")).as("first_fire_ms"),
          max(col("fire_ms")).as("last_fire_ms"),
          sum(col("writes_since_last")).as("writes_consumed"))
        .orderBy(col("user_id"))
    }),

    // E4/S8: vectorizer pipeline — chunk + deterministic hash embedding +
    // prev-link chain (the reference's prev/next chunk graph).
    "e4_vectorize" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 50)
        .select(col("doc_id"), col("text"))
      Streams.vectorize(docs)
        .select(col("chunk_id"), col("doc_id"), col("chunk_index"),
          col("prev_chunk"),
          size(split(col("content"), " ")).cast("long").as("n_words"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("e0"))
        .orderBy(col("doc_id"), col("chunk_index"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "e1_events_window" ->
      """SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start,
        |  event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Independent re-simulation of the think-trigger state machine: the
    // recursive CTE steps every user's event sequence in lockstep, carrying
    // (writes, last_think) and firing exactly when both gates pass.
    "e3_think_trigger" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    CAST(floor(epoch(ts)) AS BIGINT) * 1000 AS tms
        |  FROM events
        |),
        |sim AS (
        |  SELECT user_id, CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) AS writes,
        |    CAST(0 AS BIGINT) AS last_think, FALSE AS fired,
        |    CAST(0 AS BIGINT) AS tms, CAST(0 AS BIGINT) AS fire_writes
        |  FROM (SELECT DISTINCT user_id FROM events)
        |  UNION ALL
        |  SELECT e.user_id, e.rn,
        |    CASE WHEN s.writes + 1 >= 5 AND e.tms - s.last_think >= 86400000
        |         THEN 0 ELSE s.writes + 1 END,
        |    CASE WHEN s.writes + 1 >= 5 AND e.tms - s.last_think >= 86400000
        |         THEN e.tms ELSE s.last_think END,
        |    s.writes + 1 >= 5 AND e.tms - s.last_think >= 86400000,
        |    e.tms,
        |    s.writes + 1
        |  FROM sim s JOIN ev e ON e.user_id = s.user_id AND e.rn = s.rn + 1
        |)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_cycles,
        |  min(tms) AS first_fire_ms, max(tms) AS last_fire_ms,
        |  CAST(sum(fire_writes) AS BIGINT) AS writes_consumed
        |FROM sim WHERE fired
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "e4_vectorize" ->
      """WITH chunks AS (
        |  SELECT doc_id, CAST(start / 15 AS BIGINT) AS chunk_index,
        |    array_to_string(list_slice(w, start + 1, least(start + 20, len(w))), ' ') AS content,
        |    CAST(least(start + 20, len(w)) - start AS BIGINT) AS n_words
        |  FROM (
        |    SELECT doc_id, str_split(text, ' ') AS w,
        |      unnest(generate_series(0, len(str_split(text, ' ')) - 1, 15)) AS start
        |    FROM documents WHERE doc_id < 50)),
        |h AS (
        |  SELECT *, list_reduce([CAST(0 AS BIGINT)] ||
        |    list_transform(str_split(content, ''), c -> CAST(ord(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 2147483647) AS ph
        |  FROM chunks)
        |SELECT doc_id || ':' || chunk_index AS chunk_id, doc_id, chunk_index,
        |  CASE WHEN chunk_index > 0 THEN doc_id || ':' || (chunk_index - 1) END AS prev_chunk,
        |  n_words,
        |  round(CAST(CAST(((ph + 12289) % 2147483647) / 2147483647.0 - 0.5 AS FLOAT) AS DOUBLE), 6) AS e0
        |FROM h ORDER BY doc_id, chunk_index""".stripMargin
  )
}
