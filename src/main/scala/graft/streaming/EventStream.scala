package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Q._

/** Event-stream processing. The transforms are plain
  * `DataFrame → DataFrame`, so the SAME code runs in batch (below,
  * oracle-checked) and under Structured Streaming
  * (`spark.readStream → withWatermark → transform → writeStream`;
  * exercised with a real streaming query in StreamingSpec).
  */
object EventStream {

  /** Tumbling 1-hour window aggregation. In streaming mode, attach
    * `withWatermark("ts", ...)` upstream; the groupBy(window(...)) is
    * identical in both modes. */
  def hourlyAgg(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total"))

  /** Gap-based sessionization (30-minute inactivity): a session starts
    * where the gap from the previous event exceeds the timeout; session
    * id is the running count of starts. One shuffle on user_id. */
  def sessionize(ev: DataFrame, gapMicros: Long = 30L * 60 * 1000000): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.withColumn("us", unix_micros(col("ts")))
      .withColumn("new_session",
        when(col("us") - lag(col("us"), 1).over(w) > gapMicros, 1)
          .otherwise(when(lag(col("us"), 1).over(w).isNull, 1).otherwise(0)))
      .withColumn("session_id",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_hourly_window" -> { (s, dir) =>
      hourlyAgg(events(s, dir))
        .orderBy(col("hour_start"), col("event_type"))
    },
    "stream_sessionize" -> { (s, dir) =>
      sessionize(events(s, dir))
        .orderBy(col("user_id"), col("session_id"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    "stream_hourly_window" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1
        |         WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
        |         ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, event_id, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM g)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin
  )
}
