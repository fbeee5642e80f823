package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming transform builders (SURVEY §2.3 "Streaming").
  *
  * Each takes a DataFrame with an event-time `ts` column — batch or
  * streaming — and returns the transformed frame. Batch callers get the
  * oracle-checkable frame (StreamOps); streaming callers
  * (readStream/MemoryStream) get watermarked stateful variants whose state
  * is bounded by the watermark horizon.
  *
  * The watermark is the analog of the reference's lease-expiry clock
  * (reference core/datastore.go:48-51, 240-253): a liveness horizon after
  * which state (there: leases; here: window/dedup state) is reclaimable.
  */
object StreamJobs {

  /** Tumbling 1-hour counts; with a 10-minute watermark when streaming. */
  def tumblingCounts(ev: DataFrame, watermark: Boolean = false): DataFrame = {
    val in = if (watermark) ev.withWatermark("ts", "10 minutes") else ev
    in.groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("ws"), col("cnt"))
  }

  /** Sliding 1 h / 15 min average value. */
  def slidingAvg(ev: DataFrame, watermark: Boolean = false): DataFrame = {
    val in = if (watermark) ev.withWatermark("ts", "10 minutes") else ev
    in.groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg((sum(col("value").cast("decimal(18,2)")).cast("double")
        / count(lit(1))).as("avg_value"))
      .select(col("w.start").as("ws"), col("avg_value"))
  }

  /** Per-user session windows, 30-minute gap. */
  def sessionCounts(ev: DataFrame, watermark: Boolean = false): DataFrame = {
    val in = if (watermark) ev.withWatermark("ts", "10 minutes") else ev
    in.groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), col("w.start").as("session_start"), col("cnt"))
  }

  /** Streaming dedup by event_id; state expires past the watermark. */
  def dedupWithinWatermark(ev: DataFrame): DataFrame =
    ev.withWatermark("ts", "10 minutes").dropDuplicates("event_id")

  /** Custom arbitrary state via flatMapGroupsWithState: per-user running
    * event count + high-water timestamp, emitted on every update. This is
    * the join/merge state-machine shape of the reference's pending-read
    * scheduler (reference region/pending.go:267-360): per-key state that
    * in-flight arrivals merge into, with timeout-based reclamation.
    */
  def runningUserStats(ev: DataFrame): org.apache.spark.sql.Dataset[UserStat] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = ev.sparkSession
    import spark.implicits._
    ev.selectExpr("user_id", "CAST(ts AS LONG) AS ts_s")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserStat, UserStat](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)],
         state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(user, 0L, Long.MinValue))
          val batch = rows.toSeq
          val next = UserStat(user,
            prev.n + batch.size,
            math.max(prev.maxTs, if (batch.isEmpty) Long.MinValue else batch.map(_._2).max))
          state.update(next)
          Iterator.single(next)
      }
  }
}

/** Per-user streaming state: event count + max event-time seconds. */
case class UserStat(user_id: Long, n: Long, maxTs: Long)
