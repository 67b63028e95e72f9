package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming extension: a continuous diff over a keyed CDC feed.
  *
  * The reference is batch-only (SURVEY.md §2.9); this is the greenfield
  * streaming surface: state per key holds the last seen payload hash, each
  * incoming record emits '-' old / '+' new when it changes, nothing when it
  * is a no-op replay. Watermarked windowed aggregation gives the stats
  * stream.
  */
object StreamingDiff {

  case class KeyedRow(key: Long, payload: String, ts: Timestamp)
  case class DiffEvent(sign: String, key: Long, payload: String)

  /** Stateful continuous diff: flatMapGroupsWithState keyed by PK. */
  def continuousDiff(rows: Dataset[KeyedRow]): Dataset[DiffEvent] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.key)
      .flatMapGroupsWithState[String, DiffEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, it: Iterator[KeyedRow], state: GroupState[String]) =>
          // Process in event-time order within the micro-batch.
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          val out = scala.collection.mutable.ArrayBuffer.empty[DiffEvent]
          var last = state.getOption
          for (r <- sorted) {
            if (!last.contains(r.payload)) {
              last.foreach(old => out += DiffEvent("-", key, old))
              out += DiffEvent("+", key, r.payload)
              last = Some(r.payload)
            }
          }
          last.foreach(state.update)
          out.iterator
      }
  }

  /** Watermarked tumbling-window event counts (late data dropped at 10m). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
}
