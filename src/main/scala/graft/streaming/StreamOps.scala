package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface: the reference is strictly batch
  * (per-file loop, /root/reference/runner/main.cpp:1168-1196), but its
  * incremental block loop + end-of-stream flush (getRemainingFeatures,
  * FeatureExtractionManager.cpp:983-989) maps naturally onto streaming
  * state with a final flush (SURVEY.md §2.8). This module provides the
  * streaming analog of the batch operators:
  *
  *   - tumbling/sliding windowed aggregation with watermarking
  *   - gap-based sessionization via flatMapGroupsWithState (the stateful
  *     generalization of Windows.sessionize)
  */
object StreamOps {

  case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, session_start: Long, session_end: Long,
      n_events: Long, sum_value: Double)

  case class Tagged(user_id: Long, ts: Long, tag: Int, value: Double)
  case class CarryState(featureTs: Long, featureValue: Double)
  case class AsOfOut(user_id: Long, ts: Long, matched_ts: Option[Long],
      feature_value: Option[Double])

  /** Streaming as-of join (the J2 centerpiece as a stateful stream): one
    * unioned stream of tagged rows per entity — tag 0 = feature, tag 1 =
    * query — with per-entity state carrying ONLY the latest feature row
    * (O(1) state per key, the same property as the batch AsOfJoinExec).
    * Each query emits the latest feature with feature.ts <= query.ts;
    * within a micro-batch rows are processed in (ts, tag) order so a
    * feature at ts t is visible to a query at the same t (inclusive
    * as-of) and never to an earlier one (zero leakage). The carry
    * persists across micro-batches, which is exactly the
    * getRemainingFeatures-style continuity of the reference's block
    * loop. Late data beyond the in-order-per-entity assumption is the
    * caller's watermark decision, as with any streaming join. */
  def asofStream(tagged: Dataset[Tagged]): Dataset[AsOfOut] = {
    import tagged.sparkSession.implicits._
    tagged
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[Tagged], state: GroupState[CarryState]) => {
          var carry = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[AsOfOut]
          rows.toSeq.sortBy(r => (r.ts, r.tag)).foreach { r =>
            if (r.tag == 0) {
              // a LATE feature older than the carry must not regress it —
              // the batch join would keep the newer row for future queries
              if (carry.forall(_.featureTs <= r.ts))
                carry = Some(CarryState(r.ts, r.value))
            } else out += AsOfOut(user, r.ts,
              carry.map(_.featureTs), carry.map(_.featureValue))
          }
          carry.foreach(state.update)
          out.iterator
        })
  }

  /** Watermarked sliding-window aggregation (W1 streaming analog). */
  def windowedAgg(events: DataFrame, window_ : String = "5 minutes",
      slide: String = "1 minute", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))

  /** Exact MICROSECOND event time of a Timestamp (getTime alone is
    * ms-truncated — the batch operators and the DuckDB oracle work in
    * epoch micros, so the stream must too or gap comparisons within
    * 1 ms of the boundary diverge). */
  def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000 + (ts.getNanos / 1000) % 1000

  /** Gap-based session assembly: emits a session row when `gapUs`
    * MICROSECONDS of event time pass with no event for the user —
    * µs-exact parity with the batch Windows.sessionize / q4 oracle
    * (StreamOracleSpec pins it). Event-time timeout + watermark make
    * the end-of-session flush deterministic (the getRemainingFeatures
    * flush analog); session_start/session_end are epoch micros. */
  def sessionize(events: Dataset[Event], gapUs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              SessionOut(user, s.start, s.last, s.n, s.sum)).toIterator
            state.remove()
            out
          } else {
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            rows.toSeq.sortBy(e => micros(e.ts)).foreach { e =>
              val t = micros(e.ts)
              cur match {
                case Some(s) if t - s.last > gapUs =>
                  closed ::= SessionOut(user, s.start, s.last, s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case Some(s) =>
                  cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1,
                    sum = s.sum + e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // flush when event time passes the gap with no activity;
              // the timeout API is ms — round UP so timers never fire a
              // microsecond early
              state.setTimeoutTimestamp((s.last + gapUs + 999) / 1000)
            }
            closed.reverseIterator
          }
        })
  }
}
