package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Tagged

/** Streaming as-of vs the DUCKDB ORACLE (round-2 gap: StreamOps was
  * property-tested stream ≡ batch, but never against the oracle fixtures
  * the batch path uses). `fixtures/q2_asof_oracle_sf0001.csv` is the q2
  * oracle SQL (DuckDB ASOF LEFT JOIN over the sf0.001 events table)
  * exported verbatim; the real events fixture is replayed through
  * MemoryStream under several distinct micro-batch partitionings — each
  * must reproduce the oracle rows exactly, carry state crossing
  * micro-batch boundaries included. */
class StreamOracleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** oracle rows keyed by the (unique) (user_id, ts) of each query event:
    * -> (matched_ts, last_purchase_value). */
  private lazy val oracle: Map[(Long, Long), (Option[Long], Option[Double])] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/fixtures/q2_asof_oracle_sf0001.csv"))
    try {
      val lines = src.getLines().toList
      assert(lines.head ==
        "event_id,user_id,ts,last_purchase_value,matched_ts")
      lines.tail.map { l =>
        val c = l.split(",", -1)
        (c(1).toLong, c(2).toLong) ->
          ((if (c(4).isEmpty) None else Some(c(4).toLong)),
            (if (c(3).isEmpty) None else Some(c(3).toDouble)))
      }.toMap
    } finally src.close()
  }

  private lazy val tagged: Seq[Tagged] = {
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", unix_micros(col("ts").cast("timestamp")))
    val feats = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
      .collect().map(r => Tagged(r.getLong(0), r.getLong(1), 0, r.getDouble(2)))
    val qs = e.where(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts"))
      .collect().map(r => Tagged(r.getLong(0), r.getLong(1), 1, 0.0))
    // global (ts, tag) order: contiguous cuts of this stream preserve the
    // per-entity in-order delivery asofStream assumes
    (feats ++ qs).toSeq.sortBy(r => (r.ts, r.tag))
  }

  private var qn = 0

  /** Replay `tagged` as `nBatches` contiguous micro-batches with
    * seed-chosen cut points; return the streamed as-of output keyed like
    * the oracle. */
  private def replay(seed: Long, nBatches: Int)
      : Map[(Long, Long), (Option[Long], Option[Double])] = {
    val rnd = new scala.util.Random(seed)
    val cuts = Seq.fill(nBatches - 1)(rnd.nextInt(tagged.size)).sorted
    val batches = (Seq(0) ++ cuts ++ Seq(tagged.size)).sliding(2).map {
      case Seq(a, b) => tagged.slice(a, b)
    }.toSeq
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Tagged](spark)
    qn += 1
    val name = s"asof_stream_oracle_$qn"
    val query = StreamOps.asofStream(ms.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) { ms.addData(b); query.processAllAvailable() }
      }
      query.processAllAvailable()
    } finally query.stop()
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toMap
  }

  // --------------------------------------- windowed aggregation oracle

  /** DuckDB sliding-window oracle (5-minute windows, 1-minute slide):
    * (window_start_us, event_type) -> (count, round(sum, 6)). */
  private lazy val windowOracle: Map[(Long, String), (Long, Double)] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/fixtures/q_windows_oracle_sf0001.csv"))
    try {
      val lines = src.getLines().toList
      assert(lines.head == "ws,event_type,n,v")
      lines.tail.map { l =>
        val c = l.split(",", -1)
        (c(0).toLong, c(1)) -> ((c(2).toLong, c(3).toDouble))
      }.toMap
    } finally src.close()
  }

  test("streaming windowedAgg reproduces the DuckDB sliding-window " +
      "oracle over the real events fixture") {
    val rows = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("ts").cast("timestamp").as("ts"), col("event_type"),
        col("value"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))
      .sortBy(t => StreamOps.micros(t._1))
    val maxUs = StreamOps.micros(rows.last._1)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String, Double)](spark)
    val query = StreamOps.windowedAgg(
      ms.toDS().toDF("ts", "event_type", "value"),
      "5 minutes", "1 minute", "0 seconds")
      .select(unix_micros(col("window.start")).as("ws"), col("event_type"),
        col("n"), col("v"))
      .writeStream.format("memory").queryName("windowed_oracle")
      .outputMode("append").start()
    try {
      rows.grouped(rows.length / 3 + 1).foreach { b =>
        ms.addData(b.toSeq); query.processAllAvailable()
      }
      // advance the watermark far past every real window's end so append
      // mode flushes them (the sentinel's own windows stay pending)
      ms.addData(Seq((new java.sql.Timestamp(maxUs / 1000 + 86400000L),
        "sentinel", 0.0)))
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("windowed_oracle").collect()
      .filter(_.getString(1) != "sentinel")
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), math.rint(r.getDouble(3) * 1e6) / 1e6)))
      .toMap
    assert(got.size == windowOracle.size,
      s"${got.size} windows vs oracle ${windowOracle.size}")
    val bad = windowOracle.collect {
      case (k, v) if got.get(k) != Some(v) => (k, v, got.get(k))
    }
    assert(bad.isEmpty, s"${bad.size} window mismatches, first=${bad.headOption}")
  }

  // ------------------------------------------------ sessionize vs q4

  /** q4 oracle sessions (DuckDB gap-sessionization SQL exported
    * verbatim): multiset of (user, start_us, end_us, n, sum_rounded). */
  private lazy val sessionOracle: Set[(Long, Long, Long, Long, Double)] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/fixtures/q4_sessions_oracle_sf0001.csv"))
    try {
      val lines = src.getLines().toList
      assert(lines.head ==
        "user_id,session_start,session_end,n_events,sum_value")
      lines.tail.map { l =>
        val c = l.split(",", -1)
        (c(0).toLong, c(1).toLong, c(2).toLong, c(3).toLong, c(4).toDouble)
      }.toSet
    } finally src.close()
  }

  test("streaming sessionize reproduces the q4 DuckDB oracle (gap " +
      "sessions over the real events fixture, cross-batch state)") {
    val rows = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
        col("value"))
      .as[StreamOps.Event]
      .collect().sortBy(e => StreamOps.micros(e.ts))
    val maxUs = StreamOps.micros(rows.last.ts)
    val gap = 1800000000L
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[StreamOps.Event](spark)
    val query = StreamOps.sessionize(ms.toDS(), gapUs = gap)
      .writeStream.format("memory").queryName("session_oracle")
      .outputMode("append").start()
    try {
      // three contiguous micro-batches of the time-ordered stream
      rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { b =>
        ms.addData(b.toSeq); query.processAllAvailable()
      }
      // flush: per-user sentinels far past every session's gap advance
      // the watermark; the following wave fires the event-time timers
      def at(us: Long) = {
        val t = new java.sql.Timestamp(us / 1000)
        t.setNanos((us % 1000000).toInt * 1000)
        t
      }
      val users = rows.map(_.user_id).distinct
      ms.addData(users.map(u =>
        StreamOps.Event(u, at(maxUs + 10 * gap), 0.0)).toSeq)
      query.processAllAvailable()
      ms.addData(Seq(StreamOps.Event(users.head, at(maxUs + 20 * gap), 0.0)))
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("session_oracle").as[StreamOps.SessionOut]
      .collect()
      .filter(_.session_start <= maxUs) // exclude sentinel sessions
      .map(s => (s.user_id, s.session_start, s.session_end, s.n_events,
        math.rint(s.sum_value * 1e6) / 1e6))
      .toSet
    assert(got.size == sessionOracle.size,
      s"${got.size} sessions vs oracle ${sessionOracle.size}")
    val bad = sessionOracle.diff(got)
    assert(bad.isEmpty, s"${bad.size} oracle sessions missing, " +
      s"first=${bad.headOption}")
  }

  test("asofStream reproduces the q2 DuckDB oracle under 4 distinct " +
      "micro-batch partitionings of the real events fixture") {
    assert(oracle.size == 798) // every non-purchase event, (user,ts) unique
    // one-batch replay plus three seeded multi-batch partitionings
    val partitionings = Seq((0L, 1), (1L, 3), (2L, 7), (3L, 13))
    partitionings.foreach { case (seed, n) =>
      val got = replay(seed, n)
      assert(got.size == oracle.size,
        s"seed=$seed n=$n: ${got.size} rows vs oracle ${oracle.size}")
      val bad = oracle.collect {
        case (k, v) if got.get(k) != Some(v) => (k, v, got.get(k))
      }
      assert(bad.isEmpty,
        s"seed=$seed n=$n: ${bad.size} mismatches, first=${bad.headOption}")
    }
  }
}
