package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Tagged

/** Stream ≡ batch for the as-of join: arbitrary feature/query timelines,
  * arbitrarily CUT into micro-batches (cuts preserve global ts order, so
  * the per-entity in-order assumption holds), must produce exactly the
  * batch window-rewrite join's answer — carry state crossing micro-batch
  * boundaries included (the getRemainingFeatures-style continuity). */
object StreamAsOfProps extends Properties("streamAsof") {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(5) // each sample runs a real streaming query

  private var qn = 0

  private val gen = for {
    nf <- Gen.choose(0, 10)
    nq <- Gen.choose(1, 10)
    feats <- Gen.listOfN(nf, for {
      e <- Gen.choose(1L, 3L); t <- Gen.choose(0L, 20L)
      v <- Gen.choose(-5, 5).map(_.toDouble)
    } yield (e, t, v))
    qs <- Gen.listOfN(nq, for {
      e <- Gen.choose(1L, 3L); t <- Gen.choose(0L, 20L)
    } yield (e, t))
    cut1 <- Gen.choose(0L, 20L)
    cut2 <- Gen.choose(0L, 20L)
  } yield (feats, qs, Seq(cut1, cut2).sorted)

  property("asofStream == batch join across micro-batch cuts") =
    forAll(gen) { case (featsRaw, qsRaw, cuts) =>
      // normalize like AsOfProps: one feature per (entity, ts) (max value),
      // distinct queries — makes tie-breaking deterministic in both paths
      val feats = featsRaw.groupBy(f => (f._1, f._2))
        .map { case ((e, t), rows) => (e, t, rows.map(_._3).max) }.toList
      val qs = qsRaw.distinct

      val batch = graft.operators.AsOf.join(
        qs.toDF("user_id", "ts"),
        feats.toDF("user_id", "ts", "fv"),
        "user_id", "ts", Seq("fv"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (Option(r.get(3)).map(_.asInstanceOf[Long]),
            Option(r.get(2)).map(_.asInstanceOf[Double])))
        .toMap

      val tagged = (feats.map(f => Tagged(f._1, f._2, 0, f._3)) ++
        qs.map(q => Tagged(q._1, q._2, 1, 0.0)))
        .sortBy(r => (r.ts, r.tag))
      val batches = Seq(
        tagged.filter(_.ts <= cuts(0)),
        tagged.filter(r => r.ts > cuts(0) && r.ts <= cuts(1)),
        tagged.filter(_.ts > cuts(1)))

      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Tagged](spark)
      qn += 1
      val name = s"asof_stream_prop_$qn"
      val query = StreamOps.asofStream(ms.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b =>
          if (b.nonEmpty) { ms.addData(b); query.processAllAvailable() }
        }
        query.processAllAvailable()
      } finally query.stop()
      val got = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (Option(r.get(2)).map(_.asInstanceOf[Long]),
            Option(r.get(3)).map(_.asInstanceOf[Double])))
        .toMap
      Prop(got == batch) :| s"stream=$got batch=$batch cuts=$cuts"
    }
}
