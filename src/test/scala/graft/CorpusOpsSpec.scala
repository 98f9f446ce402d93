package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Redact, Sampling}

/** Round-5 training-pipeline operators: segment keep-first dedup, PII
  * redaction, deterministic epoch shuffle. */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------- segment dedup (q59)

  test("segment dedup keeps first global occurrence and reassembles") {
    val df = Seq(
      (1L, Seq("a", "b", "a")), // "a" at (1,0) wins; (1,2) dropped
      (2L, Seq("b", "c")),      // "b" lost to (1,1); "c" kept
      (3L, Seq("a", "b"))       // everything already seen -> empty doc
    ).toDF("doc_id", "segs")
    val got = Dedup.dedupSegmentsKeepFirst(df, "doc_id", "segs")
      .orderBy("doc_id")
      .as[(Long, Long, Seq[String])].collect().toSeq
    assert(got == Seq(
      (1L, 2L, Seq("a", "b")),
      (2L, 1L, Seq("c")),
      (3L, 0L, Seq())))
  }

  test("segment dedup passThrough exempts matching segments everywhere") {
    import org.apache.spark.sql.functions.{trim => ftrim}
    val df = Seq(
      (1L, Seq("a", "", "b")),
      (2L, Seq("", "a", "")), // both blanks survive; "a" lost to doc 1
      (3L, Seq("b", ""))      // blank survives; "b" lost
    ).toDF("doc_id", "segs")
    val got = Dedup.dedupSegmentsKeepFirst(df, "doc_id", "segs",
      passThrough = Some(s => ftrim(s) === ""))
      .orderBy("doc_id")
      .as[(Long, Long, Seq[String])].collect().toSeq
    assert(got == Seq(
      (1L, 3L, Seq("a", "", "b")),
      (2L, 2L, Seq("", "")),
      (3L, 1L, Seq(""))))
  }

  test("segment dedup drops null segments (join-back parity)") {
    // the pre-optimization equi-join-back formulation never matched null
    // segments (null != null), so they were removed; the keeper-row
    // emission pins the same behavior
    val df = Seq(
      (1L, Seq("a", null, "b")),
      (2L, Seq[String](null, null))
    ).toDF("doc_id", "segs")
    val got = Dedup.dedupSegmentsKeepFirst(df, "doc_id", "segs")
      .orderBy("doc_id")
      .as[(Long, Long, Seq[String])].collect().toSeq
    assert(got == Seq((1L, 2L, Seq("a", "b")), (2L, 0L, Seq())))
  }

  test("segment dedup within-doc repeat keeps earliest position") {
    val df = Seq((7L, Seq("x", "y", "x", "x"))).toDF("doc_id", "segs")
    val got = Dedup.dedupSegmentsKeepFirst(df, "doc_id", "segs")
      .as[(Long, Long, Seq[String])].collect().head
    assert(got == ((7L, 2L, Seq("x", "y"))))
  }

  test("segment dedup is partitioning-invariant") {
    val df = (0L until 300L).map(i =>
      (i, Seq(s"s${i % 7}", s"s${i % 11}", s"u$i"))).toDF("doc_id", "segs")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dedup.dedupSegmentsKeepFirst(d, "doc_id", "segs")
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(run(df) == run(df.repartition(13)))
  }

  test("segment dedup equals a sequential reference on random corpora") {
    val rnd = new scala.util.Random(11)
    val docs = (0L until 120L).map { id =>
      (id, Seq.fill(rnd.nextInt(6))(s"s${rnd.nextInt(12)}"))
    }
    // reference semantics: walk docs in id order, positions in order; a
    // segment survives only the first time it is EVER seen
    val seen = scala.collection.mutable.Set.empty[String]
    val expected = docs.sortBy(_._1).map { case (id, segs) =>
      val kept = segs.filter(s => seen.add(s))
      (id, kept.size.toLong, kept)
    }
    val got = Dedup.dedupSegmentsKeepFirst(
        docs.toDF("doc_id", "segs").repartition(7), "doc_id", "segs")
      .orderBy("doc_id").as[(Long, Long, Seq[String])].collect().toSeq
    assert(got == expected)
  }

  // ------------------------------------------------------- redact (q60)

  test("redact counts and replaces each rule, in order") {
    val df = Seq(
      (1L, "mail bob@site.org and carol@x.co end"),
      (2L, "server 10.0.0.1 and 192.168.1.255 up"),
      (3L, "call +1-555-123-4567 now"),
      (4L, "clean text only")
    ).toDF("doc_id", "text")
    val got = Redact.redact(df, "text")
      .select($"doc_id", $"n_email", $"n_phone", $"n_ipv4", $"n_redacted",
        $"redacted_text")
      .orderBy("doc_id")
      .as[(Long, Int, Int, Int, Int, String)].collect().toSeq
    assert(got == Seq(
      (1L, 2, 0, 0, 2, "mail <EMAIL> and <EMAIL> end"),
      (2L, 0, 0, 2, 2, "server <IP> and <IP> up"),
      (3L, 0, 1, 0, 1, "call <PHONE> now"),
      (4L, 0, 0, 0, 0, "clean text only")))
  }

  test("redact earlier rules consume their matches (email eats its host)") {
    // "11.22.33.44" inside the mail host would match the IPv4 rule, but
    // the email rule runs first and consumes the whole address; a bare
    // numeric host with no alpha TLD is NOT an email, so the IP rule
    // still catches it
    val df = Seq(
      (1L, "x user@11.22.33.44.net y"),
      (2L, "x root@10.0.0.1 y")).toDF("doc_id", "text")
    val got = Redact.redact(df, "text")
      .select($"doc_id", $"n_email", $"n_ipv4", $"redacted_text")
      .orderBy("doc_id")
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(got == Seq(
      (1L, 1, 0, "x <EMAIL> y"),
      (2L, 0, 1, "x root@<IP> y")))
  }

  test("redact rejects duplicate rule names") {
    val df = Seq((1L, "t")).toDF("doc_id", "text")
    val r = Redact.Rule("a", "x", "<A>")
    intercept[IllegalArgumentException] {
      Redact.redact(df, "text", Seq(r, r))
    }
  }

  test("redact applies to a stream unchanged (stateless map-only)") {
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val q = Redact.redact(in.toDF.toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("redact_stream")
      .outputMode("append").start()
    try {
      in.addData((1L, "a b@c.org"), (2L, "plain"))
      q.processAllAvailable()
      val got = spark.table("redact_stream").orderBy("doc_id")
        .select($"n_email", $"redacted_text")
        .as[(Int, String)].collect().toSeq
      assert(got == Seq((1, "a <EMAIL>"), (0, "plain")))
    } finally q.stop()
  }

  // ------------------------------------------------ epoch shuffle (q61)

  test("epoch shuffle is a permutation with contiguous batches") {
    val df = (0L until 1000L).toDF("doc_id")
    val got = Sampling.epochShuffle(df, "doc_id", epoch = 3L,
        batchSize = 64L)
      .select($"doc_id", $"epoch_pos", $"batch")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(_._2).sorted == (0L until 1000L))
    assert(got.forall { case (_, p, b) => b == p / 64 })
    // genuinely shuffled: not the identity order
    assert(got.sortBy(_._2).map(_._1) != (0L until 1000L).toSeq)
  }

  test("epoch shuffle is partitioning-invariant (retry-stable layout)") {
    val df = (0L until 500L).toDF("doc_id")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.epochShuffle(d, "doc_id", 1L, 100L)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(run(df) == run(df.repartition(17)))
  }

  test("different epochs draw different permutations") {
    val df = (0L until 400L).toDF("doc_id")
    def order(e: Long) = Sampling.epochShuffle(df, "doc_id", e, 64L)
      .orderBy("epoch_pos").select("doc_id")
      .as[Long].collect().toSeq
    assert(order(0L) != order(1L))
  }

  test("epoch shuffle fails loudly on negative keys") {
    val df = Seq(-1L, 2L).toDF("doc_id")
    val e = intercept[Exception] {
      Sampling.epochShuffle(df, "doc_id", 0L, 10L).collect()
    }
    assert(e.getMessage != null)
  }
}
