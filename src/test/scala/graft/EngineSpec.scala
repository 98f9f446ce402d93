package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{Engine, TransformSpecs}
import graft.model.{SummaryType, TransformSpec}
import graft.sources.SequenceGen

class EngineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val seqs = SequenceGen.generate(spark, 10, maxLen = 512, seed = 42L).toDF.cache()

  test("clicks extractor finds exactly the 3 and 6 marker instants") {
    val out = Engine.run(seqs, Seq(TransformSpec(id = "t", plugin = "graft:clicks")))
      .collect()
    val byDoc = out.groupBy(_.getAs[String]("doc_id"))
    assert(byDoc("doc_0000000001").length == 3)
    assert(byDoc("doc_0000000002").length == 6)
    // positions 85, 255, 425 at 1000 pos/sec -> 85ms... in ns
    assert(byDoc("doc_0000000001").map(_.getAs[Long]("ts")).sorted.toSeq ==
      Seq(85000000L, 255000000L, 425000000L))
    assert(out.forall(_.getAs[String]("label") == "click"))
  }

  test("regions extractor RLE: silence doc is one full-length run") {
    val out = Engine.run(seqs,
      Seq(TransformSpec(id = "t", plugin = "graft:regions")))
      .where($"doc_id" === "doc_0000000000").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("ts") == 0L)
    assert(out.head.getAs[Long]("duration") == 512L * 1000000L)
    assert(out.head.getAs[scala.collection.Seq[Float]]("values").head == 0.0f)
  }

  test("plugin-instance sharing: one extraction pass serves two transforms") {
    val specs = Seq(
      TransformSpec(id = "a", plugin = "graft:energy", output = "detectionfunction"),
      TransformSpec(id = "b", plugin = "graft:energy", output = "onsets"))
    val out = Engine.run(seqs, specs)
    val ids = out.select("transform_id").distinct().as[String].collect().toSet
    assert(ids == Set("a", "b"))
    // sharing is plan-level: the physical plan scans the source once per
    // sharing group (the spec fan-out is a broadcast join, not a re-scan)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }

  test("time-range filter (start/duration) trims features") {
    val all = Engine.run(seqs, Seq(TransformSpec(id = "t", plugin = "graft:clicks")))
      .where($"doc_id" === "doc_0000000001")
    val trimmed = Engine.run(seqs, Seq(TransformSpec(id = "t",
      plugin = "graft:clicks", start = 100000000L, duration = 200000000L)))
      .where($"doc_id" === "doc_0000000001")
    assert(all.count() == 3)
    val ts = trimmed.select("ts").as[Long].collect().toSeq
    assert(ts == Seq(255000000L)) // only the click inside [0.1s, 0.3s)
  }

  test("histogram extractor: global histogram sums to 1") {
    val out = Engine.run(seqs, Seq(TransformSpec(id = "t",
      plugin = "graft:histogram", output = "global")))
      .where($"doc_id" === "doc_0000000000").collect()
    assert(out.length == 1)
    val vs = out.head.getAs[scala.collection.Seq[Float]]("values")
    assert(vs.length == 16)
    assert(math.abs(vs.map(_.toDouble).sum - 1.0) < 1e-6)
    assert(math.abs(vs.head - 1.0) < 1e-6) // silence: all tokens in bucket 0
  }

  test("engine summaries carry reference layout and labels") {
    val specs = Seq(TransformSpec(id = "m", plugin = "graft:energy",
      output = "detectionfunction", summaryType = Some(SummaryType.Mean)))
    val feats = Engine.run(seqs, specs)
    val sums = Engine.summarize(feats, specs)
      .where($"doc_id" === "doc_0000000000").collect()
    assert(sums.length == 1)
    val r = sums.head
    assert(r.getAs[String]("summary_name") == "mean")
    assert(r.getAs[String]("label") == "(mean value, continuous-time average)")
    assert(r.getAs[Long]("seg_start_ns") == 0L)
    assert(r.getAs[Long]("seg_duration_ns") > 0L)
  }

  test("P5: binCount==0 outputs are excluded from summaries, not poisoned") {
    // instants outputs (clicks) carry EMPTY value arrays — the reference
    // skips binCount==0 outputs in value-space writers/summaries rather
    // than emitting degenerate rows (AudioDBFeatureWriter binCount==0
    // skip). A mean over clicks must yield ZERO summary rows...
    val clickSpec = Seq(TransformSpec(id = "c", plugin = "graft:clicks",
      summaryType = Some(SummaryType.Mean)))
    val clickSums = Engine.summarize(Engine.run(seqs, clickSpec), clickSpec)
    assert(clickSums.count() == 0L)
    // ...and in a MIXED batch the valued transform still summarizes while
    // the instants transform contributes nothing
    val mixed = Seq(
      TransformSpec(id = "m", plugin = "graft:energy",
        output = "detectionfunction", summaryType = Some(SummaryType.Mean)),
      TransformSpec(id = "c", plugin = "graft:clicks",
        summaryType = Some(SummaryType.Mean)))
    val sums = Engine.summarize(Engine.run(seqs, mixed), mixed)
      .select($"transform_id").distinct().as[String].collect().toSet
    assert(sums == Set("m"), s"instants transform leaked into summaries: $sums")
  }

  test("multi-type summary executes the vector aggregator ONCE (no fan-out)") {
    def mk(ts: Seq[(String, SummaryType)]) = ts.map { case (id, t) =>
      TransformSpec(id = id, plugin = "graft:energy",
        output = "detectionfunction", summaryType = Some(t))
    }
    val one = mk(Seq("a" -> SummaryType.Mean))
    val three = mk(Seq("a" -> SummaryType.Mean, "b" -> SummaryType.Sum,
      "c" -> SummaryType.Variance))
    // the aggregator must appear in the SAME number of plan nodes for a
    // 3-type request as for a 1-type request: summary routing is a
    // broadcast lookup + CASE, not per-type union branches each re-running
    // the reduce-side Aggregator merge
    def aggCount(specs: Seq[TransformSpec]): Int = {
      val out = Engine.summarize(Engine.run(seqs, specs), specs)
      "vectormomentsagg".r
        .findAllIn(out.queryExecution.executedPlan.toString.toLowerCase).length
    }
    val c1 = aggCount(one)
    assert(c1 > 0)
    assert(aggCount(three) == c1)
    // and rows still route to their transform's requested type
    val out = Engine.summarize(Engine.run(seqs, three), three)
    val names = out.select("transform_id", "summary_name").distinct()
      .as[(String, String)].collect().toSet
    assert(names == Set("a" -> "mean", "b" -> "sum", "c" -> "variance"))
  }

  test("transform spec XML parses the reference format") {
    val spec = TransformSpecs.parseXml(
      """<transform id="vamp:vamp-example-plugins:percussiononsets" program=""
        |  stepSize="512" blockSize="1024" windowType="hanning"
        |  startTime="0.000000000" duration="0.000000000" sampleRate="0">
        |  <parameter name="sensitivity" value="40"/>
        |  <parameter name="threshold" value="3"/>
        |</transform>""".stripMargin)
    assert(spec.plugin == "vamp:vamp-example-plugins:percussiononsets")
    assert(spec.stepSize == 512 && spec.blockSize == 1024)
    assert(spec.parameters == Map("sensitivity" -> 40.0, "threshold" -> 3.0))
  }

  test("transform spec JSON parses multi-transform files with summaries") {
    val specs = TransformSpecs.parseJson(
      """[{"plugin": "graft:energy", "output": "detectionfunction",
        |  "summary_type": "mean"},
        | {"plugin": "graft:energy", "output": "detectionfunction",
        |  "step_size": 32, "block_size": 64, "summary_type": "median"}]""".stripMargin)
    assert(specs.length == 2)
    assert(specs.head.summaryType.contains(SummaryType.Mean))
    assert(specs(1).stepSize == 32 && specs(1).blockSize == 64)
    assert(specs.map(_.id) == Seq("transform0", "transform1"))
  }

  test("segment list parser reproduces the reference's sloppy semantics") {
    // fixture shape: tests/test-summaries/transforms/segmentlist:1-5
    val text = " \n# ignore this\n0\n# 4,\"ignore this too\"\n,9.9,15.2,\"label\",\"rest\"\n"
    val b = TransformSpecs.parseSegments(text)
    assert(b == Seq(0L, 9900000000L))
    intercept[IllegalArgumentException] {
      TransformSpecs.parseSegments("not-a-number\n")
    }
  }

  test("skeleton emits parseable default config (reference --skeleton)") {
    val sk = TransformSpecs.skeleton("graft:energy")
    val specs = TransformSpecs.parseJson(sk)
    assert(specs.head.plugin == "graft:energy")
    assert(specs.head.parameters("sensitivity") == 40.0)
    assert(Engine.list.contains("graft:energy:onsets"))
  }

  test("windowType variants change the detectionfunction (taper applied)") {
    def df(wt: String) = Engine.run(seqs, Seq(TransformSpec(id = "t",
      plugin = "graft:energy",
      windowType = graft.model.WindowShape.fromName(wt))))
      .where($"doc_id" === "doc_0000000003" && $"output" === "detectionfunction")
      .select("values").as[Seq[Float]].collect().map(_.head)
    val hann = df("hanning")
    val rect = df("rectangular")
    val default = df("unsupported-shape") // falls back to hanning like the reference
    assert(hann.toSeq == default.toSeq)
    assert(hann.toSeq != rect.toSeq)
  }

  test("W3 spectrum: native FrameSpectrum equals a naive DFT; DC bin exact") {
    import graft.engine.SpectrumExtractor
    import graft.model.WindowShape
    val toks = Array(3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3,
      2, 3, 8, 4, 6, 2, 6, 4)
    val (cre, cim) = SpectrumExtractor.dftCoefficients(WindowShape.Hanning, 16)
    val got = Seq(toks.toSeq).toDF("tokens")
      .select(graft.functions.FrameSpectrum.spectrum(
        $"tokens", 8, 16, cre, cim).as("s"))
      .as[Seq[Seq[Float]]].head()
    assert(got.length == 2) // frames at 0 and 8
    // naive reference DFT, same literals, same accumulation order
    def naive(off: Int): Seq[Float] = (0 until 9).map { k =>
      var re = 0.0; var im = 0.0
      for (j <- 0 until 16) {
        re += toks(off + j) * cre(k)(j); im += toks(off + j) * cim(k)(j)
      }
      math.sqrt(re * re + im * im).toFloat
    }
    assert(got(0) == naive(0) && got(1) == naive(8))
    // rectangular DC bin is exactly the frame sum (integer-exact doubles)
    val (rre, rim) = SpectrumExtractor.dftCoefficients(WindowShape.Rectangular, 16)
    val rect = Seq(toks.toSeq).toDF("tokens")
      .select(graft.functions.FrameSpectrum.spectrum(
        $"tokens", 8, 16, rre, rim).as("s"))
      .as[Seq[Seq[Float]]].head()
    assert(rect(0)(0) == toks.take(16).sum.toFloat)
  }

  test("W3 spectrum runs through Engine.run with ShiftData timestamps") {
    val seqs = Seq(("d1", (1 to 24).toArray.toSeq, 24, "s"))
      .toDF("doc_id", "tokens", "n_tok", "source")
    val specs = graft.engine.TransformSpecs.parseJson(
      """[{"id": "sp", "plugin": "graft:spectrum", "step_size": 8,
         |  "block_size": 16}]""".stripMargin)
    val rows = Engine.run(seqs, specs)
      .orderBy("ts").collect()
    assert(rows.length == 2) // frames at position 0 and 8
    // ShiftData: ts at block START (0 and 8 ms at the default 1000/s)
    assert(rows.map(_.getAs[Long]("ts")).toSeq == Seq(0L, 8000000L))
    assert(rows.forall(_.getAs[scala.collection.Seq[Float]]("values").size == 9))
  }
}
