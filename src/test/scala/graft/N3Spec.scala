package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Main, TransformSpecs}
import graft.model.{SummaryType, WindowShape}
import graft.sources.SequenceGen

/** RDF/Turtle (.n3) transform parsing — driven by VERBATIM reference
  * fixture files (the reference's primary transform format). */
class N3Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ref(p: String): String =
    Files.readString(Paths.get(s"/root/reference/tests/$p"))

  test("verbatim percussiononsets-start-and-duration.n3: params, times, sizes") {
    val specs = TransformSpecs.parseN3(
      ref("test-transforms-basic/transforms/percussiononsets-start-and-duration.n3"))
    assert(specs.size == 1)
    val t = specs.head
    assert(t.id == "transform0")
    assert(t.plugin == "graft:energy") // percussiononsets analog
    assert(t.output == "onsets")
    assert(t.stepSize == 512 && t.blockSize == 1024)
    // "PT2.0S"^^xsd:duration -> 2s in ns
    assert(t.start == 2000000000L && t.duration == 2000000000L)
    // :param0 is a bnode-identified parameter, :param1 a URI-named one
    assert(t.parameters == Map("sensitivity" -> 40.0, "threshold" -> 3.0))
  }

  test("verbatim test-summaries/detectionfunction.n3: 5 transforms, bare ints, summaries") {
    val specs = TransformSpecs.parseN3(
      ref("test-summaries/transforms/detectionfunction.n3"))
    assert(specs.map(_.id) ==
      Seq("transform0", "transform1", "transform2", "transform3", "transform4"))
    assert(specs.forall(_.plugin == "graft:energy"))
    assert(specs.map(_.summaryType) == Seq(Some(SummaryType.Mean),
      Some(SummaryType.Median), None, Some(SummaryType.Mode),
      Some(SummaryType.Mean)))
    val t4 = specs.last
    assert(t4.stepSize == 2048 && t4.blockSize == 4096) // bare int literals
    assert(specs(2).output == "onsets")
  }

  test("verbatim windowtype + sample-rate n3 variants") {
    val ham = TransformSpecs.parseN3(ref(
      "test-transforms-basic/transforms/percussiononsets-df-windowtype-hamming.n3"))
    assert(ham.head.windowType == WindowShape.Hamming)
    val sr = TransformSpecs.parseN3(ref(
      "test-transforms-basic/transforms/percussiononsets-set-sample-rate.n3"))
    assert(sr.head.sampleRate == 22050.0)
    val multi = TransformSpecs.parseN3(ref(
      "test-transforms-basic/transforms/percussiononsets-multiple-outputs.n3"))
    assert(multi.map(_.output) == Seq("onsets", "detectionfunction"))
  }

  test("RDF writer output round-trips through parseN3 (reference round-trip shape)") {
    // analog of tests/test-summaries/test-summaries.sh:75-86: extract ->
    // write RDF -> re-parse the RDF as a transform spec
    val in = Files.createTempDirectory("graftrdf").toString + "/seqs"
    SequenceGen.generate(spark, 5, seed = 9L).write.parquet(in)
    val out = Files.createTempDirectory("graftrdfout").toString + "/feat.ttl"
    val tf = Files.createTempDirectory("graftrdftf").toString + "/t.json"
    Files.writeString(Paths.get(tf),
      """[{"id": "cp", "plugin": "graft:energy", "output": "onsets",
        |  "step_size": 8, "block_size": 16,
        |  "parameters": {"sensitivity": 40.0, "threshold": 3.0}}]""".stripMargin)
    Main.run(spark, Main.parseArgs(Seq(
      "--input", in, "--transforms", tf,
      "--writer", "rdf", "--output", out, "--one-file")))
    val ttl = Files.readString(Paths.get(out))
    // graph shape: prefixes, transform node, file->signal->timeline, events
    assert(ttl.startsWith("@prefix rdf:"))
    assert(ttl.contains(":transform_cp"))
    assert(ttl.contains("a vamp:Transform ."))
    assert(ttl.contains("mo:encodes :signal_doc_0000000001"))
    assert(ttl.contains("tl:onTimeLine :signal_timeline_doc_0000000001"))
    assert(ttl.contains("vamp:computed_by :transform_cp"))
    assert("\"PT\\d+\\.\\d{9}S\"\\^\\^xsd:duration".r.findFirstIn(ttl).nonEmpty)
    // round-trip: the emitted Turtle parses back to the same spec
    val back = TransformSpecs.parseN3(ttl)
    assert(back.size == 1)
    assert(back.head.plugin == "graft:energy")
    assert(back.head.output == "onsets")
    assert(back.head.stepSize == 8 && back.head.blockSize == 16)
    assert(back.head.parameters ==
      Map("sensitivity" -> 40.0, "threshold" -> 3.0))
  }

  test("dense output writes the windowed-timeline matrix form and round-trips") {
    // the reference's dense RDF form (feature-description-example.n3:46-82):
    // tl:UniformSamplingWindowingMap + hop-unit interval + value matrix
    val in = Files.createTempDirectory("graftrdfd").toString + "/seqs"
    SequenceGen.generate(spark, 5, maxLen = 64, seed = 11L).write.parquet(in)
    val out = Files.createTempDirectory("graftrdfdout").toString + "/feat.ttl"
    val tf = Files.createTempDirectory("graftrdfdtf").toString + "/t.json"
    Files.writeString(Paths.get(tf),
      """[{"id": "fr", "plugin": "graft:histogram", "output": "grid",
        |  "step_size": 8, "block_size": 16}]""".stripMargin)
    Main.run(spark, Main.parseArgs(Seq(
      "--input", in, "--transforms", tf,
      "--writer", "rdf", "--output", out, "--one-file")))
    val ttl = Files.readString(Paths.get(out))
    // windowed-timeline graph, with the spec's real step/block/rate
    assert(ttl.contains("a tl:UniformSamplingWindowingMap"))
    assert(ttl.contains("tl:windowLength \"16\"^^xsd:int"))
    assert(ttl.contains("tl:hopSize \"8\"^^xsd:int"))
    assert(ttl.contains("tl:sampleRate \"1000\"^^xsd:int"))
    assert(ttl.contains("a tl:DiscreteTimeLine"))
    assert(ttl.contains("tl:domainTimeLine :signal_timeline_doc_0000000001"))
    // docs with only dense features still carry their signal block
    assert(ttl.contains("mo:encodes :signal_doc_0000000001"))
    // dense features are a matrix, NOT per-event rows
    assert(!ttl.contains("a tl:Instant"))
    assert(ttl.contains(":signal_doc_0000000001 af:signal_feature :feature_doc_0000000001_fr"))
    // dimensions "16 <nframes>" and a value matrix of 16*nframes numbers
    val dims = "af:dimensions \"(\\d+) (\\d+)\"".r.findFirstMatchIn(ttl).get
    assert(dims.group(1).toInt == 16)
    val nframes = dims.group(2).toInt
    assert(nframes > 0)
    val value = "af:value \"([^\"]+)\"".r.findFirstMatchIn(ttl).get.group(1)
    assert(value.split(" ").length == 16 * nframes)
    // interval measured in hops on the feature timeline
    assert(ttl.contains(s"""tl:duration "$nframes"^^xsd:int"""))
    // round-trip: the emitted Turtle still parses back to the transform
    val back = TransformSpecs.parseN3(ttl)
    assert(back.size == 1)
    assert(back.head.plugin == "graft:histogram")
    assert(back.head.output == "grid")
    assert(back.head.stepSize == 8 && back.head.blockSize == 16)
  }

  test("end-to-end CLI run from a verbatim reference .n3 file") {
    val in = Files.createTempDirectory("graftn3").toString + "/seqs"
    SequenceGen.generate(spark, 10, seed = 5L).write.parquet(in)
    val out = Files.createTempDirectory("graftn3out").toString + "/feat.csv"
    Main.run(spark, Main.parseArgs(Seq(
      "--input", in,
      "--transforms",
      "/root/reference/tests/test-as-advertised/transforms/percussiononsets-detectionfunction.n3",
      "--writer", "csv", "--output", out, "--one-file")))
    val lines = Files.readAllLines(Paths.get(out))
    assert(lines.size() > 0)
    // detectionfunction rows: doc id, 9-decimal ts, one value column
    assert(lines.get(0).matches("\"[^\"]+\",\\d+\\.\\d{9},.*"))
  }
}
