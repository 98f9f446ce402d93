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
