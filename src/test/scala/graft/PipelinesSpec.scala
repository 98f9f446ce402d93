package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Pipelines
import graft.sources.SequenceGen

class PipelinesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("co-located grid as-of fast path == general sort-merge as-of") {
    val seqs = SequenceGen.generate(spark, 200, seed = 7L).toDF()
    val general = Pipelines.asofFeaturePipelineOver(seqs)
      .orderBy("doc_id", "ts").collect().map(_.toSeq).toSeq
    val colocated = Pipelines.asofColocatedPipeline(seqs)
      .orderBy("doc_id", "ts").collect().map(_.toSeq).toSeq
    assert(general.size == colocated.size)
    general.zip(colocated).foreach { case (g, c) => assert(g == c, s"$g != $c") }
  }

  test("native as-of pipeline == window-rewrite pipeline row-for-row") {
    // pins the post-exchange-explode restructure: the compact-row shuffle
    // must not change a single output row vs the window rewrite
    val seqs = SequenceGen.generate(spark, 300, seed = 11L).toDF()
    val native = Pipelines.asofFeaturePipelineNativeOver(seqs)
      .orderBy("doc_id", "ts").collect().map(_.toSeq).toSeq
    val window = Pipelines.asofFeaturePipelineOver(seqs)
      .orderBy("doc_id", "ts").collect().map(_.toSeq).toSeq
    assert(native.size == window.size)
    native.zip(window).foreach { case (n, w) => assert(n == w, s"$n != $w") }
  }

  test("pipeline is deterministic across partitioning") {
    val a = Pipelines.runAndChecksum(
      Pipelines.asofFeaturePipelineOver(
        SequenceGen.generate(spark, 500).toDF()))
    val b = Pipelines.runAndChecksum(
      Pipelines.asofFeaturePipelineOver(
        SequenceGen.generate(spark, 500).toDF().repartition(17)))
    assert(a == b)
  }
}
