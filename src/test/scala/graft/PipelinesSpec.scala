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
