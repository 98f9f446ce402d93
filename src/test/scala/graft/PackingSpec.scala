package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("greedy packing: start offsets and bins on a known layout") {
    // lengths 5,4,3,2 with binSize 6: starts 0,5,9,12 -> bins 0,0,1,2
    val df = Seq(("a", 5), ("b", 4), ("c", 3), ("d", 2))
      .toDF("doc_id", "n_tok")
    val got = Packing.packGreedy(df, "doc_id", "n_tok", 6, partitions = 3)
      .select("doc_id", "pack_start", "pack_bin")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 0L, 0L), ("b", 5L, 0L), ("c", 9L, 1L), ("d", 12L, 2L)))
  }

  test("two-stage prefix sum equals a single-partition run at any parallelism") {
    // the shared corpus generator (includes the hot-skew doc cases)
    val df = graft.sources.SequenceGen.generate(spark, 200, seed = 11L)
      .toDF().select("doc_id", "n_tok")
    def run(parts: Int) = Packing.packGreedy(df, "doc_id", "n_tok", 1000, parts)
      .select("doc_id", "pack_start", "pack_bin")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val p1 = run(1)
    assert(run(7) == p1)
    assert(run(32) == p1)
    // total stream length == sum of lengths (no gaps/overlap)
    val total = df.agg(sum("n_tok")).head().getLong(0)
    val maxEnd = Packing.packGreedy(df, "doc_id", "n_tok", 1000)
      .agg(max(col("pack_start") + col("n_tok"))).head().getLong(0)
    assert(maxEnd == total)
  }

  test("duplicate orderCol keys and negative lengths are rejected/defined") {
    // negative length -> clear failure, not silent bin corruption
    val bad = Seq(("a", 5), ("b", -1)).toDF("doc_id", "n_tok")
    val e = intercept[Exception] {
      Packing.packGreedy(bad, "doc_id", "n_tok", 10).collect()
    }
    assert(e.getMessage.contains("negative") ||
      Option(e.getCause).exists(_.getMessage.contains("negative")))
  }

  test("final plan reads the materialized prefix sums with no corpus re-shuffle") {
    val df = Seq(("a", 5), ("b", 4)).toDF("doc_id", "n_tok")
    val out = Packing.packGreedy(df, "doc_id", "n_tok", 6, partitions = 2)
    val p = out.queryExecution.executedPlan.toString
    // the one range exchange happened inside the checkpoint job; the
    // output plan must only broadcast-join the tiny offsets table
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
  }
}
