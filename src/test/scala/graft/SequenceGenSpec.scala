package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.SequenceGen

class SequenceGenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("generator is deterministic and parallelism-invariant") {
    val a = SequenceGen.generate(spark, 50, seed = 42L)
      .orderBy("doc_id").collect()
    val b = SequenceGen.generate(spark, 50, seed = 42L)
      .repartition(13).orderBy("doc_id").collect()
    assert(a.length == 50 && b.length == 50)
    a.zip(b).foreach { case (x, y) =>
      assert(x.doc_id == y.doc_id)
      assert(x.tokens.sameElements(y.tokens), s"tokens differ for ${x.doc_id}")
      assert(x.n_tok == y.n_tok && x.source == y.source)
    }
  }

  test("n_tok always equals tokens length; tokens in vocab or marker") {
    val rows = SequenceGen.generate(spark, 100, vocab = 1000, seed = 1L).collect()
    rows.foreach { r =>
      assert(r.tokens.length == r.n_tok, r.doc_id)
      assert(r.tokens.forall(t => (t >= 0 && t < 1000) || t == SequenceGen.ClickToken))
    }
  }

  test("special docs: silence is constant, clicks docs have 3 and 6 markers") {
    val rows = SequenceGen.generate(spark, 10, maxLen = 512, seed = 42L)
      .collect().map(r => r.doc_id -> r).toMap
    val silence = rows("doc_0000000000")
    assert(silence.tokens.forall(_ == 0))
    val c3 = rows("doc_0000000001")
    assert(c3.tokens.count(_ == SequenceGen.ClickToken) == 3)
    val c6 = rows("doc_0000000002")
    assert(c6.tokens.count(_ == SequenceGen.ClickToken) == 6)
    // hot-skew doc is much longer than the others
    val hot = rows("doc_0000000003")
    assert(hot.n_tok > 4 * 512)
  }

  test("feature/query timelines are deterministic and keyed per doc") {
    val f = SequenceGen.featureTimeline(spark, 5, 10)
    assert(f.count() > 0)
    assert(f.groupBy("doc_id", "ts").count().where(col("count") > 1).count() == 0)
  }
}
