package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.GraftExtensions

/** The SparkSessionExtensions surface: SQL access to the native
  * expressions and the injected as-of planner strategy. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("register exposes the native expressions to spark.sql") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(dot == 11.0)
    val ic = spark.sql(
      "SELECT intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS c")
      .head().getInt(0)
    assert(ic == 2)
    val fe = spark.sql(
      "SELECT frame_energy(array(1, 2, 3, 4), 2, 2) AS f")
      .head().getSeq[Double](0)
    assert(fe == Seq((1.0 + 4.0) / 2, (9.0 + 16.0) / 2))
    val fm = spark.sql(
      "SELECT frame_mean(array(2, 4, 6, 8), 2, 2) AS f")
      .head().getSeq[Double](0)
    assert(fm == Seq(3.0, 7.0))
    // registration is idempotent
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT vec_dot(array(1.0d), array(2.0d))")
      .head().getDouble(0) == 2.0)
  }

  test("builder-time extensions create a session with strategy + functions") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      // getOrCreate may hand back the shared session (extensions applied
      // only on a fresh one); register() covers that path, so assert on
      // whichever session we got after a defensive register.
      GraftExtensions.register(s2)
      assert(s2.sql("SELECT vec_dot(array(2.0d, 2.0d), array(3.0d, 3.0d))")
        .head().getDouble(0) == 12.0)
      assert(s2.experimental.extraStrategies
        .exists(_.isInstanceOf[graft.plans.AsOfJoinStrategy.type]))
    } finally ()
  }

  test("frame_energy rejects non-literal step/block with a clear error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT frame_energy(array(1, 2), cast(rand() * 2 as int), 2)")
        .collect()
    }
    assert(e.getMessage.contains("literal int") ||
      e.getMessage.contains("must be"), e.getMessage)
  }
}
