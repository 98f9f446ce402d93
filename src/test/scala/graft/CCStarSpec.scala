package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Large-star/small-star connected components (VERDICT r4 #6): same
  * output contract as the min-label path, different scaling shape.
  * Equivalence is property-tested on seeded random pair graphs (the two
  * implementations share no code beyond Checkpointing) and the
  * round-count bound is pinned on the adversarial chain graph — the
  * shape where min-label's per-round full-label double-join is the
  * bottleneck the star alternation exists to avoid. */
class CCStarSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("node").cast("long"), col("cluster").cast("long"))
      .as[(Long, Long)].collect().toSet

  test("star CC equals min-label CC on seeded random pair graphs") {
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      // ids deliberately non-contiguous: min-of-component must be an id
      // comparison, not a position artifact
      val ids = (0 until n).map(i => i * 13L + (i % 5))
      val edges = (0 until 80).map { _ =>
        val a = ids(rnd.nextInt(n)); val b = ids(rnd.nextInt(n))
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val pairs = edges.toDF("id_a", "id_b")
      val minLabel = labelsOf(Dedup.connectedComponents(pairs, "id_a", "id_b"))
      val star = labelsOf(Dedup.connectedComponentsStar(pairs, "id_a", "id_b"))
      assert(star == minLabel, s"seed $seed: star != min-label")
      // every cluster label is the component minimum = a member of its
      // own cluster with label == itself
      assert(star.map(_._2).forall(c => star.contains((c, c))), s"seed $seed")
    }
  }

  test("star CC on a 256-node chain: correct and within the round bound") {
    val n = 256
    val pairs = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = Dedup.starRounds(pairs, "id_a", "id_b", maxIter = 30)
    val got = labelsOf(labels)
    assert(got == (0L until n.toLong).map(i => (i, 0L)).toSet)
    info(s"chain($n) converged in $rounds star rounds")
    // Kiveris et al. bound is O(log^2 n) rounds; empirically a chain of
    // 256 resolves in far fewer. Pin a bound that a regression to
    // per-hop propagation (O(n) rounds) cannot meet.
    assert(rounds <= 16, s"chain($n) took $rounds rounds")
  }

  test("star CC handles string ids (lexicographic minima)") {
    val pairs = Seq(("b", "c"), ("a", "b"), ("x", "y")).toDF("id_a", "id_b")
    val star = Dedup.connectedComponentsStar(pairs, "id_a", "id_b")
      .as[(String, String)].collect().toSet
    assert(star == Set(("a", "a"), ("b", "a"), ("c", "a"),
      ("x", "x"), ("y", "x")))
  }

  test("star CC empty pair table -> empty labels") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponentsStar(pairs, "id_a", "id_b").count() == 0L)
  }

  test("local union-find fast path equals the distributed min-label loop") {
    for (seed <- Seq(3, 11, 99)) {
      val rnd = new scala.util.Random(seed)
      val n = 80
      val ids = (0 until n).map(i => i * 17L + (i % 7))
      val edges = (0 until 120).map { _ =>
        (ids(rnd.nextInt(n)), ids(rnd.nextInt(n)))
      }.distinct
      val pairs = edges.toDF("id_a", "id_b")
      // default conf: small integral graph takes the driver fast path
      val local = labelsOf(Dedup.connectedComponents(pairs, "id_a", "id_b"))
      val dist = labelsOf(
        Dedup.connectedComponentsDistributed(pairs, "id_a", "id_b"))
      assert(local == dist, s"seed $seed: fast path != distributed")
    }
  }

  test("local fast path preserves integer id types") {
    val pairs = Seq((5, 9), (9, 2), (30, 40)).toDF("id_a", "id_b") // IntegerType
    val out = Dedup.connectedComponents(pairs, "id_a", "id_b")
    assert(out.schema("node").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(out.schema("cluster").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val got = out.as[(Int, Int)].collect().toSet
    assert(got == Set((2, 2), (5, 2), (9, 2), (30, 30), (40, 30)))
  }

  test("localEdgeLimit=0 disables the fast path (conf escape hatch)") {
    spark.conf.set(Dedup.LocalEdgeLimitKey, "0")
    try {
      val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
      val got = labelsOf(Dedup.connectedComponents(pairs, "id_a", "id_b"))
      assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L)))
    } finally spark.conf.unset(Dedup.LocalEdgeLimitKey)
  }

  test("star convergence signature: second fold catches first-fold collisions") {
    // Craft two DIFFERENT 2-edge multisets whose (count, sum hash(x,y))
    // agree — a birthday search over murmur3 pair hashes — and assert the
    // second fold (sum hash(y,x)) separates them: the exact silent-
    // convergence hazard VERDICT r5 #2 describes cannot slip past the
    // two-fold signature.
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
    def h(x: Long, y: Long): Long =
      Murmur3Hash(Seq(Literal(x), Literal(y)), 42).eval(null)
        .asInstanceOf[Int].toLong
    val cands = (0L until 2000L).map(i => (i + 1000L, i)) // canonical (hi, lo)
    val sums = scala.collection.mutable.HashMap.empty[Long, (Int, Int)]
    var found: Option[((Long, Long), (Long, Long), (Long, Long), (Long, Long))] = None
    var i = 0
    while (found.isEmpty && i < cands.length) {
      var j = i + 1
      while (found.isEmpty && j < cands.length) {
        val s = h(cands(i)._1, cands(i)._2) + h(cands(j)._1, cands(j)._2)
        sums.get(s) match {
          case Some((pi, pj)) if pi != i && pj != i && pi != j && pj != j =>
            found = Some((cands(pi), cands(pj), cands(i), cands(j)))
          case None => sums(s) = (i, j)
          case _ => ()
        }
        j += 1
      }
      i += 1
    }
    val (e1, e2, e3, e4) = found.getOrElse(
      fail("no first-fold collision found in the search space"))
    // first fold collides by construction...
    assert(h(e1._1, e1._2) + h(e2._1, e2._2) == h(e3._1, e3._2) + h(e4._1, e4._2))
    // ...the reversed-argument fold separates the multisets
    assert(h(e1._2, e1._1) + h(e2._2, e2._1) != h(e3._2, e3._1) + h(e4._2, e4._1),
      s"two-fold signature failed to separate $e1,$e2 from $e3,$e4")
  }
}
