package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor similarity search over embedding columns.
  *
  * Baseline: brute-force cosine top-k (broadcast the query side — correct
  * reference answer, O(|Q|·|C|) but map-only and codegen'd).
  * Scale path: random-hyperplane LSH bucketing with multiprobe — candidates
  * only within matching buckets, then exact re-rank. At 10^12 rows the
  * bucketed variant turns a cross join into a bucket-key equi-join.
  */
object Similarity {

  /** Dot product of two array<double> columns — native Catalyst
    * expression (graft.functions.VecDot): the equivalent
    * aggregate(zip_with(...)) HOF chain is interpreted per element, which
    * dominates all-pairs similarity stages (|pairs| x dim evaluations);
    * the native loop is codegen'd and allocation-free with the same
    * left-to-right accumulation order (bit-identical results). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VecDot.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine with the norms supplied as pre-computed per-row columns —
    * bit-identical to `cosine` (same sqrt values, computed once per row
    * instead of once per PAIR; there is no cross-join CSE in Catalyst). */
  def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * greatest(nb, lit(1e-12)))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * greatest(norm(b), lit(1e-12)))

  /** Deterministic pseudo-random hyperplane component j of plane p:
    * uniform in [-1, 1) derived from xxhash64 — same family as the data
    * generator, reproducible at any parallelism. The coefficients are
    * row-invariant, so they're folded ONCE at plan-build time by
    * evaluating the same Catalyst expressions driver-side (identical
    * values to the previous per-row evaluation). */
  private def planeCoeff(p: Int, j: Int): Column =
    (pmod(xxhash64(lit("plane"), lit(p), lit(j)), lit(2000000L))
      .cast("double") / 1000000.0) - 1.0

  private val planeCache =
    scala.collection.concurrent.TrieMap.empty[(Int, Int), Seq[Seq[Double]]]

  def planeMatrix(dim: Int, nPlanes: Int): Seq[Seq[Double]] =
    planeCache.getOrElseUpdate((dim, nPlanes), {
      // one single-row driver-side select folds all coefficients through
      // the normal analyzer (constant expressions; no data read)
      val spark = org.apache.spark.sql.SparkSession.active
      val cols = for (p <- 0 until nPlanes; j <- 0 until dim)
        yield planeCoeff(p, j)
      val row = spark.range(1).select(cols: _*).head()
      Seq.tabulate(nPlanes, dim)((p, j) => row.getDouble(p * dim + j))
    })

  /** Sign-bit signature across nPlanes hyperplanes -> long bucket id
    * (native expression; one primitive loop per row in codegen). */
  def hyperplaneSig(v: Column, dim: Int, nPlanes: Int): Column =
    graft.functions.HyperplaneSig.sig(v, planeMatrix(dim, nPlanes))

  /** Brute-force cosine top-k: for each query vector, the k most similar
    * corpus vectors (excluding itself when ids collide). Queries are
    * broadcast; corpus streams — one map stage + one window top-k. */
  def cosineTopK(
      queries: DataFrame, // (qid, qv: array<double>)
      corpus: DataFrame,  // (cid, cv: array<double>)
      k: Int): DataFrame = {
    val scored = corpus.withColumn("__cn", norm(col("cv")))
      .crossJoin(broadcast(queries.withColumn("__qn", norm(col("qv")))))
      .where(col("qid") =!= col("cid"))
      .withColumn("score",
        cosinePre(col("qv"), col("cv"), col("__qn"), col("__cn")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(round(col("score"), 6).desc, col("cid").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("qid"), col("rk"), col("cid"), round(col("score"), 6).as("score"))
  }

  /** LSH-bucketed ANN top-k: candidates share a hyperplane bucket with the
    * query, exact re-rank inside candidates. `probes` controls multiprobe
    * depth: 0 = exact bucket only, 1 = +1-bit flips, 2 = +2-bit flips
    * (sign bits near the decision boundary are the usual LSH error — on
    * near-uniform random embeddings 2-bit probing roughly doubles recall).
    * Recall < 1 by construction; use for the scale path. */
  def annTopK(
      queries: DataFrame, // (qid, qv)
      corpus: DataFrame,  // (cid, cv)
      dim: Int,
      k: Int,
      nPlanes: Int = 8,
      probes: Int = 2): DataFrame = {
    val cs = corpus.withColumn("bucket", hyperplaneSig(col("cv"), dim, nPlanes))
    val flips: Seq[Long] = Seq(0L) ++
      (if (probes >= 1) (0 until nPlanes).map(p => 1L << p) else Nil) ++
      (if (probes >= 2)
        (for (a <- 0 until nPlanes; b <- (a + 1) until nPlanes)
          yield (1L << a) | (1L << b))
      else Nil)
    val qs = queries.withColumn("bucket0", hyperplaneSig(col("qv"), dim, nPlanes))
      .withColumn("bucket",
        explode(array(flips.map(f => col("bucket0").bitwiseXOR(lit(f))): _*)))
      .drop("bucket0")
    val scored = qs.withColumn("__qn", norm(col("qv")))
      .join(cs.withColumn("__cn", norm(col("cv"))), Seq("bucket"))
      .where(col("qid") =!= col("cid"))
      .withColumn("score",
        cosinePre(col("qv"), col("cv"), col("__qn"), col("__cn")))
      .dropDuplicates("qid", "cid")
    val w = Window.partitionBy(col("qid"))
      .orderBy(round(col("score"), 6).desc, col("cid").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("qid"), col("rk"), col("cid"), round(col("score"), 6).as("score"))
  }

  /** IVF (inverted-file) ANN top-k — the other classic scale path next to
    * hyperplane LSH. Centroids are a deterministic corpus sample (lowest
    * xxhash64(cid): reproducible at any parallelism, no iterative k-means
    * job); every corpus vector is assigned to its nearest centroid in ONE
    * broadcast map stage (the inverted lists); each query probes its
    * `nProbe` nearest centroids and re-ranks exactly inside those lists.
    * At 10^12 rows: the centroid table stays driver-small (√N-ish), the
    * assignment is map-only, and the candidate join is an equi-join on
    * centroid_id — candidates ≈ nProbe/nCentroids of the corpus instead
    * of a cross join. Recall < 1 by construction (cell-boundary misses). */
  def ivfTopK(
      queries: DataFrame, // (qid, qv)
      corpus: DataFrame,  // (cid, cv)
      k: Int,
      nCentroids: Int = 64,
      nProbe: Int = 4): DataFrame = {
    val cents = corpus
      .withColumn("__h", xxhash64(col("cid")))
      .orderBy(col("__h"), col("cid")).limit(nCentroids)
      .select(col("cid").as("centroid_id"), col("cv").as("centv"))
      .withColumn("__centn", norm(col("centv")))
    def nearest(df: DataFrame, vCol: String, idCol: String, take: Int) = {
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("__cs").desc, col("centroid_id").asc)
      df.withColumn("__vn", norm(col(vCol)))
        .crossJoin(broadcast(cents))
        .withColumn("__cs",
          cosinePre(col(vCol), col("centv"), col("__vn"), col("__centn")))
        .withColumn("__rk", row_number().over(w))
        .where(col("__rk") <= take)
        .drop("centv", "__centn", "__cs", "__rk", "__vn")
    }
    val lists = nearest(corpus, "cv", "cid", 1) // inverted lists
      .withColumn("__cn", norm(col("cv")))
    val probed = nearest(queries, "qv", "qid", nProbe)
      .withColumn("__qn", norm(col("qv")))
    val scored = probed.join(lists, Seq("centroid_id"))
      .where(col("qid") =!= col("cid"))
      .withColumn("score",
        cosinePre(col("qv"), col("cv"), col("__qn"), col("__cn")))
      .dropDuplicates("qid", "cid")
    val w = Window.partitionBy(col("qid"))
      .orderBy(round(col("score"), 6).desc, col("cid").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("qid"), col("rk"), col("cid"), round(col("score"), 6).as("score"))
  }
}
