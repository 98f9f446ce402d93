package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, Seq(3, 4, 5, 3, 4, 5, 3, 4, 5, 6, 7, 8)),
    (2L, Seq(3, 4, 5, 3, 4, 5, 3, 4, 5, 6, 7, 8)),  // exact dup of 1
    (3L, Seq(3, 4, 5, 3, 4, 5, 3, 4, 5, 6, 7, 9)),  // near dup of 1
    (4L, Seq(20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31)) // unrelated
  ).toDF("doc_id", "tokens")

  test("minhash LSH finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "tokens",
      numHashes = 16, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash pairs: identical docs at hamming 0; unrelated far") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "tokens", maxHamming = 2)
      .collect().map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Number]("hamming").longValue())).toMap
    assert(pairs((1L, 2L)) == 0L)
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("embedding dup pairs find identical vectors") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.5f, 0.2f)),
      (2L, Seq(1.0f, 0.0f, 0.5f, 0.2f)),
      (3L, Seq(-1.0f, 0.3f, -0.5f, 0.9f))).toDF("id", "emb")
    val pairs = Dedup.embeddingDupPairs(vecs, "id", "emb", dim = 4,
      nPlanes = 4, threshold = 0.99)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("banded embedding LSH recall >= single-signature recall") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // exact baseline (q33 semantics): all pairs with cosine >= 0.35
    val v = e.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("n", Similarity.norm(col("v")))
    val a = v.select(col("vec_id").as("id_a"), col("v").as("v_a"), col("n").as("n_a"))
    val b = v.select(col("vec_id").as("id_b"), col("v").as("v_b"), col("n").as("n_b"))
    val exact = a.join(broadcast(b), col("id_a") < col("id_b"))
      .where(Similarity.cosinePre(col("v_a"), col("v_b"),
        col("n_a"), col("n_b")) >= 0.35)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def lshPairs(bands: Int): Set[(Long, Long)] =
      Dedup.embeddingDupPairs(e, "vec_id", "embedding", dim = 64,
        nPlanes = 8, threshold = 0.35, bands = bands)
        .select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = lshPairs(1)
    val banded = lshPairs(3)
    // LSH never invents pairs (exact cosine verify step)
    assert(single.subsetOf(exact) && banded.subsetOf(exact))
    // any-band OR can only ADD candidates: banded is a superset and
    // strictly better recall on this fixture
    assert(single.subsetOf(banded))
    val rSingle = single.size.toDouble / exact.size
    val rBanded = banded.size.toDouble / exact.size
    assert(rBanded >= rSingle,
      s"banded recall $rBanded < single-signature $rSingle")
    assert(rBanded > rSingle,
      s"banding added no pairs on the fixture (single=$rSingle)")
  }

  test("embedding LSH caps degenerate buckets (hot-bucket skew)") {
    // 60 IDENTICAL vectors (one boilerplate bucket in every band) plus
    // two similar outliers in a normal-size bucket
    val hot = (1L to 60L).map(i => (i, Seq(1.0f, 1.0f, 1.0f, 1.0f)))
    val ok = Seq((100L, Seq(-1.0f, 0.9f, -0.8f, 0.7f)),
      (101L, Seq(-1.0f, 0.9f, -0.8f, 0.7f)))
    val vecs = (hot ++ ok).toDF("id", "emb")
    val pairs = Dedup.embeddingDupPairs(vecs, "id", "emb", dim = 4,
      nPlanes = 4, threshold = 0.99, bands = 2, maxBucket = 50)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // the 60-member bucket exceeds maxBucket=50 in every band -> its
    // |bucket|^2 = 1770 pairs are dropped; the normal bucket survives
    assert(pairs == Set((100L, 101L)), s"got ${pairs.size} pairs")
    // and without the cap the degenerate pairs WOULD appear
    val uncapped = Dedup.embeddingDupPairs(vecs, "id", "emb", dim = 4,
      nPlanes = 4, threshold = 0.99, bands = 2, maxBucket = 10000)
      .count()
    assert(uncapped == 1770L + 1L)
  }

  test("ANN top-k recall vs brute force is substantial") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val c = e.select(col("vec_id").as("cid"), col("v").as("cv"))
    val exact = Similarity.cosineTopK(q, c, 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val ann = Similarity.annTopK(q, c, dim = 64, k = 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val recall = (exact intersect ann).size.toDouble / exact.size
    assert(recall >= 0.4, s"ANN recall too low: $recall")
    // and the ANN result is always a subset of real vectors with rk<=5
    assert(ann.size <= 50)
  }

  test("IVF top-k recall vs brute force is substantial") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val c = e.select(col("vec_id").as("cid"), col("v").as("cv"))
    val exact = Similarity.cosineTopK(q, c, 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val ivf = Similarity.ivfTopK(q, c, k = 5, nCentroids = 16, nProbe = 4)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.4, s"IVF recall too low: $recall")
    assert(ivf.size <= 50)
    // determinism: same plan twice -> same rows
    val again = Similarity.ivfTopK(q, c, k = 5, nCentroids = 16, nProbe = 4)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    assert(again == ivf)
  }

  test("connected components label min-reachable id, multi-hop chains") {
    // components: chain 1-2-3-4 (diameter 3 -> needs >1 iteration),
    // pair {10,11}, and (20,21)+(21,22) triangle-free vee
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("dropNearDuplicates keeps only the cluster representative") {
    val corpus = (1L to 12L).map(i => (i, s"row$i")).toDF("id", "payload")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val kept = Dedup.dropNearDuplicates(corpus, "id", pairs)
      .select("id").as[Long].collect().toSet
    // clusters {1,2,3} and {10,11} keep 1 and 10; singletons untouched
    assert(kept == Set(1L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 12L))
  }

  test("exact dedup keeps the smallest id per duplicate group") {
    val kept = Dedup.exact(docs, Seq("tokens"), "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
  }
}
