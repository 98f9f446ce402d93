package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch timer for the similarity queries (not part of the engine
  * surface): q33 exact all-pairs cosine + q17/q28 at a given SF dir. */
object VecProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[vecprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }
    for (rep <- 1 to 2) {
      time(s"q33_embed_dup rep$rep")(
        println("rows=" + graft.engine.Queries3.q33EmbedDup(spark, dir).count()))
      time(s"q17_cosine_topk rep$rep")(
        println("rows=" + graft.engine.Queries2.all("q17_cosine_topk")(spark, dir).count()))
      time(s"q28_ann_topk rep$rep")(
        println("rows=" + graft.engine.Queries3.q28AnnTopK(spark, dir).count()))
      time(s"q15_ngram_jaccard rep$rep")(
        println("rows=" + graft.engine.Queries2.all("q15_ngram_jaccard")(spark, dir).count()))
      time(s"q35_dedup_clusters rep$rep")(
        println("rows=" + graft.engine.Queries3.q35DedupClusters(spark, dir).count()))
    }
    spark.stop()
  }
}
