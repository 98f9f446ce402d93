package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Q22Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](l: String)(f: => A): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime(); f
      println(f"[q22] $l run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s") }
    val dir = "/root/testdata/sf0.1"
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val words = d.withColumn("words", split(col("text"), " "))
    t("words-mat")(words.select(sum(length(element_at(col("words"), 1)))).collect())
    val tok = words.withColumn("tokens", transform(col("words"), w => length(w)))
    t("tokens-mat")(tok.select(sum(element_at(col("tokens"), 1))).collect())
    t("tokens-sum-all")(tok.select(sum(aggregate(col("tokens"), lit(0L), (a, x) => a + x))).collect())
    val hist0 = tok.withColumn("n_tok", size(col("tokens")))
      .withColumn("hist", graft.functions.TokenHistogram(col("tokens"), 16))
    t("hist-raw-mat")(hist0.select(sum(element_at(col("hist"), 1))).collect())
    val histN = hist0.withColumn("histn",
      transform(col("hist"), c => c.cast("double") / col("n_tok")))
    t("hist-norm-mat")(histN.select(sum(element_at(col("histn"), 1))).collect())
    val pk = graft.operators.Multiplex.peakNormalize(
      histN.select(col("doc_id"), col("histn").as("hist")), "hist")
    t("peaknorm-mat")(pk.select(sum(element_at(col("hist"), 1))).collect())
    t("peaknorm-explode")(pk.select(col("doc_id"), posexplode(col("hist"))).count())
    val buckets = spark.range(16).toDF("bucket")
    t("peaknorm-joinexplode")(pk.crossJoin(broadcast(buckets))
      .select(col("doc_id"), col("bucket"),
        element_at(col("hist"), col("bucket").cast("int") + 1).as("v")).count())
    t("peaknorm-joinexplode-sum")(pk.crossJoin(broadcast(buckets))
      .select(col("doc_id"), col("bucket"),
        element_at(col("hist"), col("bucket").cast("int") + 1).as("v"))
      .agg(sum("v")).collect())
    spark.stop()
  }
}
