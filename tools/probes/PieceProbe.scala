package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Binary-search the as-of pipeline cost at one core count. */
object PieceProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/graft_bench_seqs_sf0.1_seed42")
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("GRAFT_LOCAL_DIR", "/tmp"))
      .config("spark.shuffle.compress", sys.env.getOrElse("GRAFT_SHUF_COMPRESS", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](l: String)(f: => A): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"[piece] $l run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val seqs = spark.read.parquet(path)
    val feats = seqs
      .select(col("doc_id"), posexplode(graft.functions.FrameAgg.energy(col("tokens"), 8, 16)))
      .select(col("doc_id"), (col("pos") * 8000000L).as("ts"), col("col").as("fv"))
    time("explode-count")(feats.agg(count(lit(1)), sum("fv")).collect())
    time("explode-shuffle")(feats.repartition(col("doc_id"))
      .agg(count(lit(1)), sum("fv")).collect())
    val w = Window.partitionBy("doc_id").orderBy("ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    time("explode-window-last")(feats
      .withColumn("lv", last("fv", ignoreNulls = true).over(w))
      .agg(count(lit(1)), sum("lv")).collect())
    time("explode-window-plain")(feats
      .withColumn("lv", sum("fv").over(w))
      .agg(count(lit(1)), sum("lv")).collect())
    val queries = seqs
      .select(col("doc_id"), col("n_tok"),
        explode(sequence(lit(0), lit(3))).as("k"))
      .select(col("doc_id"),
        pmod(abs(xxhash64(col("doc_id"), col("k"))),
          greatest(col("n_tok").cast("long"), lit(1L)) * 1000000L).as("ts"))
    time("full-asof")(graft.engine.Pipelines.runAndChecksum(
      graft.operators.AsOf.join(queries, feats, "doc_id", "ts", Seq("fv"))))
    spark.stop()
  }
}
