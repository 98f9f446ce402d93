package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.SequenceGen
import graft.engine.Pipelines

/** Scratch profiler for plan iteration (not part of the engine surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }
    val n = 10000L
    val seqs = SequenceGen.generate(spark, n)
    time("gen+count")(seqs.count())
    time("gen+count again")(seqs.count())
    time("gen sum n_tok")(seqs.toDF().agg(sum("n_tok")).collect())
    val feats = seqs.toDF()
      .withColumn("df", graft.functions.FrameAgg.energy(col("tokens"), 8, 16))
      .select(col("doc_id"), posexplode(col("df")))
    time("frame features")(feats.count())
    val pipeline = Pipelines.asofFeaturePipeline(spark, n)
    time("full pipeline")(Pipelines.runAndChecksum(pipeline))
    time("full pipeline again")(Pipelines.runAndChecksum(pipeline))
    pipeline.explain("formatted")
    spark.stop()
  }
}
