package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.Pipelines

/** Minimal scaling measurement: full pipeline only, reps, min. */
object ScaleOnly {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val cores = args(1).toInt
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores, 4))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val seqs = spark.read.parquet(path)
    Pipelines.runAndChecksum(Pipelines.asofFeaturePipeline(spark, 2000)) // warmup
    def rep(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        Pipelines.runAndChecksum(mk)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scaleonly] $label cores=$cores min=${times.min}%.2f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    val which = sys.env.getOrElse("GRAFT_WHICH", "window,native")
    if (which.contains("window")) rep("window")(Pipelines.asofFeaturePipelineOver(seqs))
    if (which.contains("native")) rep("native")(Pipelines.asofFeaturePipelineNativeOver(seqs))
    spark.stop()
  }
}
