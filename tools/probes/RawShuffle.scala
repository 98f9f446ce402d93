package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Raw local-shuffle throughput microbench. */
object RawShuffle {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(4)
    val n = if (args.length > 1) args(1).toLong else 20000000L
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](l: String)(f: => A): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime(); f
      println(f"[raw] $l run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val df = spark.range(n).toDF("id")
    t("count-only")(df.agg(sum("id")).collect())
    t("shuffle")(df.repartition(cores, pmod(col("id"), lit(1000000)).cast("int"))
      .agg(sum("id")).collect())
    spark.stop()
  }
}
