package graft.tools

import org.apache.spark.sql.SparkSession

/** Materialize the deterministic benchmark sequences table. */
object GenTable {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(400000L)
    val path = if (args.length > 1) args(1)
      else s"/tmp/graft_bench_seqs_n${n}_seed42"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.SequenceGen.generate(spark, n)
      .repartition(64)
      .write.mode("overwrite").parquet(path)
    println(s"[gen] wrote $path")
    spark.stop()
  }
}
