package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object NativeRepro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val seqs = graft.sources.SequenceGen.generate(spark, 100).toDF()
    val pipe = graft.engine.Pipelines.asofFeaturePipelineNativeOver(seqs)
    val agg = pipe.agg(count(lit(1)), count(col("fv")), sum(col("fv")))
    println("=== OPTIMIZED ===")
    println(agg.queryExecution.optimizedPlan.treeString)
    try { println(agg.collect().mkString) }
    catch { case e: Throwable => println("EXEC FAIL: " + e.getMessage) }
    spark.stop()
  }
}
