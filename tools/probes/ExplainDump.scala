package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val seqs = graft.sources.SequenceGen.generate(spark, 1000).toDF()
    println("==== GENERAL AS-OF PIPELINE ====")
    graft.engine.Pipelines.asofFeaturePipelineOver(seqs).explain("formatted")
    println("==== COLOCATED FAST PATH ====")
    graft.engine.Pipelines.asofColocatedPipeline(seqs).explain("formatted")
    println("==== Q1 AGG (pushdown check) ====")
    graft.engine.Queries.q1Agg(spark, "/root/testdata/sf0.001").explain("formatted")
    spark.stop()
  }
}
