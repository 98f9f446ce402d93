package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Pipelines

/** Scaling-efficiency probe: where does p8 vs p32 lose parallelism? */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/graft_bench_seqs_sf0.1_seed42")
    val coreList = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq else Seq(8, 32)
    def session(cores: Int) = {
      val s = SparkSession.builder().master(s"local[$cores]")
        .appName(s"scaleprobe-$cores")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val run = i.taskMetrics.executorRunTime
          val gc = i.taskMetrics.jvmGCTime
          val cpu = i.taskMetrics.executorCpuTime / 1000000
          val wall = i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)
          println(f"[stage] id=${i.stageId} tasks=${i.numTasks} wall=${wall}ms run=${run}ms cpu=${cpu}ms gc=${gc}ms ${i.name.takeWhile(_ != '\n').take(60)}")
        }
      }); s
    }
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (cores <- coreList) {
      val spark = session(cores)
      val seqs = spark.read.parquet(path)
      // warmup
      Pipelines.runAndChecksum(Pipelines.asofFeaturePipeline(spark, 2000))
      val tScan = time(seqs.agg(sum(size(col("tokens")))).collect())
      val tFrame = time(seqs
        .select(col("doc_id"), graft.functions.FrameAgg.energy(col("tokens"), 8, 16).as("df"))
        .select(sum(size(col("df")))).collect())
      val tExplode = time(seqs
        .select(col("doc_id"), posexplode(graft.functions.FrameAgg.energy(col("tokens"), 8, 16)))
        .agg(count(lit(1)), sum(col("col"))).collect())
      val fulls = (1 to 3).map(_ => time(Pipelines.runAndChecksum(Pipelines.asofFeaturePipelineOver(seqs))))
      println(f"[scale] cores=$cores scan=$tScan%.2f frame=$tFrame%.2f explode=$tExplode%.2f fulls=${fulls.map(t => f"$t%.2f").mkString(",")}")
      spark.stop()
    }
  }
}
