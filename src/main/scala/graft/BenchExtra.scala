package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Auxiliary measurement harness for the optimization rounds (guide §1.4):
  * per-query isolation with the noop sink, formatted-plan capture, and
  * ad-hoc phase probes. SEPARATE from graft.Bench on purpose — the
  * driver-contract bench is frozen; numbers from here are cited in
  * OPTIMIZATION_r*.md, never in BENCH/metrics.json.
  *
  * Usage:
  *   runMain graft.BenchExtra time  <query[,query...]> [tries]
  *   runMain graft.BenchExtra noop  <query[,query...]> [tries]
  *   runMain graft.BenchExtra explain <query[,query...]> <outDir>
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32) — same contract as graft.Bench.
  */
object BenchExtra {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-benchextra-$cores")
      .config("spark.sql.shuffle.partitions", math.max(cores, 4))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.shuffle.file.buffer", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val mode = args.headOption.getOrElse("time")
    val names: Seq[String] = args.lift(1) match {
      case Some("all") | None => SparkEntry.queries.keys.toSeq.sorted
      case Some(csv) => csv.split(",").toSeq
    }
    val spark = session(cpus)
    spark.sparkContext.setJobDescription(s"benchextra $mode")
    mode match {
      case "time" | "noop" =>
        val tries = args.lift(2).map(_.toInt).getOrElse(2)
        names.foreach { name =>
          val fn = SparkEntry.queries(name)
          val ts = (1 to tries).map { _ =>
            time {
              val df = fn(spark, sfDir)
              if (mode == "noop")
                df.write.format("noop").mode("overwrite").save()
              else df.count()
            }
          }
          println(f"""{"query":"$name%s","mode":"$mode%s","min_sec":${ts.min}%.3f,"samples":${ts.map(t => f"$t%.3f").mkString("[", ",", "]")}%s}""")
        }
      case "explain" =>
        val outDir = args.lift(2).getOrElse("plans/r06")
        new java.io.File(outDir).mkdirs()
        names.foreach { name =>
          val df = SparkEntry.queries(name)(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val w = new java.io.PrintWriter(s"$outDir/$name.txt")
          try w.println(plan) finally w.close()
          println(s"wrote $outDir/$name.txt")
        }
      case other =>
        System.err.println(s"unknown mode $other")
        sys.exit(2)
    }
    spark.stop()
  }
}
