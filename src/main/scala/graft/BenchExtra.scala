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
  * `time` measures df.count() — DELIBERATELY the frozen bench's own
  * per-gate action, so numbers are comparable to BENCH/metrics.json.
  * count() lets Catalyst prune unconsumed projections, so for absolute
  * full-column cost use `noop` (guide §1.4), which computes every
  * column of every row.
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
      case "headline" =>
        // phase decomposition of the headline as-of pipeline at a given
        // core count: scan ceiling, features-only, queries-only, full
        // native join — all noop-sink (guide §1.4) over the SAME
        // materialized parquet the bench uses
        import org.apache.spark.sql.functions._
        val nDocs = args.lift(1).map(_.toLong).getOrElse(400000L)
        val reps = args.lift(2).map(_.toInt).getOrElse(2)
        val seqPath = s"/tmp/graft_bench_seqs_n${nDocs}_seed42"
        if (!new java.io.File(s"$seqPath/_SUCCESS").exists()) {
          graft.sources.SequenceGen.generate(spark, nDocs)
            .repartition(64).write.mode("overwrite").parquet(seqPath)
        }
        val seqs = spark.read.parquet(seqPath)
        // warm page cache on the bulk column
        seqs.agg(sum(size(col("tokens")))).collect()
        def phase(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
          val ts = (1 to reps).map { _ =>
            time(df.write.format("noop").mode("overwrite").save())
          }
          println(f"""{"phase":"$name%s","cpus":$cpus,"min_sec":${ts.min}%.3f,"samples":${ts.map(t => f"$t%.3f").mkString("[", ",", "]")}%s}""")
        }
        phase("scan_tokens")(seqs.select(col("doc_id"), col("tokens")))
        phase("features")(seqs
          .withColumn("df", graft.functions.FrameAgg.energy(col("tokens"), 8, 16))
          .select(col("doc_id"), posexplode(col("df")))
          .select(col("doc_id"), (col("pos") * 8000000L).as("ts"),
            col("col").as("fv")))
        phase("queries")(seqs
          .select(col("doc_id"), col("n_tok"),
            explode(sequence(lit(0), lit(3))).as("k"))
          .select(col("doc_id"),
            pmod(abs(xxhash64(col("doc_id"), col("k"))),
              greatest(col("n_tok").cast("long"), lit(1L)) * 1000000L).as("ts")))
        phase("full_native")(
          graft.engine.Pipelines.asofFeaturePipelineNativeOver(seqs))
      case "explainHeadline" =>
        val outPath = args.lift(1).getOrElse("plans/r06/headline_native.txt")
        val seqPath = "/tmp/graft_bench_seqs_n400000_seed42"
        val seqs = spark.read.parquet(seqPath)
        val df = graft.engine.Pipelines.asofFeaturePipelineNativeOver(seqs)
        new java.io.File(outPath).getParentFile.mkdirs()
        val w = new java.io.PrintWriter(outPath)
        try w.println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)) finally w.close()
        println(s"wrote $outPath")
      case other =>
        System.err.println(s"unknown mode $other")
        sys.exit(2)
    }
    spark.stop()
  }
}
