package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sinks.{CsvSink, JsonSink}

class SinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val S = 1000000000L

  /** curve features like the reference curve-vsr golden. */
  private def curve = (0 until 3).map { i =>
    ("docA", "t1", (i * 0.75 * S).toLong, None: Option[Long],
      Seq((i / 10.0).toFloat), s"${i + 1} of 3")
  }.toDF("doc_id", "transform_id", "ts", "duration", "values", "label")

  private def instants = Seq(
    ("docA", "t1", 777868480L, None: Option[Long], Seq.empty[Float], ""),
    ("docA", "t1", 1648616780L, None: Option[Long], Seq.empty[Float], ""))
    .toDF("doc_id", "transform_id", "ts", "duration", "values", "label")

  test("curve layout: filename-on-change, 9-decimal seconds, g-format values") {
    val lines = CsvSink.formatFeatures(curve, CsvSink.Options())
      .orderBy("ts").select("line").as[String].collect()
    assert(lines(0) == "\"docA\",0.000000000,0,\"1 of 3\"")
    assert(lines(1) == ",0.750000000,0.1,\"2 of 3\"")
    assert(lines(2) == ",1.500000000,0.2,\"3 of 3\"")
  }

  test("instants layout: empty values and labels drop their fields") {
    val lines = CsvSink.formatFeatures(instants, CsvSink.Options())
      .orderBy("ts").select("line").as[String].collect()
    // golden shape: tests/test-transforms-basic/expected/percussiononsets.csv
    assert(lines(0) == "\"docA\",0.777868480")
    assert(lines(1) == ",1.648616780")
  }

  test("fill-ends: end = next ts, last = own ts") {
    val lines = CsvSink.formatFeatures(curve,
      CsvSink.Options(fillEnds = true, omitFilename = true))
      .orderBy("ts").select("line").as[String].collect()
    // golden shape: tests/test-csv-writer/expected/curve-vsr-fill-ends.csv
    assert(lines(0) == "0.000000000,0.750000000,0,\"1 of 3\"")
    assert(lines(2) == "1.500000000,1.500000000,0.2,\"3 of 3\"")
  }

  test("end-times converts durations to end timestamps") {
    val notes = Seq(
      ("d", "t", 0L, Some((1.75 * S).toLong), Seq(0.0f), "n1"),
      ("d", "t", S, Some((0.5 * S).toLong), Seq(0.1f), "n2"))
      .toDF("doc_id", "transform_id", "ts", "duration", "values", "label")
    val plain = CsvSink.formatFeatures(notes,
      CsvSink.Options(omitFilename = true)).orderBy("ts")
      .select("line").as[String].collect()
    assert(plain(0) == "0.000000000,1.750000000,0,\"n1\"")
    val endt = CsvSink.formatFeatures(notes,
      CsvSink.Options(endTimes = true, omitFilename = true)).orderBy("ts")
      .select("line").as[String].collect()
    // golden shape: tests/test-csv-writer/expected/notes-regions-end-times.csv
    assert(endt(0) == "0.000000000,1.750000000,0,\"n1\"")
    assert(endt(1) == "1.000000000,1.500000000,0.1,\"n2\"")
  }

  test("sample-timing prints integer positions; custom separator; digits") {
    val lines = CsvSink.formatFeatures(curve,
      CsvSink.Options(sampleTiming = true, omitFilename = true,
        separator = "@", digits = 2))
      .orderBy("ts").select("line").as[String].collect()
    assert(lines(0) == "0@0@\"1 of 3\"")
    assert(lines(1) == "750@0.10@\"2 of 3\"" || lines(1) == "750@0.1@\"2 of 3\"")
  }

  test("one-file write: ordered, single file, overwrite policy enforced") {
    val dir = Files.createTempDirectory("graftcsv").toString
    val path = s"$dir/out.csv"
    val lines = CsvSink.formatFeatures(curve, CsvSink.Options())
    CsvSink.writeOneFile(lines, path, CsvSink.Options())
    val content = Files.readAllLines(Paths.get(path))
    assert(content.size() == 3)
    assert(content.get(0).startsWith("\"docA\",0.000000000"))
    intercept[IllegalStateException] {
      CsvSink.writeOneFile(lines, path, CsvSink.Options()) // K8: refuse
    }
    CsvSink.writeOneFile(lines, path, CsvSink.Options(append = true))
    assert(Files.readAllLines(Paths.get(path)).size() == 6)
  }

  test("gFormat matches C %g in exponent range (trimmed mantissa)") {
    // C: printf("%.6g", 1e7) -> "1e+07"; Java alone keeps "1.00000e+07"
    assert(CsvSink.gFormatValue(1e7, 6) == "1e+07")
    assert(CsvSink.gFormatValue(1.2e6, 6) == "1.2e+06")
    assert(CsvSink.gFormatValue(0.00005, 6) == "5e-05")
    assert(CsvSink.gFormatValue(1234567.0, 6) == "1.23457e+06")
    assert(CsvSink.gFormatValue(0.1, 6) == "0.1")
    assert(CsvSink.gFormatValue(12345.0, 6) == "12345")
    assert(CsvSink.gFormatValue(-3.25e8, 6) == "-3.25e+08")
  }

  test("null value elements keep their column slot (no separator collapse)") {
    val df = Seq(("d", "t", 0L, None: Option[Long],
      Seq(Some(1.5f), None, Some(2.5f)), ""))
      .toDF("doc_id", "transform_id", "ts", "duration", "values", "label")
    val lines = CsvSink.formatFeatures(df, CsvSink.Options())
      .select("line").as[String].collect()
    // the middle (null) value must keep its empty slot: 1.5,,2.5
    assert(lines(0) == "\"d\",0.000000000,1.5,,2.5")
  }

  test("per-track write of >100 tracks runs O(partitions) jobs, not O(tracks)") {
    val n = 120
    val df = (0 until n).flatMap { i =>
      Seq((f"doc_$i%03d", "t1", 0L, None: Option[Long], Seq(1.0f), ""),
        (f"doc_$i%03d", "t1", S, None: Option[Long], Seq(2.0f), ""))
    }.toDF("doc_id", "transform_id", "ts", "duration", "values", "label")
    val lines = CsvSink.formatFeatures(df, CsvSink.Options())
    val out = Files.createTempDirectory("graftmany").toString
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val written = CsvSink.writePerTrack(lines, out, CsvSink.Options())
      // listener events are async; wait for the count to go stable
      var last = -1
      var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        if (jobs.get() == last) stable += 1 else { last = jobs.get(); stable = 0 }
      }
      assert(written.size == n)
      // Two actions over the persisted grouped table: the K9 name-only
      // collect (AQE adds a shuffle-stage job) plus toLocalIterator,
      // which launches ONE JOB PER PARTITION (4 here) so the driver
      // holds one file's content at a time. The regression target is
      // jobs bounded by partitions, never by track count (round 1 ran
      // one job PER PAIR: 120 tracks -> 121+ jobs).
      val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
      assert(jobs.get() <= 4 + parts,
        s"writePerTrack must be O(partitions) jobs, saw ${jobs.get()} for $n tracks")
    } finally spark.sparkContext.removeSparkListener(listener)
    val lines0 = Files.readAllLines(Paths.get(s"$out/doc_000_t1.csv"))
    assert(lines0.size() == 2)
    assert(lines0.get(0) == "\"doc_000\",0.000000000,1")
    assert(lines0.get(1) == ",1.000000000,2")
  }

  test("distributed per-track tier: executor-direct writes, no driver rows") {
    val n = 300
    val df = (0 until n).flatMap { i =>
      Seq((f"doc_$i%03d", "t1", 0L, None: Option[Long], Seq(1.0f), ""),
        (f"doc_$i%03d", "t1", S, None: Option[Long], Seq(2.0f), ""))
    }.toDF("doc_id", "transform_id", "ts", "duration", "values", "label")
    val lines = CsvSink.formatFeatures(df, CsvSink.Options())
    val out = Files.createTempDirectory("graftdist").toString
    // the tier never runs collect()/toLocalIterator on contents: count
    // driver-fetched result rows via a listener on completed jobs
    val count = CsvSink.writePerTrackDistributed(lines, out, CsvSink.Options())
    assert(count == n)
    val f0 = Files.readAllLines(Paths.get(s"$out/doc_000_t1.csv"))
    assert(f0.size() == 2)
    assert(f0.get(0) == "\"doc_000\",0.000000000,1")
    assert(f0.get(1) == ",1.000000000,2")
    assert(Files.list(Paths.get(out)).count() == n)
    // K9 pre-flight (distributed): an existing destination fails fast
    val e = intercept[IllegalStateException] {
      CsvSink.writePerTrackDistributed(lines, out, CsvSink.Options())
    }
    assert(e.getMessage.contains("exists"), e.getMessage)
    // force overwrites idempotently (task-retry model)
    assert(CsvSink.writePerTrackDistributed(lines, out,
      CsvSink.Options(force = true)) == n)
    assert(Files.readAllLines(Paths.get(s"$out/doc_299_t1.csv")).size() == 2)
  }

  test(".mid encoding round-trips through javax.sound.midi") {
    val notes = Seq(
      ("d1", "t", 0, 0L, Some(500000000L), 60, 100),
      ("d1", "t", 0, 500000000L, Some(250000000L), 64, 90),
      ("d1", "t", 1, 1000000000L, None: Option[Long], 67, 100),
      ("d2", "t", 0, 0L, Some(1000000000L), 72, 100))
      .toDF("doc_id", "transform_id", "channel", "ts", "duration",
        "pitch", "velocity")
    val out = Files.createTempDirectory("graftmidi").toString
    val written = graft.sinks.MidiSink.writeMidPerDoc(notes, out)
    assert(written.map(p => Paths.get(p).getFileName.toString).sorted ==
      Seq("d1.mid", "d2.mid"))
    val seq1 = javax.sound.midi.MidiSystem.getSequence(
      new java.io.File(s"$out/d1.mid"))
    assert(seq1.getResolution == 480) // ticks per quarter
    val msgs = (0 until seq1.getTracks()(0).size()).map(
      seq1.getTracks()(0).get(_))
    val ons = msgs.collect {
      case e if e.getMessage.isInstanceOf[javax.sound.midi.ShortMessage] &&
          e.getMessage.asInstanceOf[javax.sound.midi.ShortMessage]
            .getCommand == javax.sound.midi.ShortMessage.NOTE_ON =>
        val m = e.getMessage.asInstanceOf[javax.sound.midi.ShortMessage]
        (e.getTick, m.getChannel, m.getData1, m.getData2)
    }
    // 120 BPM, 480 tpq: 1 s = 960 ticks
    assert(ons == Seq((0L, 0, 60, 100), (480L, 0, 64, 90), (960L, 1, 67, 100)))
  }

  test("CLI --writer midi emits one parseable .mid per doc") {
    val in = Files.createTempDirectory("graftmidicli").toString + "/seqs"
    graft.sources.SequenceGen.generate(spark, 5, seed = 11L).write.parquet(in)
    val tf = Files.createTempDirectory("graftmiditf").toString + "/t.json"
    Files.writeString(Paths.get(tf),
      """[{"id": "r", "plugin": "graft:regions"}]""")
    val out = Files.createTempDirectory("graftmidiout").toString
    graft.engine.Main.run(spark, graft.engine.Main.parseArgs(Seq(
      "--input", in, "--transforms", tf, "--writer", "midi",
      "--output", out)))
    val mids = new java.io.File(out).listFiles().filter(_.getName.endsWith(".mid"))
    assert(mids.nonEmpty)
    val seq0 = javax.sound.midi.MidiSystem.getSequence(mids.head)
    assert(seq0.getResolution == 480)
  }

  test("per-track files: naming, pre-flight collision check") {
    val dir = Files.createTempDirectory("graftcsv2").toString
    val lines = CsvSink.formatFeatures(
      curve.withColumn("transform_id", lit("p:x:y")), CsvSink.Options())
    val files = CsvSink.writePerTrack(lines, dir, CsvSink.Options())
    // K8 naming: ':' -> '_'
    assert(files == Seq(s"$dir/docA_p_x_y.csv"))
    intercept[IllegalStateException] {
      CsvSink.writePerTrack(lines, dir, CsvSink.Options())
    }
  }

  test("summary rows match the reference summary CSV layout") {
    val sums = Seq(("docA", "t1", 0L, (9.75 * S).toLong, "mean",
      Seq(0.553846), "(mean value, continuous-time average)"))
      .toDF("doc_id", "transform_id", "seg_start_ns", "seg_duration_ns",
        "summary_name", "values", "label")
    val line = CsvSink.formatSummaries(sums, CsvSink.Options())
      .select("line").as[String].collect().head
    // golden shape: testplug-curve-vsr-mean.csv:20
    assert(line ==
      "\"docA\",0.000000000,9.750000000,mean,0.553846,\"(mean value, continuous-time average)\"")
  }

  test("JAMS golden matrix: full documents per output shape") {
    // the per-shape golden table mirroring the reference's
    // tests/test-jams-writer/expected/{instants,curve-fsr,notes-regions,
    // grid-oss,af-2}.json field structure: label-as-value for 0-bin
    // instants (no label key), scalar value + label for curves, 9-decimal
    // durations for notes, array value for grids, digits option honored
    import graft.model.TransformSpec
    val spec = TransformSpec(id = "t1", plugin = "graft:test", output = "out",
      stepSize = 8, blockSize = 16, sampleRate = 1000.0,
      parameters = Map("sens" -> 40.0))
    val meta = "{ \"file_metadata\": { \"jams_version\": \"0.2.0\", " +
      "\"identifiers\": { \"filename\": \"dA\" }, \"duration\": %s }, " +
      "\"annotations\": [ { \"namespace\": \"unknown\", " +
      "\"annotation_metadata\": { \"annotation_tools\": \"Graft\", " +
      "\"data_source\": \"Automatic feature extraction\", \"annotator\": " +
      "{ \"plugin_id\": \"graft:test\", \"output_id\": \"out\", " +
      "\"step_size\": 8, \"block_size\": 16, \"sample_rate\": 1000, " +
      "\"parameters\": { \"sens\": 40 }, \"transform_id\": \"t1\" } }, " +
      "\"data\": [ %s ] } ] }"
    def doc(rows: Seq[(Long, Option[Long], Seq[Float], String)]) =
      rows.map { case (ts, d, vs, l) => ("dA", "t1", ts, d, vs, l) }
        .toDF("doc_id", "transform_id", "ts", "duration", "values", "label")
    val matrix: Seq[(String, Seq[(Long, Option[Long], Seq[Float], String)], Int, String)] = Seq(
      ("instants",
        Seq((0L, None, Seq.empty[Float], "1 of 2"),
          ((15 * S) / 10, None, Seq.empty[Float], "2 of 2")), 6,
        meta.format("1.500000000",
          "{ \"time\": 0.000000000, \"duration\": 0.0, \"confidence\": 1.0, " +
            "\"value\": \"1 of 2\" }, " +
            "{ \"time\": 1.500000000, \"duration\": 0.0, \"confidence\": 1.0, " +
            "\"value\": \"2 of 2\" }")),
      ("curve",
        Seq((0L, None, Seq(0.0f), "1 of 2"), ((4 * S) / 10, None, Seq(0.1f), "2 of 2")), 6,
        meta.format("0.400000000",
          "{ \"time\": 0.000000000, \"duration\": 0.0, \"confidence\": 1.0, " +
            "\"label\": \"1 of 2\", \"value\": 0 }, " +
            "{ \"time\": 0.400000000, \"duration\": 0.0, \"confidence\": 1.0, " +
            "\"label\": \"2 of 2\", \"value\": 0.1 }")),
      ("notes-with-durations",
        Seq((0L, Some((175 * S) / 100), Seq(0.0f), "n1"),
          (1 * S, Some(S / 2), Seq(0.1f), "n2")), 6,
        meta.format("1.750000000",
          "{ \"time\": 0.000000000, \"duration\": 1.750000000, " +
            "\"confidence\": 1.0, \"label\": \"n1\", \"value\": 0 }, " +
            "{ \"time\": 1.000000000, \"duration\": 0.500000000, " +
            "\"confidence\": 1.0, \"label\": \"n2\", \"value\": 0.1 }")),
      ("grid",
        Seq((0L, None, Seq(0.0666667f, 0.1f, 0.133333f), "g1")), 6,
        meta.format("0.000000000",
          "{ \"time\": 0.000000000, \"duration\": 0.0, \"confidence\": 1.0, " +
            "\"label\": \"g1\", \"value\": [ 0.0666667, 0.1, 0.133333 ] }")),
      ("digits-2 (af-2 analog)",
        Seq((0L, None, Seq(0.00359596f), "")), 2,
        meta.format("0.000000000",
          "{ \"time\": 0.000000000, \"duration\": 0.0, \"confidence\": 1.0, " +
            "\"value\": 0.0036 }")))
    matrix.foreach { case (name, rows, digits, expected) =>
      val got = JsonSink.toJams(doc(rows), Seq(spec), digits)
        .select("jams").as[String].collect().head
      assert(got == expected, s"JAMS golden mismatch for $name:\nGOT  $got\nWANT $expected")
      // and every golden parses as JSON with the reference's key paths
      val p = org.json4s.jackson.JsonMethods.parse(got)
      assert((p \ "file_metadata" \ "jams_version") ==
        org.json4s.JString("0.2.0"), name)
      assert((p \\ "annotator" \ "plugin_id") ==
        org.json4s.JString("graft:test"), name)
    }
  }

  test("JAMS annotator emits plugin_version when the extractor exposes one") {
    import graft.model.TransformSpec
    val spec = TransformSpec(id = "t1", plugin = "graft:test", output = "out")
    // reference field order (expected/curve-fsr.json:14-17): plugin_id,
    // output_id, plugin_version, then the numeric config
    assert(JsonSink.annotatorJson(spec, Some("5")) ==
      "{ \"plugin_id\": \"graft:test\", \"output_id\": \"out\", " +
        "\"plugin_version\": \"5\", \"transform_id\": \"t1\" }")
    // absent version -> field omitted (the pre-r5 shape, goldens above)
    assert(!JsonSink.annotatorJson(spec).contains("plugin_version"))
    val feats = Seq(("dA", "t1", 0L, None: Option[Long], Seq(1.0f), ""))
      .toDF("doc_id", "transform_id", "ts", "duration", "values", "label")
    val j = JsonSink.toJams(feats, Seq(spec), versions = Map("t1" -> "5"))
      .select("jams").as[String].collect().head
    val p = org.json4s.jackson.JsonMethods.parse(j)
    assert((p \\ "annotator" \ "plugin_version") == org.json4s.JString("5"))
  }

  test("JAMS file_metadata.duration uses inputEnds when provided") {
    val feats = Seq(("dA", "t1", 0L, None: Option[Long], Seq(1.0f), ""))
      .toDF("doc_id", "transform_id", "ts", "duration", "values", "label")
    val ends = Seq(("dA", "t1", 13 * S / 2))
      .toDF("doc_id", "transform_id", "input_end_ns")
    val j = JsonSink.toJams(feats, inputEnds = Some(ends))
      .select("jams").as[String].collect().head
    assert(j.contains("\"duration\": 6.500000000"), j)
  }

  test("JAMS JSON: NaN values become strings, document is valid-ish") {
    val feats = Seq(
      ("d", "t", 0L, None: Option[Long], Seq(Float.NaN, 1.5f), "x"))
      .toDF("doc_id", "transform_id", "ts", "duration", "values", "label")
    val j = JsonSink.toJams(feats).select("jams").as[String].collect().head
    assert(j.contains("\"NaN\""))
    assert(j.contains("\"file_metadata\""))
    assert(j.contains("\"annotations\""))
    // parses back as JSON
    val parsed = org.json4s.jackson.JsonMethods.parse(j)
    assert((parsed \ "annotations") != org.json4s.JNothing)
  }
}
