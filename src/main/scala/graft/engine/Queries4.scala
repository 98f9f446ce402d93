package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.WindowShape
import graft.operators.Multiplex
import graft.sources.Tables

/** Correctness-gate queries, part 4 (round 2): oracle coverage for §2
  * rows that round 1 left unit-tested only — time-range filtering (P2),
  * taper windows (W2), manifest selection (S3), channel mixdown (P1),
  * and multi-summary one-pass routing (A3/P4). */
object Queries4 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    QueryUtil.t(s, dir, name)

  private def docsTok(s: SparkSession, dir: String): DataFrame =
    QueryUtil.docsTok(s, dir)

  private def seqsOf(s: SparkSession, dir: String): DataFrame =
    docsTok(s, dir).select(
      col("doc_id").cast("string").as("doc_id"),
      col("tokens"), col("n_tok"), col("source"))

  // --------------------------------------------------------------- q42
  /** P2 time-range filter: the q30 energy pipeline restricted to
    * start=0.016s duration=0.048s — rows must fall in [16ms, 64ms). */
  def q42TimeRange(s: SparkSession, dir: String): DataFrame = {
    val specs = TransformSpecs.parseJson(
      """[{"id": "e2e", "plugin": "graft:energy",
         |  "output": "detectionfunction", "step_size": 8,
         |  "block_size": 16, "window_type": "rectangular",
         |  "start": "0.016", "duration": "0.048"}]""".stripMargin)
    Engine.run(seqsOf(s, dir), specs)
      .select(col("doc_id"), col("ts"),
        round(element_at(col("values"), 1).cast("double"), 6).as("energy"))
      .orderBy("doc_id", "ts")
  }

  // --------------------------------------------------------------- q43
  /** W2 taper: hanning-windowed frame energy. The oracle reuses the
    * ENGINE-computed coefficient literals (Framing.taperCoefficients
    * formatted via shortest-round-trip Double.toString), so there is no
    * cross-engine libm-cos discrepancy — only the frame arithmetic is
    * recomputed in SQL. */
  def q43TaperHanning(s: SparkSession, dir: String): DataFrame = {
    val specs = TransformSpecs.parseJson(
      """[{"id": "hann", "plugin": "graft:energy",
         |  "output": "detectionfunction", "step_size": 8,
         |  "block_size": 16, "window_type": "hanning"}]""".stripMargin)
    Engine.run(seqsOf(s, dir), specs)
      .select(col("doc_id"), col("ts"),
        round(element_at(col("values"), 1).cast("double"), 6).as("energy"))
      .orderBy("doc_id", "ts")
  }

  // --------------------------------------------------------------- q44
  /** S3 manifest/playlist selection: a manifest of every 7th doc id
    * selects the subset via broadcast left-semi join. */
  def q44Manifest(s: SparkSession, dir: String): DataFrame = {
    val docs = docsTok(s, dir)
    val manifest = docs.select(col("doc_id"))
      .where(pmod(col("doc_id"), lit(7)) === 0)
    Tables.fromManifest(docs, manifest)
      .select(col("doc_id"), col("n_tok").cast("long").as("n_tok"))
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- q45
  /** P1 channel mixdown: multiplex docs 0-3 into channels (0-padded to
    * the longest), then per-position mean across the 4 channels. */
  def q45Mixdown(s: SparkSession, dir: String): DataFrame = {
    val m = Multiplex.mixdown(
      Multiplex.multiplex(seqsOf(s, dir), Seq("0", "1", "2", "3")),
      "channels")
    m.select(posexplode(col("mixed")))
      .select((col("pos") + 1).cast("long").as("pos"),
        round(col("col"), 6).as("mixed"))
      .orderBy("pos")
  }

  // --------------------------------------------------------------- q46
  /** A3/P4 multi-summary one pass: TWO summary types (mean + count) over
    * ONE extraction pass of the q30 energy curve, routed by summary
    * type. Continuous-time weighting: each value spans to the next
    * feature's ts; the last row of a doc spans 0 (its own end). Energy
    * values are k/16 with k integer and spans are ns integers, so the
    * weighted sums are exact in both engines. */
  def q46MultiSummary(s: SparkSession, dir: String): DataFrame = {
    val specs = TransformSpecs.parseJson(
      """[{"id": "m", "plugin": "graft:energy",
         |  "output": "detectionfunction", "step_size": 8,
         |  "block_size": 16, "window_type": "rectangular",
         |  "summary_type": "mean"},
         | {"id": "c", "plugin": "graft:energy",
         |  "output": "detectionfunction", "step_size": 8,
         |  "block_size": 16, "window_type": "rectangular",
         |  "summary_type": "count"}]""".stripMargin)
    val features = Engine.run(seqsOf(s, dir), specs)
    Engine.summarize(features, specs)
      .select(col("doc_id"), col("summary_name"),
        round(element_at(col("values"), 1), 6).as("v"))
      .orderBy("doc_id", "summary_name")
  }

  // --------------------------------------------------------------- q47
  /** S2 recursive directory source: the documents table split across two
    * nested subtrees (depth 2 and 3), re-read with recursiveFileLookup —
    * must reproduce the flat table exactly. The nested copy is
    * materialized once per sf dir (idempotent overwrite). */
  def q47RecursiveDir(s: SparkSession, dir: String): DataFrame = {
    val base = s"/tmp/graft_recdir_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val docs = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    docs.where(pmod(col("doc_id"), lit(2)) === 0)
      .write.mode("overwrite").parquet(s"$base/x/a")
    docs.where(pmod(col("doc_id"), lit(2)) === 1)
      .write.mode("overwrite").parquet(s"$base/y/b/c")
    Tables.sequencesRecursive(s, base)
      .select(col("doc_id"), col("n_chars"))
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- q48
  /** S6 resample-on-read analog: events timestamps re-bucketed from the
    * µs clock to a 10 Hz grid (round(ts·f)/f, f = 10/1e6). */
  def q48Rebucket(s: SparkSession, dir: String): DataFrame =
    Tables.rebucketTs(
      t(s, dir, "events")
        .withColumn("ts", unix_micros(col("ts").cast("timestamp"))),
      "ts", fromRateHz = 1000000.0, toRateHz = 10.0)
      .select(col("event_id"), col("ts"))
      .orderBy("event_id")

  // --------------------------------------------------------------- q49
  /** A1 vector summaries: per-bin CT-weighted mean over the 16-bin grid
    * output (per-frame token histogram) — the no-explode vector path,
    * oracle-pinned per bin (round 1 had only the vector ≡ scalar
    * ScalaTest identity). Bin values are counts/16 (exact in float32)
    * and spans are ns integers, so the weighted sums are exact. */
  def q49VectorMean(s: SparkSession, dir: String): DataFrame = {
    val specs = TransformSpecs.parseJson(
      """[{"id": "vm", "plugin": "graft:histogram", "output": "grid",
         |  "step_size": 8, "block_size": 16, "summary_type": "mean",
         |  "parameters": {"buckets": 16}}]""".stripMargin)
    val features = Engine.run(seqsOf(s, dir), specs)
    Engine.summarize(features, specs)
      .select(col("doc_id"), posexplode(col("values")))
      .select(col("doc_id"), col("pos").cast("long").as("bin"),
        round(col("col"), 6).as("mean_v"))
      .orderBy("doc_id", "bin")
  }

  // --------------------------------------------------------------- q50
  /** J2 interval (notes-regions) as-of variant: the matched feature only
    * applies while q.ts < f.ts + f.duration — expired matches yield
    * nulls. Features: purchases valid for 120 s. */
  def q50AsofInterval(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .withColumn("ts", unix_micros(col("ts").cast("timestamp")))
    val queries = e.where(col("event_type") =!= "purchase")
      .select("event_id", "user_id", "ts")
    val features = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        lit(120000000L).as("dur"),
        col("value").as("purchase_value"))
    graft.operators.AsOf.joinInterval(queries, features,
      "user_id", "ts", "dur", Seq("purchase_value"))
      .select("event_id", "user_id", "ts", "purchase_value", "matched_ts")
      .orderBy("event_id")
  }

  // ------------------------------------------------------------- wiring

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_recursive_dir" -> q47RecursiveDir,
    "q48_rebucket" -> q48Rebucket,
    "q49_vector_mean" -> q49VectorMean,
    "q50_asof_interval" -> q50AsofInterval,
    "q42_time_range" -> q42TimeRange,
    "q43_taper_hanning" -> q43TaperHanning,
    "q44_manifest" -> q44Manifest,
    "q45_mixdown" -> q45Mixdown,
    "q46_multi_summary" -> q46MultiSummary)

  private val toksSql = QueryUtil.toksSql

  /** frames CTE shared by the energy oracles (q30's shape) — ONE
    * definition in QueryUtil (drift guard). */
  private val framesCte = QueryUtil.framesCte

  /** Hanning taper coefficients as a SQL list literal — the ENGINE's
    * values verbatim (Double.toString round-trips exactly). */
  private val hannSql = graft.frames.Framing
    .taperCoefficients(WindowShape.Hanning, 16)
    .map(_.toString).mkString("[", ", ", "]")

  val oracle: Map[String, String] = Map(
    "q47_recursive_dir" ->
      "SELECT doc_id, n_chars FROM documents ORDER BY doc_id",
    "q49_vector_mean" ->
      s"""WITH $framesCte,
         b AS (
           SELECT doc_id, frame, u.b AS bin,
                  CAST(len(list_filter(toks[frame*8+1 : frame*8+16],
                    x -> x % 16 = u.b)) AS DOUBLE) / 16.0 AS v
           FROM f, (SELECT unnest(range(16)) AS b) u),
         sp AS (
           SELECT doc_id, bin, v,
                  coalesce(lead(frame * 8000000) OVER
                      (PARTITION BY doc_id, bin ORDER BY frame),
                    max(frame * 8000000) OVER (PARTITION BY doc_id))
                    - frame * 8000000 AS w
           FROM b)
         SELECT doc_id, bin, round(sum(v * w) / sum(w), 6) AS mean_v
         FROM sp GROUP BY 1, 2 ORDER BY 1, 2""",
    "q50_asof_interval" ->
      """SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts,
                CASE WHEN epoch_us(e.ts) < epoch_us(p.ts) + 120000000
                     THEN p.value END AS purchase_value,
                CASE WHEN epoch_us(e.ts) < epoch_us(p.ts) + 120000000
                     THEN epoch_us(p.ts) END AS matched_ts
         FROM (SELECT * FROM events WHERE event_type <> 'purchase') e
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
           ON e.user_id = p.user_id AND e.ts >= p.ts
         ORDER BY e.event_id""",
    "q48_rebucket" ->
      """SELECT event_id,
                (epoch_us(ts) + 50000) // 100000 * 100000 AS ts
         FROM events ORDER BY event_id""",
    "q42_time_range" ->
      s"""WITH $framesCte
         SELECT doc_id, frame * 8000000 AS ts,
                round(CAST(list_sum(list_transform(
                  toks[frame*8+1 : frame*8+16], x -> x*x)) AS DOUBLE) / 16.0,
                  6) AS energy
         FROM f
         WHERE frame * 8000000 >= 16000000 AND frame * 8000000 < 64000000
         ORDER BY 1, 2""",
    // The engine stores feature values as float32 (Extractors value
    // storage mirrors the reference's 32-bit feature type, SURVEY
    // §1.3), so the oracle must model the double→float32→double trip:
    // CAST(... AS REAL)::DOUBLE before the 6-digit round. Rectangular
    // tapers (q30/q42) skip this because k/16 is float32-exact;
    // hanning coefficients are irrational, so skipping it red-flags
    // the hash. ORACLE CONVENTION: any gate whose values are not
    // exactly representable in float32 needs this width modeling.
    "q43_taper_hanning" ->
      s"""WITH $framesCte,
         w AS (SELECT $hannSql::DOUBLE[] AS cf)
         SELECT doc_id, frame * 8000000 AS ts,
                round(CAST(CAST(list_sum(list_transform(range(16), i ->
                  (toks[frame*8+i+1] * cf[i+1]) *
                  (toks[frame*8+i+1] * cf[i+1]))) AS DOUBLE) / 16.0
                  AS REAL)::DOUBLE,
                  6) AS energy
         FROM f, w ORDER BY 1, 2""",
    "q44_manifest" ->
      s"""SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tok
         FROM documents WHERE doc_id % 7 = 0 ORDER BY doc_id""",
    "q45_mixdown" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents
                     WHERE doc_id IN (0, 1, 2, 3)),
         m AS (SELECT max(len(toks)) AS ml FROM t),
         pos AS (SELECT unnest(range((SELECT ml FROM m))) AS i)
         SELECT CAST(i + 1 AS BIGINT) AS pos,
                round((SELECT sum(CASE WHEN i < len(toks)
                                  THEN toks[i+1] ELSE 0 END)
                       FROM t) / 4.0, 6) AS mixed
         FROM pos ORDER BY pos""",
    "q46_multi_summary" ->
      s"""WITH $framesCte,
         e AS (
           SELECT doc_id, frame * 8000000 AS ts,
                  CAST(list_sum(list_transform(
                    toks[frame*8+1 : frame*8+16], x -> x*x)) AS DOUBLE) / 16.0
                    AS energy
           FROM f),
         sp AS (
           SELECT doc_id, energy,
                  coalesce(lead(ts) OVER (PARTITION BY doc_id ORDER BY ts),
                           max(ts) OVER (PARTITION BY doc_id)) - ts AS w
           FROM e),
         agg AS (
           SELECT doc_id,
                  sum(energy * w) / sum(w) AS mean_v,
                  count(*) AS count_v
           FROM sp GROUP BY doc_id)
         SELECT doc_id, summary_name,
                round(CASE WHEN summary_name = 'mean' THEN mean_v
                           ELSE count_v END, 6) AS v
         FROM agg, (SELECT unnest(['count', 'mean']) AS summary_name)
         ORDER BY doc_id, summary_name"""
  )
}
