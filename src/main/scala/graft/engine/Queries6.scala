package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Redact, Sampling}

/** Gate queries 59-61: the round-5 training-pipeline additions —
  * segment-level keep-first dedup (C4/RefinedWeb line dedup), PII
  * redaction, and the deterministic epoch shuffle. Each gate synthesizes
  * its structure (segmentation / injected PII / epoch salt) from the
  * document table deterministically on BOTH faces, so the DuckDB oracle
  * reproduces the engine bit-for-bit. */
object Queries6 {

  /** Segment width for the q59 gate's fixed-window segmentation (both
    * faces derive segments from this ONE constant). */
  private val SegW = 4
  private val Epoch = 2L
  private val BatchSize = 256L

  /** Fixed-window segmentation of the token column: ceil(n/SegW)
    * comma-joined chunks — the gate's stand-in for line/paragraph
    * splits (the synthetic text has no newlines; the OPERATOR takes any
    * array<string>). */
  private def segsOfTokens(toks: Column): Column =
    // empty-array guard (ADVICE r5): sequence(0, -1) yields the
    // DESCENDING [0, -1] in Spark and would emit two phantom empty
    // segments where the oracle's range((len+3)//4) yields none.
    // Unreachable for the gate's inputs (split always yields >= 1
    // token) but pinned here so a future input change cannot diverge.
    when(size(toks) === 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), floor((size(toks) - lit(1)) / lit(SegW)).cast("int")),
        i => array_join(
          transform(slice(toks, i * SegW + 1, lit(SegW)), x => x.cast("string")),
          ",")))

  // --------------------------------------------------------------- q59
  /** Segment-level exact dedup, keep-first, with document reassembly:
    * every repeated segment survives only at its smallest (doc_id, pos)
    * occurrence; docs re-emit their surviving segments in order (empty
    * docs stay visible with n_kept = 0). Token-length segments over a
    * tiny alphabet make cross-doc repeats plentiful at sf0.01, so the
    * keep-first election is genuinely exercised. */
  def q59SegmentDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = QueryUtil.docsTok(s, dir)
      .select(col("doc_id"), segsOfTokens(col("tokens")).as("segs"))
    Dedup.dedupSegmentsKeepFirst(docs, "doc_id", "segs")
      .select(col("doc_id"), col("n_kept"),
        array_join(col("kept_segments"), "|").as("kept_text"))
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- q60
  /** PII redaction over deterministically injected PII: docs get an
    * email / IPv4 / phone / nothing appended by doc_id % 4, then the
    * shared rule chain ([[Redact.defaultRules]] — the SAME pattern
    * strings are spliced into the oracle SQL) redacts and counts.
    * Map-only; the only exchange is the gate's own orderBy. */
  def q60Redact(s: SparkSession, dir: String): DataFrame = {
    val m = pmod(col("doc_id"), lit(4))
    val pii = QueryUtil.t(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .withColumn("text", concat(col("text"),
        when(m === 0, concat(lit(" contact user"),
          col("doc_id").cast("string"), lit("@example.com now")))
        .when(m === 1, concat(lit(" from 10."),
          pmod(col("doc_id"), lit(256)).cast("string"), lit(".0."),
          pmod(col("doc_id"), lit(100)).cast("string"), lit(" logged")))
        .when(m === 2, concat(lit(" call +1-"),
          lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"),
          lit("-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
        .otherwise(lit(""))))
    Redact.redact(pii, "text")
      .select(col("doc_id"), col("n_email"), col("n_phone"), col("n_ipv4"),
        col("n_redacted"), col("redacted_text"))
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- q61
  /** Deterministic epoch shuffle: the (key, epoch)-pure global
    * permutation + batch assignment (Sampling.epochShuffle — the
    * prefix-sum layout, not a corpus-wide window). The oracle replays
    * the hash CTE chain and a row_number over (h, doc_id). */
  def q61EpochShuffle(s: SparkSession, dir: String): DataFrame =
    Sampling.epochShuffle(
      QueryUtil.t(s, dir, "documents").select(col("doc_id")),
      "doc_id", Epoch, BatchSize)
      .orderBy("doc_id")

  // ------------------------------------------------------------- wiring

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q59_segment_dedup" -> q59SegmentDedup,
    "q60_redact" -> q60Redact,
    "q61_epoch_shuffle" -> q61EpochShuffle)

  private val toksSql = QueryUtil.toksSql

  /** The q59 segmentation in DuckDB — same SegW constant. */
  private def segsSql: String =
    s"""list_transform(range((len(toks) + ${SegW - 1}) // $SegW),
        i -> array_to_string(list_transform(
               toks[i*$SegW+1:i*$SegW+$SegW],
               x -> CAST(x AS VARCHAR)), ','))"""

  /** The q60 rule chain in DuckDB — pattern strings spliced from
    * [[Redact.defaultRules]] so the two faces cannot drift. DuckDB
    * regexp_replace needs the explicit 'g' flag to match Spark's
    * replace-all semantics; counts are taken on the text each rule
    * sees, like the engine's sequential fold. */
  private def redactCtes: String = {
    val Seq(email, phone, ipv4) = Redact.defaultRules.map(_.pattern)
    val Seq(emailT, phoneT, ipv4T) = Redact.defaultRules.map(_.tag)
    s"""p AS (SELECT doc_id, text ||
           CASE WHEN doc_id % 4 = 0
                  THEN ' contact user' || doc_id || '@example.com now'
                WHEN doc_id % 4 = 1
                  THEN ' from 10.' || (doc_id % 256) || '.0.'
                       || (doc_id % 100) || ' logged'
                WHEN doc_id % 4 = 2
                  THEN ' call +1-'
                       || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                       || '-555-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                ELSE '' END AS text
         FROM documents),
       r1 AS (SELECT doc_id,
                CAST(len(regexp_extract_all(text, '$email')) AS INT)
                  AS n_email,
                regexp_replace(text, '$email', '$emailT', 'g') AS t1
              FROM p),
       r2 AS (SELECT doc_id, n_email,
                CAST(len(regexp_extract_all(t1, '$phone')) AS INT)
                  AS n_phone,
                regexp_replace(t1, '$phone', '$phoneT', 'g') AS t2
              FROM r1),
       r3 AS (SELECT doc_id, n_email, n_phone,
                CAST(len(regexp_extract_all(t2, '$ipv4')) AS INT) AS n_ipv4,
                regexp_replace(t2, '$ipv4', '$ipv4T', 'g') AS redacted_text
              FROM r2)"""
  }

  val oracle: Map[String, String] = Map(
    "q59_segment_dedup" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         sg AS (SELECT doc_id, $segsSql AS segs FROM t),
         e AS (SELECT doc_id, unnest(range(len(segs))) AS pos, segs
               FROM sg),
         e2 AS (SELECT doc_id, pos, segs[pos+1] AS seg FROM e),
         k1 AS (SELECT seg, min(doc_id) AS kd FROM e2 GROUP BY seg),
         k2 AS (SELECT e2.seg, k1.kd, min(e2.pos) AS kp
                FROM e2 JOIN k1 ON e2.seg = k1.seg AND e2.doc_id = k1.kd
                GROUP BY e2.seg, k1.kd),
         surv AS (SELECT e2.doc_id, e2.pos, e2.seg
                  FROM e2 JOIN k2 ON e2.seg = k2.seg
                    AND e2.doc_id = k2.kd AND e2.pos = k2.kp),
         r AS (SELECT doc_id, count(*) AS n_kept,
                 array_to_string(list(seg ORDER BY pos), '|') AS kept_text
               FROM surv GROUP BY doc_id)
         SELECT t.doc_id, coalesce(r.n_kept, 0) AS n_kept,
                coalesce(r.kept_text, '') AS kept_text
         FROM t LEFT JOIN r ON t.doc_id = r.doc_id
         ORDER BY t.doc_id""",
    "q60_redact" ->
      s"""WITH $redactCtes
         SELECT doc_id, n_email, n_phone, n_ipv4,
                n_email + n_phone + n_ipv4 AS n_redacted, redacted_text
         FROM r3 ORDER BY doc_id""",
    "q61_epoch_shuffle" ->
      s"""WITH ${Sampling.selectionHashCtes(
             "documents", "doc_id", Epoch, "doc_id")},
         r AS (SELECT doc_id,
                 row_number() OVER (ORDER BY h, doc_id) - 1 AS epoch_pos
               FROM s3)
         SELECT doc_id, epoch_pos, epoch_pos // $BatchSize AS batch
         FROM r ORDER BY doc_id""")
}
