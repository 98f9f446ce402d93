package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Gate queries 51-52: the REAL multimodal codecs (round-3 item — the
  * round-2 multimodal gate q24 exercised only the metadata/stub path).
  * Each gate synthesizes true container bytes (binary PPM / RIFF WAV)
  * from a deterministic per-doc rule, pushes them through the batched
  * mapPartitions decode, and emits decoded dimensions + content
  * checksums. The DuckDB oracle recomputes the expected decode results
  * from the same rule WITHOUT touching bytes — any header-grammar or
  * offset bug in the parser shifts dimensions or checksums and reds the
  * gate. Both pipelines are map-only (no exchange): at 10^12 rows the
  * decode stage scales embarrassingly, which is the point of the
  * batched-per-partition shape. */
object Queries5 {

  private def ids(s: SparkSession, dir: String) =
    s.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") < 200)
      .select(col("doc_id").cast("long").as("id"))

  // --------------------------------------------------------------- q51
  /** Binary-PPM round trip: encode real P6 bytes (header grammar
    * included) per doc, decode with the REAL parser, emit dims + pixel
    * checksum. */
  def q51PpmDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = ids(s, dir).as[Long].map { id =>
      val w = (id % 7 + 1).toInt
      val h = (id % 5 + 1).toInt
      val px = Array.tabulate(w * h * 3)(i => ((id * 3 + i * 7) % 256).toByte)
      Multimodal.MediaRow(id, "image", Multimodal.encodePpm(w, h, px), w, h)
    }
    Multimodal.decodePpm(media)
      .map(p => (p.id, p.width, p.height, p.pixels.length,
        p.pixels.map(b => (b & 0xff).toLong).sum))
      .toDF("doc_id", "width", "height", "n_pixels", "pix_sum")
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- q52
  /** 16-bit PCM WAV round trip: encode a real RIFF container per doc,
    * decode with the REAL chunk walker, emit format fields + sample
    * count + sample sum. */
  def q52WavDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = ids(s, dir).as[Long].map { id =>
      val n = (id % 50 + 10).toInt
      val samples = Array.tabulate(n)(i =>
        ((id * 31 + i * 17) % 65536 - 32768).toShort)
      Multimodal.MediaRow(id, "audio",
        Multimodal.encodeWavPcm16(8000, 1, samples), 0, 0)
    }
    Multimodal.decodeWav(media)
      .map(a => (a.id, a.channels, a.sample_rate, a.bits_per_sample,
        a.samples.length, a.samples.map(_.toLong).sum))
      .toDF("doc_id", "channels", "sample_rate", "bits_per_sample",
        "n_samples", "sample_sum")
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- q53
  /** W3 frequency-domain adaptation end-to-end: hanning-tapered per-frame
    * DFT magnitude spectrum (native FrameSpectrum expression), timestamps
    * at block start (ShiftData). The oracle embeds the ENGINE-computed
    * taper-folded coefficient matrices as double literals — the q43
    * lesson applied from the start: float32 storage is modeled with
    * CAST(... AS REAL)::DOUBLE before the 6-digit round. */
  def q53Spectrum(s: SparkSession, dir: String): DataFrame = {
    val specs = TransformSpecs.parseJson(
      """[{"id": "spec", "plugin": "graft:spectrum", "output": "magnitude",
         |  "step_size": 8, "block_size": 16, "window_type": "hanning"}]"""
        .stripMargin)
    Engine.run(seqsOf(s, dir), specs)
      .select(col("doc_id"), col("ts"),
        posexplode(col("values")))
      .select(col("doc_id"), col("ts"), col("pos").cast("int").as("bin"),
        round(col("col").cast("double"), 6).as("mag"))
      .orderBy("doc_id", "ts", "bin")
  }

  private def seqsOf(s: SparkSession, dir: String): DataFrame =
    QueryUtil.seqsOf(s, dir)

  // --------------------------------------------------------------- q54
  /** Train/test CONTAMINATION check, the composed two-pass design:
    * EXACT content matches (hash equi-join — immune to the LSH cap, so
    * a benchmark doc in a degenerate boilerplate bucket is still
    * caught; identical payloads are the common contamination case)
    * UNION banded-minhash near-dup candidates
    * (`Dedup.minhashLshPairsAcross`, combined-side bucket cap, portable
    * band keys). Corpus = all documents, "benchmark" = every 10th doc,
    * so every benchmark doc must surface its corpus twin at
    * est_jaccard 1.0 via the exact pass regardless of bucket skew.
    * Both passes and the cap are modeled in the oracle. */
  def q54Contamination(s: SparkSession, dir: String): DataFrame = {
    val docs = QueryUtil.docsTok(s, dir)
    val bench = docs.where(col("doc_id") % 10 === 3)
    val exact = graft.operators.Dedup.exactMatchesAcross(
      docs, bench, "doc_id", "tokens")
      .withColumn("est_jaccard", lit(1.0))
    val near = graft.operators.Dedup.minhashLshPairsAcross(
      docs, bench, "doc_id", "tokens",
      numHashes = 8, bands = 4, threshold = 0.5,
      maxBucket = 1000, portableBucketKey = true)
    exact.unionByName(near)
      .groupBy("id_l", "id_r")
      .agg(max(col("est_jaccard")).as("est_jaccard"))
      .orderBy("id_l", "id_r")
  }

  // --------------------------------------------------------------- q55
  /** Deterministic stratified sampling: per-source rates (src3 kept at
    * 80%, src7 dropped to 10%, everything else 30%) via the exact-int64
    * selection hash — partition/retry-independent and reproduced
    * bit-for-bit by the oracle. */
  def q55Sample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.stratifiedByHash(
      QueryUtil.t(s, dir, "documents")
        .select(col("doc_id"), col("source")),
      "doc_id", "source",
      rates = Map("src3" -> 0.8, "src7" -> 0.1),
      defaultRate = 0.3, salt = 5L)
      .orderBy("doc_id")

  // --------------------------------------------------------------- q56
  /** Contamination VERDICT (round-4 item): q54's pair table composed
    * into the per-benchmark-doc report pipelines act on — true match
    * count, worst similarity, and the matched corpus ids (reported list
    * capped at 100, modeled in the oracle; n_matches stays uncapped). */
  def q56ContaminationReport(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.contaminationReport(q54Contamination(s, dir))
      .select(col("id_r").as("bench_id"),
        col("n_matches"),
        round(col("max_est_jaccard"), 6).as("max_est_jaccard"),
        array_join(transform(col("matched_ids"), i => i.cast("string")), ",")
          .as("matched_ids"))
      .orderBy("bench_id")

  // --------------------------------------------------------------- q57
  /** The contamination ACTION: dropContaminated removes every corpus doc
    * CONFIDENTLY matching a benchmark doc (est_jaccard >= 0.9 — the
    * 8-hash candidate net at 0.5 is deliberately loose; the drop step
    * acts on the high-confidence verdicts) via anti join — the only
    * touch on the corpus. Output = the surviving corpus ids. */
  def q57DropContaminated(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.dropContaminated(
      QueryUtil.docsTok(s, dir).select(col("doc_id")),
      "doc_id", q54Contamination(s, dir).where(col("est_jaccard") >= 0.9))
      .orderBy("doc_id")

  // --------------------------------------------------------------- q58
  /** Within-document n-gram repetition (round-4 item): the Gopher-class
    * quality signals — duplicate-bigram fraction and top-bigram share —
    * via the native NgramRepetitionStats expression: ONE in-row sort of
    * the doc's own windows, no explode, no shuffle (the groupBy(doc,
    * shingle) formulation pays two exchanges for a per-doc scalar). */
  def q58Repetition(s: SparkSession, dir: String): DataFrame =
    QueryUtil.docsTok(s, dir)
      .select(col("doc_id"),
        graft.functions.NgramRepetitionStats(col("tokens"), 2).as("st"))
      .select(col("doc_id"),
        col("st.total").as("total_2grams"),
        col("st.distinct").as("distinct_2grams"),
        when(col("st.total") === 0, lit(0.0))
          .otherwise(round(lit(1.0) -
            col("st.distinct").cast("double") / col("st.total").cast("double"), 6))
          .as("dup_2gram_frac"),
        when(col("st.total") === 0, lit(0.0))
          .otherwise(round(
            col("st.top").cast("double") / col("st.total").cast("double"), 6))
          .as("top_2gram_frac"))
      .orderBy("doc_id")

  // ------------------------------------------------------------- wiring

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51_ppm_decode" -> q51PpmDecode,
    "q52_wav_decode" -> q52WavDecode,
    "q53_spectrum" -> q53Spectrum,
    "q54_contamination" -> q54Contamination,
    "q55_sample" -> q55Sample,
    "q56_contamination_report" -> q56ContaminationReport,
    "q57_drop_contaminated" -> q57DropContaminated,
    "q58_repetition" -> q58Repetition)

  /** ENGINE-computed taper-folded DFT coefficient literals (hanning,
    * block 16, 9 bins) formatted shortest-round-trip — DuckDB parses
    * them back to the identical doubles, so the whole spectrum matches
    * bit-for-bit before the float32 width modeling. */
  private def matSql(m: Seq[Seq[Double]]): String =
    m.map(_.map(_.toString).mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")
  private lazy val (creSql, cimSql) = {
    val (cre, cim) = SpectrumExtractor.dftCoefficients(
      graft.model.WindowShape.Hanning, 16)
    (matSql(cre), matSql(cim))
  }

  /** frames CTE — the ONE QueryUtil definition (drift guard). */
  private val framesCte = QueryUtil.framesCte

  private val toksSql = QueryUtil.toksSql
  private def cut(r: Double) = graft.operators.Sampling.cutFor(r)

  private val oracle1: Map[String, String] = Map(
    "q54_contamination" ->
      s"""WITH $contaminationCtes
         SELECT id_l, id_r, max(est_jaccard) AS est_jaccard FROM pairs
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q56_contamination_report" ->
      s"""WITH $contaminationCtes,
         agg AS (
           SELECT id_l, id_r, max(est_jaccard) AS est_jaccard FROM pairs
           GROUP BY 1, 2)
         SELECT id_r AS bench_id, count(*) AS n_matches,
                round(max(est_jaccard), 6) AS max_est_jaccard,
                array_to_string(list_sort(list(DISTINCT id_l))[1:100], ',')
                  AS matched_ids
         FROM agg GROUP BY 1 ORDER BY 1""",
    "q57_drop_contaminated" ->
      s"""WITH $contaminationCtes
         SELECT doc_id FROM documents
         WHERE doc_id NOT IN (SELECT id_l FROM pairs WHERE est_jaccard >= 0.9)
         ORDER BY doc_id""")

  /** The q54 contamination CTE chain (exact pre-pass UNION capped banded
    * LSH), shared verbatim by the q54/q56/q57 oracles so the three faces
    * of the contamination story cannot drift. Ends with `pairs`. */
  private def contaminationCtes: String =
      s"""t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         sig AS (
           SELECT doc_id AS id,
             list_transform(range(8), h ->
               list_min(list_transform(toks,
                 tk -> ((2*h+1)*tk + (h*h+7)) % 1000000007))) AS sig
           FROM t),
         banded0 AS (
           SELECT id, sig, b,
             array_to_string(list_transform(sig[b*2+1:b*2+2],
               x -> CAST(x AS VARCHAR)), ',') AS bucket,
             0 AS side
           FROM sig, range(4) r(b)
           UNION ALL
           SELECT id, sig, b,
             array_to_string(list_transform(sig[b*2+1:b*2+2],
               x -> CAST(x AS VARCHAR)), ',') AS bucket,
             1 AS side
           FROM sig, range(4) r(b) WHERE id % 10 = 3),
         banded AS (
           -- COMBINED-side degenerate-bucket cap (engine maxBucket=1000)
           SELECT id, sig, b, bucket, side FROM (
             SELECT id, sig, b, bucket, side,
               count(*) OVER (PARTITION BY b, bucket) AS bn
             FROM banded0) WHERE bn <= 1000),
         near AS (
           SELECT DISTINCT a.id AS id_l, b.id AS id_r,
             CAST(len(list_filter(range(8),
               i -> a.sig[i+1] = b.sig[i+1])) AS DOUBLE) / 8 AS est_jaccard
           FROM banded a JOIN banded b
             ON a.b = b.b AND a.bucket = b.bucket
               AND a.side = 0 AND b.side = 1),
         exact AS (
           -- exact-content pre-pass: cap-immune, always catches twins
           SELECT a.doc_id AS id_l, b.doc_id AS id_r, 1.0 AS est_jaccard
           FROM t a JOIN t b ON a.toks = b.toks
           WHERE b.doc_id % 10 = 3),
         pairs AS (
           SELECT id_l, id_r, est_jaccard FROM near
           WHERE est_jaccard >= 0.5
           UNION ALL SELECT * FROM exact)"""

  private val oracle2: Map[String, String] = Map(
    "q58_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         g AS (SELECT doc_id,
                 list_transform(range(greatest(len(toks) - 1, 0)),
                   i -> toks[i+1]::BIGINT * 1031 + toks[i+2]) AS gs
               FROM t),
         u AS (SELECT doc_id, unnest(gs) AS gram FROM g),
         c AS (SELECT doc_id, gram, count(*) AS cnt FROM u GROUP BY 1, 2),
         a AS (SELECT doc_id, CAST(sum(cnt) AS INT) AS total_2grams,
                      CAST(count(*) AS INT) AS distinct_2grams,
                      CAST(max(cnt) AS INT) AS top
               FROM c GROUP BY 1)
         SELECT t.doc_id,
                coalesce(a.total_2grams, 0) AS total_2grams,
                coalesce(a.distinct_2grams, 0) AS distinct_2grams,
                CASE WHEN coalesce(a.total_2grams, 0) = 0 THEN 0.0
                     ELSE round(1.0 - a.distinct_2grams::DOUBLE
                                / a.total_2grams, 6) END AS dup_2gram_frac,
                CASE WHEN coalesce(a.total_2grams, 0) = 0 THEN 0.0
                     ELSE round(a.top::DOUBLE / a.total_2grams, 6)
                END AS top_2gram_frac
         FROM t LEFT JOIN a ON t.doc_id = a.doc_id
         ORDER BY t.doc_id""",
    "q55_sample" ->
      s"""WITH ${graft.operators.Sampling.selectionHashCtes(
             "documents", "doc_id", 5L, "doc_id, source")}
         SELECT doc_id, source FROM s3
         WHERE h < CASE WHEN source = 'src3' THEN ${cut(0.8)}
                        WHEN source = 'src7' THEN ${cut(0.1)}
                        ELSE ${cut(0.3)} END
         ORDER BY doc_id""",
    "q53_spectrum" ->
      s"""WITH $framesCte,
         m AS (SELECT $creSql::DOUBLE[][] AS cre, $cimSql::DOUBLE[][] AS cim),
         b AS (
           SELECT doc_id, frame, u.k AS bin,
                  list_sum(list_transform(range(16),
                    j -> toks[frame*8+j+1] * cre[u.k+1][j+1])) AS re,
                  list_sum(list_transform(range(16),
                    j -> toks[frame*8+j+1] * cim[u.k+1][j+1])) AS im
           FROM f, m, (SELECT unnest(range(9)) AS k) u)
         SELECT doc_id, frame * 8000000 AS ts, CAST(bin AS INT) AS bin,
                round(CAST(CAST(sqrt(re*re + im*im) AS REAL) AS DOUBLE),
                  6) AS mag
         FROM b ORDER BY 1, 2, 3""",
    "q51_ppm_decode" ->
      """SELECT doc_id,
                CAST((doc_id % 7) + 1 AS INT) AS width,
                CAST((doc_id % 5) + 1 AS INT) AS height,
                CAST(((doc_id % 7) + 1) * ((doc_id % 5) + 1) * 3 AS INT)
                  AS n_pixels,
                CAST(list_sum(list_transform(
                  range(((doc_id % 7) + 1) * ((doc_id % 5) + 1) * 3),
                  i -> (doc_id * 3 + i * 7) % 256)) AS BIGINT) AS pix_sum
         FROM documents WHERE doc_id < 200 ORDER BY doc_id""",
    "q52_wav_decode" ->
      """SELECT doc_id,
                CAST(1 AS INT) AS channels,
                CAST(8000 AS INT) AS sample_rate,
                CAST(16 AS INT) AS bits_per_sample,
                CAST((doc_id % 50) + 10 AS INT) AS n_samples,
                CAST(list_sum(list_transform(range((doc_id % 50) + 10),
                  i -> (doc_id * 31 + i * 17) % 65536 - 32768)) AS BIGINT)
                  AS sample_sum
         FROM documents WHERE doc_id < 200 ORDER BY doc_id""")

  val oracle: Map[String, String] = oracle1 ++ oracle2
}
