package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TokenFeatures

/** Deduplication operators for large-scale training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: every method avoids the O(n²) all-pairs trap —
  * candidates are generated only inside small blocking buckets (LSH bands,
  * simhash band bytes, length blocks), so the expensive verify step runs on
  * |bucket|² pairs with |bucket| ≪ n. All shuffles are plain hash
  * exchanges on bucket keys; skewed mega-buckets (e.g. boilerplate dups)
  * should be capped with `maxBucket` which drops degenerate buckets rather
  * than letting one task own n² work.
  */
/** Runtime reporting for bucket caps (the repo's "no silent caps" rule):
  * a per-session QueryExecutionListener surfaces the `graft_cap_N`
  * observations that [[Dedup]]'s capped stages emit, WARN-logging any
  * nonzero drop and keeping the last observation per name for tests. */
object CapMetrics {
  private val log = org.slf4j.LoggerFactory.getLogger("graft.operators.CapMetrics")
  private val id = new java.util.concurrent.atomic.AtomicInteger(0)
  // weak keys: a stopped SparkSession must not stay reachable from this
  // static registry (benches cycle dozens of sessions per JVM)
  private val sessions = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, java.lang.Boolean]()))
  private val lastCap = 4096 // bound the per-observation history
  // LRU-evicting per-name history (oldest out) — a plain clear() at the
  // bound would silently reset the running totals mid-run, at odds with
  // the "no silent caps" rule this registry backs (ADVICE r4)
  private val last = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, (Long, Long, Long)](64, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (Long, Long, Long)]): Boolean =
        size() > lastCap
    })
  private val droppedRowsEver = new java.util.concurrent.atomic.AtomicLong(0)

  def nextId(): Int = id.incrementAndGet()

  /** MONOTONIC cumulative dropped-row count: every delivered graft_cap
    * observation adds its dropped_rows (re-running a query re-counts its
    * drop — this is a per-delivery event counter for delta assertions,
    * not a distinct-query total, and it never resets). */
  def totalDroppedRows: Long = droppedRowsEver.get()

  private val wipeouts = new java.util.concurrent.atomic.AtomicLong(0)

  /** Number of completed queries whose cap observation vanished from the
    * final adaptive plan — which happens when the capped stage produced
    * ZERO rows and AQE pruned it: either every (band, bucket) group was
    * capped (total cap wipeout) or the operator's input was empty. The
    * listener cannot distinguish the two from the pruned plan; the WARN
    * names both. */
  def totalWipeouts: Long = wipeouts.get()

  def ensureListener(spark: org.apache.spark.sql.SparkSession): Unit =
    if (sessions.add(spark)) {
      spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft_cap_")) {
              def l(f: String): Long =
                Option(row.getAs[Any](f)).fold(0L)(_.toString.toDouble.toLong)
              val dropped = (l("dropped_rows"), l("dropped_buckets"), l("max_bucket"))
              droppedRowsEver.addAndGet(dropped._1)
              last.put(name, dropped)
              if (dropped._1 > 0L)
                log.warn(s"$name: bucket cap dropped ${dropped._1} rows in " +
                  s"${dropped._2} oversized buckets (largest ${dropped._3}) — " +
                  "near-dup recall is reduced for those groups; raise maxBucket " +
                  "or widen the bucket space (nPlanes/bands), and rely on exact " +
                  "dedup for identical payloads")
            }
          }
          // an observation declared in the analyzed plan but absent from the
          // final adaptive plan = total cap wipeout (AQE pruned the stage
          // because EVERY group was capped away): zero pairs by CAP, not by
          // similarity — the silent-recall-collapse case, made loud
          val declared = qe.analyzed.collect {
            case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics
              if c.name.startsWith("graft_cap_") => c.name
          }
          val delivered = qe.observedMetrics.keySet
          declared.filterNot(delivered).foreach { name =>
            wipeouts.incrementAndGet()
            log.warn(s"$name: cap observation missing from the final plan " +
              "(AQE pruned the empty capped stage) — EITHER every " +
              "(band, bucket) group exceeded maxBucket (total cap wipeout: " +
              "the empty pair output reflects the cap, not true " +
              "dissimilarity — raise maxBucket or nPlanes/bands, or rely " +
              "on exact dedup) OR the operator's input had no rows; check " +
              "the input count to tell which")
          }
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
      })
    }
}

object Dedup {

  private val log = org.slf4j.LoggerFactory.getLogger("graft.operators.Dedup")

  /** Exact dedup: keep the row with the smallest `idCol` per duplicate
    * group. One shuffle on the (hashed) content key. */
  def exact(df: DataFrame, contentCols: Seq[String], idCol: String): DataFrame = {
    val w = Window.partitionBy(contentCols.map(col): _*).orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** Segment-level exact dedup with keep-first semantics — the C4 /
    * RefinedWeb "line dedup" step: each segment (line / paragraph /
    * chunk) survives ONLY at its first global occurrence, i.e. the
    * lexicographically smallest (doc id, position) over every exact
    * occurrence of that segment text, and each document is reassembled
    * from its surviving segments in original order.
    *
    * Scale shape: the explode is map-side; the keeper election is ONE
    * aggregate keyed on segment content; the survivor filter is an
    * equi-join on that same key (Catalyst reuses the exchange);
    * reassembly is one aggregate on the doc id. No self-join and no
    * corpus-wide window — every shuffle is keyed and linear in the
    * segment count, so a boilerplate segment repeated 10^9 times costs
    * one combine-heavy group, not a blown partition. The output is
    * TOTAL over input docs: a doc whose every segment is a repeat
    * survives with n_kept = 0 and an empty segment list (left join back
    * to the input), so downstream length filters see it rather than
    * silently losing the row.
    *
    * `idCol` must be orderable and unique per doc; `segsCol` is an
    * `array<string>` column (callers choose the segmentation: lines,
    * paragraphs, fixed token windows).
    */
  /** `passThrough`: segments matching the predicate are EXEMPT from the
    * keep-first election and always survive in place — C4/RefinedWeb-style
    * line dedup exempts empty/trivial lines so blank-line paragraph
    * boundaries are not collapsed corpus-wide (ADVICE r5). None = every
    * segment is electable (the q59 gate's pinned semantics). */
  def dedupSegmentsKeepFirst(df: DataFrame, idCol: String,
      segsCol: String,
      passThrough: Option[Column => Column] = None): DataFrame = {
    val ex = df.select(col(idCol).as("__id"),
      posexplode(col(segsCol)).as(Seq("__pos", "__seg")))
    // null-safe split: a null predicate result must not drop the segment
    // from BOTH branches
    val exempt = passThrough.map(p =>
      ex.where(coalesce(p(col("__seg")), lit(false))))
    val electable = passThrough match {
      case Some(p) => ex.where(!coalesce(p(col("__seg")), lit(false)))
      case None => ex
    }
    val keeper = electable.groupBy(col("__seg"))
      .agg(min(struct(col("__id"), col("__pos"))).as("__keep"))
    // The surviving occurrences ARE the keeper rows (one per distinct
    // segment, at its min (id, pos)) — no join back to the exploded
    // table needed. This also deletes the operator's only skew surface
    // (VERDICT r5 #7: a boilerplate segment repeated 10^7 times used to
    // probe one hot __seg key on one task); the remaining hot-key touch
    // is the keeper AGGREGATE, which partial map-side aggregation
    // bounds by design.
    // null segments never survive — parity with the pre-optimization
    // join-back formulation, whose equi-join on __seg dropped them
    // (null != null); the keeper-row emission would otherwise newly
    // keep one occurrence of a null segment
    val surv0 = keeper.where(col("__seg").isNotNull)
      .select(col("__keep.__id").as("__id"),
        col("__keep.__pos").as("__pos"), col("__seg"))
    val surv = exempt.fold(surv0)(e =>
      surv0.unionByName(e.select(col("__id"), col("__pos"), col("__seg"))))
    val reassembled = surv.groupBy(col("__id"))
      .agg(count(lit(1)).as("n_kept"),
        array_sort(collect_list(struct(col("__pos"), col("__seg"))))
          .as("__ordered"))
      .select(col("__id"), col("n_kept"),
        transform(col("__ordered"), s => s.getField("__seg"))
          .as("kept_segments"))
    df.select(col(idCol)).join(reassembled, col(idCol) === col("__id"), "left")
      .select(col(idCol),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_segments"), array().cast("array<string>"))
          .as("kept_segments"))
  }

  /** Candidate pairs from MinHash + banded LSH over a token column.
    *
    * signature[h] = min over tokens of affine hash h; `bands` bands of
    * `rowsPerBand` signature entries each become bucket keys; docs sharing
    * any band bucket become a candidate pair; pairs are verified with the
    * signature-estimated Jaccard (fraction of agreeing minhashes).
    *
    * Returns (id_a, id_b, est_jaccard) with id_a < id_b, est >= threshold.
    */
  /** Banded minhash signatures: (id, sig, band, bucket) — one row per
    * (doc, band). Band key = digest of that band's signature slice;
    * portableBucketKey uses the slice values verbatim (reproducible in
    * any engine for the oracle) instead of Spark's murmur3. Shared by
    * the within-corpus and cross-corpus pair generators so the banding
    * scheme cannot drift between them. */
  private def bandedMinhash(df: DataFrame, idCol: String, tokensCol: String,
      numHashes: Int, bands: Int, portableBucketKey: Boolean): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sig = df.select(col(idCol).as("id"),
      TokenFeatures.minhashSignature(col(tokensCol), numHashes).as("sig"))
    def bandKey(b: org.apache.spark.sql.Column) = {
      val sl = slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))
      if (portableBucketKey)
        concat_ws(",", transform(sl, x => x.cast("string")))
      else hash(sl, b).cast("string")
    }
    sig.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b => bandKey(b))))
      .withColumnRenamed("col", "bucket")
      .withColumnRenamed("pos", "band")
  }

  /** Drop rows of (band, bucket) groups over `maxBucket` members.
    *
    * NO SILENT CAPS: every capped stage `observe`s (dropped_rows,
    * dropped_buckets, max_bucket) under a `graft_cap_N` observation —
    * collected during the run at zero extra passes — and [[CapMetrics]]
    * WARN-logs any nonzero drop on query completion, so a recall collapse
    * (e.g. small bucket space + default cap at corpus scale) is loud
    * instead of a silently-empty pair list. */
  private def capBuckets(banded: DataFrame, maxBucket: Int): DataFrame = {
    CapMetrics.ensureListener(banded.sparkSession)
    val wB = Window.partitionBy(col("band"), col("bucket"))
    val sized = banded.withColumn("__n", count(lit(1)).over(wB))
    // Callers MATERIALIZE the capped table before self-joining it, so the
    // observation runs exactly once. (Pre-materialization history: an
    // observe node on both legs of a self-join gets cloned by
    // DeduplicateRelations, and two CollectMetrics nodes with one name
    // cancel each other — observed metrics come back empty.)
    val obs =
      sized.observe(s"graft_cap_${CapMetrics.nextId()}",
        sum(when(col("__n") > maxBucket, lit(1L)).otherwise(lit(0L)))
          .as("dropped_rows"),
        // each dropped row contributes 1/|bucket| -> exact bucket count
        round(sum(when(col("__n") > maxBucket,
          lit(1.0) / col("__n")).otherwise(lit(0.0)))).cast("long")
          .as("dropped_buckets"),
        max(col("__n")).as("max_bucket"))
    obs.where(col("__n") <= maxBucket)
  }

  /** Signature-estimated Jaccard: fraction of agreeing minhash slots.
    * Runs once per CANDIDATE PAIR — native fused count
    * ([[graft.functions.SlotAgree]]), no per-pair intermediate arrays. */
  private def estJaccard(a: Column, b: Column, numHashes: Int): Column =
    graft.functions.SlotAgree(a, b).cast("double") / numHashes

  /** The HOF composition [[estJaccard]] replaced — the executable spec
    * its native expression is tested against (DedupSimilaritySpec). */
  private[graft] def estJaccardHof(a: Column, b: Column, numHashes: Int): Column =
    size(filter(zip_with(a, b, (x, y) =>
      (x === y).cast("int")), v => v === 1)).cast("double") / numHashes

  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5,
      maxBucket: Int = 1000,
      portableBucketKey: Boolean = false): DataFrame = {
    val banded = bandedMinhash(df, idCol, tokensCol, numHashes, bands,
      portableBucketKey)
    // materialize the capped banded table ONCE: the self-join's two legs
    // otherwise each recompute scan+minhash+cap-window (the observe node
    // makes the subtrees differ, so even ReuseExchange cannot help), and
    // the checkpointed RDD keeps the cap window's (band, bucket) hash
    // partitioning, so the bucket equi-join needs no new exchange
    val capped = Checkpointing.materialize(
      capBuckets(banded, maxBucket).drop("__n"))
    val a = capped.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = capped.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        estJaccard(col("sig_a"), col("sig_b"), numHashes).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** Exact n-gram (shingle) Jaccard between candidate pairs produced by a
    * blocking key (default: same source + doc-length bucket). Use for the
    * verify step after LSH, or standalone on small blocked groups.
    *
    * Shingles over a TOKEN array are packed into int64 ids
    * (base-1031 polynomial — exact for token ids < 1031, which covers
    * word-length tokens; collision-hashed above that): integer set ops are
    * ~50x cheaper per candidate pair than string-array intersections. */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      tokensCol: String, // array<int>
      n: Int = 3,
      blockingCols: Seq[Column] = Nil,
      threshold: Double = 0.5): DataFrame = {
    // sorted distinct shingle sets in ONE fused native pass
    // (graft.functions.NgramShingles); the pairwise jaccard then needs
    // only a native merge-count (graft.functions.IntersectCount) — no
    // per-pair array_intersect/array_union allocation;
    // |A∪B| = |A|+|B|-|A∩B|
    // materialized ONCE: the blocked self-join's legs would otherwise
    // each recompute the shingle pass over the full corpus (same rule as
    // the minhash/embedding pair generators)
    val shingles = Checkpointing.materialize(df
      .where(size(col(tokensCol)) >= n)
      .select(
        col(idCol).as("id") +:
          graft.functions.NgramShingles(col(tokensCol), n).as("sh") +:
          blockingCols.zipWithIndex.map { case (c, i) => c.as(s"bk$i") }: _*)
      .withColumn("nsh", size(col("sh"))))
    val keys = blockingCols.indices.map(i => s"bk$i")
    val a = shingles.select(col("id").as("id_a") +: col("sh").as("sh_a") +:
      col("nsh").as("nsh_a") +: keys.map(col): _*)
    val b = shingles.select(col("id").as("id_b") +: col("sh").as("sh_b") +:
      col("nsh").as("nsh_b") +: keys.map(col): _*)
    val joined = if (keys.nonEmpty) a.join(b, keys.toSeq) else a.crossJoin(b)
    joined.where(col("id_a") < col("id_b"))
      .withColumn("__i",
        graft.functions.IntersectCount.count(col("sh_a"), col("sh_b")))
      .select(col("id_a"), col("id_b"),
        (col("__i").cast("double") /
          greatest(col("nsh_a") + col("nsh_b") - col("__i"), lit(1))
            .cast("double"))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: 32-bit simhash; blocking on each of 4 bytes
    * (two near-dups within hamming distance <= 7 share at least one byte),
    * verify with exact hamming <= maxHamming. */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 10000): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      TokenFeatures.simhash32(col(tokensCol)).as("sh"))
    val banded = sh.select(col("id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(3)), b =>
        call_function("shiftright", col("sh"), b * 8).bitwiseAND(255))))
      .withColumnRenamed("col", "byte").withColumnRenamed("pos", "band")
    val wB = Window.partitionBy(col("band"), col("byte"))
    val capped = banded.withColumn("__n", count(lit(1)).over(wB))
      .where(col("__n") <= maxBucket)
    val a = capped.select(col("band"), col("byte"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = capped.select(col("band"), col("byte"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "byte"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        TokenFeatures.hamming(col("sh_a"), col("sh_b")).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** CROSS-CORPUS exact matches: (id_l, id_r) for every content-equal
    * pair between two tables. One hash shuffle on a 64-bit content
    * digest (the arrays themselves stay out of the join key; equality
    * re-verified post-join, so digest collisions cannot fabricate
    * pairs). This is the contamination check's PRE-PASS: it is immune
    * to the LSH path's degenerate-bucket cap — a benchmark doc sitting
    * in a >maxBucket boilerplate bucket is invisible to [[
    * minhashLshPairsAcross]] but trivially caught here, and identical
    * payloads are precisely the common contamination case. */
  def exactMatchesAcross(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      contentCol: String): DataFrame = {
    val l = left.select(col(idCol).as("id_l"),
      xxhash64(col(contentCol)).as("__h"), col(contentCol).as("__cl"))
    val r = right.select(col(idCol).as("id_r"),
      xxhash64(col(contentCol)).as("__h"), col(contentCol).as("__cr"))
    l.join(r, Seq("__h"))
      .where(col("__cl") === col("__cr"))
      .select(col("id_l"), col("id_r"))
  }

  /** CROSS-CORPUS near-dup pairs (contamination check): banded-minhash
    * candidates between TWO tables — the train/test (or corpus/benchmark)
    * overlap detector every training pipeline needs before eval. Same
    * machinery as [[minhashLshPairs]] (signatures, band buckets,
    * signature-estimated Jaccard verify) but candidates pair only ACROSS
    * the sides, and the degenerate-bucket cap counts the COMBINED
    * (band, bucket) membership — the join cost is |L_b|·|R_b|, so a hot
    * bucket on either side is the same quadratic trap.
    *
    * Returns (id_l, id_r, est_jaccard), est >= threshold. At 10^12×10^6
    * scale (corpus × benchmark) the benchmark side is tiny: every stage
    * is bounded by bucket sizes and the output by true overlap. */
  def minhashLshPairsAcross(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      tokensCol: String,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5,
      maxBucket: Int = 1000,
      portableBucketKey: Boolean = false): DataFrame = {
    def banded(df: DataFrame, side: Int) =
      bandedMinhash(df, idCol, tokensCol, numHashes, bands, portableBucketKey)
        .withColumn("side", lit(side))
    // combined-side cap: the join cost is |L_b|·|R_b|. Materialized ONCE
    // (same rationale as minhashLshPairs): both join legs otherwise
    // recompute the corpus scan + signatures + cap window.
    val combined = banded(left, 0).unionByName(banded(right, 1))
    val capped = Checkpointing.materialize(
      capBuckets(combined, maxBucket).drop("__n"))
    val a = capped
      .where(col("side") === 0).select(col("band"), col("bucket"),
        col("id").as("id_l"), col("sig").as("sig_l"))
    val b = capped
      .where(col("side") === 1).select(col("band"), col("bucket"),
        col("id").as("id_r"), col("sig").as("sig_r"))
    a.join(b, Seq("band", "bucket"))
      .select(col("id_l"), col("id_r"),
        estJaccard(col("sig_l"), col("sig_r"), numHashes).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
      .dropDuplicates("id_l", "id_r")
  }

  /** Contamination VERDICT: compose a cross-corpus pair table (from
    * [[minhashLshPairsAcross]] / [[exactMatchesAcross]]) into the
    * per-benchmark-doc report a pipeline acts on: match count, worst
    * (max) similarity, and the matched corpus ids. The pair list is
    * evidence; this is the actionable summary.
    *
    * `maxMatches` caps only the REPORTED id list (boilerplate benchmark
    * docs can match thousands of corpus twins) — `n_matches` always
    * carries the true count, so the cap is visible, not silent. The
    * aggregation groups by the benchmark side (tiny at real scale):
    * one shuffle sized by the pair table. */
  def contaminationReport(
      pairs: DataFrame,
      lCol: String = "id_l",
      rCol: String = "id_r",
      scoreCol: String = "est_jaccard",
      maxMatches: Int = 100): DataFrame = {
    // rank matches per benchmark doc FIRST so the aggregation buffer
    // holds at most maxMatches ids — collect_set-then-slice would buffer
    // EVERY match of a boilerplate benchmark doc before truncating
    val perPair = pairs.groupBy(col(rCol), col(lCol))
      .agg(max(col(scoreCol)).as("__s"))
    val w = Window.partitionBy(col(rCol)).orderBy(col(lCol))
    perPair.withColumn("__rn", row_number().over(w))
      .groupBy(col(rCol))
      .agg(count(lit(1)).as("n_matches"),
        max(col("__s")).as("max_" + scoreCol),
        // collect_list skips nulls: only the maxMatches smallest ids are
        // ever buffered; sorted for a deterministic report
        array_sort(collect_list(when(col("__rn") <= maxMatches, col(lCol))))
          .as("matched_ids"))
  }

  /** Drop every corpus row whose id appears on the corpus side of a
    * cross-corpus pair table: the train/test-overlap removal step. The
    * anti join is the ONLY touch on the (huge) corpus — the pair table
    * (and hence the distinct drop list) is bounded by true overlap. */
  def dropContaminated(
      corpus: DataFrame,
      idCol: String,
      pairs: DataFrame,
      lCol: String = "id_l"): DataFrame =
    corpus.join(pairs.select(col(lCol).as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** Pair tables at or below this many rows (with integral, non-null
    * node ids) are clustered with ONE driver-side union-find pass instead
    * of the iterative distributed loop: the loop pays ~10 fixed
    * synchronization barriers (checkpoint + convergence probe per round)
    * regardless of graph size, which dwarfs the work itself on the small
    * pair graphs real dedup thresholds produce (guide §1.2: fix the
    * distributed algorithm first — here the ideal plan for a sub-million-
    * edge graph is no distribution at all). The limit bounds the driver
    * collect explicitly: at the 1M default expect a few hundred MB of
    * TRANSIENT driver footprint (boxed Rows + the labels list), so size
    * the limit to the driver heap before raising it. Above the limit —
    * the 100 TB shape — the unchanged distributed rounds run. Set 0 to
    * disable. */
  val LocalEdgeLimitKey = "spark.graft.cc.localEdgeLimit"
  private val localEdgeLimitDefault = 1000000L

  /** Driver union-find over collected (a, b) long pairs: returns
    * (node -> min reachable id) for every paired node, exactly the
    * distributed loop's contract. Path-compressed; O(E α(E)). */
  private def unionFindMinLabel(
      rows: Array[org.apache.spark.sql.Row]): scala.collection.mutable.LongMap[Long] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    rows.foreach { row =>
      val a = row.getLong(0); val b = row.getLong(1)
      if (!parent.contains(a)) parent(a) = a
      if (!parent.contains(b)) parent(b) = b
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(ra) = rb
    }
    val minOf = scala.collection.mutable.LongMap.empty[Long]
    parent.keysIterator.foreach { n =>
      val r = find(n)
      if (n < minOf.getOrElse(r, Long.MaxValue)) minOf(r) = n
    }
    val labels = scala.collection.mutable.LongMap.empty[Long]
    parent.keysIterator.foreach { n => labels(n) = minOf(find(n)) }
    labels
  }

  /** Connected components over a near-dup pair table -> (node, cluster)
    * with cluster = the minimum reachable id; training pipelines dedupe by
    * keeping one representative per CLUSTER, not per pair. Iterative
    * min-label propagation: one shuffle per round, converges in
    * O(component diameter) rounds (near-dup clusters are near-cliques, so
    * 2-3 in practice); [[connectedComponentsStar]] is the drop-in upgrade
    * for high-diameter (chain-shaped) pair graphs — same signature, same
    * (node, cluster=min reachable id) output. Singletons (no pair) are
    * omitted, matching the pair table's domain.
    *
    * Small pair graphs (measured count <= [[LocalEdgeLimitKey]], integral
    * ids) short-circuit to a driver union-find — identical labels, no
    * per-round barriers; see the key's doc for the scale rationale. */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 20): DataFrame = {
    val sparkS = pairs.sparkSession
    val dtA = pairs.schema(aCol).dataType
    val dtB = pairs.schema(bCol).dataType
    import org.apache.spark.sql.types._
    val integral = (dtA == dtB) && (dtA match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })
    val localLimit = sparkS.conf.getOption(LocalEdgeLimitKey)
      .map(_.toLong).getOrElse(localEdgeLimitDefault)
    if (integral && localLimit > 0) {
      val pc = pairs.select(col(aCol).cast("long").as("a"),
        col(bCol).cast("long").as("b")).cache()
      try {
        val nPairs = pc.count()
        val rows = if (nPairs <= localLimit) pc.collect() else null
        if (rows != null && rows.forall(r => !r.isNullAt(0) && !r.isNullAt(1))) {
          val labels = unionFindMinLabel(rows)
          def back(v: Long): Any = dtA match {
            case LongType => v
            case IntegerType => v.toInt
            case ShortType => v.toShort
            case ByteType => v.toByte
          }
          val out = new java.util.ArrayList[org.apache.spark.sql.Row](labels.size)
          labels.foreach { case (n, c) =>
            out.add(org.apache.spark.sql.Row(back(n), back(c)))
          }
          val schema = StructType(Seq(StructField("node", dtA),
            StructField("cluster", dtA)))
          return sparkS.createDataFrame(out, schema)
        }
        // over the limit (or null node ids, which the distributed path's
        // null-grouping semantics own): run the distributed rounds over
        // the already-cached canonical pair table — the size probe must
        // not cost the big path a recompute of an expensive pair join —
        // and cast the labels back to the caller's id type
        val labeled = connectedComponentsDistributed(pc, "a", "b", maxIter)
        if (dtA == LongType) labeled
        else labeled.select(col("node").cast(dtA).as("node"),
          col("cluster").cast(dtA).as("cluster"))
      } finally pc.unpersist()
    } else
      connectedComponentsDistributed(pairs, aCol, bCol, maxIter)
  }

  /** The iterative distributed min-label loop (the >limit / non-integral
    * path of [[connectedComponents]]; kept callable for tests). */
  private[graft] def connectedComponentsDistributed(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 20): DataFrame = {
    // Checkpointing.materialize (not cache) between rounds: each
    // iteration's plan embeds TWO copies of the previous one (join +
    // union), so without lineage truncation the logical plan doubles per
    // round and the optimizer OOMs by ~iteration 15. Local mode uses
    // localCheckpoint; set spark.graft.checkpointDir for the RELIABLE
    // (executor-loss-surviving, resumable) variant on a cluster.
    // cache the pair table FIRST: the symmetric-closure union below
    // references it twice, and without this the (possibly expensive)
    // pair-producing join would be evaluated twice; released as soon as
    // the edges checkpoint is materialized
    val p = pairs.select(col(aCol).as("a"), col(bCol).as("b")).cache()
    var edges = Checkpointing.materialize(
      p.union(p.select(col("b").as("a"), col("a").as("b"))).distinct())
    p.unpersist()
    // size the iteration shuffles from the MEASURED edge count, not the
    // session default — a 10^4-edge graph should not pay 32-task fixed
    // costs per round, and a 10^12-edge graph needs more than 32
    val nEdges = edges.count()
    val spark = pairs.sparkSession
    if (nEdges == 0) // no pairs -> no clustered nodes
      return edges.select(col("a").as("node"), col("a").as("cluster"))
    val defaultParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = math.max(1L, math.min(defaultParts.toLong, nEdges / 100000L + 1)).toInt
    edges = Checkpointing.materialize(edges.repartition(parts, col("a")))
    var labels = Checkpointing.materialize(
      edges.select(col("a").as("node")).distinct()
        .withColumn("cluster", col("node")))
    // Convergence probes. Numeric ids use the label-sum invariant: labels
    // are minima over a monotonically growing reachable set, so per-node
    // labels only ever DECREASE — the total strictly decreases until
    // fixpoint, and an unchanged sum proves convergence without a compare
    // join. Non-numeric ids (strings order lexicographically but don't
    // sum) fall back to a changed-row count between consecutive rounds —
    // one extra equi-join per round on the (small) label table.
    val numericIds = labels.schema("cluster").dataType match {
      case _: org.apache.spark.sql.types.NumericType => true
      case _ => false
    }
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("cluster").cast("decimal(38,0)"))).head().getDecimal(0)
    def changedCount(prev: DataFrame, next: DataFrame): Long =
      next.join(prev.withColumnRenamed("cluster", "__prev"), Seq("node"))
        .where(col("cluster") =!= col("__prev")).count()
    var prevSum = if (numericIds) labelSum(labels) else null
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neigh = Checkpointing.materialize(edges
        .join(labels.withColumnRenamed("node", "a"), "a")
        .select(col("b").as("node"), col("cluster"))
        .union(labels)
        .groupBy("node").agg(min("cluster").as("cluster")))
      // pointer jumping: follow each node's label to THAT node's label
      // (labels are always existing node ids) — path compression turns
      // O(diameter) rounds into O(log diameter)
      val prop = Checkpointing.materialize(neigh
        .join(neigh.select(col("node").as("cluster"),
          col("cluster").as("jumped")), Seq("cluster"))
        .select(col("node"), col("jumped").as("cluster")))
      if (numericIds) {
        val s = labelSum(prop)
        converged = s.compareTo(prevSum) == 0
        prevSum = s
      } else {
        converged = changedCount(labels, prop) == 0
      }
      labels = prop
      i += 1
    }
    // Silent non-convergence would under-merge clusters and feed WRONG
    // groups to dropNearDuplicates; with pointer jumping 20 rounds cover
    // component diameters ~2^20, so hitting the cap means something is
    // genuinely pathological — fail loudly.
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds; " +
        "raise maxIter (labels are still an under-merged over-segmentation)")
    labels
  }

  /** Connected components via LARGE-STAR / SMALL-STAR alternation — the
    * two-operation MapReduce algorithm of Kiveris et al., "Connected
    * Components in MapReduce and Beyond" (SoCC 2014): same signature and
    * output contract as [[connectedComponents]] (every paired node ->
    * min reachable id; singletons omitted), different scaling shape.
    *
    * Each round rewrites the EDGE set (shrinking toward per-component
    * stars rooted at the minimum id) instead of joining a full label
    * table against the edge list twice — on a chain-shaped pair graph
    * (low thresholds, transitive near-dups) min-label's per-round
    * double-join over all nodes is the bottleneck; the star ops converge
    * in O(log² n) rounds with per-round work proportional to the
    * current (shrinking) edge set:
    *
    *   large-star(u): m = min({u} ∪ Γ(u)); emit (v, m) for v ∈ Γ(u), v > u
    *   small-star(u): N = {v ∈ Γ(u) : v < u}, m = min(N);
    *                  emit (u, m) and (v, m) for v ∈ N \ {m}
    *
    * Both ops emit only (hi, lo) directed edges, so the working set
    * stays canonical; the fixpoint is the star graph (v, root) per
    * component. Convergence = unchanged (count, endpoint-hash-sum) edge
    * multiset across one large+small round — both invariants come from
    * ONE agg on the (small, shrinking) edge table, no compare join. */
  def connectedComponentsStar(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 20): DataFrame =
    starRounds(pairs, aCol, bCol, maxIter)._1

  /** [[connectedComponentsStar]] plus the executed round count — the
    * scaling-evidence hook (BENCH ladder) and the chain-graph round
    * bound asserted in tests. */
  private[graft] def starRounds(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 20): (DataFrame, Int) = {
    val p = pairs.select(col(aCol).as("x"), col(bCol).as("y"))
      .where(col("x") =!= col("y")).cache()
    // canonical (hi, lo) working set
    var edges = Checkpointing.materialize(
      p.select(greatest(col("x"), col("y")).as("x"),
        least(col("x"), col("y")).as("y")).distinct())
    p.unpersist()
    val spark = pairs.sparkSession
    // TWO independent hash folds (hash(x,y) and hash(y,x)) plus the count:
    // a changed edge multiset that collides one sum while keeping the
    // count would otherwise end iteration early and silently emit wrong
    // clusters (VERDICT r5 #2); both folds come from the SAME single agg,
    // so the hardening costs no extra pass
    def sig(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(sum(hash(col("x"), col("y")).cast("long")), lit(0L)),
        coalesce(sum(hash(col("y"), col("x")).cast("long")), lit(0L))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    var prev = sig(edges)
    if (prev._1 == 0)
      return (edges.select(col("x").as("node"), col("x").as("cluster")), 0)
    // iteration shuffles sized from the measured edge count (same rule
    // as the min-label path)
    val defaultParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = math.max(1L,
      math.min(defaultParts.toLong, prev._1 / 100000L + 1)).toInt
    edges = Checkpointing.materialize(edges.repartition(parts, col("x")))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // ---- large-star over the bidirectional neighborhood of u
      val bi = edges.union(edges.select(col("y").as("x"), col("x").as("y")))
      val mL = bi.groupBy("x").agg(min(col("y")).as("mn"))
        .select(col("x").as("u"), least(col("x"), col("mn")).as("m"))
      val ls = Checkpointing.materialize(
        bi.join(mL, bi("x") === mL("u"))
          .where(col("y") > col("x")) // v ∈ Γ(u), v > u
          .select(col("y").as("x"), col("m").as("y"))
          .where(col("x") =!= col("y"))
          .distinct())
      // ---- small-star over the below-u neighborhood (ls is canonical
      // (hi, lo), so grouping by x IS the below-u neighborhood)
      val mS = ls.groupBy("x").agg(min(col("y")).as("m"))
      val ss = Checkpointing.materialize(
        ls.join(mS, Seq("x"))
          .select(explode(array(
            struct(col("x").as("hi"), col("m").as("lo")),
            struct(col("y").as("hi"), col("m").as("lo")))).as("e"))
          .select(col("e.hi").as("x"), col("e.lo").as("y"))
          .where(col("x") =!= col("y"))
          .distinct())
      val s = sig(ss)
      converged = s == prev
      prev = s
      edges = ss
      i += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsStar did not converge in $maxIter rounds; " +
        "raise maxIter (edges are not yet per-component stars)")
    // fixpoint edges are (v, root): emit members + the roots themselves
    val labels = edges.select(col("x").as("node"), col("y").as("cluster"))
      .union(edges.select(col("y").as("node"), col("y").as("cluster")))
      .distinct()
    (labels, i)
  }

  /** The dedup materializer: drop every row whose id belongs to a
    * near-dup cluster but is not the cluster representative (minimum id)
    * — "keep one per cluster", the near-dup analog of [[exact]]. The
    * anti join is the only touch on the (huge) corpus; clustering runs
    * on the (small) pair graph. */
  def dropNearDuplicates(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    val losers = connectedComponents(pairs, aCol, bCol)
      .where(col("node") =!= col("cluster"))
      .select(col("node").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Embedding-cosine near-dup pairs via random-hyperplane LSH blocking
    * (sign bits of dot products with `nPlanes` deterministic pseudo-random
    * hyperplanes), verified with exact cosine >= threshold.
    *
    * `bands` independent nPlanes-bit signatures are OR'd into the
    * candidate set (minhash-style banding): a single signature loses any
    * near-dup pair that disagrees on even ONE sign bit, capping recall
    * structurally; with N bands a pair is lost only if every band
    * disagrees somewhere. bands=1 reproduces the single-signature
    * behavior bit-for-bit (band 0 = the unbanded plane family).
    *
    * `maxBucket` drops degenerate (band, bucket) groups — boilerplate or
    * zero-ish embeddings all landing on one signature would otherwise
    * make the bucket self-join |bucket|², the exact trap the minhash and
    * simhash paths already cap. NOTE the trade (same as those siblings):
    * members of a dropped bucket are NOT reported as pairs, so a
    * >maxBucket cluster of near-identical embeddings goes undeduped by
    * THIS operator. That is deliberate — identical/boilerplate payloads
    * are [[exact]] dedup's job (hash equality, no quadratic risk), and
    * the alternative (letting one bucket own |bucket|² work) is how a
    * 100 TB run dies. Raise `maxBucket` only with a matching oracle
    * update (the q25/q39 lesson: caps must be modeled or sf0.1
    * diverges). */
  def embeddingDupPairs(
      df: DataFrame,
      idCol: String,
      embCol: String,
      dim: Int,
      // scale-safe defaults (VERDICT r4 #5): 16 planes = 65536 buckets
      // per band (cap saturation ~2^16·maxBucket ≈ 6.5·10^7 rows instead
      // of the old 8-plane 2.6·10^5), and 2 bands so the narrower
      // per-band buckets don't cost recall (a pair is lost only if EVERY
      // band disagrees somewhere). The old nPlanes=8/bands=1 default was
      // the exact combination the plan-time warning below calls a recall
      // trap. bands=1 still reproduces the single-signature behavior
      // bit-for-bit when requested explicitly.
      nPlanes: Int = 16,
      threshold: Double = 0.95,
      bands: Int = 2,
      maxBucket: Int = 1000): DataFrame = {
    // Default-parameter trap, made loud: nPlanes=8 leaves only 256 buckets
    // per band, so beyond ~bucketSpace*maxBucket rows TYPICAL buckets (not
    // just degenerate ones) exceed the cap and recall collapses. The
    // runtime drop is observed+logged by capBuckets/CapMetrics; this
    // plan-time warning fires before any job runs.
    // every row lands once in EVERY band, so a band's 2^nPlanes buckets
    // saturate at ~2^nPlanes·maxBucket rows REGARDLESS of band count —
    // more bands add recall, not cap headroom
    val saturation = (1L << math.min(nPlanes, 40)) * maxBucket
    if (nPlanes <= 10)
      log.warn(s"embeddingDupPairs: nPlanes=$nPlanes gives only " +
        s"${1L << nPlanes} buckets per band; above ~$saturation " +
        s"rows the maxBucket=$maxBucket cap will drop TYPICAL buckets and " +
        "recall collapses — raise nPlanes (with more bands to keep recall) " +
        "or maxBucket, and watch the graft_cap dropped_rows metric")
    val base = df.select(col(idCol).as("id"),
      transform(col(embCol), x => x.cast("double")).as("v"))
      .withColumn("n", Similarity.norm(col("v"))) // once per row, not per pair
    val banded = base.select(col("id"), col("v"), col("n"),
      posexplode(array((0 until bands).map(bd =>
        Similarity.hyperplaneSigBand(col("v"), dim, nPlanes, bd, bands)): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    // cap degenerate buckets (see scale note above); materialized ONCE so
    // the self-join's legs don't each recompute signatures + cap window
    val capped = Checkpointing.materialize(
      capBuckets(banded, maxBucket).drop("__n"))
    val a = capped
      .select(col("band"), col("bucket"), col("id").as("id_a"),
        col("v").as("v_a"), col("n").as("n_a"))
    val b = capped
      .select(col("band"), col("bucket"), col("id").as("id_b"),
        col("v").as("v_b"), col("n").as("n_b"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosinePre(col("v_a"), col("v_b"),
          col("n_a"), col("n_b")).as("cos"))
      .where(col("cos") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }
}
