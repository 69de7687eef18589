package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming operators over the `events` table shape — entry-point
  * streams, windowed aggregation, keyed state
  * (`execution_stream.py`, `shared_state.py`, SURVEY §2.9).
  */
object StreamOps {

  /** Watermarked tumbling-window aggregation — the beyond-reference
    * event-time extension (reference is processing-time only, ST3).
    * Runs identically on a file/Kafka stream and in batch mode.
    */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Start the windowed aggregation as a streaming query reading
    * parquet files from `dir` (file-source streaming; new files = new
    * micro-batches), delivering to in-memory sink `sinkName`.
    */
  def runFileStream(spark: SparkSession, dir: String, schema: org.apache.spark.sql.types.StructType,
      sinkName: String): StreamingQuery = {
    val stream = spark.readStream.schema(schema).parquet(dir)
    val streamTs = graft.core.Engine.normalizeTs(stream)
    windowedCounts(streamTs)
      .writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Per-key running state for a stream of (key, value) — the keyed
    * shared-state analog (`shared_state.py:49-343`): one state row per
    * key, updated per micro-batch via mapGroupsWithState. Shuffle by
    * key gives single-writer-per-key for free (the reference needs
    * per-key locks, ST2's SYNCHRONIZED level).
    */
  final case class KeyedCount(key: String, n: Long, sum: Double)

  def runningKeyedState(events: Dataset[(String, Double)]): Dataset[KeyedCount] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[KeyedCount, KeyedCount](GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[KeyedCount]) =>
          val prev = state.getOption.getOrElse(KeyedCount(key, 0L, 0.0))
          val batch = rows.toSeq
          val updated = KeyedCount(key, prev.n + batch.size, prev.sum + batch.map(_._2).sum)
          state.update(updated)
          updated
      }
  }

  /** Streaming stall detector — W1's stateful form
    * (`event_loop_node.py:1823-1829` over an unbounded stream): per
    * key, a ring buffer of the last `threshold` values lives in
    * `GroupState`; when all are identical and non-empty, a stall event
    * is emitted. State is O(threshold) per key regardless of stream
    * length.
    */
  final case class StallEvent(key: String, value: String, runLength: Int)

  def streamingStallDetector(events: Dataset[(String, String)], threshold: Int = 3):
      Dataset[StallEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[List[String], StallEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[List[String]]) =>
          var buf = state.getOption.getOrElse(Nil)
          val out = Seq.newBuilder[StallEvent]
          rows.foreach { case (_, v) =>
            buf = (buf :+ v).takeRight(threshold)
            if (buf.size == threshold && v.nonEmpty && buf.forall(_ == v))
              out += StallEvent(key, v, threshold)
          }
          state.update(buf)
          out.result().iterator
      }
  }

  /** Streaming KMV distinct-estimate: the bottom-k sketch
    * ([[graft.operators.Aggregators.kmv]]) as a complete-mode global
    * aggregate — each micro-batch folds into O(k) state, and the
    * emitted summary row IS the sketch of everything seen so far
    * (derive the estimate with the same (k−1)·2³²/h₍k₎ rule as the
    * batch [[graft.operators.Analytics.kmvDistinct]]). The live
    * "distinct URLs/users so far" counter; unlike
    * approx_count_distinct state, the emitted sketch also composes
    * with OTHER corpora's sketches by set union.
    */
  def streamingDistinctEstimate(events: DataFrame, itemCol: String,
      k: Int = 256, seed: String = "kmv"): DataFrame = {
    import events.sparkSession.implicits._
    events
      .filter(col(itemCol).isNotNull)
      .select(graft.operators.TextOps.portableHash(col(itemCol), seed).as("h"))
      .as[Long]
      .select(graft.operators.Aggregators.kmv(k).toColumn)
      .toDF("kmv")
  }

  /** Streaming KLL quantile sketch — [[graft.operators.Aggregators
    * .kllSketch]] as a complete-mode global aggregate, the quantile
    * companion of [[streamingDistinctEstimate]]: each micro-batch
    * folds into O(k·log n) state and the emitted row IS the sketch of
    * everything seen so far (read p50/p99 with
    * [[graft.operators.Aggregators.kllQuantile]]). The live "latency
    * percentile so far" monitor; the emitted sketch also merges with
    * other corpora's sketches, which percentile_approx state never
    * leaves the aggregation.
    */
  def streamingQuantileSketch(events: DataFrame, valueCol: String,
      k: Int = 256): DataFrame = {
    import events.sparkSession.implicits._
    events
      .filter(col(valueCol).isNotNull && !col(valueCol).cast("double").isNaN)
      .select(col(valueCol).cast("double"))
      .as[Double]
      .select(graft.operators.Aggregators.kllSketch(k).toColumn)
      .toDF("kll")
  }

  /** Streaming image-ingest dedup — the crawl loop for a multimodal
    * corpus as a foreachBatch stream: each micro-batch dHashes its
    * images ([[graft.operators.Dedup.imageHashSignatures]], map-only),
    * pairs them against the DURABLE signature store via
    * [[graft.operators.Dedup.incrementalHammingNearDuplicates]]
    * (new-vs-anything, never old-vs-old — O(batch) per batch), then
    * appends its own signatures to the store. Layout under
    * `storeDir`:
    *
    * {{{
    * store_meta.json    # {"version":1,"signature":"<kernel>/<ver>"}
    * sigs/batch=<id>/   # (id, sh) per ingested batch
    * pairs/batch=<id>/  # (id_a, id_b, hamming) found by that batch
    * }}}
    *
    * Per-batch generation dirs + overwrite mode make a replayed batch
    * idempotent (foreachBatch redelivers with the same batchId);
    * pairs are written BEFORE signatures so a crash between the two
    * replays into overwrites, never into the batch meeting its own
    * signatures as "old".
    */
  def streamingImageDedupIngest(stream: DataFrame, idCol: String,
      contentCol: String, storeDir: String, checkpointDir: String,
      maxHamming: Int = 6, bands: Int = 8,
      maxBucketSize: Int = graft.operators.Dedup.DefaultMaxBucketSize)
      : org.apache.spark.sql.streaming.StreamingQuery =
    streamingSignatureDedupIngest(stream, idCol, contentCol,
      graft.operators.Multimodal.dhash64Col,
      graft.operators.Multimodal.DHashSignatureName, storeDir,
      checkpointDir, maxHamming, bands, maxBucketSize)

  /** Streaming cross-modal cover-art linking —
    * [[streamingImageDedupIngest]] over the
    * [[graft.operators.Multimodal.mediaLinkHash64Col]] kernel: a
    * crawl loop that links incoming audio/video (by embedded art)
    * and images (by their raster) against everything already
    * ingested, batch by batch. Same durable store layout, same
    * kernel-identity stamp (the store refuses a drifted kernel), same
    * new-vs-anything cost bound.
    */
  def streamingArtLinkIngest(stream: DataFrame, idCol: String,
      contentCol: String, storeDir: String, checkpointDir: String,
      maxHamming: Int = 6, bands: Int = 8,
      maxBucketSize: Int = graft.operators.Dedup.DefaultMaxBucketSize)
      : org.apache.spark.sql.streaming.StreamingQuery =
    streamingSignatureDedupIngest(stream, idCol, contentCol,
      graft.operators.Multimodal.mediaLinkHash64Col,
      graft.operators.Multimodal.MediaLinkHashSignatureName, storeDir,
      checkpointDir, maxHamming, bands, maxBucketSize)

  /** Streaming media card — the live form of
    * [[graft.operators.Multimodal.upsertMediaCardState]], built on
    * the signature store's replay discipline instead of a read-
    * modify-write fold: each micro-batch writes its per-group MONOID
    * partial ([[graft.operators.Multimodal.mediaCardSignals]]) to its
    * OWN generation dir (`partials/batch=<id>`, overwrite mode), so a
    * foreachBatch redelivery overwrites identical bytes instead of
    * double-counting — the property a stateful fold can only
    * approximate with markers. Partials are O(groups) rows each;
    * [[streamingMediaCard]] re-sums them at read time, and a
    * caller-scheduled compaction can fold old generations through
    * `upsertMediaCardState` when the generation count grows.
    */
  def streamingMediaCardIngest(stream: DataFrame, contentCol: String,
      groupCol: String, storeDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Multimodal
          .mediaCardSignals(batch, contentCol, groupCol)
          .write.mode("overwrite")
          .parquet(s"$storeDir/partials/batch=$batchId")
        ()
      }
      .start()

  /** Derive the media card from a [[streamingMediaCardIngest]] store:
    * the compacted monoid state (if [[compactMediaCardStore]] has
    * run) plus every partial generation it does not cover, re-summed
    * and derived — the same merge and derive the batch card uses, so
    * stream == batch by construction (StreamingSpec locks it).
    *
    * Generations are listed through the filesystem and read by
    * explicit path, filtered by the compacted state's
    * `__covered_upto` watermark — so a crash that left folded
    * generation dirs behind (compaction GC is after the pointer
    * flip) can never double-count them, and a GC deleting a covered
    * dir mid-read can never break the listing (covered dirs are
    * never selected).
    */
  def streamingMediaCard(spark: org.apache.spark.sql.SparkSession,
      storeDir: String, groupCol: String): DataFrame = {
    val M = graft.operators.Multimodal
    val compacted = graft.operators.Scale.readVersionedState(
      spark, s"$storeDir/compacted")
    val covered = compacted.fold(-1L)(coveredUpto)
    val gens = listPartialGenerations(spark, storeDir).collect {
      case (id, path) if id > covered => path
    }
    val live =
      if (gens.isEmpty) None
      else Some(spark.read.parquet(gens: _*).drop("batch"))
    val state = (compacted.map(_.drop(CoveredCol)), live) match {
      case (Some(c), Some(l)) => c.unionByName(l)
      case (Some(c), None) => c
      case (None, Some(l)) => l
      case (None, None) => throw new IllegalArgumentException(
        s"no media-card store at $storeDir")
    }
    M.deriveMediaCard(M.mergeMediaCardSignals(state), groupCol)
  }

  /** The column stamping how far a compacted media-card state reaches:
    * every partial generation with `batch <= __covered_upto` is
    * already folded in. Carried INSIDE the state frame so the
    * watermark commits atomically with the state (one `_CURRENT`
    * pointer flip covers both).
    */
  private val CoveredCol = "__covered_upto"

  private def coveredUpto(state: DataFrame): Long =
    state.select(max(col(CoveredCol))).head() match {
      case r if r.isNullAt(0) => -1L
      case r => r.getLong(0)
    }

  /** List a media-card store's partial generations as (batchId, path),
    * via the filesystem (no partition discovery — a concurrently
    * GC'd covered dir must not break the read).
    */
  private def listPartialGenerations(spark: SparkSession,
      storeDir: String): Seq[(Long, String)] = {
    val partials = new org.apache.hadoop.fs.Path(s"$storeDir/partials")
    val fs = partials.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(partials)) Nil
    else fs.listStatus(partials).toSeq.collect {
      case st if st.isDirectory &&
        st.getPath.getName.matches("batch=\\d+") =>
        (st.getPath.getName.stripPrefix("batch=").toLong,
          st.getPath.toString)
    }.sortBy(_._1)
  }

  /** Compact a [[streamingMediaCardIngest]] store: fold the partial
    * generations into ONE versioned monoid state
    * (`<storeDir>/compacted`, [[graft.operators.Scale
    * .writeVersionedState]]'s write-ahead + point-the-pointer-last
    * discipline) and garbage-collect the folded dirs — the
    * maintenance operator a long-running ingest needs, since the
    * partials store otherwise grows one parquet dir per micro-batch
    * forever.
    *
    * Safety invariants:
    *   - The NEWEST generation is never folded: after a crash,
    *     foreachBatch redelivers the last uncommitted batch, whose
    *     idempotence is overwrite-same-dir — folding it would turn
    *     a redelivery into a double count.
    *   - The covered watermark travels INSIDE the state frame
    *     ([[CoveredCol]]), so state + watermark commit in one
    *     pointer flip; a crash BEFORE the flip leaves the old state
    *     and all dirs intact, a crash AFTER the flip (before GC)
    *     leaves folded dirs behind that [[streamingMediaCard]]
    *     filters out by the watermark — either way a reader sees a
    *     complete, never-partial store.
    *   - Re-running compaction after such a crash just finishes the
    *     GC.
    *
    * Returns the number of generations folded this call (0 = nothing
    * to do beyond GC).
    */
  def compactMediaCardStore(spark: SparkSession, storeDir: String): Int = {
    val M = graft.operators.Multimodal
    val statePath = s"$storeDir/compacted"
    val compacted = graft.operators.Scale.readVersionedState(spark, statePath)
    val covered = compacted.fold(-1L)(coveredUpto)
    val gens = listPartialGenerations(spark, storeDir)
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def gc(upTo: Long): Unit = gens.foreach { case (id, path) =>
      if (id <= upTo) fs.delete(new org.apache.hadoop.fs.Path(path), true)
    }
    // all but the newest generation, beyond what's already covered
    val candidates = gens.dropRight(1).filter(_._1 > covered)
    if (candidates.isEmpty) { gc(covered); return 0 }
    val upTo = candidates.last._1
    val fresh = spark.read.parquet(candidates.map(_._2): _*).drop("batch")
    val merged = M.mergeMediaCardSignals(
      compacted.map(_.drop(CoveredCol).unionByName(fresh)).getOrElse(fresh))
      .withColumn(CoveredCol, lit(upTo))
    graft.operators.Scale.writeVersionedState(spark, statePath, merged)
    gc(upTo) // after the pointer flip: a crash here just delays GC
    candidates.size
  }

  /** [[streamingImageDedupIngest]] for ANY 64-bit perceptual
    * signature — pass the modality's kernel column
    * ([[graft.operators.Multimodal.dhash64Col]] for images,
    * [[graft.operators.Multimodal.audioHash64Col]] for audio/MP3,
    * `CatalystExpressions.simhash64 ∘ tokenHashes` for text): one
    * ingest loop, one store layout, one incremental join for every
    * modality, so the crawl infrastructure can never drift between
    * them. Signature-null rows (non-decodable bytes) are dropped —
    * they can't be near anything.
    *
    * `signatureName` is the versioned kernel identity
    * ([[graft.operators.Multimodal.DHashSignatureName]] /
    * [[graft.operators.Multimodal.AudioHashSignatureName]]; text
    * SimHash callers pass `"simhash64/1"`): stamped into
    * `store_meta.json` at store creation, and every later batch
    * REFUSES a store stamped differently — a kernel whose bit output
    * changed (new framing, fixed bug) would otherwise keep joining
    * new signatures against incompatible persisted ones and miss
    * real duplicates with no error. A store written before
    * versioning existed (sigs present, no meta) is refused with the
    * rebuild instruction for the same reason.
    */
  def streamingSignatureDedupIngest(stream: DataFrame, idCol: String,
      contentCol: String,
      signature: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      signatureName: String,
      storeDir: String, checkpointDir: String,
      maxHamming: Int = 6, bands: Int = 8,
      maxBucketSize: Int = graft.operators.Dedup.DefaultMaxBucketSize)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val sigs = batch
          .select(col(idCol).as("id"), signature(col(contentCol)).as("sh"))
          .filter(col("sh").isNotNull)
          .localCheckpoint(false) // one decode serves pairs + the store write
        // explicit existence check, NOT a broad AnalysisException
        // catch: a corrupt / permission-broken store must fail the
        // batch loudly — degrading it to "no old signatures" would
        // silently record false no-duplicate results forever
        val hconf = spark.sparkContext.hadoopConfiguration
        val sigsPath = new org.apache.hadoop.fs.Path(s"$storeDir/sigs")
        val storeExists = sigsPath.getFileSystem(hconf).exists(sigsPath)
        checkOrStampSignatureStore(hconf, storeDir, signatureName,
          storeExists)
        val old =
          if (!storeExists) sigs.filter(lit(false))
          else spark.read.parquet(s"$storeDir/sigs")
            // partition discovery exposes the generation as `batch`; a
            // replayed batch must not meet its own earlier write
            .filter(col("batch") =!= batchId).drop("batch")
        val pairs = graft.operators.Dedup.incrementalHammingNearDuplicates(
          old.unionByName(sigs), sigs, maxHamming, bands, maxBucketSize)
        pairs.write.mode("overwrite")
          .parquet(s"$storeDir/pairs/batch=$batchId")
        sigs.write.mode("overwrite")
          .parquet(s"$storeDir/sigs/batch=$batchId")
        ()
      }
      .start()

  /** Compact a [[streamingSignatureDedupIngest]] store's signature
    * generations: fold every `sigs/batch=*` dir except the NEWEST
    * into one merged generation keeping the lowest folded id — the
    * [[compactMediaCardStore]] discipline for the dedup stores,
    * whose partials otherwise grow one parquet dir per micro-batch
    * forever. `pairs/batch=*` dirs are RESULTS, not state, and are
    * left untouched.
    *
    * Contract: run while the ingest is STOPPED — the ingest both
    * reads and writes `sigs/`, so compaction is a maintenance-window
    * operation (the TarSource reshard discipline). Within that
    * contract it is crash-safe by RESUME:
    *
    *   - the merged generation is staged OUTSIDE `sigs/` as
    *     `.compact_sigs_<lo>_<hi>` (the folded id range travels in
    *     the name);
    *   - folded dirs are deleted lowest-id FIRST, so
    *     "`batch=<lo>` still exists" means no deletion has happened
    *     and a stale staging dir can simply be discarded;
    *   - `batch=<lo>` missing + staging present means a swap was
    *     interrupted: a re-run deletes the remaining folded dirs in
    *     [lo, hi] and renames the staging dir into place before
    *     doing anything new.
    *
    * The newest generation is never folded: after a restart,
    * foreachBatch redelivers the last uncommitted batch, whose
    * idempotence is overwrite-same-dir — folding it would turn a
    * redelivery into the batch meeting its own signatures. Returns
    * the number of generations folded (0 = nothing to do).
    */
  def compactSignatureStore(spark: SparkSession, storeDir: String): Int = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(storeDir)
    val fs = root.getFileSystem(hconf)
    val sigs = new org.apache.hadoop.fs.Path(s"$storeDir/sigs")
    def gens(): Seq[(Long, org.apache.hadoop.fs.Path)] =
      if (!fs.exists(sigs)) Nil
      else fs.listStatus(sigs).toSeq.collect {
        case st if st.isDirectory && st.getPath.getName.matches("batch=\\d+") =>
          (st.getPath.getName.stripPrefix("batch=").toLong, st.getPath)
      }.sortBy(_._1)
    // resume or discard an interrupted swap FIRST
    val StagingRe = "\\.compact_sigs_(\\d+)_(\\d+)".r
    if (fs.exists(root)) fs.listStatus(root).foreach { st =>
      st.getPath.getName match {
        case StagingRe(loS, hiS) =>
          val lo = loS.toLong
          val hi = hiS.toLong
          val target = new org.apache.hadoop.fs.Path(sigs, s"batch=$lo")
          if (fs.exists(target)) {
            fs.delete(st.getPath, true) // fold never started: stale staging
          } else {
            // interrupted swap: finish the deletes, then the rename
            gens().foreach { case (id, p) =>
              if (id >= lo && id <= hi) fs.delete(p, true)
            }
            fs.rename(st.getPath, target)
          }
        case _ => ()
      }
    }
    val all = gens()
    val candidates = all.dropRight(1)
    if (candidates.size < 2) return 0 // nothing worth folding
    val lo = candidates.head._1
    val hi = candidates.last._1
    val merged = spark.read.parquet(candidates.map(_._2.toString): _*)
    val staging = new org.apache.hadoop.fs.Path(root,
      s".compact_sigs_${lo}_$hi")
    merged.write.mode("overwrite").parquet(staging.toString)
    // point of no return: delete lowest-id first (see resume rule)
    candidates.foreach { case (_, p) => fs.delete(p, true) }
    fs.rename(staging, new org.apache.hadoop.fs.Path(sigs, s"batch=$lo"))
    candidates.size
  }

  /** Enforce the signature-store version contract: stamp
    * `store_meta.json` when the store is new, verify it matches the
    * running kernel otherwise, refuse pre-versioning stores (sigs
    * present, no meta). The stamp is idempotent (a replayed batch 0
    * rewrites identical bytes).
    */
  private def checkOrStampSignatureStore(
      hconf: org.apache.hadoop.conf.Configuration, storeDir: String,
      signatureName: String, storeExists: Boolean): Unit = {
    val metaPath = new org.apache.hadoop.fs.Path(s"$storeDir/store_meta.json")
    val fs = metaPath.getFileSystem(hconf)
    if (fs.exists(metaPath)) {
      val in = fs.open(metaPath)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
      val parsed = org.json4s.jackson.JsonMethods.parse(text)
      require((parsed \ "version").extract[Int] == 1,
        s"unsupported signature store layout at $storeDir")
      val stamped = (parsed \ "signature").extract[String]
      require(stamped == signatureName,
        s"signature store at $storeDir was built with kernel '$stamped' " +
          s"but this ingest runs '$signatureName' — persisted signatures " +
          "would silently stop matching new ones (missed duplicates, no " +
          "error). Rebuild the store with the current kernel, or run the " +
          "kernel version it was built with.")
    } else if (storeExists) {
      throw new IllegalStateException(
        s"signature store at $storeDir predates store versioning (sigs/ " +
          "present, no store_meta.json) — its kernel version is unknown " +
          "and incremental matching against it is unsafe. Rebuild the " +
          "store with the current kernel.")
    } else {
      val out = fs.create(metaPath, true)
      try out.write(
        s"""{"version":1,"signature":"$signatureName"}""".getBytes("UTF-8"))
      finally out.close()
    }
  }

  /** A flagged outlier from [[streamingAnomalyFlags]]. */
  final case class AnomalyHit(key: String, seq: Long, value: Double,
    zscore: Double)

  /** Streaming rolling z-score anomaly monitor — the incremental twin
    * of [[graft.operators.Analytics.anomalyFlags]] with the SAME
    * semantics: a value is flagged when it deviates more than
    * `z`·σ from the mean of that key's previous `window` values, and
    * never during the cold start (fewer than `window` predecessors).
    * The rolling stats run over integer cents exactly like the batch
    * form, so batch and stream agree bit-for-bit on the same ordered
    * input.
    *
    * State per key is a bounded Seq of `window` longs — O(window) no
    * matter how long the stream runs. Rows WITHIN a micro-batch are
    * processed in `seq` order (cross-batch order is the stream's
    * arrival order, as with every keyed-state operator here).
    */
  def streamingAnomalyFlags(events: Dataset[(String, Long, Double)],
      window: Int = 20, z: Double = 3.0): Dataset[AnomalyHit] = {
    require(window >= 2, "window must be >= 2")
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[Seq[Long], AnomalyHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[Seq[Long]]) =>
          var buf = state.getOption.getOrElse(Seq.empty)
          val out = Seq.newBuilder[AnomalyHit]
          rows.toSeq.sortBy(_._2).foreach { case (_, seq, v) =>
            // roundHalfAway, NOT math.round: Spark's round() (the batch
            // form's cents) rounds half away from zero, math.round half
            // toward +∞ — they disagree at negative exact halves
            // (-0.125 → -12 vs -13), breaking bit parity
            val cents = graft.functions.ExprKernels.roundHalfAway(v * 100)
            if (buf.size == window) {
              val n = window.toDouble
              val s1 = buf.sum.toDouble
              val s2 = buf.map(c => c * c).sum.toDouble
              val mean = s1 / n
              val variance = math.max((s2 - s1 * s1 / n) / n, 0.0)
              val std = math.sqrt(variance)
              if (std > 0) {
                // round BEFORE the threshold compare — the batch form
                // flags on the rounded zscore column; keep bit parity
                val zs = BigDecimal((cents.toDouble - mean) / std)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                if (math.abs(zs) > z) out += AnomalyHit(key, seq, v, zs)
              }
            }
            buf = (buf :+ cents).takeRight(window)
          }
          state.update(buf)
          out.result().iterator
      }
  }

  /** A stage advance emitted by [[streamingFunnel]]: `key` newly
    * satisfies the first-touch chain through `stageIdx` (1-based). */
  final case class FunnelAdvance(key: String, stageIdx: Int, stage: String)

  /** Streaming first-touch funnel — the incremental twin of
    * [[graft.operators.Analytics.funnel]] with the SAME membership
    * rule: a user reaches stage k when the FIRST occurrences of stages
    * 1..k are strictly increasing in event time. Emits one
    * [[FunnelAdvance]] the moment a user's chain first extends to a
    * new depth (append mode — the live funnel counter updates
    * incrementally instead of rescanning history).
    *
    * State per key: one long per stage (first-touch times) + the
    * deepest stage already emitted — O(|stages|) forever. Note the
    * first-touch rule is order-sensitive: a stage-2 event arriving
    * BEFORE any stage-1 event permanently blocks that user in batch
    * and stream alike (the agreement the spec locks).
    *
    * Out-of-order arrivals: batch parity is guaranteed only when
    * events arrive in event-time order. Once a depth is emitted it is
    * never retracted (append mode has no retractions), so the
    * first-touch times of stages already covered by `emitted` are
    * FROZEN — a late-arriving earlier event for an emitted stage
    * cannot rewrite the chain that justified an emitted advance,
    * which keeps the stream's emitted depths consistent with their
    * own state (a batch recompute over the full log may then report a
    * shallower depth for that key; that is the documented trade of an
    * append-only live counter).
    */
  def streamingFunnel(events: Dataset[(String, Long, String)],
      stages: Seq[String]): Dataset[FunnelAdvance] = {
    require(stages.nonEmpty, "stages must be non-empty")
    import events.sparkSession.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    val Unseen = Long.MinValue
    events.groupByKey(_._1)
      .flatMapGroupsWithState[(Seq[Long], Int), FunnelAdvance](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[(Seq[Long], Int)]) =>
          var (firsts, emitted) = state.getOption
            .getOrElse((Seq.fill(stages.size)(Unseen), 0))
          val f = firsts.toArray
          val out = Seq.newBuilder[FunnelAdvance]
          rows.toSeq.sortBy(_._2).foreach { case (_, ts, tpe) =>
            stageIdx.get(tpe).foreach { i =>
              // freeze stages already covered by an emitted advance
              // (i is 0-based; emitted is a 1-based depth): emitted
              // depths must stay justified by the state that emitted
              // them even under out-of-order arrival — see scaladoc
              if (i >= emitted && (f(i) == Unseen || ts < f(i))) f(i) = ts
              // depth = longest strictly-increasing prefix of firsts
              var depth = 0
              var prev = Long.MinValue
              var j = 0
              var ok = true
              while (ok && j < f.length) {
                if (f(j) != Unseen && (j == 0 || f(j) > prev)) {
                  depth = j + 1; prev = f(j); j += 1
                } else ok = false
              }
              while (emitted < depth) {
                emitted += 1
                out += FunnelAdvance(key, emitted, stages(emitted - 1))
              }
            }
          }
          state.update((f.toSeq, emitted))
          out.result().iterator
      }
  }

  /** Streaming exact dedup: `dropDuplicates` over a fingerprint column
    * with keyed state across micro-batches; `withWatermark` bounds the
    * state for event-time streams (without it, state grows with the
    * distinct-key count — fine for bounded keys, fatal at 100 TB, so
    * production streams must pass a watermark column + delay).
    */
  def streamingDedup(events: DataFrame, keyCols: Seq[String],
      watermark: Option[(String, String)] = None): DataFrame = {
    val wm = watermark.fold(events) { case (c, d) => events.withWatermark(c, d) }
    wm.dropDuplicates(watermark.fold(keyCols) { case (c, _) => keyCols :+ c })
  }

  /** Streaming heavy hitters — the SAME mergeable Misra–Gries summary
    * as [[graft.operators.Aggregators.misraGries]], run as a streaming
    * global aggregate: each micro-batch's partial summaries merge into
    * the running state-store summary (complete output mode), so the
    * state is permanently bounded at `capacity` counters no matter how
    * many distinct items the stream ever carries — the frequent-
    * domains monitor for an unbounded crawl feed. Same guarantee as
    * batch: counts are lower bounds within N/(capacity+1); exact while
    * distinct ≤ capacity.
    */
  def streamingFrequentItems(events: DataFrame, itemCol: String,
      capacity: Int): DataFrame = {
    import events.sparkSession.implicits._
    events.select(col(itemCol).cast("string"))
      .filter(col(itemCol).isNotNull).as[String]
      .select(graft.operators.Aggregators.misraGries(capacity).toColumn)
      .toDF("mg")
  }

  /** Streaming NEAR-duplicate detection — the incremental twin of
    * [[graft.operators.Dedup.minhashNearDuplicates]]: MinHash
    * signatures are a map-only projection (stream-compatible), the
    * LSH (band, band_hash) bucket becomes the state key, and
    * `flatMapGroupsWithState` keeps each bucket's members — a new
    * arrival emits a pair against every stored same-bucket member
    * whose signature overlap clears `minJaccard`, INCLUDING members
    * from earlier micro-batches (which a per-batch join can't see).
    *
    * Scale: the banding reuses the batch definition (same buckets
    * stream or batch); bucket membership is capped at `maxBucketSize`
    * like every batch LSH join — a boilerplate bucket stops admitting
    * members instead of going quadratic — so state is
    * O(maxBucketSize × signature) per distinct bucket. Pairs colliding
    * in several bands emit once per band (the batch path's
    * pre-`distinct()` form): dedup downstream, or treat as
    * at-least-once.
    */
  final case class NearDupPair(id_a: Long, id_b: Long, est_jaccard: Double)

  def streamingNearDuplicates(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleK: Int = 3,
      minJaccard: Double = 0.5, maxBucketSize: Int = 1000): Dataset[NearDupPair] = {
    import docs.sparkSession.implicits._
    val banded = graft.operators.Dedup.bandedOf(
      graft.operators.Dedup.minhashSignatures(docs, idCol, textCol, numHashes, shingleK),
      idCol, numHashes, bands, keepSignature = true)
      .select(col("band"), col("band_hash"), col("id").cast("long"),
        col("signature"))
      .as[(Int, Long, Long, Seq[Long])]
    banded.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[List[(Long, Seq[Long])], NearDupPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[List[(Long, Seq[Long])]]) =>
          var members = state.getOption.getOrElse(Nil)
          val out = Seq.newBuilder[NearDupPair]
          rows.foreach { case (_, _, id, sig) =>
            if (!members.exists(_._1 == id)) {
              members.foreach { case (mid, msig) =>
                if (msig.length == sig.length) {
                  var same = 0
                  var i = 0
                  while (i < sig.length) { if (sig(i) == msig(i)) same += 1; i += 1 }
                  val est = same.toDouble / sig.length
                  if (est >= minJaccard)
                    out += NearDupPair(math.min(id, mid), math.max(id, mid),
                      est)
                }
              }
              if (members.size < maxBucketSize) members = (id, sig) :: members
            }
          }
          state.update(members)
          out.result().iterator
      }
  }

  /** One element of a [[streamingAsOf]] input: state rows
    * (`isState = true`) advance the per-key reference value; event
    * rows emit joined against the latest reference at or before their
    * time.
    */
  final case class AsOfEvent(key: String, time: Long, isState: Boolean, value: Double)
  final case class AsOfState(time: Long, value: Double)
  final case class AsOfMatch(key: String, time: Long, value: Double,
      state_time: Option[Long], state_value: Option[Double])

  /** Streaming as-of join — the incremental twin of
    * [[graft.plans.AsOf.join]] (backward direction), and the streaming
    * form of the reference's "read latest state at execution" rule
    * (`shared_state.py:117-160`: reads resolve to the most recent
    * write). Both sides arrive as one tagged stream;
    * `flatMapGroupsWithState` keeps exactly ONE row per key (the
    * latest reference state) — O(1) state, no retained event history.
    *
    * Within a micro-batch, rows process in (time, state-first) order,
    * so an event at the same time as a state row sees it (inclusive
    * backward, matching the batch exec). Across batches, arrival order
    * rules, like every reference stream (SURVEY ST3: no event-time
    * lateness): a state row older than the retained one is ignored
    * (state only advances), and an event arriving before its matching
    * state joins the previous state — the documented
    * processing-time relaxation, not a bug.
    */
  def streamingAsOf(events: Dataset[AsOfEvent]): Dataset[AsOfMatch] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[AsOfState, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[AsOfState]) =>
          val out = List.newBuilder[AsOfMatch]
          var cur = state.getOption
          rows.toSeq.sortBy(e => (e.time, !e.isState)).foreach { e =>
            if (e.isState) {
              if (cur.forall(_.time <= e.time)) cur = Some(AsOfState(e.time, e.value))
            } else {
              val m = cur.filter(_.time <= e.time)
              out += AsOfMatch(key, e.time, e.value, m.map(_.time), m.map(_.value))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  /** Incremental run metrics (A8, `run.py:45-66` + `runtime/core.py`
    * update sites): per-run running counters — total/successful/failed
    * decisions, value sums — as a streaming aggregation. In a
    * streaming query use `outputMode("update"/"complete")`; the same
    * plan runs in batch.
    */
  def incrementalRunMetrics(events: DataFrame, runIdCol: String,
      isSuccess: org.apache.spark.sql.Column,
      valueCol: String): DataFrame =
    events.groupBy(col(runIdCol))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(isSuccess, 1L).otherwise(0L)).as("n_success"),
        sum(when(!isSuccess, 1L).otherwise(0L)).as("n_failed"),
        sum(col(valueCol)).as("sum_value"))

  /** Hierarchical state read resolution (`shared_state.py:152-182`):
    * execution < stream < global; the narrowest scope that has the key
    * wins. State is a DataFrame of (scope, stream_id, execution_id,
    * key, value) — at scale a compacted keyed table.
    */
  def resolveState(state: DataFrame, streamId: String, executionId: String): DataFrame = {
    val exec = state.filter(col("scope") === "execution" &&
      col("stream_id") === streamId && col("execution_id") === executionId)
      .select(col("key"), col("value").as("v_exec"))
    val strm = state.filter(col("scope") === "stream" && col("stream_id") === streamId)
      .select(col("key"), col("value").as("v_stream"))
    val glob = state.filter(col("scope") === "global")
      .select(col("key"), col("value").as("v_global"))
    glob.join(strm, Seq("key"), "full_outer")
      .join(exec, Seq("key"), "full_outer")
      .select(col("key"),
        coalesce(col("v_exec"), col("v_stream"), col("v_global")).as("value"))
  }

  /** Spillover pointer pattern (`event_loop_node.py:1943-2040`, ST10):
    * values longer than `maxChars` are replaced by a preview +
    * pointer column; callers store the blob out-of-band. Keeps wide
    * payloads out of shuffle buffers.
    */
  def spillover(df: DataFrame, valueCol: String, maxChars: Int = 3000): DataFrame =
    df.withColumn("spilled", length(col(valueCol)) > maxChars)
      .withColumn("preview",
        when(col("spilled"), concat(substring(col(valueCol), 1, 200), lit("…[spilled]")))
          .otherwise(col(valueCol)))
      .withColumn("pointer",
        when(col("spilled"), sha2(col(valueCol), 256)).otherwise(lit(null)))

  /** Tiered token-budget compaction (`event_loop_node.py:2041-2157`,
    * ST11): given per-(session, seq) token counts, keep the newest
    * rows whose running token sum (from the tail) fits the budget;
    * older rows collapse into one summary row per session. The tier
    * table (`:2046-2052`): usage 80–100% keep 4, 100–120% keep 2,
    * ≥120% keep 1 — expressed as a keep-count column.
    */
  def compactionPlan(df: DataFrame, sessionCol: String, seqCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(sessionCol)).orderBy(desc(seqCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = Window.partitionBy(col(sessionCol))
    df.withColumn("run_tokens", sum(col(tokensCol)).over(w))
      .withColumn("usage_ratio", sum(col(tokensCol)).over(totals) / lit(budget.toDouble))
      .withColumn("keep_n",
        when(col("usage_ratio") < 0.8, lit(Int.MaxValue))
          .when(col("usage_ratio") < 1.0, lit(4))
          .when(col("usage_ratio") < 1.2, lit(2))
          .otherwise(lit(1)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(sessionCol)).orderBy(desc(seqCol))))
      .withColumn("keep", col("rn") <= col("keep_n") && col("run_tokens") <= budget)
      .drop("rn", "keep_n")
  }
}
