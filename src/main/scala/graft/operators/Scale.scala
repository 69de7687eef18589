package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale machinery: the shuffle-shaping operators a 100 TB deployment
  * leans on — key salting for skew, bucketed co-located joins,
  * partition-pruned layouts. AQE handles moderate skew at runtime;
  * these are the explicit tools for the pathological cases (one key =
  * 10% of the data) and for amortizing shuffles across many queries.
  */
object Scale {

  /** Raise a DataFrame's partition count to the session's core count
    * when the source supplies fewer splits (a tiny local table is ONE
    * parquet split, so a CPU-bound scan over it would run
    * single-task). Round-robin repartition, applied only when below
    * the floor — at real scale, file splits already provide
    * parallelism and this is the identity. Use ahead of CPU-heavy
    * map/explode stages (hashing, distance scans, tokenization), not
    * ahead of shuffles (those re-partition anyway).
    */
  def parallelismFloor(df: DataFrame): DataFrame = {
    val floor = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < floor) df.repartition(floor) else df
  }

  /** [[parallelismFloor]] for frames DOWNSTREAM of exchanges, where
    * calling `.rdd` to inspect partitions would force AQE to execute
    * the upstream stages at build time: decide from the optimizer's
    * size ESTIMATE instead. A frame estimated smaller than
    * (cores × AQE minPartitionSize) is exactly the shape AQE's
    * post-shuffle coalescing collapses below core count — a
    * CPU-heavy-per-byte map chain (regex redaction, tokenization)
    * behind it then runs near-serial, which the byte-targeted
    * coalescing cannot see. At real scale the estimate exceeds the
    * threshold and this is the identity — no extra shuffle.
    */
  def parallelismFloorBySize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val floor = spark.sparkContext.defaultParallelism
    val minSz = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1MB"))
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est < BigInt(floor) * minSz) df.repartition(floor) else df
  }

  /** Salted inner equi-join for skewed keys: the skewed (large) side
    * gets a random salt in [0, saltFactor); the small side is
    * replicated once per salt value. Breaks one hot key's rows across
    * `saltFactor` reducers at the cost of `saltFactor`× the small
    * side. Result equals the unsalted join exactly.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int = 8): DataFrame = {
    val salted = large.withColumn("__salt",
      (rand(42) * saltFactor).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase salted aggregation for skewed group keys: partial
    * aggregate on (key, salt), then final aggregate on key. For
    * algebraic aggregates (count/sum/min/max) the result is exact.
    * Spark's partial aggregation already does this per partition —
    * salting adds a second *shuffle-level* split for keys so hot that
    * a single reducer can't hold one key's partials.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltFactor: Int,
      partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", (rand(42) * saltFactor).cast("int"))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Write both sides bucketed on the join key so subsequent joins are
    * shuffle-free (bucketed scan → sort-merge with no Exchange). The
    * one-time bucketing shuffle is amortized over every later join —
    * the standard layout for 100 TB fact tables joined repeatedly on
    * the same key.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Hive-style partitioned layout (the reference's by_goal/by_status
    * secondary index files, `storage/backend.py:153-201` — §4): one
    * directory per partition value; filters on the partition column
    * prune whole directories at planning time.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bloom-filter semi-join pruning — the 100 TB pattern for "filter a
    * huge fact table by keys present in a merely-large side": the
    * filter side is too big to broadcast as a hash set, but its Bloom
    * filter is tiny (10M keys at 1% fpp ≈ 11 MB) and broadcasts as an
    * expression literal. The fact side then drops ~(1-fpp) of
    * non-matching rows map-side, BEFORE any shuffle — what Spark's
    * runtime row-level filtering does automatically for some joins,
    * exposed as an explicit tool for multi-stage pipelines (build
    * once, prune many scans).
    *
    * No false negatives (every true match survives — the spec locks
    * this); false positives pass at ~`fpp` and are eliminated by
    * whatever exact join/filter follows. Keys are xxhash64-normalized
    * on both sides, so any key type works. The build is a distributed
    * treeAggregate; only the finished filter returns to the driver.
    */
  def bloomSemiPrune(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val bf = small.select(xxhash64(col(smallKey)).as("__h"))
      .stat.bloomFilter("__h", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    import org.apache.spark.sql.graft.bridge.{columnOf, expressionOf}
    val mightContain = columnOf(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          bos.toByteArray, org.apache.spark.sql.types.BinaryType),
        expressionOf(xxhash64(col(bigKey)))))
    big.filter(mightContain)
  }

  /** Z-order (Morton-curve) clustering of a DataFrame on two integral
    * columns: each row's coordinates interleave into one long sort key
    * ([[graft.functions.CatalystExpressions.zOrderValue]]), rows are
    * range-partitioned into `numFiles` contiguous curve segments and
    * sorted within each. Written as parquet, every file's min/max
    * footer stats then cover a tight rectangle in (a, b) space instead
    * of a full-width stripe, so predicates on EITHER column skip most
    * files at scan time — the standard multi-dimensional data-layout
    * optimization for 100 TB fact tables queried on more than one
    * axis (a single-column sort only prunes on its leading column).
    *
    * Coordinates are clamped to [0, 2^bits-1]; callers pre-scale
    * (e.g. `(col - min) * (2^bits - 1) / (max - min)`) when the
    * natural domain is wider. `bits` = 16 (65k cells per axis) is
    * plenty for file-grain skipping: what matters is that rows in the
    * same file share curve locality, not sub-file precision.
    *
    * The range partitioner samples the z-value distribution, so files
    * get ~equal ROW counts even when the coordinate distribution is
    * skewed — no manual histogramming.
    */
  def zOrderLayout(df: DataFrame, colA: String, colB: String,
      numFiles: Int, bits: Int = 16): DataFrame = {
    require(numFiles > 0, "numFiles must be positive")
    val z = graft.functions.CatalystExpressions.zOrderValue(col(colA), col(colB), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Z-order layout written to parquet: one file per curve segment. */
  def zOrderWrite(df: DataFrame, colA: String, colB: String,
      numFiles: Int, path: String, bits: Int = 16): Unit =
    zOrderLayout(df, colA, colB, numFiles, bits)
      .write.mode("overwrite").parquet(path)

  /** Small-files compaction to a target file size — the maintenance
    * pass every long-lived 100 TB table needs after streaming or
    * incremental ingest (thousands of KB-scale files make the scan
    * planner enumerate splits and the NameNode/object store sweat; the
    * fix is periodic rewrite into ~`targetBytes` files). The output
    * partition count comes from the INPUT's total on-disk bytes (a
    * FileSystem listing, no data read), so the rewrite is one
    * round-robin shuffle sized to the real data volume rather than a
    * guessed constant. Returns the number of files written.
    *
    * Round-robin (not coalesce): coalesce would chain input splits
    * onto fewer tasks without a shuffle but inherits their skew —
    * a compaction pass exists precisely because the input layout is
    * pathological, so pay the one shuffle and get uniform files.
    */
  def compactToTarget(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && !f.getPath.getName.startsWith("_")) bytes += f.getLen
    }
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath).repartition(nOut)
      .write.mode("overwrite").parquet(outPath)
    nOut
  }

  /** Targeted deletion from a Hive-partitioned layout — the
    * right-to-be-forgotten maintenance pass: rewrite ONLY the
    * partitions that contain hit keys, leaving every other partition's
    * files untouched (at 100 TB, a delete of a few thousand keys must
    * not rewrite the table). Keys arrive as a DataFrame (millions of
    * keys join fine; an `isin` literal list would blow up the plan).
    *
    * Mechanics: a semi-join finds the affected partition values (the
    * collect is bounded by the partition count, not the data); the
    * affected partitions are re-read, anti-joined against the keys,
    * and written back under dynamic partition overwrite — Spark
    * replaces exactly the partitions present in the written frame.
    * Returns the number of rows deleted.
    *
    * Deletion is physical once the write commits; readers see the
    * partition swap atomically per partition (the parquet commit
    * protocol), which is the standard contract for this pass outside
    * a snapshotting table format.
    */
  def deleteByKeys(spark: SparkSession, path: String, partitionCol: String,
      keyCol: String, keys: DataFrame): Long = {
    val layout = spark.read.parquet(path)
    val k = keys.select(col(keys.columns.head).as(keyCol)).distinct()
    val affected = layout.join(k, Seq(keyCol), "left_semi")
      .select(col(partitionCol)).distinct().collect().map(_.get(0))
    if (affected.isEmpty) return 0L
    val hitParts = layout.filter(col(partitionCol).isInCollection(affected))
    val deleted = hitParts.join(k, Seq(keyCol), "left_semi").count()
    // materialize the survivors BEFORE overwriting: the rewrite plan
    // reads the very partitions the write replaces (Spark refuses the
    // self-overwrite, and lazily it would be a read-after-delete).
    // Bounded by the affected partitions' surviving rows only.
    val rewritten = hitParts.join(k, Seq(keyCol), "left_anti")
      .localCheckpoint(true)
    // dynamic overwrite only replaces partitions PRESENT in the
    // written frame — a partition whose rows are all deleted would
    // keep its old files, so it must be dropped explicitly
    val surviving = rewritten.select(col(partitionCol)).distinct()
      .collect().map(_.get(0)).toSet
    val conf = spark.conf
    val prev = conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      rewritten.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
    } finally prev.fold(conf.unset("spark.sql.sources.partitionOverwriteMode"))(v =>
      conf.set("spark.sql.sources.partitionOverwriteMode", v))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    affected.filterNot(surviving).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/$partitionCol=$v"), true)
    }
    deleted
  }

  /** Durable incremental aggregate state — maintain a (keys → count,
    * integer-cents sum) parquet table across ingest batches WITHOUT
    * rescanning history: each call folds one batch's map-side partials
    * into the stored state (`new = old ⊎ partial`, cell-wise sums).
    * The daily-ingest pattern for per-domain / per-source corpus
    * statistics at 100 TB — the work per call is O(batch) + O(state),
    * never O(corpus).
    *
    * Count and sum are the classic commutative-monoid aggregates, so
    * fold order is irrelevant and `state(batches 1..n)` equals the
    * full recompute bit-for-bit (integer arithmetic throughout —
    * means/ratios derive at read time). The state is versioned:
    * each upsert writes `v<n+1>` beside the current version and flips
    * `_CURRENT` last, so a crash mid-write leaves the previous version
    * intact and readable (write-ahead, point-the-pointer-last).
    *
    * Returns the merged state frame (read from the new version).
    */
  def upsertAggState(spark: SparkSession, path: String, batch: DataFrame,
      keys: Seq[String], valueCol: String): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val partial = batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(round(col(valueCol) * 100).cast("long")).as("sum_cents"))
    val merged = readVersionedState(spark, path) match {
      case Some(state) =>
        state.unionByName(partial)
          .groupBy(keys.map(col): _*)
          .agg(sum(col("cnt")).as("cnt"),
            sum(col("sum_cents")).as("sum_cents"))
      case None => partial
    }
    writeVersionedState(spark, path, merged)
  }

  private def statePointer(spark: SparkSession, path: String) = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (fs, new org.apache.hadoop.fs.Path(s"$path/_CURRENT"))
  }

  private[graft] def currentStateVersion(spark: SparkSession,
      path: String): Option[String] = {
    val (fs, pointer) = statePointer(spark, path)
    if (!fs.exists(pointer)) None
    else {
      val in = fs.open(pointer)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    }
  }

  /** The current version of a versioned state table, if any. */
  private[graft] def readVersionedState(spark: SparkSession,
      path: String): Option[DataFrame] =
    currentStateVersion(spark, path).map(v => spark.read.parquet(s"$path/$v"))

  /** Write the next version beside the current one and flip `_CURRENT`
    * LAST (write-ahead, point-the-pointer-last — a crash mid-write
    * leaves the previous version intact and readable). Previous
    * versions are retained for readers in flight; a caller-scheduled
    * vacuum can drop versions older than its read horizon. Returns a
    * frame reading the committed version.
    */
  private[graft] def writeVersionedState(spark: SparkSession, path: String,
      df: DataFrame): DataFrame = {
    val (fs, pointer) = statePointer(spark, path)
    val nextV = "v" + (currentStateVersion(spark, path)
      .map(_.drop(1).toLong).getOrElse(0L) + 1)
    df.write.mode("overwrite").parquet(s"$path/$nextV")
    val out = fs.create(pointer, true)
    try out.write(nextV.getBytes("UTF-8")) finally out.close()
    spark.read.parquet(s"$path/$nextV")
  }

  /** Read the current version of an [[upsertAggState]] table. */
  def readAggState(spark: SparkSession, path: String): DataFrame =
    readVersionedState(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no agg state at $path"))

  /** Point-in-interval range join without a cross product. Spark plans
    * a plain `p BETWEEN lo AND hi` join (no equi-conjunct, or one with
    * heavy range skew) as BroadcastNestedLoop / shuffled O(|L|×|R|)
    * work; this is the standard bucketed decomposition instead:
    *
    *   - every interval explodes into the fixed-width buckets it
    *     covers (fan-out = (hi-lo)/bucketWidth + 1 rows);
    *   - every point maps to exactly ONE bucket;
    *   - equi-join on (keys, bucket) — a co-partitioned hash join —
    *     then the exact `lo <= p <= hi` filter.
    *
    * Because a point lives in one bucket, each matching pair meets
    * exactly once: no dedup pass. `bucketWidth` trades interval
    * fan-out against bucket population — set it near the typical
    * interval length so fan-out stays O(1) per interval.
    *
    * Both axis columns must be integral (long after cast); intervals
    * with `lo > hi` or null bounds are dropped (SQL BETWEEN semantics
    * — they can match nothing). Output: all point columns + all
    * interval columns (caller disambiguates names, as with any join).
    */
  def rangeJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      pointKeys: Seq[String] = Nil, intervalKeys: Seq[String] = Nil,
      bucketWidth: Long = 1000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(pointKeys.length == intervalKeys.length,
      s"key arity mismatch: $pointKeys vs $intervalKeys")
    // exact floor division on longs, negative-safe: pmod is always
    // non-negative, so the numerator is an exact multiple of the width
    // and integral `div` (no double round-trip) keeps 64-bit precision
    def bucketOf(c: Column): Column =
      call_function("div",
        c.cast("long") - pmod(c.cast("long"), lit(bucketWidth)), lit(bucketWidth))
    val p = points.withColumn("__range_bucket", bucketOf(col(pointCol)))
    val i = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
      .withColumn("__range_bucket",
        explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    val joinCond = (pointKeys.zip(intervalKeys).map { case (a, b) =>
        p(a) === i(b)
      } :+ (p("__range_bucket") === i("__range_bucket")))
      .reduce(_ && _)
    p.join(i, joinCond)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__range_bucket")
  }

  /** Key-skew diagnostic report — the pre-flight check for any 100 TB
    * join/aggregate: per-key counts → the top-k hottest keys with
    * their share of all rows, the key-count skew ratio
    * (max/avg = max·n_keys/n_rows), and a per-key suggested salt
    * factor (⌈count/avg⌉, the [[saltedJoin]]/[[saltedAggregate]]
    * input). Everything integer-exact except the two documented
    * rounded ratios.
    *
    * Scale shape: ONE hash aggregate on the key (map-side combine),
    * one tiny global summary broadcast back, TakeOrderedAndProject
    * top-k. The report is O(topK) rows however large the input.
    */
  def skewReport(df: DataFrame, keys: Seq[String], topK: Int = 5): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val counts = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt"))
    counts.crossJoin(broadcast(totals))
      .withColumn("key", concat_ws("|", keys.map(c => col(c).cast("string")): _*))
      .withColumn("share", round(col("cnt").cast("double") / col("n_rows"), 6))
      .withColumn("skew_ratio",
        round(col("max_cnt").cast("double") * col("n_keys") / col("n_rows"), 3))
      .withColumn("suggested_salt",
        ceil(col("cnt").cast("double") * col("n_keys") / col("n_rows"))
          .cast("int"))
      .select(col("key"), col("cnt"), col("share"), col("n_keys"),
        col("n_rows"), col("skew_ratio"), col("suggested_salt"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(topK)
  }

  /** Per-group equi-depth histogram: the `buckets` discrete quantile
    * boundaries of `scoreCol` within each group (boundary b = the
    * smallest score whose cumulative share reaches b/buckets —
    * percentile_disc semantics, so boundaries are actual data values).
    * The stats-collection primitive behind optimizer selectivity
    * estimates, per-dump score calibration curves and drift monitors.
    *
    * Same never-sort-raw-rows shape as the quantile family in
    * [[graft.operators.Curation]]: aggregate to (group, score) counts,
    * window over DISTINCT scores only, one conditional-min aggregate
    * per boundary. Output: (group, bucket, upper_bound), `buckets`
    * rows per group.
    */
  def equiDepthHistogram(df: DataFrame, groupCol: String, scoreCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(scoreCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    val frac = df.groupBy(col(groupCol), col(scoreCol))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__frac",
        sum(col("__c")).over(w).cast("double") / sum(col("__c")).over(wg))
    val boundaryAggs = (1 to buckets).map { b =>
      min(when(col("__frac") >= b.toDouble / buckets, col(scoreCol)))
        .as(s"__p$b")
    }
    frac.groupBy(col(groupCol))
      .agg(boundaryAggs.head, boundaryAggs.tail: _*)
      .select(col(groupCol), explode(array(
        (1 to buckets).map(b => struct(lit(b).as("bucket"),
          col(s"__p$b").as("upper_bound"))): _*)).as("__s"))
      .select(col(groupCol), col("__s.bucket"), col("__s.upper_bound"))
  }

  /** Global running totals over a DISTINCT-VALUE count table WITHOUT an
    * unpartitioned window — the scale-safe building block behind every
    * "rank/ntile/cume over the whole corpus" statistic (exact AUC,
    * calibration deciles, RFM quintiles, global row numbers). A
    * `Window.orderBy(x)` with no partition moves EVERY row through one
    * task — the canonical 100 TB executor-OOM — so instead:
    *
    *   1. bucket each distinct value into one of `buckets` ordered
    *      range cells (pure function of the value: uniform width over
    *      the observed [min, max], so re-evaluation is deterministic);
    *   2. aggregate per-bucket totals and collect them — bounded by
    *      `buckets` rows, a metadata-sized driver model;
    *   3. compute per-bucket starting offsets driver-side and
    *      broadcast-join them back;
    *   4. finish with a PARTITIONED window (per bucket, ordered by the
    *      value) — each partition holds ~1/buckets of the distinct
    *      values, never the whole table.
    *
    * Input must be a count table (one row per distinct `orderCol`
    * value, `orderCol` numeric and non-null): callers aggregate raw
    * rows to (value, counts) first, which is what makes the windowed
    * frame |distinct values| ≪ |rows|. Adds, for every `c` in
    * `sumCols`: `cum_<c>` — the inclusive ascending running total —
    * and `total_<c>` — the grand total as a literal. Exclusive
    * prefix ("rows strictly below") = `cum_<c> − <c>`; descending
    * prefix ("rows strictly above") = `total_<c> − cum_<c>`.
    */
  def globalPrefixSums(counts: DataFrame, orderCol: String,
      sumCols: Seq[String], buckets: Int = 64): DataFrame = {
    require(sumCols.nonEmpty, "sumCols must be non-empty")
    require(buckets > 0, "buckets must be positive")
    val spark = counts.sparkSession
    // A single NaN (or null) order value poisons the bucket function:
    // max() returns NaN, every bucket expression goes NaN, and the
    // non-ANSI int cast folds ALL rows into one bucket — silently
    // recreating the single-partition window this helper exists to
    // prevent. Fail loudly here rather than in each caller.
    val ordD = col(orderCol).cast("double")
    val mm = counts.agg(min(ordD).as("mn"), max(ordD).as("mx"),
      coalesce(sum(when(ordD.isNull || ordD.isNaN, 1L).otherwise(0L)),
        lit(0L)).as("bad")).head()
    require(mm.getLong(2) == 0L,
      s"globalPrefixSums: orderCol '$orderCol' has ${mm.getLong(2)} " +
        "NaN/null value(s) — they would collapse every row into one " +
        "bucket; filter or impute them before calling")
    if (mm.isNullAt(0)) { // empty input: keep the output schema stable
      return sumCols.foldLeft(counts) { (d, c) =>
        d.withColumn(s"cum_$c", col(c).cast("long"))
          .withColumn(s"total_$c", lit(0L))
      }
    }
    val (mn, mx) = (mm.getDouble(0), mm.getDouble(1))
    val bucketCol =
      if (mx == mn) lit(0)
      else least(lit(buckets - 1),
        floor((col(orderCol).cast("double") - mn) / (mx - mn) * buckets)
          .cast("int"))
    // materialize once: the bucket totals action and the final plan
    // must see the same count table without recomputing its aggregate
    val withB = counts.withColumn("__pb", bucketCol).localCheckpoint(true)
    val sumAggs = sumCols.map(c => sum(col(c)).cast("long").as(c))
    val perBucket = withB.groupBy(col("__pb"))
      .agg(sumAggs.head, sumAggs.tail: _*)
      .collect()
      .map(r => r.getInt(0) -> sumCols.indices.map(i => r.getLong(i + 1)))
      .sortBy(_._1)
    val grand = sumCols.indices.map(i => perBucket.map(_._2(i)).sum)
    // running offsets: bucket b starts after everything in buckets < b
    val offRows = {
      var acc = sumCols.indices.map(_ => 0L)
      perBucket.map { case (b, tot) =>
        val row = org.apache.spark.sql.Row.fromSeq(b +: acc)
        acc = acc.zip(tot).map { case (a, t) => a + t }
        row
      }
    }
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val offSchema = StructType(StructField("__pb", IntegerType, nullable = false) +:
      sumCols.map(c => StructField(s"__off_$c", LongType, nullable = false)))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows.toSeq, 1), offSchema)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pb")).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    sumCols.zipWithIndex.foldLeft(withB.join(broadcast(offDf), Seq("__pb"))) {
      case (d, (c, i)) =>
        d.withColumn(s"cum_$c", col(s"__off_$c") + sum(col(c).cast("long")).over(w))
          .withColumn(s"total_$c", lit(grand(i)))
          .drop(s"__off_$c")
    }.drop("__pb")
  }

  /** [[globalPrefixSums]] with a GROUP key — N independent prefix-sum
    * problems (one per `groupCol` value) in ONE pass: one per-group
    * min/max action, one checkpoint, one (group × bucket) totals
    * collect, one partitioned window. The reason it exists: a caller
    * that needs running totals for k metrics (RFM's three quintile
    * ladders, a multi-column calibration report) would otherwise pay
    * k serial [[globalPrefixSums]] calls — k min/max actions, k eager
    * checkpoints, k bucket collects — pure scheduler overhead at any
    * scale. Stack the metrics in long format (`metric`, `value`,
    * counts…) and fold them here instead.
    *
    * Same contract per group as [[globalPrefixSums]]: `counts` is a
    * distinct-value count table within each group (one row per
    * (group, value)), `orderCol` numeric with no NaN/null, and the
    * group count is modest (one row per metric/stratum — the driver
    * holds groups × buckets bucket totals, metadata-sized). Adds
    * `cum_<c>` / `total_<c>` computed WITHIN each group.
    *
    * `ranges`: optional caller-supplied per-group (group, min, max) of
    * `orderCol`. When the caller already knows the spans — typically
    * because it derived the stacked metrics from a frame it aggregates
    * anyway — passing them skips this helper's min/max action (one
    * fewer Spark job); the NaN/null refusal then rides the bucket
    * expression itself (codegen'd `assert_true`, zero extra jobs).
    */
  def groupedPrefixSums(counts: DataFrame, groupCol: String,
      orderCol: String, sumCols: Seq[String], buckets: Int = 64,
      ranges: Seq[(Any, Double, Double)] = Nil): DataFrame = {
    require(sumCols.nonEmpty, "sumCols must be non-empty")
    require(buckets > 0, "buckets must be positive")
    val spark = counts.sparkSession
    val ordD = col(orderCol).cast("double")
    val mmRows: Seq[(Any, Double, Double)] =
      if (ranges.nonEmpty) {
        require(!ranges.exists(r => r._2.isNaN || r._3.isNaN),
          "groupedPrefixSums: caller-supplied ranges contain NaN")
        ranges
      } else {
        // one action: per-group [min, max] + the NaN/null refusal (same
        // rationale as globalPrefixSums — one bad value would fold a
        // whole group into one bucket)
        val rows = counts.groupBy(col(groupCol).as("__pg")).agg(
          min(ordD).as("__mn"), max(ordD).as("__mx"),
          sum(when(ordD.isNull || ordD.isNaN, 1L).otherwise(0L)).as("__bad"))
          .collect()
        val bad = rows.map(_.getLong(3)).sum
        require(bad == 0L,
          s"groupedPrefixSums: orderCol '$orderCol' has $bad NaN/null " +
            "value(s) — they would collapse their group into one bucket; " +
            "filter or impute them before calling")
        rows.toSeq.map(r => (r.get(0), r.getDouble(1), r.getDouble(2)))
      }
    if (mmRows.isEmpty) { // empty input: keep the output schema stable
      return sumCols.foldLeft(counts) { (d, c) =>
        d.withColumn(s"cum_$c", col(c).cast("long"))
          .withColumn(s"total_$c", lit(0L))
      }
    }
    val gField = counts.schema(counts.schema.fieldIndex(groupCol))
    // assert_true returns null when the predicate holds and raises
    // otherwise — the zero-job NaN/null guard for the ranges path
    // (harmlessly redundant on the computed path)
    val guarded = when(
      assert_true(ordD.isNotNull && !ordD.isNaN,
        lit(s"groupedPrefixSums: NaN/null $orderCol value")).isNull, ordD)
    // the per-group spans are driver-side either way and the group
    // count is modest by contract, so the bucket function inlines as a
    // literal CASE over the group key — pure codegen, no broadcast
    // exchange to ship three rows
    // base case raises: a group absent from caller-supplied ranges is
    // a caller bug, never a silent row drop at the offsets join
    val noRange = when(assert_true(lit(false),
      lit(s"groupedPrefixSums: a '$groupCol' value is missing from " +
        "the supplied ranges")).isNull, lit(0))
    val bucketCol = mmRows.foldLeft(noRange) {
      case (e, (g, mn, mx)) =>
        val b =
          if (mx == mn) lit(0)
          else least(lit(buckets - 1),
            floor((guarded - mn) / (mx - mn) * buckets).cast("int"))
        when(col(groupCol) === lit(g), b).otherwise(e)
    }
    // materialize once — same discipline as globalPrefixSums
    val withB = counts
      .withColumn("__pb", bucketCol)
      .localCheckpoint(true)
    val sumAggs = sumCols.map(c => sum(col(c)).cast("long").as(c))
    val perBucket = withB.groupBy(col(groupCol).as("__pg"), col("__pb"))
      .agg(sumAggs.head, sumAggs.tail: _*)
      .collect()
      .map(r => (r.get(0), r.getInt(1)) ->
        sumCols.indices.map(i => r.getLong(i + 2)))
      .sortBy(_._1._2)
    // per-group running offsets and grand totals, driver-side
    val byGroup = perBucket.groupBy(_._1._1)
    val offRows = byGroup.toSeq.flatMap { case (g, bs) =>
      var acc = sumCols.indices.map(_ => 0L)
      val grand = sumCols.indices.map(i => bs.map(_._2(i)).sum)
      bs.map { case ((_, b), tot) =>
        val row = org.apache.spark.sql.Row.fromSeq((g +: b +: acc) ++ grand)
        acc = acc.zip(tot).map { case (a, t) => a + t }
        row
      }
    }
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val offSchema = StructType(
      StructField("__pg", gField.dataType) +:
        StructField("__pb", IntegerType, nullable = false) +:
        (sumCols.map(c => StructField(s"__off_$c", LongType, nullable = false)) ++
          sumCols.map(c => StructField(s"__tot_$c", LongType, nullable = false))))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1), offSchema)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), col("__pb")).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val joined = withB.join(broadcast(offDf),
      col(groupCol) === col("__pg") && withB("__pb") === offDf("__pb"))
      .drop(offDf("__pb")).drop("__pg")
    sumCols.foldLeft(joined) { case (d, c) =>
      d.withColumn(s"cum_$c", col(s"__off_$c") + sum(col(c).cast("long")).over(w))
        .withColumn(s"total_$c", col(s"__tot_$c"))
        .drop(s"__off_$c", s"__tot_$c")
    }.drop("__pb")
  }

  /** Global `row_number()` over (orderCol, tieCols…) without an
    * unpartitioned window: distinct-value count table →
    * [[globalPrefixSums]] for the rows-before count, then a window
    * partitioned BY THE VALUE for the within-tie-group order. Scale
    * shape: the only windows are (a) per range bucket over distinct
    * values, (b) per tie group — callers guarantee tie groups are
    * modest (e.g. one row per source, or a handful of equal scores).
    * `ascending = false` ranks from the largest value down; `tieCols`
    * always break ties ascending. Adds `outCol` (long, 1-based).
    */
  def globalRowNumber(df: DataFrame, orderCol: String, tieCols: Seq[String],
      ascending: Boolean = true, outCol: String = "rank",
      buckets: Int = 64): DataFrame = {
    require(tieCols.nonEmpty, "tieCols must be non-empty (deterministic order)")
    val counts = df.groupBy(col(orderCol)).agg(count(lit(1)).as("__gc"))
    val pre = globalPrefixSums(counts, orderCol, Seq("__gc"), buckets)
      .withColumn("__before",
        if (ascending) col("cum___gc") - col("__gc")
        else col("total___gc") - col("cum___gc"))
      .select(col(orderCol), col("__before"))
    val tieW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(orderCol)).orderBy(tieCols.map(col): _*)
    df.join(pre, Seq(orderCol))
      .withColumn(outCol, col("__before") + row_number().over(tieW))
      .drop("__before")
  }

  /** Snapshot diff — classify every id across two corpus snapshots as
    * `added` / `removed` / `changed` / `unchanged` by comparing an
    * md5 content fingerprint over `compareCols` (the incremental-crawl
    * reconciliation step: what actually changed between yesterday's
    * and today's corpus, feeding targeted re-embedding / re-indexing
    * instead of a full rebuild).
    *
    * Scale shape: ONE full-outer shuffle join on the id — both sides
    * hash-partition on the same key, fingerprints are computed
    * map-side pre-join so the exchange carries (id, 16-byte hash), not
    * the documents. Downstream consumers typically filter
    * `status != 'unchanged'`, which Catalyst pushes into the join
    * output scan.
    *
    * Output: (id, status, old_fp, new_fp) — fingerprints exposed so a
    * durable diff log can be persisted and re-joined later.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    // collision-safe multi-column encoding: each field is
    // length-prefixed ("3:abc") and null gets its own sentinel, so
    // ("ab","c") != ("a","bc") and ("a", null) != ("a","") -- concat_ws
    // SKIPS null fields entirely (("a", null, "b") == ("a", "b")), so
    // genuinely changed rows could classify as unchanged. The sentinel
    // cannot collide with data: an encoded field always starts with a
    // digit.
    def enc(c: String): Column = {
      val s = col(c).cast("string")
      coalesce(concat(length(s).cast("string"), lit(":"), s), lit("n"))
    }
    def fp(df: DataFrame, out: String): DataFrame =
      df.select(col(idCol), md5(concat(compareCols.map(enc): _*)).as(out))
    fp(oldDf, "old_fp").join(fp(newDf, "new_fp"), Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") === col("new_fp"), "unchanged")
          .otherwise("changed"))
  }
}
