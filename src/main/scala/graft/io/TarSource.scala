package graft.io

import java.io.{InputStream, OutputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WebDataset-style tar shards — the standard container for
  * multimodal training data at scale: each sample is a group of
  * `{key}.{ext}` files stored CONSECUTIVELY inside a plain ustar tar,
  * shards are ~fixed-count tar files, and a training loader streams
  * shards sequentially (no per-sample object-store round trips — the
  * whole point at 100 TB). Pure-JDK ustar read/write, no external
  * deps, same discipline as [[WarcSource]].
  *
  * Scale shape: WRITE is one hash-partition exchange on the shard id
  * (every shard built by exactly one task, one streamed pass, O(row)
  * memory); READ parallelizes at file grain via `binaryFiles` with
  * the same parallelism floor as WARC (shards are the unit of
  * training-loader parallelism too, so file grain is the right
  * grain). Headers are written with fixed mtime/uid/gid, so two
  * writes of the same frame are BYTE-IDENTICAL — shard bytes can be
  * content-addressed / diffed across pipeline runs.
  *
  * Determinism: samples within a shard are ordered by key; a sample's
  * files are ordered by extension. Tolerates PAX ('x'/'g') headers on
  * read (skipped) so foreign-written archives load; writes plain
  * ustar that python `tarfile` reads back verbatim (TarSpec carries
  * the cross-generated fixture).
  */
object TarSource {

  val SampleSchema: StructType = StructType(Seq(
    StructField("shard", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("ext", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  // ------------------------------------------------------------ write

  /** Write `df` as `numShards` WebDataset tar shards under `dir`
    * (`shard-%05d.tar`). Each input row becomes one sample: for every
    * (columnName → ext) in `files`, the column's binary payload is
    * stored as `{key}.{ext}` (null payloads are skipped). Shard
    * assignment must be provided as an integral `shardCol` in
    * [0, numShards) — callers use a portable hash of the key
    * (`pmod(TextOps.portableHash(key, seed), numShards)`) so the
    * layout replays identically in any engine.
    *
    * One hash exchange on the shard id; each task streams its
    * shard(s) to the filesystem — nothing buffers more than one
    * sample. Returns the number of samples written.
    *
    * Rerun-safe: shards are staged under a run-unique hidden subdir
    * and swapped into place only after the whole job succeeds, so a
    * rerun that fails mid-job leaves the previous committed dataset
    * (shards + `_SUCCESS`) untouched.
    *
    * Keys must be UNIQUE (the WebDataset contract — a sample IS its
    * key): duplicate keys would both collide inside the archive and
    * make the within-shard sort order — and therefore the shard
    * bytes — nondeterministic. String payload columns are cast to
    * binary (UTF-8) automatically.
    */
  def writeShards(df: DataFrame, dir: String, keyCol: String,
      shardCol: String, files: Seq[(String, String)],
      numShards: Int): Long =
    writeShardsNamed(df, dir, keyCol, shardCol, files, numShards,
      shard => f"shard-$shard%05d.tar",
      // the whole non-generation family: a rerun with fewer shards
      // must also sweep the old run's higher-numbered shards
      n => n.matches("""shard-\d{5}\.tar"""),
      swapSuccessMarker = true)

  private def writeShardsNamed(df: DataFrame, dir: String, keyCol: String,
      shardCol: String, files: Seq[(String, String)], numShards: Int,
      fileName: Int => String, staleName: String => Boolean,
      swapSuccessMarker: Boolean): Long = {
    require(numShards >= 1, s"numShards must be >= 1: $numShards")
    require(files.nonEmpty, "files mapping must be non-empty")
    val spark = df.sparkSession
    // Commit protocol, job level: every task streams its shards into a
    // run-unique HIDDEN staging subdir (`.staging-<tag>/`, invisible to
    // read()'s `*.tar` glob), and only after the whole job's reduce
    // succeeds does the driver swap the staged shards into place —
    // sweep this run's stale family names, rename staged files in,
    // write _SUCCESS. A rerun that fails mid-job therefore leaves the
    // PREVIOUS committed dataset (shards + _SUCCESS) fully intact, and
    // a read-then-write of the same directory never deletes its own
    // inputs before the read executes (the source shards survive until
    // the swap, which runs after every task finished). The only
    // exposure window is the driver's swap loop — renames, not data
    // movement. Stale `.staging-*` dirs from ANY prior failed run
    // (including other streaming generations — their sweep never runs
    // again) are reclaimed here, BEFORE tasks start.
    // (`locally` keeps blocks statements — a bare block after a `new`
    // would parse as an anonymous-class body.)
    val stagingName = s".staging-${java.util.UUID.randomUUID().toString.take(12)}"
    val staging = s"$dir/$stagingName"
    locally {
      val dirPath = new org.apache.hadoop.fs.Path(dir)
      val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(dirPath)) {
        fs.listStatus(dirPath).foreach { st =>
          val n = st.getPath.getName
          if (n.startsWith(".staging-") && st.isDirectory)
            fs.delete(st.getPath, true)
        }
      }
    }
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val cols = col(keyCol).cast("string").as("__key") +:
      col(shardCol).cast("int").as("__shard") +:
      files.map { case (c, _) => col(c).cast("binary") }
    val exts = files.map(_._2)
    val written = df.select(cols: _*)
      .repartition(numShards, col("__shard"))
      .sortWithinPartitions(col("__shard"), col("__key"))
      .mapPartitions { rows =>
        // Commit protocol, task level (all inside the staging dir):
        // every shard is streamed to a task-attempt-unique dot-prefixed
        // temp file and renamed to its staged name only once its
        // trailer is written. A speculative or retried attempt never
        // interleaves bytes with the original — each attempt owns its
        // temp file — and failed TASKS leave only dot-temps behind,
        // which the failure listener deletes. The staged path is NEVER
        // deleted here: the staging dir is run-unique, so an existing
        // staged path can only be a byte-identical twin committed by
        // another attempt of this run (fixed header fields + key-sorted
        // samples ⇒ deterministic bytes) — treat it as already
        // committed and drop our temp, closing the delete-then-rename
        // window where a zombie attempt could remove a committed shard
        // and then die before restoring it.
        val tc = org.apache.spark.TaskContext.get()
        val attemptTag =
          if (tc == null) "local" else s"a${tc.taskAttemptId()}"
        val fs = new org.apache.hadoop.fs.Path(staging)
          .getFileSystem(hconf.value)
        val tmpPaths = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.hadoop.fs.Path]
        var count = 0L
        var out: OutputStream = null
        var openShard = -1
        if (tc != null) tc.addTaskFailureListener { (_, _) =>
          // close before delete: deleting a still-open file fails on
          // some filesystems
          try { if (out != null) { out.close(); out = null } }
          catch { case _: java.io.IOException => () }
          tmpPaths.foreach(p => try fs.delete(p, false) catch {
            case _: java.io.IOException => ()
          })
        }
        def close(): Unit = if (out != null) {
          out.write(new Array[Byte](1024)) // two zero end blocks
          out.close(); out = null
          val finalPath =
            new org.apache.hadoop.fs.Path(staging, fileName(openShard))
          val tmp = tmpPaths.last
          if (fs.exists(finalPath)) {
            // A byte-identical twin attempt already committed.
            fs.delete(tmp, false)
          } else if (!fs.rename(tmp, finalPath)) {
            // Lost the rename race itself to a twin — content is in
            // place; drop our temp.
            require(fs.exists(finalPath),
              s"failed to commit tar shard $finalPath")
            fs.delete(tmp, false)
          }
        }
        rows.foreach { r =>
          val shard = r.getInt(1)
          if (shard != openShard) {
            close()
            val tmp = new org.apache.hadoop.fs.Path(staging,
              s".${fileName(shard)}.$attemptTag.inprogress")
            tmpPaths += tmp
            out = fs.create(tmp, true)
            openShard = shard
          }
          val key = r.getString(0)
          var i = 0
          while (i < exts.length) {
            if (!r.isNullAt(2 + i)) {
              val bytes = r.getAs[Array[Byte]](2 + i)
              writeEntry(out, s"$key.${exts(i)}", bytes)
            }
            i += 1
          }
          count += 1
        }
        close()
        Iterator.single(count)
      }(org.apache.spark.sql.Encoders.scalaLong)
      .reduce(_ + _)
    // Job-level swap, only reached when EVERY task committed its
    // staged shards. Two orderings, chosen by who can be watching:
    //
    //  - Batch path (swapSuccessMarker = true): retract _SUCCESS
    //    FIRST, so no read(requireSuccessMarker = true) treats the
    //    directory as complete while family names churn; then bulk
    //    sweep this run's stale family names (a rerun with a SHRUNK
    //    shard count must not leave the old run's higher-numbered
    //    shards behind) and rename the staged shards in.
    //
    //  - Streaming path (swapSuccessMarker = false): the shared
    //    marker STAYS (other generations remain a committed dataset
    //    throughout), so a re-delivered generation must never have
    //    its old shards bulk-deleted before the replacements land — a
    //    concurrent reader would glob a complete-looking directory
    //    with the whole generation missing, and a crash in that
    //    window would persist it. Instead each staged shard swaps
    //    INDIVIDUALLY (delete the old twin immediately before its
    //    replacement's rename), shrinking the exposure to one shard ×
    //    two metadata ops — and a crash mid-swap leaves at most a
    //    mixed old/new generation that the batch replay (same
    //    batchId, deterministic bytes) repairs. Stale family names
    //    WITHOUT a replacement (a shrunk shard count) are swept after
    //    all replacements are in place.
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagingPath = new org.apache.hadoop.fs.Path(staging)
    val stagedNames: Array[String] =
      if (fs.exists(stagingPath))
        fs.listStatus(stagingPath).map(_.getPath.getName)
          .filter(!_.startsWith(".")) // staged shards only, never leftover temps
      else Array.empty
    def sweepStale(exclude: Set[String]): Unit =
      if (fs.exists(dirPath)) { // an all-null-payload job may write nothing
        fs.listStatus(dirPath).foreach { st =>
          val n = st.getPath.getName
          // also reclaim loose ".{base}.{attempt}.inprogress" debris of
          // this family (the pre-staging temp form never recreated now)
          val staleTemp = n.startsWith(".") && n.endsWith(".inprogress") && {
            val i = n.indexOf(".tar.")
            i > 0 && staleName(n.substring(1, i + 4))
          }
          if ((staleName(n) && !exclude(n)) || staleTemp)
            fs.delete(st.getPath, false)
        }
      }
    def renameIn(n: String, deleteOldFirst: Boolean): Unit = {
      val target = new org.apache.hadoop.fs.Path(dirPath, n)
      if (deleteOldFirst && fs.exists(target)) fs.delete(target, false)
      require(fs.rename(new org.apache.hadoop.fs.Path(stagingPath, n), target),
        s"failed to commit tar shard $target from staging")
    }
    if (swapSuccessMarker) {
      fs.delete(new org.apache.hadoop.fs.Path(dirPath, SuccessMarker), false)
      sweepStale(Set.empty)
      stagedNames.foreach(renameIn(_, deleteOldFirst = false))
    } else {
      stagedNames.foreach(renameIn(_, deleteOldFirst = true))
      sweepStale(stagedNames.toSet)
    }
    if (fs.exists(stagingPath)) fs.delete(stagingPath, true)
    fs.create(new org.apache.hadoop.fs.Path(dirPath, SuccessMarker), true)
      .close()
    written
  }

  /** Marker written after ALL shard tasks commit — the job-level
    * "this directory is a complete dataset" signal ([[read]] can
    * require it).
    */
  val SuccessMarker = "_SUCCESS"

  private def writeEntry(out: OutputStream, name: String,
      content: Array[Byte]): Unit = {
    require(name.getBytes("UTF-8").length <= 100,
      s"ustar name limit is 100 bytes: $name")
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("UTF-8")
      System.arraycopy(b, 0, h, off, b.length)
    }
    def putOctal(off: Int, len: Int, v: Long): Unit =
      put(off, ("%0" + (len - 1) + "o").format(v))
    put(0, name)
    putOctal(100, 8, 420L) // mode 0644
    putOctal(108, 8, 0L) // uid
    putOctal(116, 8, 0L) // gid
    putOctal(124, 12, content.length.toLong)
    putOctal(136, 12, 0L) // mtime: fixed → byte-identical rewrites
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum spaces
    h(156) = '0' // typeflag: regular file
    put(257, "ustar")
    h(262) = 0
    put(263, "00")
    var sum = 0L
    var i = 0
    while (i < 512) { sum += h(i) & 0xff; i += 1 }
    put(148, "%06o".format(sum))
    h(154) = 0
    h(155) = ' '
    out.write(h)
    out.write(content)
    val pad = (512 - content.length % 512) % 512
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  /** Shard count for a target shard size — the [[graft.operators
    * .Scale.compactToTarget]] idea applied at WRITE time: one
    * aggregate sums the payload bytes (per stored entry: content +
    * one 512-byte header + up to 511 bytes padding, estimated at
    * content + 1024), so shards land near `targetBytes` instead of a
    * guessed constant. Training loaders want ~fixed-size shards
    * (shard = the unit of loader parallelism and of resume
    * granularity).
    */
  def shardCountForBytes(df: DataFrame, fileCols: Seq[String],
      targetBytes: Long = 256L * 1024 * 1024): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    require(fileCols.nonEmpty, "fileCols must be non-empty")
    val per = fileCols.map(c =>
      coalesce(length(col(c)).cast("long") + 1024L, lit(0L)))
      .reduce(_ + _)
    val total = df.agg(coalesce(sum(per), lit(0L))).head().getLong(0)
    math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
  }

  /** Re-shard a WebDataset: read every sample under `inDir`, keep only
    * keys present in `keep` (a one-column keep-list frame — typically
    * the `keep` survivors of [[graft.operators.Dedup.imageDedupCorpus]]
    * or a quality gate), and write fresh shards under `outDir` with
    * portable-hash assignment over `numShards`. THE post-curation
    * export step for multimodal corpora: dedup/gate decisions arrive
    * as an id list, and the training-ready artifact is a new shard
    * set — compacted (no tombstones, no holes), byte-deterministic,
    * loader-parallel.
    *
    * Scale shape: shard-grain parallel read → broadcast-able semi-join
    * on the key → ONE hash exchange on the new shard id. Samples keep
    * their file layout (ext → content); returns samples written.
    */
  def reshard(spark: SparkSession, inDir: String, outDir: String,
      keep: DataFrame, numShards: Int, glob: String = "*.tar",
      seed: String = "tar"): Long = {
    // refuse in-place compaction: writeShards' commit swap deletes the
    // old family names, and the lazy read lineage can still re-execute
    // after that point (a lost localCheckpoint block recomputes from
    // the source shards)
    val hconf = spark.sparkContext.hadoopConfiguration
    def qualified(d: String): String = {
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(hconf).makeQualified(p).toString
    }
    require(qualified(inDir) != qualified(outDir),
      "reshard: outDir must differ from inDir — the fresh-output sweep " +
        "would delete the source shards before they are read")
    val keyCol = keep.columns.head
    // duplicate keys across input shards (streaming generations
    // re-delivering a re-crawled key) resolve LAST-GENERATION-WINS.
    // Order by the EXTRACTED generation token, not the whole file name:
    // the shard number precedes the `-bNNNNNN` batch suffix, so a
    // whole-name sort would let an OLDER generation win whenever a key
    // maps to a higher shard number across generations (changed
    // numShards or hash seed). Non-generation shards extract to ''
    // (the base generation); full name breaks ties. The window
    // partitions per key (tiny groups), never globally.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key"))
      .orderBy(regexp_extract(col("shard"), "-b(\\d{6})\\.tar$", 1).desc,
        col("shard").desc)
    val kept = readSamples(spark, inDir, glob)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1).drop("__rk")
      // no broadcast hint: the keep-list is corpus-scale (survivors
      // are MOST keys) — let AQE pick the join strategy
      .join(keep.select(col(keyCol).cast("string").as("key")),
        Seq("key"), "left_semi")
      // one tar read + join serves the ext discovery AND the write
      .localCheckpoint(false)
    // flatten the sample map back to one row per (key, ext) — write
    // wants one binary column per ext, so pivot the extension set
    // (bounded: a WebDataset sample has a handful of file types)
    val exts = kept.select(explode(map_keys(col("sample"))).as("ext"))
      .distinct().collect().map(_.getString(0)).sorted
    require(exts.nonEmpty, s"reshard: no samples survive the keep-list under $inDir")
    val cols = col("key") +:
      pmod(graft.operators.TextOps.portableHash(col("key"), seed),
        lit(numShards)).cast("int").as("__shard") +:
      exts.map(e => element_at(col("sample"), e).as(s"__f_$e"))
    writeShards(kept.select(cols: _*), outDir, "key", "__shard",
      exts.map(e => s"__f_$e" -> e), numShards)
  }

  /** Streaming twin of [[writeShards]] — the incremental-crawl export:
    * each micro-batch writes its OWN shard generation
    * (`shard-%05d-b%06d.tar`), so a batch never rewrites earlier
    * bytes (append-only, the [[graft.operators.CorpusIndex]] append
    * discipline) and a failed batch replay overwrites only its own
    * generation (foreachBatch re-delivers with the same batchId —
    * idempotent because shard bytes are deterministic). [[read]]'s
    * default glob picks up every generation; a training loader
    * treats generations as more shards. The shared `_SUCCESS` marker
    * is only ever (re)written at each batch's commit, never retracted
    * mid-batch; a re-DELIVERED generation replaces its old shards one
    * at a time (per-shard delete-then-rename), so a concurrent
    * `read(requireSuccessMarker = true)` sees every OTHER generation
    * complete throughout and can transiently miss at most one shard
    * of the generation being replayed (first deliveries only add
    * files — no window at all). A crash mid-swap leaves a mixed
    * old/new generation that the replay (same batchId, deterministic
    * bytes) repairs.
    */
  def writeStreamShards(stream: DataFrame, dir: String, keyCol: String,
      shardCol: String, files: Seq[(String, String)], numShards: Int,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val gen = f"-b$batchId%06d.tar"
        writeShardsNamed(batch, dir, keyCol, shardCol, files, numShards,
          shard => f"shard-$shard%05d$gen",
          // sweep ONLY this batch's generation — other batches'
          // shards are other commits, not staleness
          n => n.startsWith("shard-") && n.endsWith(gen) &&
            n.length == "shard-00000".length + gen.length,
          // never retract the shared marker between generations
          swapSuccessMarker = false)
        ()
      }
      .start()

  // ------------------------------------------------------------- read

  /** Read every `*.tar` under `dir` into (shard, key, ext, content)
    * rows — one row per stored file, `key`/`ext` split at the LAST
    * dot (the WebDataset convention; a key may itself contain dots).
    * File-grain parallelism with the [[WarcSource]] floor; PAX
    * extended headers and directories are skipped.
    */
  def read(spark: SparkSession, dir: String, glob: String = "*.tar",
      requireSuccessMarker: Boolean = false): DataFrame = {
    if (requireSuccessMarker) {
      val dirPath = new org.apache.hadoop.fs.Path(dir)
      val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      require(fs.exists(new org.apache.hadoop.fs.Path(dirPath, SuccessMarker)),
        s"no ${SuccessMarker} marker under $dir — the shard write job " +
          "did not complete; the *.tar files present may be a partial " +
          "dataset")
    }
    val path = s"$dir/$glob"
    val minParts = spark.sparkContext.defaultParallelism
    val handles0 = spark.sparkContext.binaryFiles(path, minParts)
    val handles =
      if (handles0.getNumPartitions < minParts) handles0.repartition(minParts)
      else handles0
    // STREAMING per file — one entry in memory at a time, like
    // WarcSource: a shard can be gigabytes, and buffering it whole
    // would put the entire tar in one task's heap
    val rows = handles.flatMap { case (file, pds) =>
      val shard = file.substring(file.lastIndexOf('/') + 1)
      new Iterator[Row] {
        private var in: InputStream = null
        private var pending: Row = null
        private var done = false
        private def fetch(): Unit = {
          if (in == null && !done) in = pds.open()
          while (pending == null && !done) {
            val entry = readEntry(in)
            if (entry == null) { done = true; in.close() }
            else {
              val (name, typeflag, content) = entry
              if (typeflag == '0' || typeflag == 0.toChar) {
                val dot = name.lastIndexOf('.')
                val (key, ext) =
                  if (dot > 0) (name.substring(0, dot), name.substring(dot + 1))
                  else (name, "")
                pending = Row(shard, key, ext, content)
              }
            }
          }
        }
        override def hasNext: Boolean = { fetch(); pending != null }
        override def next(): Row = {
          fetch()
          val r = pending; pending = null
          if (r == null) throw new NoSuchElementException
          r
        }
      }
    }
    spark.createDataFrame(rows, SampleSchema)
  }

  /** Samples view: one row per (shard, key) with an ext → content map
    * — the unit a training loader consumes.
    */
  def readSamples(spark: SparkSession, dir: String,
      glob: String = "*.tar", requireSuccessMarker: Boolean = false): DataFrame =
    read(spark, dir, glob, requireSuccessMarker)
      .groupBy(col("shard"), col("key"))
      .agg(map_from_entries(array_sort(collect_list(
        struct(col("ext"), col("content"))))).as("sample"))

  /** One tar entry: (name, typeflag, content), or null at EOF. */
  private def readEntry(in: InputStream): (String, Char, Array[Byte]) = {
    val h = new Array[Byte](512)
    var got = 0
    while (got < 512) {
      val n = in.read(h, got, 512 - got)
      if (n < 0) {
        // EOF is only clean on a block boundary; mid-header EOF is a
        // truncated archive and must fail loudly like entry bodies do
        require(got == 0, s"truncated tar header ($got of 512 bytes)")
        return null
      }
      got += n
    }
    if (h.forall(_ == 0)) return null // end-of-archive zero block
    def str(off: Int, len: Int): String = {
      var end = off
      while (end < off + len && h(end) != 0) end += 1
      new String(h, off, end - off, "UTF-8")
    }
    val name = {
      val prefix = if (str(257, 6).startsWith("ustar")) str(345, 155) else ""
      val base = str(0, 100)
      if (prefix.nonEmpty) s"$prefix/$base" else base
    }
    val size = java.lang.Long.parseLong(str(124, 12).trim, 8)
    // JVM arrays cap slightly below Int.MaxValue (VM header overhead),
    // so bound at MaxValue - 8: a size in the sliver above would pass
    // an Int.MaxValue check and then die with an opaque OOM at
    // `new Array[Byte]`.
    require(size >= 0 && size <= Int.MaxValue - 8,
      s"tar entry $name size $size exceeds the single-entry limit of " +
        s"${Int.MaxValue - 8} bytes (JVM max array length)")
    val typeflag = (h(156) & 0xff).toChar
    val content = new Array[Byte](size.toInt)
    var read = 0
    while (read < size) {
      val n = in.read(content, read, size.toInt - read)
      require(n >= 0, s"truncated tar entry $name")
      read += n
    }
    val pad = ((512 - size % 512) % 512).toInt
    var skipped = 0L
    while (skipped < pad) {
      val n = in.skip(pad - skipped)
      require(n > 0, "truncated tar padding")
      skipped += n
    }
    (name, typeflag, content)
  }
}
