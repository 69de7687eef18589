package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{CatalystExpressions, TextFunctions}

/** Session-scoped materialized corpus index artifacts: shingle-hash
  * sets, MinHash/SimHash signatures, exact-dedup fingerprints, and the
  * end-to-end near-duplicate classification of a document corpus.
  *
  * Rationale (the 100 TB story): every dedup / similarity query over a
  * corpus starts from the same per-document derivations — tokenize →
  * token hashes → shingles → signatures. Recomputing them per query
  * means re-reading and re-hashing the whole corpus each time, which
  * at 100 TB is the dominant cost of the *query*, not of the
  * *pipeline*. A corpus store computes these once at ingest as index
  * tables (id + signatures is ~0.1% of corpus bytes) and every
  * downstream query reuses them — exactly like a database maintains a
  * B-tree instead of re-sorting per lookup. On a cluster the artifacts
  * live as parquet next to the corpus; within one session the
  * Spark-native analog is a lazily-materialized block-cached frame
  * (`localCheckpoint`), which is what this cache holds.
  *
  * All artifacts derive from ONE combined pass ([[artifacts]]): the
  * expensive steps (tokenize, per-token hash) are computed once per
  * document and every signature branches off that shared projection —
  * the same reason a 100 TB ingest job computes all index columns in
  * one scan rather than one scan per index.
  *
  * Identity: artifacts are memoized per (session, cache key); the key
  * must name the corpus snapshot (e.g. its path) plus the derivation
  * parameters — the builders below append theirs, so
  * differently-parameterized indexes never collide. Entries for
  * stopped sessions are dropped on the next access, so test suites
  * that open/close many sessions don't accumulate dead references.
  *
  * Results are identical to inline computation — only materialization
  * is shared; [[Dedup]]'s `...FromSigs`/`...FromSets` entry points
  * consume these artifacts.
  *
  * Reference surface: generalizes the reference's canonical
  * fingerprint reuse (`core/framework/graph/event_loop_node.py:1895-1899`
  * computes fingerprints once per message and caches them) from one
  * value to the full family of corpus index artifacts.
  */
object CorpusIndex {

  // Session-lifecycle-aware memo (graft.core.SessionMemo): weak
  // session keys + stopped-context purge, and the lazy-cell
  // indirection that lets a memoized build call [[memo]] for its own
  // dependencies (e.g. dedupClasses → minhashSignatures) without
  // tripping ConcurrentHashMap's "Recursive update" check.
  private val cache = new graft.core.SessionMemo[DataFrame]

  /** The one canonical cache key for a parameterized corpus index —
    * shared by [[artifacts]] (in-session memo), [[persist]] (written
    * into the on-disk metadata) and [[load]] (re-registered under the
    * same key so the accessors transparently hit the loaded frame).
    */
  private def artifactKey(key: String, idCol: String, numHashes: Int,
      shingleK: Int): String =
    s"corpus:n=$numHashes:k=$shingleK:id=$idCol:$key"

  /** Memoize `build` per (session, key), materialized as a lazy local
    * checkpoint: the first action computes and block-caches it; later
    * users (including later references within one query plan) read the
    * cached blocks. Row-format block storage beats a columnar
    * `persist` here — the artifact is consumed whole (no column
    * pruning to exploit) and skipping the columnar encode keeps the
    * build at scan speed.
    */
  def memo(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cache.getOrCompute(spark, key)(build.localCheckpoint(false))

  /** Drop every artifact whose key starts with `keyPrefix` — the
    * invalidation hook for when a corpus snapshot is replaced.
    */
  def invalidate(spark: SparkSession, keyPrefix: String): Unit =
    cache.invalidate(spark, _.startsWith(keyPrefix))

  /** The combined one-pass index frame:
    * (idCol, fingerprint, shingles, minhash_sig, simhash) — token
    * hashes computed once, all signatures derived from them. The
    * public accessors below select views of this single cached
    * artifact, so materializing any one of them materializes the whole
    * index exactly once.
    */
  def artifacts(df: DataFrame, key: String, idCol: String, textCol: String,
      numHashes: Int = 64, shingleK: Int = 3): DataFrame =
    memo(df.sparkSession, artifactKey(key, idCol, numHashes, shingleK)) {
      derive(df, idCol, textCol, numHashes, shingleK)
    }

  /** The raw one-pass derivation behind [[artifacts]] — also the unit
    * of incremental ingest ([[append]] derives it for a new batch
    * only).
    */
  private def derive(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingleK: Int): DataFrame =
    df.select(col(idCol),
        CatalystExpressions.tokenHashes(col(textCol)).as("th"),
        TextFunctions.exactFingerprint(col(textCol)).as("fingerprint"))
      .select(col(idCol), col("fingerprint"),
        CatalystExpressions.shingleHashes(col("th"), shingleK).as("shingles"),
        CatalystExpressions.simhash64(col("th")).as("simhash"))
      .select(col(idCol), col("fingerprint"), col("shingles"), col("simhash"),
        CatalystExpressions.minhashSig(col("shingles"), numHashes).as("minhash_sig"))

  /** (id, sh): distinct shingle-hash set per document — the input of
    * exact-Jaccard verification ([[Dedup.ngramJaccardFromSets]]).
    */
  def shingleSets(df: DataFrame, key: String, idCol: String, textCol: String,
      shingleK: Int = 3): DataFrame =
    artifacts(df, key, idCol, textCol, shingleK = shingleK)
      .select(col(idCol).as("id"), col("shingles").as("sh"))

  /** (idCol, signature): MinHash signatures, as
    * [[Dedup.minhashSignatures]] emits them.
    */
  def minhashSignatures(df: DataFrame, key: String, idCol: String, textCol: String,
      numHashes: Int = 64, shingleK: Int = 3): DataFrame =
    artifacts(df, key, idCol, textCol, numHashes, shingleK)
      .select(col(idCol), col("minhash_sig").as("signature"))

  /** (id, sh): 64-bit SimHash signatures, as
    * [[Dedup.simhashSignatures]] emits them.
    */
  def simhashSignatures(df: DataFrame, key: String, idCol: String,
      textCol: String): DataFrame =
    artifacts(df, key, idCol, textCol)
      .select(col(idCol).as("id"), col("simhash").as("sh"))

  /** (idCol, fingerprint): canonical exact-dedup fingerprints. */
  def fingerprints(df: DataFrame, key: String, idCol: String,
      textCol: String): DataFrame =
    artifacts(df, key, idCol, textCol).select(col(idCol), col("fingerprint"))

  // ------------------------------------------------------- durability

  /** On-disk layout written by [[persist]] under one base path:
    *
    * {{{
    * <path>/
    *   index_meta.json   # {key, idCol, numHashes, shingleK, version}
    *   artifacts/        # parquet, range-partitioned by id
    * }}}
    *
    * The artifact frame is range-partitioned by the id column before
    * writing, so (a) each file carries a tight min/max id range —
    * point lookups and keep-list joins prune files via parquet
    * statistics — and (b) re-loading preserves a data layout clustered
    * on the join key every consumer uses. At 100 TB this is the index
    * a corpus store maintains at ingest: ~0.1% of corpus bytes,
    * computed once, reused by every dedup / similarity / curation
    * query until the snapshot is replaced.
    */
  private def fs(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeMeta(spark: SparkSession, path: String,
      data: Map[String, String]): Unit = {
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    val out = fs(spark, path).create(new org.apache.hadoop.fs.Path(path), true)
    try out.write(org.json4s.jackson.Serialization.write(data).getBytes("UTF-8"))
    finally out.close()
  }

  private def readMeta(spark: SparkSession, path: String): Map[String, String] = {
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    val in = fs(spark, path).open(new org.apache.hadoop.fs.Path(path))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    org.json4s.jackson.JsonMethods.parse(text).extract[Map[String, String]]
  }

  /** Build (or reuse the memoized) combined index frame and write it
    * durably under `path` — the ingest-time step of the 100 TB
    * discipline. Subsequent sessions call [[load]] instead of
    * re-deriving the corpus. Overwrites any previous index at `path`.
    */
  def persist(df: DataFrame, path: String, key: String, idCol: String,
      textCol: String, numHashes: Int = 64, shingleK: Int = 3): Unit = {
    val spark = df.sparkSession
    val art = artifacts(df, key, idCol, textCol, numHashes, shingleK)
    art.repartitionByRange(
        spark.sessionState.conf.numShufflePartitions, col(idCol))
      .write.mode("overwrite").parquet(s"$path/artifacts")
    writeMeta(spark, s"$path/index_meta.json", Map(
      "version" -> "1", "key" -> key, "idCol" -> idCol,
      "numHashes" -> numHashes.toString, "shingleK" -> shingleK.toString))
  }

  /** Open a persisted index: reads the metadata, re-registers the
    * parquet-backed frame in the session cache under the exact key
    * [[artifacts]] would compute — so every accessor
    * ([[minhashSignatures]], [[shingleSets]], [[dedupClasses]], …)
    * called with the same (key, params) transparently reads the loaded
    * index instead of re-deriving the corpus. Returns the artifact
    * frame.
    */
  def load(spark: SparkSession, path: String): DataFrame = {
    val meta = readMeta(spark, s"$path/index_meta.json")
    require(meta.get("version").contains("1"), s"unsupported index version at $path: $meta")
    val cacheKey = artifactKey(meta("key"), meta("idCol"),
      meta("numHashes").toInt, meta("shingleK").toInt)
    val art = spark.read.parquet(s"$path/artifacts")
    cache.put(spark, cacheKey, art)
    art
  }

  /** Incremental ingest — the daily-crawl pattern: derive the index
    * artifacts for `newDocs` ONLY (one scan of the batch, not the
    * corpus), append them to the persisted index at `path`, and
    * invalidate the session memo so accessors re-read the grown
    * index. At 100 TB this is the difference between an O(batch)
    * nightly job and an O(corpus) one. The caller owns id uniqueness
    * across batches (ingest ids are monotone in any real corpus
    * store).
    *
    * Returns the new-batch artifact frame (the input to
    * [[Dedup.incrementalNearDuplicates]] — dedup the delta against
    * the whole index without re-pairing old-vs-old).
    */
  def append(newDocs: DataFrame, path: String, textCol: String): DataFrame = {
    val spark = newDocs.sparkSession
    val meta = readMeta(spark, s"$path/index_meta.json")
    val (idCol, numHashes, shingleK) =
      (meta("idCol"), meta("numHashes").toInt, meta("shingleK").toInt)
    val batch = derive(newDocs, idCol, textCol, numHashes, shingleK)
      .localCheckpoint(false) // one derivation serves both the write and the returned frame
    batch.write.mode("append").parquet(s"$path/artifacts")
    invalidate(spark, artifactKey(meta("key"), idCol, numHashes, shingleK))
    batch
  }

  /** Near-duplicate pairs introduced by a new batch, against the full
    * persisted index (old ∪ new): candidates are LSH-banded
    * (batch side) ⋈ (full side) — never old-vs-old — then exact
    * shingle-Jaccard verified from the index's own shingle sets.
    * With the same banding parameters and the bucket cap DISABLED
    * (`maxBucketSize = 0`),
    * `full(old) ∪ incremental(all, new) == full(all)` — the spec
    * locks this equivalence on random corpora. With a cap enabled the
    * equality is only guaranteed when no bucket crosses the cap
    * boundary between old and old ∪ new: a bucket under the cap for
    * old alone but over it for the union keeps old-old pairs in
    * `full(old)` that `full(all)` would drop.
    */
  def incrementalNearDuplicates(spark: SparkSession, path: String,
      newArtifacts: DataFrame, minJaccard: Double = 0.5, bands: Int = 16,
      maxBucketSize: Int = Dedup.DefaultMaxBucketSize): DataFrame = {
    val meta = readMeta(spark, s"$path/index_meta.json")
    val idCol = meta("idCol")
    val all = spark.read.parquet(s"$path/artifacts")
    Dedup.incrementalNearDuplicates(all, newArtifacts, idCol,
      meta("numHashes").toInt, bands, minJaccard, maxBucketSize)
  }

  /** The full near-duplicate classification of the corpus
    * ([[Dedup.dedupCorpus]]: input + `dup_class` + `keep`), built from
    * the cached signature/shingle artifacts and itself cached — the
    * keep-list a curation pipeline materializes once and every
    * downstream query (language mix, token accounting, export)
    * filters against.
    */
  def dedupClasses(df: DataFrame, key: String, idCol: String, textCol: String,
      minJaccard: Double = 0.5, numHashes: Int = 64, bands: Int = 16,
      shingleK: Int = 3,
      maxBucketSize: Int = Dedup.DefaultMaxBucketSize,
      checkpointDir: Option[String] = None): DataFrame =
    memo(df.sparkSession,
        s"dedup:j=$minJaccard:n=$numHashes:b=$bands:k=$shingleK:cap=$maxBucketSize:$key") {
      Dedup.dedupCorpus(df, idCol, textCol, minJaccard, numHashes, bands,
        shingleK, maxBucketSize,
        precomputedSigs =
          Some(minhashSignatures(df, key, idCol, textCol, numHashes, shingleK)),
        precomputedSets = Some(shingleSets(df, key, idCol, textCol, shingleK)),
        checkpointDir = checkpointDir)
    }
}
