package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Memory-protection guards — parity with the reference's permission
  * views and write validation (`node.py:265-447`,
  * `shared_state.py:370-435`).
  */
object Guards {

  /** Read-permission view (P7, `node.py:434-447` `with_permissions`):
    * a column-pruned view over the same data. Requesting a column
    * outside the allowlist fails analysis — the same contract as the
    * reference's KeyError, enforced by Catalyst.
    */
  def permissionView(df: DataFrame, allowedCols: Seq[String]): DataFrame = {
    val missing = allowedCols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"allowlisted columns not in schema: $missing")
    df.select(allowedCols.map(col): _*)
  }

  /** Code-indicator predicate (P8, `node.py:295-325`): true when the
    * string looks like injected code. For strings over `sampleOver`
    * bytes the reference samples 5 evenly spaced windows instead of
    * scanning everything (`node.py:369-433`) — mirrored with
    * positional substrings so the check stays O(windows), not O(len).
    */
  def codeIndicator(c: Column, sampleOver: Int = 10240, window: Int = 2048): Column = {
    val pattern = "(?s).*(def |import |function\\s*\\(|<script|eval\\(|exec\\(|subprocess|__import__).*"
    val fullScan = c.rlike(pattern)
    // head, three interior quarters, and a tail-anchored window (the
    // tail anchor matters: an even i/5 grid never reaches the end)
    val positions: Seq[Column] =
      (0 until 4).map(i => greatest((length(c) * i / 4).cast("int"), lit(1))) :+
        greatest(length(c) - window + 1, lit(1)).cast("int")
    val sampled = positions
      .map(p => c.substr(p, lit(window)).rlike(pattern))
      .reduce(_ || _)
    when(length(c) > sampleOver, sampled).otherwise(fullScan)
  }

  /** Write validation (P8, `node.py:295-325`): rejects values longer
    * than `maxLen` that contain code indicators. Returns the input
    * with a boolean `write_ok` column; `enforce` drops rejected rows.
    */
  def validateWrites(df: DataFrame, valueCol: String, maxLen: Int = 5000,
      enforce: Boolean = false): DataFrame = {
    val ok = !(length(col(valueCol)) > maxLen && codeIndicator(col(valueCol)))
    val flagged = df.withColumn("write_ok", coalesce(ok, lit(true)))
    if (enforce) flagged.filter(col("write_ok")).drop("write_ok") else flagged
  }

  /** Last-write-wins merge of branch outputs into keyed memory (O6,
    * `executor.py:1908-1910`, `node.py:327-370`): deterministic order
    * by `versionCol`, one row per key. The reference serializes with
    * per-key locks; shuffling by key gives the same single-writer
    * guarantee for free.
    */
  def lastWriteWins(df: DataFrame, keyCols: Seq[String], versionCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(desc(versionCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** CDC upsert (the MERGE shape over plain parquet): base rows plus a
    * change set, last write per key wins; a boolean `deletedCol` in the
    * changes tombstones the key. One shuffle on the keys — the batch
    * form of keeping a 100 TB keyed table current from change feeds.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      versionCol: String, deletedCol: Option[String] = None): DataFrame = {
    val changesAligned = deletedCol match {
      case Some(d) => changes
      case None => changes.withColumn("__deleted", lit(false))
    }
    val baseAligned = base.withColumn(
      deletedCol.getOrElse("__deleted"), lit(false))
    val merged = lastWriteWins(
      baseAligned.unionByName(changesAligned, allowMissingColumns = true),
      keyCols, versionCol)
    val d = deletedCol.getOrElse("__deleted")
    merged.filter(!coalesce(col(d), lit(false))).drop(d)
  }

  /** As-of read over a versioned keyed state table: the last write per
    * key at or before `asOfVersion` — the time-travel complement of
    * [[lastWriteWins]] (the reference's state-change history,
    * `shared_state.py:91, 341-343`, queried at a point in time).
    */
  def stateAsOf(df: DataFrame, keyCols: Seq[String], versionCol: String,
      asOfVersion: Long): DataFrame =
    lastWriteWins(df.filter(col(versionCol) <= asOfVersion), keyCols, versionCol)

  /** Parallel-branch output-key disjointness check (`edge.py:671-691`):
    * the reference statically forbids overlapping output keys across
    * parallel branches; given (branch, key) pairs, return the
    * offending keys (empty = valid).
    */
  def overlappingKeys(branchKeys: DataFrame, branchCol: String, keyCol: String): DataFrame =
    branchKeys.groupBy(col(keyCol))
      .agg(countDistinct(col(branchCol)).as("n_branches"))
      .filter(col("n_branches") > 1)
      .select(col(keyCol), col("n_branches"))

  /** Data-quality expectations report — the declarative ingest gate a
    * production table needs before anything downstream trusts it:
    * row-level predicates (nulls count as violations), key-uniqueness
    * checks, and referential-integrity checks, each reported as one
    * (check, n_violations) row.
    *
    * Scale shape: ALL row-level predicates fold into ONE scan-wide
    * aggregate (a conditional sum per check — adding a check adds a
    * column, not a pass); each uniqueness check is one count-distinct
    * aggregate (duplicates = rows − distinct keys); each FK check is
    * one left-anti join against the parent keys (broadcast when the
    * parent is a dimension). The report is O(#checks) rows.
    */
  def qualityReport(df: DataFrame,
      checks: Seq[(String, Column)],
      uniqueKeys: Seq[(String, Seq[String])] = Nil,
      foreignKeys: Seq[(String, String, DataFrame, String)] = Nil): DataFrame = {
    require(checks.nonEmpty || uniqueKeys.nonEmpty || foreignKeys.nonEmpty,
      "at least one check required")
    val spark = df.sparkSession
    import spark.implicits._
    val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (checks.nonEmpty) {
      val aggs = checks.map { case (name, p) =>
        // coalesce: sum over ZERO rows is null — an empty table must
        // report 0 violations like the uniqueness/FK checks do, not a
        // null that reads as "unknown" for row checks only
        coalesce(sum(when(!coalesce(p, lit(false)), 1L).otherwise(0L)), lit(0L))
          .as(name)
      }
      val row = df.agg(aggs.head, aggs.tail: _*)
      frames += row.select(explode(array(checks.map { case (name, _) =>
        struct(lit(name).as("check_name"), col(name).as("n_violations"))
      }: _*)).as("s")).select(col("s.check_name"), col("s.n_violations"))
    }
    uniqueKeys.foreach { case (name, keys) =>
      frames += df.agg(
        (count(lit(1)) -
          countDistinct(col(keys.head), keys.tail.map(col): _*))
          .as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"))
    }
    foreignKeys.foreach { case (name, childKey, parent, parentKey) =>
      frames += df.filter(col(childKey).isNotNull)
        .join(broadcast(parent.select(col(parentKey).as(childKey)).distinct()),
          Seq(childKey), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"))
    }
    frames.reduce(_ unionByName _)
  }
}
