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
}
