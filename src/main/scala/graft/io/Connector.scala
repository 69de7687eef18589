package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Generic foreign source/sink connector pattern — the engine-level
  * restatement of the reference's 253 `@mcp.tool` connectors
  * (SURVEY §2.1 S14: "we implement the pattern once, not 253 times").
  *
  * A connector is list/search reads (→ DataFrame via paginated
  * fetches) and create/update writes (→ foreachPartition sink), with
  * per-partition transport instantiation, client-side rate limiting,
  * and the ST12 retry/backoff discipline, all around a pluggable
  * [[Transport]]. Tests use [[InMemoryTransport]]; a real HTTP
  * transport implements one trait.
  */
object Connector {

  /** One page of results + the cursor for the next (None = done) —
    * the cursor-pagination shape every list/search API shares.
    */
  final case class Page(rows: Seq[Row], nextCursor: Option[String])

  trait Transport extends Serializable {
    /** Fetch one page of `resource` starting at `cursor`. */
    def fetch(resource: String, cursor: Option[String], pageSize: Int): Page
    /** Write a batch of rows to `resource`; returns accepted count. */
    def write(resource: String, rows: Seq[Row]): Int
  }

  /** Simple token-bucket rate limiter (client-side; the reference's
    * provider backoff lives at `llm/litellm.py:133-188`).
    */
  final class RateLimiter(permitsPerSecond: Double) extends Serializable {
    private var nextFree = 0L
    def acquire(): Unit = synchronized {
      val now = System.nanoTime()
      val interval = (1e9 / permitsPerSecond).toLong
      val at = math.max(now, nextFree)
      nextFree = at + interval
      val sleepNs = at - now
      if (sleepNs > 0) Thread.sleep(sleepNs / 1000000, (sleepNs % 1000000).toInt)
    }
  }

  /** Read a foreign resource as a DataFrame: the driver walks cursor
    * pages (bounded by `maxPages`) and hands them off. Foreign APIs
    * are cursor-serial by nature — the parallelism at 100 TB comes
    * from many resources/partitions (one connector stream each), not
    * from one cursor.
    *
    * Driver memory is bounded by `spillEveryRows`: whenever that many
    * rows accumulate, they're flushed as a parquet part under a spill
    * directory and the buffer resets, so `maxPages × pageSize` never
    * has to fit in driver heap. Small reads (never reaching the
    * threshold) skip the disk round-trip entirely.
    */
  def read(spark: SparkSession, transport: Transport, resource: String,
      schema: StructType, pageSize: Int = 100, maxPages: Int = 1000,
      ratePerSecond: Double = 50, spillEveryRows: Int = 100000,
      spillDir: Option[String] = None): DataFrame = {
    val limiter = new RateLimiter(ratePerSecond)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    var dir: Option[String] = None
    def flush(): Unit = if (buf.nonEmpty) {
      val d = dir.getOrElse {
        // always a per-read unique directory: mode("append") into a
        // shared spillDir would mix rows from prior reads
        val d0 = spillDir match {
          case Some(base) => s"$base/read-${java.util.UUID.randomUUID()}"
          case None =>
            java.nio.file.Files.createTempDirectory("graft-connector-spill").toString
        }
        dir = Some(d0); d0
      }
      spark.createDataFrame(
          spark.sparkContext.parallelize(buf.toSeq, math.max(1, buf.size / 25000)), schema)
        .write.mode("append").parquet(d)
      buf.clear()
    }
    var cursor: Option[String] = None
    var pages = 0
    var done = false
    while (!done && pages < maxPages) {
      limiter.acquire()
      val page = transport.fetch(resource, cursor, pageSize)
      buf ++= page.rows
      if (buf.size >= spillEveryRows) flush()
      cursor = page.nextCursor
      pages += 1
      done = cursor.isEmpty
    }
    dir match {
      case None => // never crossed the threshold — stay in memory
        spark.createDataFrame(spark.sparkContext.parallelize(buf.toSeq, 4), schema)
      case Some(d) =>
        flush()
        spark.read.schema(schema).parquet(d)
    }
  }

  /** Sink a DataFrame into a foreign resource: per-partition transport
    * use, batched writes, retry with backoff (ST12), rate limiting.
    * Returns the number of accepted rows (accumulator-summed).
    */
  def writeSink(df: DataFrame, transportFactory: () => Transport, resource: String,
      batchSize: Int = 100, ratePerSecond: Double = 50,
      maxRetries: Int = 3, backoffBaseMs: Long = 10): Long = {
    val accepted = df.sparkSession.sparkContext.longAccumulator("connector_accepted")
    df.rdd.foreachPartition { it =>
      val transport = transportFactory()
      val limiter = new RateLimiter(ratePerSecond)
      it.grouped(batchSize).foreach { batch =>
        var attempt = 0
        var ok = false
        while (!ok) {
          limiter.acquire()
          try {
            accepted.add(transport.write(resource, batch).toLong)
            ok = true
          } catch {
            case e: Exception =>
              attempt += 1
              if (attempt > maxRetries) throw e
              Thread.sleep(backoffBaseMs * (1L << (attempt - 1)))
          }
        }
      }
    }
    accepted.value
  }

  // --------------------------------------------------- remote SQL (JDBC)

  /** Default row cap of the remote-SQL source
    * (`bigquery_tool.py:153`).
    */
  val DefaultSqlMaxRows: Int = 1000

  /** Hard ceiling no caller can exceed (`bigquery_tool.py:207-214`). */
  val HardSqlMaxRows: Int = 10000

  /** Split spec for parallel remote reads: Spark issues one range
    * query per partition (`column BETWEEN …`), the standard way to
    * fan a warehouse extract across executors.
    */
  final case class SqlPartitioning(column: String, lower: Long, upper: Long,
      numPartitions: Int)

  /** Remote-SQL warehouse source (the real-transport half of S6, whose
    * pattern/accounting the BigQuery surface established): run a gated
    * SELECT on a remote database over Spark's JDBC source, with the
    * reference's `max_rows` cap + truncation flag
    * (`bigquery_tool.py:149-275`).
    *
    * - The SQL text is validated by [[graft.sql.QueryGate]] BEFORE it
    *   is sent anywhere: any DDL/DML anywhere in the tree (CTEs,
    *   subqueries) throws [[graft.sql.QueryGate.RejectedQuery]] — the
    *   plan-walk upgrade over the reference's keyword denylist.
    * - `maxRows` is clamped to [[HardSqlMaxRows]] like the reference's
    *   hard cutoff; the truncation flag comes from one row of
    *   lookahead via [[graft.sql.QueryStats.run]] (scan-side file
    *   bytes read 0 here — remote byte accounting is server-side,
    *   which JDBC does not expose).
    * - `partitioning` fans the read across executors as range splits;
    *   unsplit reads push the whole query text down to the remote
    *   (`query` option), so filters/aggregates run warehouse-side.
    *
    * Scale note: this source is for warehouse-extract workloads — the
    * cap bounds what reaches the driver-facing result, while bulk
    * extraction goes through `partitioning` + a durable write, never
    * through a driver collect.
    */
  def sqlSource(spark: SparkSession, url: String, query: String,
      options: Map[String, String] = Map.empty,
      maxRows: Int = DefaultSqlMaxRows,
      partitioning: Option[SqlPartitioning] = None): graft.sql.QueryStats.Stats = {
    // validateRemote, not validate: the query runs on the REMOTE
    // engine's dialect — when Spark's parser accepts it the plan-walk
    // gate applies, otherwise the lexical SELECT-only fallback does
    // (a `SELECT TOP 5 …` must not be rejected for being foreign)
    graft.sql.QueryGate.validateRemote(spark, query) match {
      case Left(reason) => throw graft.sql.QueryGate.RejectedQuery(reason)
      case Right(_) => ()
    }
    val cap = math.min(math.max(1, maxRows), HardSqlMaxRows)
    val base = spark.read.format("jdbc").option("url", url).options(options)
    val df = partitioning match {
      case Some(p) => base
        .option("dbtable", s"($query) graft_q")
        .option("partitionColumn", p.column)
        .option("lowerBound", p.lower.toString)
        .option("upperBound", p.upper.toString)
        .option("numPartitions", p.numPartitions.toString)
        .load()
      case None => base.option("query", query).load()
    }
    graft.sql.QueryStats.run(df, cap)
  }

  val DescribeSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("table_schema",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("table_name",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("column_name",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("data_type",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("nullable",
      org.apache.spark.sql.types.BooleanType),
    org.apache.spark.sql.types.StructField("ordinal",
      org.apache.spark.sql.types.IntegerType)))

  val TableListSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("table_schema",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("table_name",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("table_type",
      org.apache.spark.sql.types.StringType)))

  /** Remote catalog describe — `describe_dataset` parity for the
    * remote-SQL source (`bigquery_tool.py:277-392` lists a REMOTE
    * dataset's tables + schemas; [[graft.core.Catalog.describeDataset]]
    * covers the local metastore half). One row per column via JDBC
    * `DatabaseMetaData.getColumns` — the portable, read-only metadata
    * surface (no SQL text exists to gate; nothing here can mutate).
    * Catalog listings are tiny, so this is a bounded driver-side walk
    * like the reference's — the DATA path stays [[sqlSource]].
    */
  def describeRemote(spark: SparkSession, url: String,
      schemaPattern: Option[String] = None, tablePattern: String = "%",
      options: Map[String, String] = Map.empty): DataFrame = {
    val props = new java.util.Properties()
    options.foreach { case (k, v) => props.setProperty(k, v) }
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val rs = conn.getMetaData.getColumns(null, schemaPattern.orNull, tablePattern, "%")
      val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
      while (rs.next()) {
        rows += Row(rs.getString("TABLE_SCHEM"), rs.getString("TABLE_NAME"),
          rs.getString("COLUMN_NAME"), rs.getString("TYPE_NAME"),
          rs.getInt("NULLABLE") != java.sql.DatabaseMetaData.columnNoNulls,
          rs.getInt("ORDINAL_POSITION"))
      }
      rs.close()
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), DescribeSchema)
    } finally conn.close()
  }

  /** Table-level listing of the remote catalog (the dataset view the
    * reference renders before per-table schemas): one row per
    * TABLE/VIEW via `DatabaseMetaData.getTables`.
    */
  def listRemoteTables(spark: SparkSession, url: String,
      schemaPattern: Option[String] = None, tablePattern: String = "%",
      options: Map[String, String] = Map.empty): DataFrame = {
    val props = new java.util.Properties()
    options.foreach { case (k, v) => props.setProperty(k, v) }
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val rs = conn.getMetaData.getTables(null, schemaPattern.orNull, tablePattern,
        Array("TABLE", "VIEW"))
      val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
      while (rs.next()) {
        rows += Row(rs.getString("TABLE_SCHEM"), rs.getString("TABLE_NAME"),
          rs.getString("TABLE_TYPE"))
      }
      rs.close()
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), TableListSchema)
    } finally conn.close()
  }

  /** In-memory transport for tests/offline runs: serves a fixed row
    * set in pages; records writes (per JVM).
    */
  object InMemoryTransport {
    val written = new java.util.concurrent.ConcurrentHashMap[String, java.util.List[Row]]()
    @volatile var failNextWrites: Int = 0
  }

  final case class InMemoryTransport(data: Seq[Row]) extends Transport {
    override def fetch(resource: String, cursor: Option[String], pageSize: Int): Page = {
      val start = cursor.map(_.toInt).getOrElse(0)
      val slice = data.slice(start, start + pageSize)
      val next = if (start + pageSize >= data.size) None else Some((start + pageSize).toString)
      Page(slice, next)
    }
    override def write(resource: String, rows: Seq[Row]): Int = {
      if (InMemoryTransport.failNextWrites > 0) {
        InMemoryTransport.failNextWrites -= 1
        throw new RuntimeException("simulated write failure")
      }
      InMemoryTransport.written
        .computeIfAbsent(resource, _ => java.util.Collections.synchronizedList(
          new java.util.ArrayList[Row]()))
        .addAll(scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava)
      rows.size
    }
  }
}
