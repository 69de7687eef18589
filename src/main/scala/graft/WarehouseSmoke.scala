package graft

/** Hive-metastore smoke: builds a warehouse-backed session (embedded
  * Derby metastore), registers the star schema as external tables,
  * and runs a gated query through the persistent catalog — the
  * BASELINE.json "Spark SQL + Hive metastore integration" path,
  * exercised in its own JVM (`sbt "runMain graft.WarehouseSmoke"`).
  */
object WarehouseSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val base = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val spark = graft.core.Catalog.warehouseSession(
      s"$base/warehouse", s"$base/metastore", cores = 8)
    try {
      graft.core.Catalog.registerStarSchema(spark, sfDir)
      val tables = spark.catalog.listTables().collect().map(_.name).sorted
      println(s"[warehouse] catalog tables: ${tables.mkString(",")}")
      val n = graft.sql.QueryGate.sql(spark,
        """SELECT l_returnflag, count(*) AS n FROM lineitem
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin).count()
      println(s"[warehouse] gated query over hive catalog: $n rows")
      val desc = graft.core.Catalog.describeDatabase(spark).count()
      println(s"[warehouse] describe_dataset: $desc tables")
      assert(n > 0 && tables.contains("lineitem"))
      println("[warehouse] OK")
    } finally spark.stop()
  }
}
