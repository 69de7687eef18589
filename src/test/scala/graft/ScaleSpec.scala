package graft

import org.apache.spark.sql.functions._
import graft.operators.Scale

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals unsalted join on skewed data") {
    // hot key: 5000 of 5100 rows share key 1
    val large = ((1 to 5000).map(i => (1L, i.toDouble)) ++
      (1 to 100).map(i => (i.toLong + 1, i.toDouble))).toDF("k", "v")
    val small = (1L to 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val salted = Scale.saltedJoin(large, small, Seq("k"))
    val plain = large.join(small, Seq("k"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salted aggregate equals direct aggregate") {
    val df = ((1 to 5000).map(_ => ("hot", 1.0)) ++
      (1 to 100).map(i => (s"k$i", 2.0))).toDF("k", "v")
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val salted = Scale.saltedAggregate(df, Seq("k"), saltFactor = 8,
      partialAggs = Seq(count(lit(1)).as("pn"), sum("v").as("ps")),
      finalAggs = Seq(sum("pn").as("n"), sum("ps").as("s")))
    assert(salted.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(salted).count() == 0)
  }

  test("bucketed join plans without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a fresh JVM's in-memory catalog forgets managed tables but their
    // warehouse directories persist — clear them or CREATE fails
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("b_orders", "b_lineitem").foreach { t =>
      val d = new java.io.File(s"$wh/$t")
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(d)
      }
    }
    val dir = "/root/testdata/sf0.001"
    Scale.writeBucketed(graft.core.Engine.table(spark, dir, "orders"),
      "b_orders", Seq("o_orderkey"), 4)
    Scale.writeBucketed(
      graft.core.Engine.table(spark, dir, "lineitem")
        .withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", Seq("o_orderkey"), 4)
    val joined = spark.table("b_lineitem").join(spark.table("b_orders"), Seq("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() > 0)
  }

  test("partitioned layout prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Scale.writePartitioned(
      graft.core.Engine.table(spark, sfDir, "events"), dir, Seq("event_type"))
    val pruned = spark.read.parquet(dir).filter(col("event_type") === "error")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"expected partition filters in:\n$plan")
    assert(pruned.count() ==
      graft.core.Engine.table(spark, sfDir, "events")
        .filter(col("event_type") === "error").count())
  }
}
