package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import graft.plans.{AsOf, AsOfJoinExec}

import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def trades = Seq(
    ("A", 3L, 100.0), ("A", 8L, 101.0), ("A", 15L, 102.0),
    ("B", 4L, 200.0), ("B", 9L, 201.0),
    ("C", 1L, 300.0)).toDF("sym", "t", "px")

  private def quotes = Seq(
    ("A", 2L, 99.5), ("A", 8L, 100.5), ("A", 10L, 101.5),
    ("B", 5L, 199.5),
    ("D", 1L, 0.0)).toDF("sym", "qt", "bid")

  test("backward inner: latest right row at or before each left time") {
    val out = AsOf.join(trades, quotes, "t", "qt", Seq("sym"), Seq("sym"))
      .select("sym", "t", "px", "qt", "bid")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).sorted.toSeq
    // A@3→q2, A@8→q8 (inclusive), A@15→q10; B@4 none, B@9→q5; C none
    assert(out == Seq(("A", 3L, 2L), ("A", 8L, 8L), ("A", 15L, 10L), ("B", 9L, 5L)))
  }

  test("backward left: unmatched left rows survive with null right") {
    val out = AsOf.join(trades, quotes, "t", "qt", Seq("sym"), Seq("sym"),
      joinType = "left")
    assert(out.count() == 6)
    val unmatched = out.filter(col("bid").isNull)
      .select("sym", "t").collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(unmatched == Seq(("B", 4L), ("C", 1L)))
  }

  test("forward: earliest right row at or after each left time") {
    val out = AsOf.join(trades, quotes, "t", "qt", Seq("sym"), Seq("sym"),
      direction = AsOf.Forward)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).sorted.toSeq
    // A@3→q8, A@8→q8 (inclusive), A@15 none; B@4→q5, B@9 none
    assert(out == Seq(("A", 3L, 8L), ("A", 8L, 8L), ("B", 4L, 5L)))
  }

  test("nearest: closer side wins, ties resolve backward") {
    val left = Seq(("A", 6L)).toDF("k", "t") // back q: 2 (Δ4), fwd q: 8 (Δ2)
    val right = Seq(("A", 2L, "back"), ("A", 8L, "fwd")).toDF("k", "rt", "v")
    val out = AsOf.join(left, right, "t", "rt", Seq("k"), Seq("k"),
      direction = AsOf.Nearest).select("v").as[String].collect().toSeq
    assert(out == Seq("fwd"))
    val tie = Seq(("A", 5L)).toDF("k", "t") // Δ3 both ways
    val out2 = AsOf.join(tie, right, "t", "rt", Seq("k"), Seq("k"),
      direction = AsOf.Nearest).select("v").as[String].collect().toSeq
    assert(out2 == Seq("back"))
  }

  test("tolerance bounds the match window") {
    val out = AsOf.join(trades, quotes, "t", "qt", Seq("sym"), Seq("sym"),
      tolerance = Some(2.0))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).sorted.toSeq
    // A@3→q2 (Δ1 ok), A@8→q8 (Δ0), A@15→q10 Δ5 dropped; B@9→q5 Δ4 dropped
    assert(out == Seq(("A", 3L, 2L), ("A", 8L, 8L)))
  }

  test("null keys and null times never match") {
    val l = Seq((Some("A"), Some(5L)), (None, Some(5L)), (Some("A"), None))
      .toDF("k", "t")
    val r = Seq((Some("A"), Some(1L), 1.0), (None, Some(1L), 2.0),
      (Some("A"), None.asInstanceOf[Option[Long]].map(identity), 3.0))
      .toDF("k", "rt", "v")
    val out = AsOf.join(l, r, "t", "rt", Seq("k"), Seq("k"), joinType = "left")
    assert(out.count() == 3)
    val matched = out.filter(col("v").isNotNull).select("v").collect()
    assert(matched.length == 1 && matched(0).getDouble(0) == 1.0)
  }

  test("duplicate right times: the last row in sort order wins") {
    val l = Seq(("A", 10L)).toDF("k", "t")
    val r = Seq(("A", 5L, "first"), ("A", 5L, "second")).toDF("k", "rt", "v")
    val out = AsOf.join(l, r, "t", "rt", Seq("k"), Seq("k"))
    assert(out.count() == 1) // exactly one match, never a row explosion
  }

  test("global as-of (no keys) and empty right side") {
    val l = Seq(1L, 5L, 9L).toDF("t")
    val r = Seq((2L, "x"), (6L, "y")).toDF("rt", "v")
    val out = AsOf.join(l, r, "t", "rt", Nil, Nil, joinType = "left")
      .orderBy("t").select("v").collect().map(r => Option(r.getString(0))).toSeq
    assert(out == Seq(None, Some("x"), Some("y")))
    val empty = AsOf.join(l, r.filter(lit(false)), "t", "rt", Nil, Nil,
      joinType = "left")
    assert(empty.count() == 3)
    assert(AsOf.join(l, r.filter(lit(false)), "t", "rt", Nil, Nil).count() == 0)
  }

  test("timestamp time axis normalizes to micros") {
    val l = Seq(("A", Timestamp.valueOf("2026-01-01 00:00:10")))
      .toDF("k", "ts")
    val r = Seq(("A", Timestamp.valueOf("2026-01-01 00:00:09.5"), "q"))
      .toDF("k", "rts", "v")
    val out = AsOf.join(l, r, "ts", "rts", Seq("k"), Seq("k"),
      tolerance = Some(1e6)) // 1 second in micros
    assert(out.select("v").as[String].collect().toSeq == Seq("q"))
    val tight = AsOf.join(l, r, "ts", "rts", Seq("k"), Seq("k"),
      tolerance = Some(1e5)) // 0.1 s: the 0.5 s gap misses
    assert(tight.count() == 0)
  }

  test("self as-of join: events against their own error history") {
    val ev = graft.core.Engine.table(spark, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("value"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("event_id").as("err_id"))
    val out = AsOf.join(clicks, errors, "event_id", "err_id",
      Seq("user_id"), Seq("e_user"), joinType = "left")
    assert(out.count() == clicks.count()) // left join preserves cardinality
    // every matched pair obeys the as-of contract
    val bad = out.filter(col("err_id").isNotNull && col("err_id") > col("event_id"))
    assert(bad.count() == 0)
  }

  test("random diff: merge exec == composed window form (backward inner)") {
    val rnd = new scala.util.Random(7)
    val keys = Array("a", "b", "c", "d")
    val l = (1 to 400).map(_ => (keys(rnd.nextInt(4)), rnd.nextInt(1000).toLong,
      rnd.nextInt(100))).toDF("k", "t", "lv")
    val r = (1 to 300).map(_ => (keys(rnd.nextInt(4)), rnd.nextInt(1000).toLong,
      rnd.nextInt(100))).toDF("k", "rt", "rv")
    // de-dup right times per key so "last wins" ambiguity can't differ;
    // rename the right key so the composed form's output is unambiguous
    val rDedup = r.groupBy("k", "rt").agg(max("rv").as("rv"))
      .withColumnRenamed("k", "rk")
    val exec = AsOf.join(l, rDedup, "t", "rt", Seq("k"), Seq("rk"))
      .select("k", "t", "lv", "rt", "rv")
    val composed = AsOf.joinComposedBackward(l, rDedup, "t", "rt", Seq("k"), Seq("rk"))
      .select("k", "t", "lv", "rt", "rv")
    assert(exec.exceptAll(composed).count() == 0)
    assert(composed.exceptAll(exec).count() == 0)
    assert(exec.count() > 0)
  }

  test("optimizer rule: left-side filters push through the join to the scan") {
    val ev = graft.core.Engine.table(spark, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("value"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("event_id").as("err_id"))
    val out = AsOf.join(clicks, errors, "event_id", "err_id",
        Seq("user_id"), Seq("e_user"))
      .filter(col("user_id") < 10) // written ABOVE the as-of join
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    val clickScan = plan.linesIterator
      .filter(_.contains("FileScan parquet")).find(_.contains("LessThan(user_id,10)"))
    assert(clickScan.isDefined,
      s"user_id filter must reach a parquet scan's PushedFilters:\n$plan")
    // semantics unchanged by the pushdown
    val expected = AsOf.join(
      clicks.filter(col("user_id") < 10), errors,
      "event_id", "err_id", Seq("user_id"), Seq("e_user"))
    assert(out.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(out).count() == 0)
  }

  test("optimizer rule: right-side filters do NOT push (as-of semantics)") {
    // dropping right rows changes which row is "most recent": filter
    // above must not equal filter below on the right side
    val l = Seq(("A", 10L)).toDF("k", "t")
    val r = Seq(("A", 5L, 1.0), ("A", 8L, 99.0)).toDF("k", "rt", "v")
    val above = AsOf.join(l, r, "t", "rt", Seq("k"), Seq("k"))
      .filter(col("v") < 50) // latest match has v=99 → filtered out
    assert(above.count() == 0)
    val below = AsOf.join(l, r.filter(col("v") < 50), "t", "rt", Seq("k"), Seq("k"))
    assert(below.count() == 1) // pre-filtering re-matches to v=1.0
  }

  test("optimizer rule: narrow projection prunes both scan schemas") {
    val ev = graft.core.Engine.table(spark, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("event_id").as("err_id"),
        col("value").as("err_value"), col("props").as("err_props"))
    val out = AsOf.join(clicks, errors, "event_id", "err_id",
        Seq("user_id"), Seq("e_user"))
      .select("user_id", "event_id", "err_id")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // neither side's scan should read its wide string column
    assert(!plan.contains("err_props"), s"right side must prune err_props:\n$plan")
    val scans = plan.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.nonEmpty && scans.forall(!_.contains("props")),
      s"pruned scans must not read props/ts:\n${scans.mkString("\n")}")
  }

  test("plan shape: one AsOfJoinExec, at most one exchange per side") {
    val out = AsOf.join(trades, quotes, "t", "qt", Seq("sym"), Seq("sym"))
    out.collect() // finalize adaptive plan
    val plan = out.queryExecution.executedPlan
    val asofs = collect(plan) { case e: AsOfJoinExec => e }
    assert(asofs.length == 1)
    val exchanges = collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.length <= 2)
    val cartesian = collect(plan) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(cartesian.isEmpty)
  }
}
