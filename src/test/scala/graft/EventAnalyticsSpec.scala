package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Funnel / cohort-retention / rolling-anomaly operators: hand-computed
  * fixtures for the first-touch funnel ordering semantics, the weekly
  * cohort matrix, and the integer-cents rolling z-score.
  */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel: first-touch strict ordering decides stage membership") {
    // u1 completes view<click<purchase; u2 view<click but purchase BEFORE
    // click (first-touch order broken at stage 3); u3 only views; u4's
    // first click precedes their first view (never enters stage 2).
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:01:00"), "click"),
      (1L, ts("2024-01-01 10:02:00"), "purchase"),
      (2L, ts("2024-01-02 09:00:00"), "view"),
      (2L, ts("2024-01-02 09:05:00"), "click"),
      (2L, ts("2024-01-02 09:01:00"), "purchase"),
      (3L, ts("2024-01-03 08:00:00"), "view"),
      (4L, ts("2024-01-04 07:00:00"), "click"),
      (4L, ts("2024-01-04 07:30:00"), "view"),
      (4L, ts("2024-01-04 07:40:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val r = Analytics.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(x => (x.getInt(0), x.getString(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq === Seq(
      (1, "view", 4L, 1.0),      // u1 u2 u3 u4 all have a first view
      (2, "click", 2L, 0.5),     // u1, u2 (u4's click precedes their view)
      (3, "purchase", 1L, 0.25)))// only u1 keeps strict order through purchase
  }

  test("funnel: empty base yields zero conversion, not a division error") {
    val ev = Seq((1L, ts("2024-01-01 10:00:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val r = Analytics.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click")).collect()
    assert(r.map(_.getLong(2)).toSeq === Seq(0L, 0L))
    assert(r.map(_.getDouble(3)).toSeq === Seq(0.0, 0.0))
  }

  test("cohort retention: users land in their first-event week, offsets count distinct") {
    // 2024-01-01 is a Monday. u1 first in week0, returns week1 twice
    // (still ONE distinct user); u2 first in week0 only; u3 first in week1.
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-08 10:00:00")),
      (1L, ts("2024-01-09 10:00:00")),
      (2L, ts("2024-01-03 10:00:00")),
      (3L, ts("2024-01-10 10:00:00")))
      .toDF("user_id", "ts")
    val r = Analytics.cohortRetention(ev, "user_id", "ts")
      .collect().map(x => (x.getDate(0).toString, x.getInt(1), x.getLong(2)))
    assert(r.toSeq === Seq(
      ("2024-01-01", 0, 2L), // u1+u2 active in their own cohort week
      ("2024-01-01", 1, 1L), // u1 returns (two events, one user)
      ("2024-01-08", 0, 1L)))
  }

  test("anomaly flags: spike after a full window trips, cold start never does") {
    // 25 steady values then one spike for u1: rolling mean 10, σ≈0 over
    // constant history would zero-divide — so vary history slightly.
    val steady = (0 until 25).map(i => (1L, i.toLong, if (i % 2 == 0) 10.0 else 10.5))
    val ev = (steady :+ ((1L, 25L, 50.0))).toDF("user_id", "event_id", "value")
    val r = Analytics.anomalyFlags(ev, Seq("user_id"), "event_id", "value",
      window = 20, z = 3.0)
    val flagged = r.filter(col("anomaly")).collect()
    assert(flagged.length === 1)
    assert(flagged.head.getAs[Long]("event_id") === 25L)
    // rows 0..19 have an incomplete window: never flagged even if extreme
    val early = r.filter(col("event_id") < 20 && col("anomaly")).count()
    assert(early === 0L)
  }

  test("anomaly flags: rolling stats replay the exact integer-cents arithmetic") {
    val ev = Seq((1L, 0L, 1.0), (1L, 1L, 2.0), (1L, 2L, 3.0), (1L, 3L, 10.0))
      .toDF("user_id", "event_id", "value")
    val r = Analytics.anomalyFlags(ev, Seq("user_id"), "event_id", "value",
        window = 2, z = 1.0)
      .orderBy("event_id").collect()
    // row 3: window = {2.0, 3.0} → mean 2.5, σ = 0.5 ⇒ z = (10-2.5)/0.5 = 15
    assert(r(3).getAs[Double]("roll_mean") === 2.5)
    assert(r(3).getAs[Double]("roll_std") === 0.5)
    assert(r(3).getAs[Double]("zscore") === 15.0)
    assert(r(3).getAs[Boolean]("anomaly"))
  }

  test("transitionMatrix counts consecutive pairs per user, rows sum to 1") {
    // u1: a→b→a→b ; u2: b→b→c. No cross-user pair (u1's last b never
    // precedes u2's first b).
    val ev = Seq(
      (1L, 0L, "a"), (1L, 1L, "b"), (1L, 2L, "a"), (1L, 3L, "b"),
      (2L, 4L, "b"), (2L, 5L, "b"), (2L, 6L, "c"))
      .toDF("user_id", "event_id", "event_type")
    val m = Analytics.transitionMatrix(ev, "user_id", "event_id", "event_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(m(("a", "b")) == ((2L, 2L, 1.0)))
    assert(m(("b", "a")) == ((1L, 3L, 0.333333)))
    assert(m(("b", "b")) == ((1L, 3L, 0.333333)))
    assert(m(("b", "c")) == ((1L, 3L, 0.333333)))
    assert(m.size == 4, "no cross-user transitions")
  }

  test("conversionLag: first-from to first-later-to in whole seconds") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:30"), "purchase"),  // 30 s
      (1L, ts("2024-01-01 11:00:00"), "purchase"),  // ignored (not first)
      (2L, ts("2024-01-02 09:00:00"), "purchase"),  // BEFORE first view
      (2L, ts("2024-01-02 10:00:00"), "view"),
      (2L, ts("2024-01-02 10:02:00"), "purchase"),  // 120 s
      (3L, ts("2024-01-03 08:00:00"), "view"))      // never converts
      .toDF("user_id", "ts", "event_type")
    val r = Analytics.conversionLag(ev, "user_id", "ts", "event_type",
      "view", "purchase").head()
    assert(r.getAs[Long]("n_converted") == 2L)
    assert(r.getAs[Double]("avg_s") == 75.0)
    assert(r.getAs[Long]("min_s") == 30L)
    assert(r.getAs[Long]("max_s") == 120L)
  }

  test("gapFillHourly: grid spans first..last hour, gaps carry the last value") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:15:00"), 1.5),
      (1L, ts("2024-01-01 10:45:00"), 2.5),  // same hour → cents sum 400
      (1L, ts("2024-01-01 13:05:00"), 7.0),  // 2-hour gap before this
      (2L, ts("2024-01-02 00:00:00"), 9.0))  // single-hour entity
      .toDF("user_id", "ts", "value")
    val got = Analytics.gapFillHourly(ev, "user_id", "ts", "value")
      .orderBy("user_id", "hour").collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("hour").toString.substring(11, 13),
        r.getAs[Boolean]("observed"),
        Option(r.getAs[Any]("cents")),
        r.getAs[Long]("filled_cents")))
    assert(got.toSeq == Seq(
      (1L, "10", true, Some(400L), 400L),
      (1L, "11", false, None, 400L), // filled from hour 10
      (1L, "12", false, None, 400L),
      (1L, "13", true, Some(700L), 700L),
      (2L, "00", true, Some(900L), 900L)))
  }

  test("aucScore: perfect, inverted, random and tied cases match closed forms") {
    def auc(rows: Seq[(Double, Int)]): Double =
      Analytics.aucScore(rows.toDF("score", "y"), "score", "y")
        .head().getAs[Double]("auc")
    // perfect separation → 1.0; inverted → 0.0
    val perfect = Seq((0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1))
    assert(auc(perfect) == 1.0)
    assert(auc(perfect.map { case (s, y) => (s, 1 - y) }) == 0.0)
    // all scores equal → every pair is a tie → 0.5 exactly
    assert(auc(Seq((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0))) == 0.5)
    // hand case: scores 1,2,3,4 with labels 0,1,0,1:
    // pairs (pos>neg): (2>1)=1, (2>3)=0, (4>1)=1, (4>3)=1 → 3/4
    assert(auc(Seq((1.0, 0), (2.0, 1), (3.0, 0), (4.0, 1))) == 0.75)
    // partition-invariance of the exact statistic
    val rnd = new scala.util.Random(3)
    val big = Seq.fill(500)((rnd.nextInt(20) / 10.0, rnd.nextInt(2)))
    val a = auc(big)
    val b = Analytics.aucScore(big.toDF("score", "y").repartition(11),
      "score", "y").head().getAs[Double]("auc")
    assert(a == b)
  }

  test("timeInState: dwell runs to the next event, last events close nothing") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "work"),   // 60 s of work
      (1L, ts("2024-01-01 10:01:00"), "idle"),   // 30 s of idle
      (1L, ts("2024-01-01 10:01:30"), "work"),   // open — excluded
      (2L, ts("2024-01-02 09:00:00"), "work"))   // open — excluded
      .toDF("user_id", "ts", "event_type")
    val got = Analytics.timeInState(ev, "user_id", "ts", "event_type")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map("work" -> ((1L, 60L, 60L)), "idle" -> ((1L, 30L, 30L))))
  }
}
