package graft

import graft.core.SessionMemo
import graft.operators.Curation

/** Lifecycle of the session-scoped memo behind `Curation.memoModel`
  * and the durable-layout builds (round-6 verdict weak #2): entries
  * must not outlive their session. The suite can't stop the shared
  * SparkContext (stopped-context purge is exercised implicitly — every
  * access calls it), so the weak-key path is proven the way weak maps
  * are provable: drop the only strong reference to a session and GC
  * until its entries vanish.
  */
class SessionMemoSpec extends SparkSpec {

  test("entries are per-session and a fresh session recomputes (refits) without error") {
    val memo = new SessionMemo[java.lang.Integer]
    var fits = 0
    def fit(): java.lang.Integer = { fits += 1; Integer.valueOf(fits) }

    assert(memo.getOrCompute(spark, "k")(fit()) == 1)
    assert(memo.getOrCompute(spark, "k")(fit()) == 1, "same session memoizes")
    val s2 = spark.newSession()
    assert(memo.getOrCompute(s2, "k")(fit()) == 2, "fresh session refits")
    assert(memo.getOrCompute(s2, "k")(fit()) == 2)
    assert(memo.sessionCount == 2)
  }

  test("per-key compute runs once under concurrent first access") {
    val memo = new SessionMemo[java.lang.Integer]
    val fits = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val tasks = (1 to 32).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Integer] {
          def call(): Integer =
            memo.getOrCompute(spark, "once") {
              Thread.sleep(10); Integer.valueOf(fits.incrementAndGet())
            }
        })
      }
      val vals = tasks.map(_.get()).toSet
      assert(vals == Set(Integer.valueOf(1)), s"one compute shared by all: $vals")
      assert(fits.get() == 1)
    } finally pool.shutdown()
  }

  test("a memoized compute may nest another getOrCompute (lazy cell, no Recursive update)") {
    // deterministic CHM-bin collision: "Aa" and "BB" share a hash (see
    // the CorpusIndex regression this memo inherited) — storing values
    // directly in the map throws IllegalStateException here
    val memo = new SessionMemo[java.lang.Integer]
    val out = memo.getOrCompute(spark, "nest-Aa") {
      memo.getOrCompute(spark, "nest-BB")(Integer.valueOf(1))
      Integer.valueOf(2)
    }
    assert(out == 2 && memo.getOrCompute(spark, "nest-BB")(Integer.valueOf(9)) == 1)
  }

  test("invalidate drops matching keys for one session only") {
    val memo = new SessionMemo[java.lang.Integer]
    val s2 = spark.newSession()
    memo.getOrCompute(spark, "corpus:a")(Integer.valueOf(1))
    memo.getOrCompute(spark, "other")(Integer.valueOf(2))
    memo.getOrCompute(s2, "corpus:a")(Integer.valueOf(3))
    memo.invalidate(spark, _.startsWith("corpus:"))
    assert(memo.getOrCompute(spark, "corpus:a")(Integer.valueOf(10)) == 10, "invalidated → refit")
    assert(memo.getOrCompute(spark, "other")(Integer.valueOf(11)) == 2, "untouched key kept")
    assert(memo.getOrCompute(s2, "corpus:a")(Integer.valueOf(12)) == 3, "other session kept")
  }

  test("an abandoned session's entries are released (weak keys)") {
    val memo = new SessionMemo[AnyRef]
    // entry under the long-lived shared session anchors the map
    memo.getOrCompute(spark, "anchor")(new Object)
    // the compute CLOSURE captures the session by val (every real fit
    // does — it reads frames from it): the cell must release the thunk
    // after evaluation or the closure→session chain pins the weak
    // entry forever. The nested scope keeps the strong alias off this
    // frame's locals.
    def fitUnder(s: org.apache.spark.sql.SparkSession): Unit = {
      val pinned = s
      memo.getOrCompute(s, "big-model") {
        require(pinned != null)
        new Array[Byte](1 << 20)
      }
      ()
    }
    var s2 = spark.newSession()
    fitUnder(s2)
    assert(memo.sessionCount == 2)

    // drop the only strong reference; thread-local active-session
    // state could pin it, so clear that too
    s2 = null
    org.apache.spark.sql.SparkSession.clearActiveSession()

    var tries = 0
    while (memo.sessionCount > 1 && tries < 50) {
      System.gc()
      Thread.sleep(50)
      tries += 1
    }
    assert(memo.sessionCount == 1,
      "abandoned session's entries must be collectable (weak keys)")
  }

  test("memoModel refits in a fresh session (integration surface)") {
    val docs = graft.core.Engine.table(spark, sfDir, "documents").limit(50)
    val before = Curation.memoSessionCount
    var fitsA = 0
    val a = Curation.memoModel(spark, "smemo-spec-key") { fitsA += 1; docs.schema }
    val a2 = Curation.memoModel(spark, "smemo-spec-key") { fitsA += 1; docs.schema }
    assert(fitsA == 1 && (a eq a2))
    val s2 = spark.newSession()
    var fitsB = 0
    val b = Curation.memoModel(s2, "smemo-spec-key") { fitsB += 1; docs.schema }
    assert(fitsB == 1 && b == a)
    assert(Curation.memoSessionCount >= before)
  }
}
