package graft.core

import org.apache.spark.sql.SparkSession

/** Session-scoped memo with a bounded lifetime — the cache shape behind
  * [[graft.operators.Curation.memoModel]]'s fitted models and
  * [[graft.operators.Similarity]]'s durable-layout builds.
  *
  * Lifecycle (the long-lived multi-session service shape — e.g. a
  * Thrift server hosting many `newSession()` clones of one context):
  *
  *   - sessions are WEAK keys: a superseded/abandoned `SparkSession`
  *     no longer referenced anywhere releases its entries (and the
  *     fitted models they hold — a BigramLm can be millions of map
  *     entries) at the next GC;
  *   - every access also purges entries whose underlying
  *     `SparkContext` has stopped, so a stopped application's models
  *     are dropped eagerly, not just when the GC notices.
  *
  * Per-key compute is once-only within a session (ConcurrentHashMap
  * `computeIfAbsent` semantics — two threads racing the same layout
  * build run it once and share the result).
  *
  * Staleness contract: the memo key NAMES a corpus snapshot. Rewriting
  * the data under the same path/key and refitting under the same key
  * returns the PREVIOUS fit — callers that mutate data in place must
  * put a version/fingerprint in the key (the gate queries key by
  * sf-directory, which is immutable by construction).
  *
  * Weak-key caveat: collection requires that the stored VALUE not
  * reference the session. Fitted models and layout flags qualify;
  * DataFrame-valued entries (plan caches) inherently reference their
  * session, so for those the weak keys are inert and the
  * stopped-context purge is the operative bound.
  */
final class SessionMemo[V <: AnyRef] {

  // Compute runs OUTSIDE the ConcurrentHashMap lock via a lazy cell:
  // computeIfAbsent only allocates the cell, `.value` evaluates under
  // the cell's own lock — so a memoized compute may itself call
  // getOrCompute (the nested-artifact shape that trips CHM's
  // "Recursive update" check when values are stored directly) while
  // keeping once-only semantics. The dependency graph is acyclic, so
  // cell locks cannot deadlock.
  //
  // The thunk is NULLED after evaluation — deliberately not a Scala
  // `lazy val`, which retains its initializer forever: a memoized
  // fit's closure almost always captures the SparkSession (it reads
  // frames from it), and a strong value→key chain inside a
  // WeakHashMap pins the entry, defeating weak keys entirely. With
  // the thunk released, an entry survives only if the VALUE itself
  // references the session (plan caches — see the class scaladoc).
  private final class Cell(thunk0: () => V) {
    private[this] var thunk: () => V = thunk0
    private[this] var v: V = _
    def value: V = this.synchronized {
      if (thunk != null) {
        v = thunk()
        thunk = null
      }
      v
    }
  }

  // WeakHashMap needs external synchronization; the guarded section is
  // only bucket lookup + stopped-context purge (cheap), never the
  // compute itself.
  private val entries =
    new java.util.WeakHashMap[SparkSession, java.util.concurrent.ConcurrentHashMap[String, Cell]]()

  private def purgeStoppedLocked(): Unit = {
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      if (it.next().getKey.sparkContext.isStopped) it.remove()
    }
  }

  private def bucket(spark: SparkSession): java.util.concurrent.ConcurrentHashMap[String, Cell] =
    entries.synchronized {
      purgeStoppedLocked()
      var m = entries.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, Cell]()
        entries.put(spark, m)
      }
      m
    }

  /** Get the memoized value for (spark, key), computing it at most
    * once per live session. The compute may itself call
    * [[getOrCompute]] on this memo (nested artifacts).
    */
  def getOrCompute(spark: SparkSession, key: String)(compute: => V): V =
    bucket(spark).computeIfAbsent(key, _ => new Cell(() => compute)).value

  /** Insert or OVERWRITE (already-materialized value — e.g. an index
    * loaded from disk registered under the key its builder would
    * compute).
    */
  def put(spark: SparkSession, key: String, value: V): Unit = {
    bucket(spark).put(key, new Cell(() => value))
    ()
  }

  /** Drop this session's entries whose key satisfies `pred` — the
    * invalidation hook for replaced corpus snapshots.
    */
  def invalidate(spark: SparkSession, pred: String => Boolean): Unit =
    entries.synchronized {
      val m = entries.get(spark)
      if (m != null) m.keySet.removeIf(k => pred(k))
    }

  /** Number of live sessions currently holding entries (purges stopped
    * sessions first). Test/diagnostic surface.
    */
  def sessionCount: Int = entries.synchronized {
    purgeStoppedLocked()
    entries.size()
  }

  private[graft] def contains(spark: SparkSession, key: String): Boolean =
    entries.synchronized {
      purgeStoppedLocked()
      val m = entries.get(spark)
      m != null && m.containsKey(key)
    }
}
