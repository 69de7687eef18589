package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Diagnostic main: run one gate query cold and print every Spark job
  * with its call site — the tool behind job-count audits (a cold
  * query's fixed job overhead is shuffle-barrier overhead at scale).
  * Usage: runMain graft.tools.JobTrace <sfDir> <queryName>
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = graft.core.Engine.session("graft-jobtrace", cores = 32)
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val tasks = j.stageInfos.map(_.numTasks).sum
        val names = j.stageInfos.map(s => s"${s.stageId}:${s.name.takeWhile(_ != '(').trim}[${s.numTasks}]")
          .mkString(" | ")
        jobs.add(f"job ${j.jobId}%3d stages=${j.stageInfos.size}%2d tasks=$tasks%3d  $names")
        if (sys.env.contains("JOBTRACE_DETAILS")) j.stageInfos.foreach { s =>
          val graft = s.details.linesIterator
            .filter(l => l.contains("graft") || l.contains("Dedup") || l.contains("checkpoint"))
            .take(3).mkString(" <- ")
          jobs.add(f"      stage ${s.stageId}[${s.numTasks}]: $graft")
        }
        ()
      }
    })
    // Bench-accounting parity: prebuild the shared corpus-index
    // artifacts (its own `index_sec` metric there) so the trace shows
    // the QUERY's jobs; SPARK_GRAFT_PREBUILD_INDEX=0 includes them.
    if (sys.env.getOrElse("SPARK_GRAFT_PREBUILD_INDEX", "1") != "0") {
      try graft.operators.CorpusIndex.artifacts(
        graft.core.Engine.table(spark, sfDir, "documents"), sfDir, "doc_id", "text").count()
      catch { case _: Throwable => () }
      Thread.sleep(300) // listener delivery is async — drain before clearing
      jobs.clear()
    }
    val t0 = System.nanoTime()
    val df =
      if (name == "dedup_corpus_raw") {
        // the un-memoized tail of q53: dedupCorpus before dedupClasses'
        // localCheckpoint truncates the plan — for auditing the final
        // join/agg shape
        val docs = graft.core.Engine.table(spark, sfDir, "documents")
        graft.operators.Dedup.dedupCorpus(docs, "doc_id", "text", minJaccard = 0.3)
      } else graft.SparkEntry.queries(name)(spark, sfDir)
    val n = df.count()
    val sec = (System.nanoTime() - t0) / 1e9
    if (sys.env.contains("JOBTRACE_EXPLAIN")) df.explain("formatted")
    Thread.sleep(500) // let listener drain
    val jobCount = jobs.stream.filter(_.startsWith("job")).count()
    jobs.forEach(s => println(s"[trace] $s"))
    println(f"[trace] $name: $jobCount jobs, $sec%.1f s, rows=$n")
    spark.stop()
  }
}
