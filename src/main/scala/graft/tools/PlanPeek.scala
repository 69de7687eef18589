package graft.tools

/** Dev tool: print the executed physical plan of one or more registered
  * queries (`runMain graft.tools.PlanPeek [sfDir] q110_funnel ...`) —
  * the quick way to eyeball exchanges/windows/joins before writing a
  * PlanAudit lock. Companion to [[ProfileQuery]] (which measures).
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val (dir, names) =
      if (args.nonEmpty && args.head.startsWith("/")) (args.head, args.tail.toSeq)
      else ("/root/testdata/sf0.001", args.toSeq)
    val spark = graft.core.Engine.session("plan-peek", cores = 4)
    spark.sparkContext.setLogLevel("ERROR")
    val targets = if (names.nonEmpty) names else graft.SparkEntry.queries.keys.toSeq.sorted
    targets.foreach { q =>
      println(s"===== $q")
      println(graft.SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
