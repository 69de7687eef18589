package graft.tools

/** Dev tool: write `.explain("formatted")` output of registered
  * queries to files — the evidence artifacts the optimization rounds
  * commit under `plans/rNN/`. Usage:
  * runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> q1 [q2 ...]
  * writes `<outDir>/<query>_<suffix>.txt` per query.
  */
object PlanDump {
  /** The q156-shaped signature corpus: 5000 ids in 15 identical-hash
    * classes — the shape whose per-bucket pair join the class-pairs
    * collapse exists for. localCheckpoint'ed like the real callers.
    */
  private def sigCorpus(spark: org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    (0L until 5000L).map(id => (id, (id % 15) * 0x0101010101010101L))
      .toDF("id", "sh").localCheckpoint(false)
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val rest = args.drop(3).toSeq
    val spark = graft.core.Engine.session("graft-plandump", cores = 32)
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    rest.foreach { q =>
      // operator-level subplans hidden behind localCheckpoints in the
      // registry queries (the final plan starts at the checkpoint
      // scan): "subplan:<name>" dumps the named internal frame over a
      // representative signature corpus, so the committed plan files
      // actually show the joins the work log talks about
      val df = q match {
        case "subplan:hamming_full_pairs" =>
          graft.operators.Dedup.simhashNearDuplicatesFromSigs(
            sigCorpus(spark), maxHamming = 6, bands = 8)
        case "subplan:hamming_class_pairs" =>
          graft.operators.Dedup.hammingClassPairs(
            sigCorpus(spark), maxHamming = 6, bands = 8,
            maxBucketSize = graft.operators.Dedup.DefaultMaxBucketSize)
        case _ => graft.SparkEntry.queries(q)(spark, sfDir)
      }
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val fname = q.replace("subplan:", "")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${fname}_$suffix.txt"), txt)
      println(s"[plandump] wrote $outDir/${fname}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
