package graft.tools

/** Dev tool: write `.explain("formatted")` output of registered
  * queries to files — the evidence artifacts the optimization rounds
  * commit under `plans/rNN/`. Usage:
  * runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> q1 [q2 ...]
  * writes `<outDir>/<query>_<suffix>.txt` per query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val rest = args.drop(3).toSeq
    val spark = graft.core.Engine.session("graft-plandump", cores = 32)
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    rest.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${q}_$suffix.txt"), txt)
      println(s"[plandump] wrote $outDir/${q}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
