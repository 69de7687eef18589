package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpoint metadata index — parity with the reference's checkpoint
  * schema + index helpers (`core/framework/schemas/checkpoint.py:
  * 14-177`: checkpoint types, `filter_by_type`, `filter_by_node`,
  * `get_latest_clean_checkpoint`).
  *
  * The index is an append-only JSONL file next to the checkpoint data
  * (readable as a DataFrame via the engine's JSONL source — corrupt
  * lines skipped, same as every log surface), so checkpoint analytics
  * compose with the rest of the engine.
  */
object Checkpoints {

  final case class CheckpointMeta(
      checkpoint_id: String,
      checkpoint_type: String, // node_start | pause | manual (`checkpoint.py:14-100`)
      node_id: String,
      step: Int,
      clean: Boolean, // completed without error
      ts: Long,
      data_dir: String)

  final class CheckpointIndex(spark: SparkSession, baseDir: String) {
    private val indexPath = s"$baseDir/checkpoints.jsonl"
    new java.io.File(baseDir).mkdirs()

    def record(meta: CheckpointMeta): Unit = {
      val json = org.json4s.jackson.Serialization.write(meta)(org.json4s.DefaultFormats)
      java.nio.file.Files.write(java.nio.file.Paths.get(indexPath),
        (json + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
      ()
    }

    def list(): DataFrame =
      if (new java.io.File(indexPath).exists())
        graft.io.LogSource.readJsonl(spark, indexPath)
      else spark.emptyDataFrame

    /** `filter_by_type` (`checkpoint.py:163-169`). */
    def filterByType(t: String): DataFrame = list().filter(col("checkpoint_type") === t)

    /** `filter_by_node` (`checkpoint.py:170-173`). */
    def filterByNode(nodeId: String): DataFrame = list().filter(col("node_id") === nodeId)

    /** `get_latest_clean_checkpoint` (`checkpoint.py:174-177`). */
    def latestClean(): Option[String] = {
      val rows = list().filter(col("clean"))
        .orderBy(desc("ts"), desc("step")).limit(1).collect()
      rows.headOption.map(_.getAs[String]("checkpoint_id"))
    }
  }
}
