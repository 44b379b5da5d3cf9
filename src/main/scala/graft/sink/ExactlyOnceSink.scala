package graft.sink

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exactly-once table sink without an Iceberg runtime (SURVEY.md §7.3).
  *
  * Semantics re-created from the reference's delivery contract: a sink may
  * see the same events again after a partial ack / retry, and redelivery
  * must be invisible downstream (`/root/reference/src/reflow/internal/
  * worker.py:158-175`, `edge_router.py:138-154`). Spark's micro-batch model
  * turns that per-event contract into a per-epoch one: `foreachBatch` may
  * re-invoke an epoch after a failure, so the sink must be IDEMPOTENT BY
  * EPOCH ID. We write each epoch to its own directory and flip a commit
  * marker via atomic rename; a re-delivered epoch whose marker exists is
  * skipped, and an epoch that died mid-write is fully overwritten on retry.
  * Readers see exactly the committed epochs.
  *
  * At cluster scale the same protocol runs against HDFS/S3 with a
  * rename-based (or Iceberg snapshot) commit; only `commitMarker` changes.
  */
class ExactlyOnceParquetSink(val dir: String) extends Serializable {

  private def epochDir(epochId: Long) = s"$dir/epoch=$epochId"
  private def commitsDir: Path = Paths.get(dir, "_commits")
  private def marker(epochId: Long): Path = commitsDir.resolve(epochId.toString)

  def isCommitted(epochId: Long): Boolean = Files.exists(marker(epochId))

  /** The foreachBatch body. Safe to call repeatedly with the same epochId. */
  def addBatch(df: DataFrame, epochId: Long): Unit = {
    if (isCommitted(epochId)) {
      // redelivered epoch: drop the rows (dedup) — but still consume every
      // partition so upstream stateful operators commit their state stores
      // (Spark validates that foreachBatch processed the whole DataFrame)
      df.foreach(_ => ())
      return
    }
    // overwrite handles a torn previous attempt of this same epoch
    df.write.mode("overwrite").parquet(epochDir(epochId))
    Files.createDirectories(commitsDir)
    val tmp = commitsDir.resolve(s".${epochId}.tmp")
    Files.write(tmp, s"epoch=$epochId".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, marker(epochId), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def committedEpochs(): Seq[Long] =
    if (!Files.exists(commitsDir)) Seq.empty
    else {
      val s = Files.list(commitsDir)
      try s.iterator().asScala
        .map(_.getFileName.toString).filterNot(_.startsWith("."))
        .map(_.toLong).toSeq.sorted
      finally s.close()
    }

  /** Read back exactly the committed epochs (uncommitted dirs invisible). */
  def readCommitted(spark: SparkSession): DataFrame = {
    val epochs = committedEpochs()
    require(epochs.nonEmpty, s"no committed epochs under $dir")
    spark.read.option("basePath", dir).parquet(epochs.map(epochDir): _*)
  }
}
