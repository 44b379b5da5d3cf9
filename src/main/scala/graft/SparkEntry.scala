package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator registry itself lives in graft.Queries / graft.TranscriptQueries. */
object SparkEntry {
  /** Flagship: the reference's canonical flow (classify -> change-detect,
    * `/root/reference/examples/temp_monitor_flow.py`) over deterministic
    * synthetic transcripts, via the keyed ordered-state automaton. */
  def entry(spark: SparkSession): DataFrame =
    TranscriptQueries.changeDetectBatch(spark)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for streaming/CEP-native and
    * approximate ops (rows-only check; ScalaTest pins those). */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
