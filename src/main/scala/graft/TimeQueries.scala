package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time (and optionally explain) individual registered
  * queries at any scale factor, outside the fixed Bench headline.
  *
  *   sbt "runMain graft.TimeQueries <sfDir> [-explain] <name> [<name>…]"
  *
  * Each query is fully consumed via a count over its rows (same
  * materialization discipline as Bench: no collect of wide results), run
  * twice with the SECOND time reported (first pass pays codegen + scan
  * cache).
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val explain = args.contains("-explain")
    val names = args.tail.filterNot(_ == "-explain")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    names.foreach { name =>
      val q = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      if (explain)
        println(s"== $name plan ==\n" +
          q(spark, sfDir).queryExecution.executedPlan.toString.take(6000))
      def once(): (Long, Double) = {
        val t0 = System.nanoTime()
        val n = q(spark, sfDir).count()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      val (_, cold) = once()
      val (rows, warm) = once()
      println(f"[time] $name%-28s rows=$rows%8d warm=$warm%7.3fs (cold $cold%7.3fs)")
    }
    spark.stop()
  }
}
