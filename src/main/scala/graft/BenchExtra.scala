package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1.4): per-query
  * noop-sink timing OUTSIDE the frozen driver bench, with optional
  * formatted-plan capture. Session config mirrors Bench's batch leg
  * (local[$SPARK_GRAFT_CPUS], shuffle partitions = cpus, AQE on, UTC,
  * /dev/shm scratch) so numbers here are comparable to the driver's.
  *
  *   sbt "runMain graft.BenchExtra [-explain <outDir>] [-passes N] <name>…"
  *
  * Each query is materialized through the noop sink (computes every
  * column of every row — count() would let the optimizer prune), run
  * `passes` times (default 3) after one untimed warm pass; min and all
  * samples are printed (host noise only ever slows a pass).
  */
object BenchExtra {
  private def scratchBase: String =
    if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
      "/dev/shm" else System.getProperty("java.io.tmpdir")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val explainDir = args.sliding(2).collectFirst {
      case Array("-explain", d) => d }
    val passes = args.sliding(2).collectFirst {
      case Array("-passes", n) => n.toInt }.getOrElse(3)
    val names0 = {
      var skip = false
      args.toSeq.filter { a =>
        if (skip) { skip = false; false }
        else if (a == "-explain" || a == "-passes") { skip = true; false }
        else true
      }
    }
    val qmap = SparkEntry.queries
    val names = if (names0.nonEmpty) names0 else qmap.keys.toSeq.sorted

    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(scratchBase), "graft_bx").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", s"$work/spark_local")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm codegen/IO like Bench does
    try qmap("q01_agg_pricing")(spark, sfDir).write.format("noop")
      .mode("overwrite").save()
    catch { case _: Throwable => () }

    names.foreach { name =>
      val fn = qmap.getOrElse(name, sys.error(s"unknown query $name"))
      explainDir.foreach { d =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(d, s"$name.txt"),
          plan.getBytes("UTF-8"))
      }
      spark.sparkContext.setJobDescription(s"bx:$name")
      def once: Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val secs = try {
        once // untimed warm pass (codegen/JIT)
        (1 to passes).map(_ => once)
      } catch { case e: Throwable =>
        System.err.println(s"[bx] $name FAILED: ${e.getMessage}")
        Seq(-1.0)
      }
      println(f"[bx] $name%-28s min=${secs.min}%7.3f  samples=" +
        secs.map(s => f"$s%.3f").mkString(","))
    }
    spark.stop()
    def rmTree(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        try s.iterator().forEachRemaining(rmTree) finally s.close()
      }
      java.nio.file.Files.deleteIfExists(p)
    }
    rmTree(java.nio.file.Paths.get(work))
  }
}
