package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every SparkEntry query on SPARK_GRAFT_SF_DIR,
  * 1 warmup + 5 timed runs each (median), full `collect()` so projections
  * are actually computed (a bare `count()` lets Catalyst prune the work).
  * Prints exactly one JSON line for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Baseline methodology (BASELINE.md): build the DataFrame once,
    // 1 warmup collect, then median of timed collects.
    val results: Seq[(String, Double)] = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val t =
          try {
            val df = fn(spark, sfDir)
            df.collect() // warmup: scan/codegen/broadcast caches
            // median-of-5, matching the BASELINE.md methodology
            val runs = Seq.fill(5) {
              val t0 = System.nanoTime()
              df.collect()
              (System.nanoTime() - t0) / 1e9
            }.sorted
            runs(runs.length / 2)
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              -1.0
          }
        name -> t
    }

    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
