package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-probe (dev-only, not in any gate) — currently
  * dissecting b37's ×1000 superlinearity: 1030 s at ×1000 vs 55 s at
  * ×300 (18.7× for 3.33× the rows) while its exact sibling b18 stayed
  * linear. Times each half of the query separately on
  * SPARK_GRAFT_SF_DIR: the double percentile_approx aggregate (two GK
  * sketches), a single array-quantile sketch, and the
  * ExactQuantile bracketing side. */
object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]").appName("probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", sys.env.getOrElse("SPARK_GRAFT_MAXPART", "8m"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "16000000")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // full engine extensions: native functions, DotRewrite, and the
      // graft_asof whole-operator rule/strategy (AsOfJoin.scala)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time1(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "scaledata/sf100-synth")
    val li = graft.sources.Tables.lineitem(spark, d)
      .select("l_returnflag", "l_extendedprice")

    time1("scan_only") {
      li.write.format("noop").mode("overwrite").save()
    }
    time1("approx_two_sketches_acc10000") {
      li.groupBy("l_returnflag")
        .agg(
          expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("p50a"),
          expr("percentile_approx(l_extendedprice, 0.95, 10000)").as("p95a"))
        .write.format("noop").mode("overwrite").save()
    }
    time1("approx_one_array_sketch_acc10000") {
      li.groupBy("l_returnflag")
        .agg(expr("percentile_approx(l_extendedprice, array(0.5, 0.95), 10000)").as("pa"))
        .write.format("noop").mode("overwrite").save()
    }
    time1("approx_one_array_sketch_acc1000") {
      li.groupBy("l_returnflag")
        .agg(expr("percentile_approx(l_extendedprice, array(0.5, 0.95), 1000)").as("pa"))
        .write.format("noop").mode("overwrite").save()
    }
    time1("exact_bracketing") {
      graft.operators.ExactQuantile.groupQuantiles(
          graft.sources.Tables.lineitem(spark, d), "l_returnflag",
          "l_extendedprice", Seq(0.5, 0.95))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
