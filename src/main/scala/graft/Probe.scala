package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-probe (dev-only, not in any gate) — currently
  * dissecting the SQL front door for graft_asof: where does the parser
  * attach the hint node for a hinted SELECT over a CROSS JOIN, and does
  * ResolveAsOfJoin see a bare Join child or a Project/SubqueryAlias
  * chain above it?
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]").appName("probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val d = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, d)
    ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
      .createOrReplaceTempView("errors_v")
    ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user_id"), col("ts").as("c_ts"))
      .agg(max(col("event_id")).as("click_id"))
      .createOrReplaceTempView("clicks_v")

    val sql =
      """SELECT /*+ graft_asof('user_id', 'ts', 'c_user_id', 'c_ts') */
        |       event_id, user_id, click_id
        |FROM errors_v CROSS JOIN clicks_v""".stripMargin

    // 1: what does the PARSED plan look like (pre-analysis)?
    val parsed = spark.sessionState.sqlParser.parsePlan(sql)
    println("=== parsed ===")
    println(parsed.treeString)

    // 2: does analysis succeed, and into what?
    try {
      val df = spark.sql(sql)
      println("=== analyzed ===")
      println(df.queryExecution.analyzed.treeString)
      println("=== rows === " + df.count())
    } catch {
      case e: Exception =>
        println("=== analysis failed: " + e.getMessage)
    }
    spark.stop()
  }
}
