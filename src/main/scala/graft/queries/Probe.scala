package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch micro-probe (dev-only, not in any gate) — currently
  * attributing the rewritten t1 kernel's ×300 wall across its stages:
  * the per-row profile map, the language-profile subtree, and the
  * map-lookup distance aggregate.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/scaledata/ds300")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]").appName("probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    val docs = graft.sources.Tables.documents(spark, d)
    val profs = docs.select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .map { case (id, lang, text) =>
        T1DocProf(id, lang, TextStats.t1Top100(text)) }
      .filter(_.prof.nonEmpty)
      .toDF()
    time("per-row profiles")(profs)

    val ng = docs.select(col("doc_id"), col("lang"), explode(
        when(length(col("text")) >= 3,
          transform(sequence(lit(1), length(col("text")) - 2),
            i => col("text").substr(i, lit(3))))
          .otherwise(array().cast("array<string>"))).as("ng"))
    val langProf = ng.groupBy("lang", "ng").agg(count(lit(1)).as("c"))
      .withColumn("lrank", row_number().over(
        Window.partitionBy("lang").orderBy(col("c").desc, col("ng").asc)))
      .filter(col("lrank") <= 100)
      .select(col("lang").as("cand"), col("ng").as("lng"), col("lrank"))
    time("lang profile")(langProf)

    val langMaps = langProf.groupBy("cand")
      .agg(map_from_entries(collect_list(struct(col("lng"), col("lrank")))).as("lmap"))
    val dist = profs.crossJoin(broadcast(langMaps))
      .select(col("doc_id"), col("true_lang"), col("cand"),
        aggregate(col("prof"), lit(0L), (acc, e) =>
          acc + coalesce(
            abs(e.getField("drank").cast("long") -
              element_at(col("lmap"), e.getField("ng")).cast("long")),
            lit(100L))).as("dist"))
    time("full dist (re-runs profiles + langmaps)")(dist)
    spark.stop()
  }
}
