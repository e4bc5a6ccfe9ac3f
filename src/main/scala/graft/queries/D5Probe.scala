package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage wall profile of d5's wide branch — dev tool.
  * runMain graft.queries.D5Probe [sfDir] */
object D5Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/scaledata/emb300")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("d5-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[d5probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s -> $r")
      r
    }
    val emb = graft.sources.Tables.embeddings(spark, d)
    time("count")(emb.count())
    val b = time("bands-build")(Similarity.bandsProbe(spark, emb, 144, 24))
    time("bands-count")(b.count())
    val cand = Similarity.d5CandidatesGeo(spark, emb, wide = true)
    time("cand-count")(cand.count())
    time("d5-full")(Similarity.d5EmbeddingNeardup(spark, d).collect().length)
    spark.stop()
  }
}
