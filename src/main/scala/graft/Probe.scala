package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-probe for b6 top-k variants (dev-only, not in any gate). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", sys.env.getOrElse("SPARK_GRAFT_MAXPART", "8m"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")

    def time(tag: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 7).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6 }.sorted
      println(f"[probe] $tag median=${ts(3)}%.1f ms all=${ts.map(t => f"$t%.0f").mkString(",")}")
    }

    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .withColumn("e", col("embedding").cast("array<double>"))
    time("emb_scan") { emb.agg(count(lit(1))).collect() }
    val q = emb.filter(col("vec_id") === 0).select(col("e").as("qv"))
    time("emb_qjob") { q.collect() }
    import org.apache.spark.sql.Column
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val b12 = emb.crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dot(col("e"), col("qv")) /
          (sqrt(dot(col("e"), col("e"))) * sqrt(dot(col("qv"), col("qv")))), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(10)
    time("b12_full") { b12.collect() }
    val qlit = q.collect()(0).getSeq[Double](0)
    val b12lit = emb
      .select(col("vec_id"),
        round(dot(col("e"), typedLit(qlit)) /
          (sqrt(dot(col("e"), col("e"))) * sqrt(dot(typedLit(qlit), typedLit(qlit)))), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(10)
    time("b12_lit") { b12lit.collect() }
    val hof = emb.select(col("vec_id"),
      aggregate(zip_with(col("e"), col("e"), (x, y) => x * y), lit(0.0), (a2, x) => a2 + x).as("nx"))
    time("hof_only") { hof.agg(sum(col("nx"))).collect() }
    spark.stop()
  }
}
