package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Executable evidence for the 100 TB design points that small-SF
  * correctness runs don't exercise: bucketed co-located joins (no
  * exchange), salted skew-join equivalence, and partition-count
  * independence of every oracled result.
  */
class ScaleSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("scale-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir",
      Files.createTempDirectory("graft-warehouse").toString)
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  /** saveAsTable location survives session/catalog mismatches across
    * suite runs — drop both the catalog entry and the directory. */
  private def resetTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    if (loc.exists()) rm(loc)
  }

  test("bucketed tables join without any shuffle exchange") {
    // the co-location recipe for a repeatedly-joined 100 TB fact table:
    // bucket both sides on the join key at write time, then every
    // subsequent join is exchange-free.
    resetTable("li_bucketed")
    resetTable("ord_bucketed")
    Tables.lineitem(spark, sf).write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
      s"bucketed join must not shuffle the fact side:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not shuffle the dim side:\n$plan")

    // same result as the plain shuffled join
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("salted aggregation equals direct aggregation (skew recipe)") {
    // two-phase salted aggregation for a skewed group key: explode the
    // hot key over S salts, partially aggregate on (key, salt), then
    // collapse. Counts/sums are associative so the rewrite is exact.
    val S = 8
    val li = Tables.lineitem(spark, sf)
    val direct = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("decimal(30,6)")).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet

    val salted = li
      .withColumn("salt", pmod(col("l_orderkey"), lit(S)))
      .groupBy("l_returnflag", "salt")
      .agg(count(lit(1)).as("pn"), sum(col("l_quantity").cast("decimal(30,6)")).as("pq"))
      .groupBy("l_returnflag")
      .agg(sum("pn").cast("long").as("n"), sum("pq").cast("decimal(30,6)").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    assert(salted == direct)
  }

  test("oracled queries are partition-count independent (1 vs 32 shuffle partitions)") {
    // determinism recipe's load-bearing claim: results identical under
    // radically different parallelism. Sample one query per family.
    val names = Seq("b2_hash_agg", "d2_minhash_lsh", "t1_lang_id", "s1_ann_lsh",
      "m1_media_features", "b29_funnel", "d7_dup_clusters", "t8_mix_weights")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      val wide = SampleRunner.run(spark, sf, names, "32")
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val serial = SampleRunner.run(spark, sf, names, "1")
      assert(wide == serial, "results must not depend on partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
  }
}

private object SampleRunner {
  def run(spark: SparkSession, sf: String, names: Seq[String], tag: String): Map[String, Seq[String]] =
    names.map { n =>
      val df = graft.SparkEntry.queries(n)(spark, sf)
      n -> df.collect().map(_.toString).toSeq.sorted
    }.toMap
}
