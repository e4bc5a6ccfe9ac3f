package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r17 optimization probe (dev-only, not in any gate): isolates the
  * dedup family's rep-collapse operator — the r17 SortAggregate →
  * HashAggregate rewrite of Dedup.d2Reps — and A/B-times the OLD
  * formulation (groupBy(md5(text)) + first(text): string agg buffer ⇒
  * sort-based aggregation of the whole corpus) against the NEW one
  * (groupBy(text) + min(doc_id): string is only a grouping KEY, long
  * buffer ⇒ hash aggregation) on the same session, alternating runs so
  * box drift cancels (guide §1.4 noop sink — whole-query walls at ×100
  * swung ±30% with the box's load15 at 6+, which is exactly the
  * contamination the alternation removes).
  *
  * Also asserts, per run: (a) the plan fingerprints — OLD contains
  * SortAggregate, NEW contains none; (b) result parity — identical
  * row count and identical order-free checksum over every output
  * column, so the probe re-proves the rewrite is a pure plan change.
  *
  * Usage: runMain graft.queries.D2RepsProbe [sfDir] [rounds]
  */
object D2RepsProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/scaledata/ds100")
    val rounds = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]").appName("d2reps-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.sources.Tables.documents(spark, d)

    // the r16 formulation, verbatim
    def oldReps: DataFrame =
      docs.groupBy(md5(col("text")).as("th"))
        .agg(min(col("doc_id")).as("doc_id"), first(col("text")).as("text"))
    // the r17 formulation, verbatim (Dedup.d2Reps)
    def newReps: DataFrame =
      docs.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
        .select(md5(col("text")).as("th"), col("doc_id"), col("text"))

    def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString
    require(planOf(oldReps).contains("SortAggregate"),
      "probe premise broken: OLD form no longer plans SortAggregate")
    require(!planOf(newReps).contains("SortAggregate") &&
      planOf(newReps).contains("HashAggregate"),
      "rewrite regressed: NEW form must plan HashAggregate only")

    // order-free parity: count + xor-of-row-hashes over all columns
    // (bit_xor, not sum: ANSI mode makes a long sum overflow-throwing)
    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        bit_xor(xxhash64(col("th"), col("doc_id"), col("text")))).head
      (r.getLong(0), r.getLong(1))
    }
    val (oc, oh) = checksum(oldReps)
    val (nc, nh) = checksum(newReps)
    require(oc == nc && oh == nh,
      s"parity broken: old=($oc,$oh) new=($nc,$nh)")
    println(s"""{"d2reps_parity":"ok","rows":$oc}""")

    def time(tag: String, df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"""{"d2reps":"$tag","sec":$t%.3f}""")
      t
    }
    // one unmeasured warmup pass each, then alternating timed rounds
    time("warmup_old", oldReps); time("warmup_new", newReps)
    val (olds, news) = (Array.ofDim[Double](rounds), Array.ofDim[Double](rounds))
    (0 until rounds).foreach { i =>
      olds(i) = time(s"old_$i", oldReps)
      news(i) = time(s"new_$i", newReps)
    }
    def med(a: Array[Double]): Double = a.sorted.apply(a.length / 2)
    println(f"""{"d2reps_median":{"old":${med(olds)}%.3f,"new":${med(news)}%.3f},"sf":"$d","rounds":$rounds}""")
    spark.stop()
  }
}
