package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** d10b design-point probe (r15 verdict task 2): demonstrate the
  * bucketed standing base's payoff at the workload it exists for —
  * REPEATED small-delta joins against a LARGE unchanging base.
  *
  * The driver-gated d10b query rebuilds its base table inside every
  * invocation (the oracle needs a self-contained query), so the ×1000
  * sweep necessarily billed a full base read+band build to both d10
  * and d10b and showed no wall difference (543 vs 549 s). The design
  * claim was never "one cold run is faster"; it is "the base-side
  * shuffle is paid once per ingest epoch, not once per delta". This
  * probe measures exactly that:
  *
  *  1. ingest epoch (once): the base band relation — reps tagged
  *     has-base, banded and capped, the d10b standing side — is
  *     written BUCKETED by the join key (band, sig), and also written
  *     as PLAIN parquet (identical rows) as the control;
  *  2. a ×(1/denom)-scale delta band relation is materialized and
  *     persisted (identical input to both forms, excluded from both
  *     timings);
  *  3. alternating timed runs of the SAME candidate join (SMJ-pinned,
  *     least/greatest + distinct, the d10b candidate stage verbatim):
  *     A = against the bucketed table — the scan itself satisfies
  *         hashpartitioning(band, sig), so the base NEVER shuffles;
  *     B = against the plain copy — every run pays the base-side
  *         Exchange + Sort again.
  *
  * B is deliberately GENEROUS to the competitor: the d10-form would
  * additionally recompute the base bands from text each delta (the
  * shingle→minhash→band subtree — the ingest-epoch wall recorded in
  * step 1); B starts from materialized bands and re-pays only the
  * shuffle. The probe also asserts the plan shapes: the bucketed form
  * must plan exactly one Exchange fewer than the plain form.
  *
  * Usage: runMain graft.queries.D10bProbe [corpusDir] [deltaDenom] [buckets] [runs]
  */
object D10bProbe {

  private def jnum(v: Double): String = f"$v%.3f"

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/scaledata/ds1000")
    val denom = args.lift(1).map(_.toInt).getOrElse(1000)
    val buckets = args.lift(2).map(_.toInt).getOrElse(32)
    val runs = args.lift(3).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-d10b-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.sources.Tables.documents(spark, d)
    val members = Dedup.d10Members(docs)
    val capped = Dedup.d10TaggedBands(docs, members)

    // ---- ingest epoch: write the standing base once, both layouts ----
    val baseTable = "graft_d10b_probe_base"
    spark.sql(s"DROP TABLE IF EXISTS $baseTable")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(baseTable)))
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    val t0 = System.nanoTime()
    capped.filter(col("hb") === 1)
      .write.mode("overwrite")
      .bucketBy(buckets, "band", "sig")
      .sortBy("band", "sig")
      .saveAsTable(baseTable)
    val wallBucketed = (System.nanoTime() - t0) / 1e9
    val plainDir = sys.props("java.io.tmpdir") + "/graft_d10b_probe_plain"
    val t1 = System.nanoTime()
    spark.table(baseTable).write.mode("overwrite").parquet(plainDir)
    val wallPlain = (System.nanoTime() - t1) / 1e9
    val baseRows = spark.table(baseTable).count()

    // ---- the small delta: materialized once, shared by both forms ----
    val delta = capped.filter(col("hd") === 1 && pmod(col("doc_id"), lit(denom)) === 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deltaRows = delta.count()

    def candJoin(base: DataFrame): DataFrame =
      delta.as("a").hint("merge").join(base.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
            col("a.doc_id") =!= col("b.doc_id") &&
            ((col("a.hd") === 1 && col("b.hb") === 1) ||
              (col("a.hb") === 1 && col("b.hd") === 1)))
        .select(least(col("a.doc_id"), col("b.doc_id")).as("da"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("db"))
        .distinct()

    val bucketedForm = candJoin(spark.table(baseTable))
    // the plain copy carries no hd column-stats difference — same rows,
    // same schema, only the physical access path differs
    val plainForm = candJoin(spark.read.parquet(plainDir))

    // plan-shape assertion: bucketing must remove exactly the base-side
    // Exchange (delta shuffle + distinct shuffle remain in both)
    def exchanges(df: DataFrame): Int =
      "Exchange hashpartitioning".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
    val exB = exchanges(bucketedForm)
    val exP = exchanges(plainForm)
    require(exP == exB + 1,
      s"bucketed form should plan exactly one Exchange fewer " +
        s"(bucketed=$exB, plain=$exP)")

    // ---- alternating timed runs (each a fresh noop-sink execution) ----
    def time(df: DataFrame): Double = {
      val s0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - s0) / 1e9
    }
    // one unrecorded warmup each (scan caches, codegen)
    time(bucketedForm); time(plainForm)
    val wb = scala.collection.mutable.ArrayBuffer.empty[Double]
    val wp = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to runs).foreach { _ =>
      wb += time(bucketedForm)
      wp += time(plainForm)
    }
    def med(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.length / 2) }
    val candRows = bucketedForm.count()
    val candRowsPlain = plainForm.count()
    require(candRows == candRowsPlain,
      s"forms disagree: bucketed=$candRows plain=$candRowsPlain")

    println(
      s"""{"probe":"d10b_design_point","corpus":"$d","delta_denom":$denom""" +
        s""","buckets":$buckets,"base_rows":$baseRows,"delta_rows":$deltaRows""" +
        s""","cand_rows":$candRows""" +
        s""","ingest_bucketed_sec":${jnum(wallBucketed)}""" +
        s""","ingest_plain_sec":${jnum(wallPlain)}""" +
        s""","delta_join_bucketed_sec":${wb.map(jnum).mkString("[", ",", "]")}""" +
        s""","delta_join_plain_sec":${wp.map(jnum).mkString("[", ",", "]")}""" +
        s""","median_bucketed":${jnum(med(wb.toSeq))}""" +
        s""","median_plain":${jnum(med(wp.toSeq))}""" +
        s""","exchanges_bucketed":$exB,"exchanges_plain":$exP}""")
    delta.unpersist()
    spark.stop()
  }
}
