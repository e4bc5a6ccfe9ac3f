package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** d10b growing-base probe (r16 verdict task 4): [[D10bProbe]] showed
  * the standing base turns a per-delta band rebuild into a ~1 s join —
  * against a STATIC base. A real daily pipeline also APPENDS each
  * delta's bands to the base so tomorrow's delta sees today's docs.
  * This probe runs that loop end to end:
  *
  *  - the corpus' capped band relation (the d10 join input, built once
  *    — band caps are union-level, exactly what a from-scratch run
  *    sees) is split by `pmod(doc_id, deltaDenom)`: residues 1..epochs
  *    are the daily deltas, everything else the initial base. Two
  *    regimes, both worth measuring: deltaDenom = epochs+1 grows the
  *    base ~(epochs+1)× over the run (stress: does the join wall track
  *    the base SCAN, which bucketing cannot remove, and nothing
  *    worse?); deltaDenom ≫ epochs is the realistic daily shape
  *    (delta ≪ base, base growth per epoch negligible) where the
  *    per-epoch wall should hold flat;
  *  - epoch i: (a) candidate-join Δᵢ against the standing bucketed
  *    table (SMJ, the bucketed scan satisfies hashpartitioning(band,
  *    sig) — base never re-shuffles), timed; (b) APPEND Δᵢ's bands to
  *    the table (mode=append preserves the bucket spec), timed — the
  *    full per-day cost is join + append, both recorded;
  *  - correctness: the union of the 5 epochs' pair sets must equal
  *    the from-scratch oracle over the union corpus — every distinct
  *    (band,sig)-colliding pair whose endpoints lie in DIFFERENT
  *    strata (the later endpoint's epoch is exactly when the standing
  *    base first contains the earlier one; same-stratum pairs are
  *    invisible to both formulations, as in d10's hb/hd disjunction).
  *    Compared by symmetric multiset difference — zero rows or the
  *    probe fails loudly.
  *
  * Usage: runMain graft.queries.D10bGrowProbe [corpusDir] [epochs] [buckets] [deltaDenom]
  */
object D10bGrowProbe {

  private def jnum(v: Double): String = f"$v%.3f"

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/scaledata/ds1000")
    val epochs = args.lift(1).map(_.toInt).getOrElse(5)
    val buckets = args.lift(2).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-d10b-grow-probe")
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
    // strata on the capped band relation: persist once — every epoch's
    // delta filter and the oracle read it (the band build is the
    // ingest-epoch cost D10bProbe already prices; this probe times the
    // standing-base loop)
    val denom = args.lift(3).map(_.toInt).getOrElse(epochs + 1)
    require(denom > epochs, s"deltaDenom=$denom must exceed epochs=$epochs")
    // mapped stratum: residues 1..epochs are deltas, all else base (0)
    val banded = Dedup.d10TaggedBands(docs, members)
      .withColumn("strat",
        when(pmod(col("doc_id"), lit(denom)).between(1, epochs),
          pmod(col("doc_id"), lit(denom))).otherwise(lit(0)))
      .select("doc_id", "band", "sig", "strat")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandRows = banded.count()

    // ---- epoch 0: the initial standing base, written bucketed ----
    val table = "graft_d10b_grow_base"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    val t0 = System.nanoTime()
    banded.filter(col("strat") === 0).drop("strat")
      .write.mode("overwrite")
      .bucketBy(buckets, "band", "sig").sortBy("band", "sig")
      .saveAsTable(table)
    val ingestWall = (System.nanoTime() - t0) / 1e9

    // ---- the daily loop: join Δi vs standing, then append Δi ----
    val pairDirs = scala.collection.mutable.ArrayBuffer.empty[String]
    val report = scala.collection.mutable.ArrayBuffer.empty[String]
    (1 to epochs).foreach { i =>
      val delta = banded.filter(col("strat") === i).drop("strat")
      val standingRows = spark.table(table).count() // excluded from walls
      val tj = System.nanoTime()
      val cand = delta.as("a").hint("merge").join(spark.table(table).as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
            col("a.doc_id") =!= col("b.doc_id"))
        .select(least(col("a.doc_id"), col("b.doc_id")).as("da"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("db"))
        .distinct()
      val out = sys.props("java.io.tmpdir") + s"/graft_d10b_grow_pairs_$i"
      cand.write.mode("overwrite").parquet(out)
      val joinWall = (System.nanoTime() - tj) / 1e9
      pairDirs += out
      val ta = System.nanoTime()
      delta.write.mode("append")
        .bucketBy(buckets, "band", "sig").sortBy("band", "sig")
        .saveAsTable(table)
      val appendWall = (System.nanoTime() - ta) / 1e9
      val nPairs = spark.read.parquet(out).count()
      report += s"""{"epoch":$i,"standing_rows":$standingRows""" +
        s""","join_sec":${jnum(joinWall)},"append_sec":${jnum(appendWall)}""" +
        s""","pairs":$nPairs}"""
    }

    // ---- from-scratch oracle over the union corpus ----
    val to = System.nanoTime()
    val oracle = banded.as("a").join(banded.as("b").hint("merge"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id") && col("a.strat") =!= col("b.strat"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    val got = spark.read.parquet(pairDirs.toSeq: _*)
    val diff = got.unionAll(oracle)
      .groupBy("da", "db").count().filter(col("count") =!= 2).count()
    val nOracle = oracle.count()
    val oracleWall = (System.nanoTime() - to) / 1e9
    require(diff == 0,
      s"growing-base union diverged from from-scratch: $diff asymmetric pairs")

    println(
      s"""{"probe":"d10b_growing_base","corpus":"$d","epochs":$epochs""" +
        s""","buckets":$buckets,"delta_denom":$denom,"band_rows":$bandRows""" +
        s""","ingest_epoch0_sec":${jnum(ingestWall)}""" +
        s""","per_epoch":[${report.mkString(",")}]""" +
        s""","union_pairs":$nOracle,"from_scratch_oracle_sec":${jnum(oracleWall)}""" +
        s""","parity":"exact"}""")
    banded.unpersist()
    spark.stop()
  }
}
