package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dev-only scale probe (VERDICT r3 #8): replicate the sf0.1 documents
  * corpus 10× with doc_id offsets — i.e. a corpus where EVERY document
  * has 9 exact duplicates, the pathological mass-duplication shape the
  * round-4 hot-bucket caps defend against — and report candidate-join
  * sizes for the dedup/fingerprint families at 1× vs 10×. Linear-ish
  * growth (not 100×) is the pass criterion; results are recorded in
  * BENCH_NOTES.md.
  *
  * Usage: sbt "runMain graft.Stress [sfDir]"
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stress")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.documents(spark, sfDir)
      .select("doc_id", "text", "n_chars")
    val ten = (0 until 10)
      .map(k => base.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        col("text"), col("n_chars")))
      .reduce(_ union _)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    for ((tag, docs) <- Seq(("1x", base), ("10x", ten))) {
      val nDocs = docs.count()
      val (d2c, d2t) = time(Dedup.d2Candidates(docs).count())
      val (d3c, d3t) = time(Dedup.d3Candidates(docs).count())
      val (d4c, d4t) = time(Dedup.d4Candidates(docs).count())
      val (t4c, t4t) = time(TextStats.t4Candidates(TextStats.winnowFps(docs)).count())
      val (d2p, d2pt) = time(Dedup.d2Pairs(docs).count())
      println(f"[stress] $tag docs=$nDocs d2cand=$d2c (${d2t}%.1fs) " +
        f"d3cand=$d3c (${d3t}%.1fs) d4cand=$d4c (${d4t}%.1fs) " +
        f"t4cand=$t4c (${t4t}%.1fs) d2pairs=$d2p (${d2pt}%.1fs)")
    }

    // d5's sign-bucket cap: 10× duplication keeps every bucket under
    // the cap (candidates grow ≤ C(10,2) per dup group — bounded by the
    // duplication factor, never the corpus), 100× pushes dup groups
    // PAST the cap and the saturated buckets must drop entirely.
    val embBase = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    def embTimes(k: Int) = (0 until k)
      .map(i => embBase.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
        col("embedding")))
      .reduce(_ union _)
    for ((tag, e) <- Seq(("1x", embBase), ("10x", embTimes(10)), ("100x", embTimes(100)))) {
      val nVecs = e.count()
      val (d5c, d5t) = time(Similarity.d5Candidates(spark, e).count())
      println(f"[stress] $tag vecs=$nVecs d5cand=$d5c (${d5t}%.1fs)")
    }
    spark.stop()
  }
}
