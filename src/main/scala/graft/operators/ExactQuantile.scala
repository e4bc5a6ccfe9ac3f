package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT interpolated quantiles — the scale-correct
  * replacement for `percentile(v, q)` when the group key has only a
  * handful of values: the built-in aggregate buffers every value of a
  * group in its (partial and final) aggregation buffer, so a 3-group
  * quantile over a 100 TB corpus holds a third of the corpus per final
  * task — the ×300 probe measured b18 at ~5 min/run on 180M rows where
  * every neighboring aggregate takes seconds, and the same shape OOMs
  * first on real clusters. The classic escape is the t-digest/GK
  * sketch (b37's `percentile_approx` gate), but the EXACT answer does
  * not actually require buffering: the k-th order statistic can be
  * found with bounded memory by histogram bracketing —
  *
  *   1. per-group count/min/max (one hash agg, 3 numbers per group);
  *   2. a fixed-width bucket histogram per group (hash agg onto
  *      groups×B keys, map-side combined), prefix-summed per group so
  *      every bucket knows how many values precede it;
  *   3. the needed ranks — floor((n−1)·q) and its successor per
  *      quantile — each land in exactly one bucket (a broadcast range
  *      join of a ≤groups×2·|qs|-row rank relation with the
  *      histogram);
  *   4. only the rows of those buckets (expected n/B per bucket) are
  *      re-scanned, ranked by value within their bucket, and the rows
  *      whose global rank matches a needed rank are kept — order
  *      statistics keyed by value are tie-order-independent, so a
  *      plain `row_number` over the value is deterministic here;
  *   5. the ≤2 order statistics per quantile interpolate with EXACTLY
  *      the built-in's arithmetic
  *      (`(higher−pos)·lower + (pos−lower)·higher`, Spark
  *      `Percentile.getPercentile`), so results are bit-identical to
  *      `percentile()` — asserted per-element against the built-in in
  *      ExactQuantileSpec — and keep hash-matching DuckDB's
  *      `quantile_cont`.
  *
  * Every stage is bounded: the histogram is groups×B rows, the windows
  * run over ≤B rows (the cumsum) and ≤bucket-size rows (candidate
  * ranking), and nothing is collected to the driver — the whole thing
  * is ONE lazy declarative DAG (3 column-pruned scans of the input),
  * composable like any other relation. Degenerate worst case: a bucket
  * where virtually all values are equal ranks its rows through one
  * window partition — a spillable sort, not a buffering aggregate, and
  * only when a needed rank lands in it.
  */
object ExactQuantile {

  /** Histogram width: 8192 buckets ⇒ the candidate re-scan touches
    * ~n/8192 rows per needed rank while the histogram stays a
    * groups×8192-row relation — metadata-sized for any corpus. */
  val Buckets: Int = 8192

  /** One row per (group, quantile): `(g, n, q, qv)` with `qv` the exact
    * interpolated quantile of `valueCol` (cast to double, nulls
    * dropped) over the group — bit-identical to
    * `percentile(valueCol, q)` and carrying the group's non-null count
    * as `n`. `qs` must be literal fractions in [0,1]; `groupCol` must
    * be LOW-cardinality (the histogram relation is groups×8192 rows —
    * for a high-cardinality group the built-in's per-group buffer is
    * small and already the right tool). */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be fractions in [0,1], got $qs")
    val in = df
      .select(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)

    // pass 1: per-group extent — three numbers per group
    val stats = in.groupBy("g")
      .agg(count(lit(1)).as("n"), min("v").as("vmin"), max("v").as("vmax"))

    // value → bucket, the identical formula at histogram and re-scan
    // time (same doubles in, same bucket out)
    def bucketOf(v: Column, vmin: Column, vmax: Column): Column =
      when(vmax === vmin, lit(0L)).otherwise(
        least(floor((v - vmin) / (vmax - vmin) * Buckets), lit(Buckets - 1L))
          .cast("long"))

    val withB = in.join(broadcast(stats), "g")
      .select(col("g"), col("v"),
        bucketOf(col("v"), col("vmin"), col("vmax")).as("b"))

    // pass 2: bucket histogram + values-preceding-bucket prefix sum
    // ((g, b) is unique in hist, so the ≤B-row per-group window is a
    // plain running sum)
    val hist = withB.groupBy("g", "b").agg(count(lit(1)).as("cnt"))
    val cum = hist.withColumn("cum_below",
      sum("cnt").over(Window.partitionBy("g").orderBy("b")) - col("cnt"))

    // the built-in's position arithmetic: pos = q·(n−1), bracketed by
    // rank floor(pos) and its successor (clamped to the last rank)
    val quants = stats
      .select(col("g"), col("n"), explode(array(qs.map(lit(_)): _*)).as("q"))
      .withColumn("h", col("q") * (col("n") - 1).cast("double"))
      .withColumn("klo", floor(col("h")).cast("long"))
      .withColumn("khi", least(col("klo") + 1, col("n") - 1))

    val ranks = quants
      .select(col("g"), explode(array(col("klo"), col("khi"))).as("rank"))
      .distinct()

    // which bucket holds each needed rank (tiny × small range join)
    val tb = cum.alias("c")
      .join(broadcast(ranks.alias("r")),
        col("c.g") === col("r.g") &&
          col("r.rank") >= col("c.cum_below") &&
          col("r.rank") < col("c.cum_below") + col("c.cnt"))
      .select(col("c.g").as("g"), col("r.rank").as("rank"),
        col("c.b").as("b"), col("c.cum_below").as("cum_below"))

    // pass 3: re-scan ONLY the needed buckets, rank within, keep the
    // rows whose global rank is a needed rank
    val neededBuckets = tb.select("g", "b", "cum_below").distinct()
    val svals = withB
      .join(broadcast(neededBuckets), Seq("g", "b"))
      .withColumn("rn",
        row_number().over(Window.partitionBy("g", "b").orderBy("v")))
      .withColumn("rank", col("cum_below") + col("rn") - 1)
      .join(broadcast(tb.select("g", "rank").distinct()), Seq("g", "rank"))
      .select(col("g"), col("rank"), col("v"))

    // interpolate with the built-in's exact expression (Percentile
    // .getPercentile): lower when pos is integral, else
    // (higher−pos)·lowerVal + (pos−lower)·higherVal
    quants
      .join(svals.select(col("g"), col("rank").as("klo"), col("v").as("vlo")),
        Seq("g", "klo"))
      .join(svals.select(col("g"), col("rank").as("khi"), col("v").as("vhi")),
        Seq("g", "khi"))
      .withColumn("qv",
        when(col("h") === col("klo").cast("double"), col("vlo"))
          .otherwise(
            (col("khi").cast("double") - col("h")) * col("vlo") +
              (col("h") - col("klo").cast("double")) * col("vhi")))
      .select(col("g"), col("n"), col("q"), col("qv"))
  }
}
