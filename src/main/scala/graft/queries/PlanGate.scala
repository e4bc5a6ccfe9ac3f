package graft.queries

import org.apache.spark.sql.DataFrame

/** The ONE plan-time cardinality gate behind every cardinality-chosen
  * plan switch in the query families:
  *
  *  - d5's band geometry (narrow 16-bit below / wide 24-bit above
  *    [[Dedup]]-family corpus sizes — `Similarity.D5WideCutoff`),
  *  - d8b's flat / broadcast-kernel / distributed-join assignment
  *    regimes (`D8bFlatCutoff`, `D8bKernelCap`),
  *  - s12's broadcast-product / row-free-kernel bench cutoff
  *    (`S12KernelCutoff`).
  *
  * Each of these used to hand-roll the same two steps — a column-pruned
  * `count()` of the deciding relation, then threshold compares — in
  * slightly different shapes; the r15 verdict flagged the drift risk
  * when caps change. This helper is the single place the pattern
  * lives, and `PlanGateSpec` is the single harness that pins every
  * switch's boundary arithmetic (and, where the branches are exact
  * twins, their value equality at the boundary).
  *
  * Cost story (shared by all call sites): the deciding count is ONE
  * column-pruned scan — plan-time metadata work ahead of a
  * potentially multi-minute plan, never a data collect. At ×1000 it
  * measured ~1 s before d8b's multi-minute assignment.
  */
private[queries] object PlanGate {

  /** The deciding cardinality: one column-pruned count of `keyCol`
    * over `rel`. */
  def cardinality(rel: DataFrame, keyCol: String): Long =
    rel.select(keyCol).count()

  /** Regime index of `k` against ascending INCLUSIVE upper bounds:
    * the first `i` with `k <= cutoffs(i)`, or `cutoffs.length` above
    * them all. Regime 0 is always the small-corpus plan, so a
    * cardinality exactly AT a cutoff stays on the cheaper/exact side
    * — the same `<=` convention the oracle SQL gates use (d5Sql routes
    * through the narrow geometry at n == cutoff), pinned by
    * PlanGateSpec so Scala and SQL can never disagree at the boundary.
    */
  def regime(k: Long, cutoffs: Long*): Int = {
    require(cutoffs.nonEmpty && cutoffs.sliding(2).forall(
        c => c.length < 2 || c(0) < c(1)),
      s"cutoffs must be strictly ascending: $cutoffs")
    val i = cutoffs.indexWhere(k <= _)
    if (i < 0) cutoffs.length else i
  }

  /** One-cutoff convenience: measure `rel`'s cardinality and pick. */
  def pick[T](rel: DataFrame, keyCol: String, cutoff: Long)(
      below: => T, above: => T): T =
    if (regime(cardinality(rel, keyCol), cutoff) == 0) below else above
}
