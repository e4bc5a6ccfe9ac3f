package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input/buffer of [[ArgMaxAgg]]: one (ordering value, payload id)
  * candidate. */
final case class ArgMaxIn(v: Double, id: Long)

/** `argmax_id(v, id)` — the id with the LARGEST v, smallest id on
  * ties: exactly `ORDER BY v DESC, id ASC LIMIT 1` per group, as a
  * one-pass hash aggregate.
  *
  * Exists because neither built-in form survives a corpus×codebook
  * product at scale: a `row_number()` window ships the entire product
  * through a shuffle into per-partition sorts, and `max_by` with a
  * struct ordering key falls back to SORT-based aggregation (struct
  * buffers are not hash-aggregable) — both sort |n|·K rows where the
  * answer needs |n| buffers. A typed Aggregator runs on
  * ObjectHashAggregate: true hash aggregation with map-side partials,
  * so the nearest-centroid assignment streams the product inside the
  * scan stage and shuffles one 16-byte buffer per (vector, partition).
  * Merge is associative/commutative and totally ordered (ids are
  * unique), so the pick is deterministic under any partitioning.
  */
object ArgMaxAgg extends Aggregator[ArgMaxIn, ArgMaxIn, Long] {

  override def zero: ArgMaxIn = ArgMaxIn(Double.NegativeInfinity, Long.MaxValue)

  /** Spark's SORT total order for doubles (java.lang.Double.compare):
    * NaN is GREATER than every value, so a NaN candidate (e.g. the
    * cosine of a zero vector) wins the argmax exactly as it would win
    * `ORDER BY v DESC` under the row_number form this aggregator
    * replaced — never the zero-buffer sentinel. Primitive `>` would
    * silently drop NaN candidates (all NaN comparisons are false). */
  private[functions] def better(a: ArgMaxIn, b: ArgMaxIn): ArgMaxIn = {
    val c = java.lang.Double.compare(b.v, a.v)
    if (c > 0 || (c == 0 && b.id < a.id)) b else a
  }

  override def reduce(b: ArgMaxIn, in: ArgMaxIn): ArgMaxIn = better(b, in)

  override def merge(a: ArgMaxIn, b: ArgMaxIn): ArgMaxIn = better(a, b)

  override def finish(b: ArgMaxIn): Long = b.id

  override def bufferEncoder: Encoder[ArgMaxIn] = Encoders.product[ArgMaxIn]

  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** [[ArgMaxAgg]] returning the whole winning `(v, id)` pair, for
  * consumers that need the ordering value too (e.g. the PQ assignment
  * keeps the winning squared error). Same order, same hash-aggregate
  * execution. For an argMIN, pass `-v` and negate the returned `v`
  * back — exact for IEEE doubles (sign-bit flip; `-(-0.0)` is `0.0`). */
object ArgMaxPairAgg extends Aggregator[ArgMaxIn, ArgMaxIn, ArgMaxIn] {

  override def zero: ArgMaxIn = ArgMaxIn(Double.NegativeInfinity, Long.MaxValue)

  override def reduce(b: ArgMaxIn, in: ArgMaxIn): ArgMaxIn = ArgMaxAgg.better(b, in)

  override def merge(a: ArgMaxIn, b: ArgMaxIn): ArgMaxIn = ArgMaxAgg.better(a, b)

  override def finish(b: ArgMaxIn): ArgMaxIn = b

  override def bufferEncoder: Encoder[ArgMaxIn] = Encoders.product[ArgMaxIn]

  override def outputEncoder: Encoder[ArgMaxIn] = Encoders.product[ArgMaxIn]
}
