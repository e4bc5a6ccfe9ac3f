package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.queries.Relational
import graft.sources.Tables

/** Gates for the native as-of join (AsOfJoin.scala): value parity with
  * a driver-side reference walk, physical-plan shape, the
  * unextended-session guard, and the rule's analysis-time rejections.
  *
  * Sessions: suites share one forked JVM, so `getOrCreate` alone would
  * return whichever session an earlier suite built — with or without
  * extensions. Each helper clears the active/default session and builds
  * a FRESH one (same SparkContext) so extension presence is exactly
  * what the test states; the suite restores the previous default in
  * afterAll.
  */
class AsOfJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val prevDefault = SparkSession.getDefaultSession
  private val prevActive = SparkSession.getActiveSession

  override def afterAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    prevDefault.foreach(SparkSession.setDefaultSession)
    prevActive.foreach(SparkSession.setActiveSession)
    super.afterAll()
  }

  private def freshSession(extended: Boolean): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val b = SparkSession.builder()
      .master("local[4]")
      .appName(s"asof-spec-$extended")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // withExtensions (not the spark.sql.extensions conf): the conf is
    // static — consulted from the SparkCONTEXT's conf, so on a reused
    // context it reflects whichever suite created the JVM's context,
    // not this builder. withExtensions applies unconditionally, making
    // extension presence exactly what each test states.
    (if (extended) b.withExtensions(new GraftExtensions) else b).getOrCreate()
  }

  private val sf = "/root/testdata/sf0.001"

  test("b49 values equal a driver-side reference walk of the same semantics") {
    val s = freshSession(extended = true)
    val ev = Tables.events(s, sf)
    val clicksByUser = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), unix_micros(col("ts")).as("tsu"))
      .agg(max("event_id").as("click_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1)).toMap
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tsu"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = errors.flatMap { case (eid, uid, tsu) =>
      clicksByUser.getOrElse(uid, Array.empty[(Long, Long)])
        .takeWhile(_._1 <= tsu).lastOption
        .map { case (cts, cid) => (eid, uid, cid, tsu - cts) }
    }.toSet
    assert(expected.nonEmpty, "fixture must produce at least one match")
    val got = Relational.b49AsofNative(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("b49 plans through AsOfJoinExec — never the fallback cartesian") {
    val s = freshSession(extended = true)
    val df = Relational.b49AsofNative(s, sf)
    df.collect() // finalize any adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("an unextended session fails loudly instead of planning the cross join") {
    val s = freshSession(extended = false)
    val e = intercept[IllegalStateException](Relational.b49AsofNative(s, sf))
    assert(e.getMessage.contains("graft_asof"))
  }

  test("null keys and null times never match (inner semantics)") {
    val s = freshSession(extended = true)
    import s.implicits._
    val left = Seq(
      (Some(1L), Some(100L), "a"),
      (None: Option[Long], Some(100L), "b"),
      (Some(1L), None: Option[Long], "c"),
      (Some(2L), Some(50L), "d"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (Some(1L), Some(100L), "r1"), // tie at t=100: backward-inclusive
      (Some(1L), Some(40L), "r0"),
      (None: Option[Long], Some(1L), "rn"),
      (Some(2L), Some(60L), "r2"))  // after left d's t=50: no match
      .toDF("rk", "rt", "rtag")
    val out = left.crossJoin(right).hint("graft_asof", "k", "t", "rk", "rt")
      .select("tag", "rtag").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("a", "r1")))
  }

  test("the rule rejects ambiguous and type-mismatched hint columns at analysis") {
    val s = freshSession(extended = true)
    import s.implicits._
    val l = Seq((1L, 10L)).toDF("k", "t")
    val rStr = Seq(("1", 10L)).toDF("rk", "rt")
    val mism = intercept[IllegalArgumentException] {
      l.crossJoin(rStr).hint("graft_asof", "k", "t", "rk", "rt")
        .queryExecution.analyzed
    }
    assert(mism.getMessage.contains("key types differ"))
    val missing = intercept[IllegalArgumentException] {
      l.crossJoin(Seq((1L, 10L)).toDF("rk", "rt"))
        .hint("graft_asof", "nope", "t", "rk", "rt")
        .queryExecution.analyzed
    }
    assert(missing.getMessage.contains("resolved to 0"))
  }
}
