package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gated (compact) version of the [[StreamSoak]] probe: the many-batch
  * drain path — 16 time-sliced micro-batches through RocksDB with a
  * mid-soak kill/resume — runs in every `sbt test`, so a regression in
  * long checkpoint lineages, per-batch state growth, or update-mode
  * re-emission semantics fails the build instead of waiting for the
  * next big-SF probe. The full-depth numbers (64 batches at sf0.1)
  * live in BENCH_NOTES §Round 16.
  */
class SoakSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("soak-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.streaming.numRecentProgressUpdates", "64")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private val nSlices = 16

  private lazy val (arrivals, arrivalsDup, ev) = {
    val root = java.nio.file.Files.createTempDirectory("graft_soak_spec").toString
    StreamSoak.writeTimeSlices(spark, sf, nSlices, root)
  }

  test("b51 ValueState survives a 16-batch drain with a mid-soak kill/resume " +
      "and converges to the batch aggregate") {
    def df = EventStream.userActivity(
      StreamSoak.readArrivals(spark, arrivals, ev.schema))
    // The mid-soak kill is inherently racy on a fast drain: 16 tiny
    // slices can all commit inside one 50 ms watcher poll, so the kill
    // REQUEST doesn't guarantee a kill. Retry with a fresh work dir
    // until the watcher actually wins (SoakRun.killed), then assert
    // the resume path; the parity/state gates below hold either way.
    var work = java.nio.file.Files.createTempDirectory("soak_b51").toString
    var half = StreamSoak.drive(spark, "spec_soak_b51", df, "update",
      s"$work/ckpt", s"$work/out", arrivals.getAbsolutePath,
      killAfter = nSlices / 2)
    var attempts = 1
    while (!half.killed && attempts < 4) {
      work = java.nio.file.Files.createTempDirectory("soak_b51").toString
      half = StreamSoak.drive(spark, "spec_soak_b51", df, "update",
        s"$work/ckpt", s"$work/out", arrivals.getAbsolutePath,
        killAfter = nSlices / 2)
      attempts += 1
    }
    val rest = StreamSoak.drive(spark, "spec_soak_b51_resume", df, "update",
      s"$work/ckpt", s"$work/out", arrivals.getAbsolutePath)
    assert(rest.finished, "the resumed run should drain to completion")
    if (half.killed) {
      assert(!half.finished, "a killed run must not report finished")
      assert(rest.progress.count(_._2 > 0) > 0 || half.progress.count(_._2 > 0) >= nSlices,
        "the resumed run should have processed the remaining slices")
    } else info(s"kill never won the race in $attempts attempts; " +
      "resume leg degraded to a no-op restart (still asserted finished)")
    val dataBatches = (half.progress ++ rest.progress).count(_._2 > 0)
    assert(dataBatches >= nSlices,
      s"expected >= $nSlices data micro-batches across kill+resume, saw $dataBatches")
    // converged value parity: per-user LAST update == batch GROUP BY
    val got = StreamSoak.lastUpdate(spark, s"$work/out", Seq("user_id"))
    val want = ev.groupBy("user_id").agg(
      count(lit(1)).as("n_events"), max(col("value")).as("max_value"),
      min(unix_micros(col("ts"))).as("first_ts_us"),
      max(unix_micros(col("ts"))).as("last_ts_us"))
    val asym = got.unionAll(want).groupBy(got.columns.map(col).toIndexedSeq: _*)
      .count().filter(col("count") =!= 2).count()
    assert(asym == 0, s"$asym asymmetric rows between converged state and batch aggregate")
    // bounded state: the store plateaus at the user-key space, never above
    val users = ev.select("user_id").distinct().count()
    val maxState = (half.progress ++ rest.progress).map(_._4).max
    assert(maxState <= users,
      s"state rows $maxState exceeded the $users-user key space")
  }

  test("b45 session windows and b46 interval join drain 16 batches with exact " +
      "parity and watermark-evicted state") {
    // the two hardest state encodings (merging session state; symmetric
    // join buffers) — full-depth kill/resume evidence lives in the
    // StreamSoak probe, this gates the drain path per build
    val w45 = java.nio.file.Files.createTempDirectory("soak_b45").toString
    val r45 = StreamSoak.drive(spark, "spec_soak_b45",
      EventStream.sessionAgg(StreamSoak.readArrivals(spark, arrivals, ev.schema)),
      "append", s"$w45/ckpt", s"$w45/out", arrivals.getAbsolutePath)
    assert(r45.finished && r45.progress.count(_._2 > 0) >= nSlices)
    val got45 = IdempotentSink.readBack(spark, s"$w45/out")
    val want45 = EventStream.sessionAgg(ev)
      .crossJoin(ev.agg(
        ((floor(max(unix_micros(col("ts"))) / 1000) - 7200000L) * 1000).as("wm_us")))
      .filter(col("sess_end_us") <= col("wm_us")).drop("wm_us")
    val asym45 = got45.unionAll(want45)
      .groupBy(got45.columns.map(col).toIndexedSeq: _*)
      .count().filter(col("count") =!= 2).count()
    assert(asym45 == 0, s"b45: $asym45 asymmetric session rows")
    val st45 = r45.progress.map(_._4)
    assert(st45.last < st45.max, s"b45: no session-state eviction (peak ${st45.max})")

    val w46 = java.nio.file.Files.createTempDirectory("soak_b46").toString
    val r46 = StreamSoak.drive(spark, "spec_soak_b46", {
        val e = StreamSoak.readArrivals(spark, arrivals, ev.schema)
        EventStream.clickErrorJoin(e, e)
      }, "append", s"$w46/ckpt", s"$w46/out", arrivals.getAbsolutePath)
    assert(r46.finished && r46.progress.count(_._2 > 0) >= nSlices)
    val got46 = IdempotentSink.readBack(spark, s"$w46/out")
    val want46 = EventStream.clickErrorJoin(ev, ev)
    val asym46 = got46.unionAll(want46)
      .groupBy(got46.columns.map(col).toIndexedSeq: _*)
      .count().filter(col("count") =!= 2).count()
    assert(asym46 == 0, s"b46: $asym46 asymmetric joined rows")
    val st46 = r46.progress.map(_._4)
    assert(st46.last < st46.max, s"b46: no join-buffer eviction (peak ${st46.max})")
  }

  test("b47 dedup over a doubled 16-batch stream reproduces the raw table " +
      "with watermark-bounded state") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("soak_b47").toString
    val r = StreamSoak.drive(spark, "spec_soak_b47",
      EventStream.dedupedEvents(
        StreamSoak.readArrivals(spark, arrivalsDup, ev.schema)),
      "append", s"$work/ckpt", s"$work/out", arrivals.getAbsolutePath)
    assert(r.finished)
    assert(r.progress.count(_._2 > 0) >= nSlices)
    val got = IdempotentSink.readBack(spark, s"$work/out")
      .select("event_id").as[Long].collect().sorted.toSeq
    val want = ev.select("event_id").as[Long].collect().sorted.toSeq
    assert(got == want,
      s"dedup output diverged: got ${got.size} rows, want ${want.size}")
    // eviction visible: the final batch's seen-key state is strictly
    // below the peak (the watermark passed early keys mid-drain)
    val states = r.progress.map(_._4)
    assert(states.last < states.max,
      s"no watermark eviction observed: state stayed at peak ${states.max}")
  }
}
