package graft.cap

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** F2 quarantine semantics: throwing alerts surface as (id, error)
  * rows; healthy alerts quarantine nothing; features output is
  * unchanged from the plain path.
  */
class QuarantineSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("quarantine-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def alert(id: String, sent: String): CapAlert =
    CapAlert(id, "sender@x", sent, "Actual", "Alert", "Public",
      "Met", "Wind", "Immediate", "Severe", "Observed", "MetService",
      s"headline $id", "desc", "instr", "Monitor", "", "", "",
      "Area", Seq("-41,174 -42,175 -41,175 -41,174"), "", "", "")

  test("unparseable sent is quarantined with an error; valid alerts pass through") {
    import spark.implicits._
    val alerts = Seq(
      alert("ok-1", "2024-05-01T10:00:00Z"),
      alert("bad-1", "not a date"),
      alert("ok-2", "2024-05-02T10:00:00Z")).toDS()
    val fanOut = CapPipeline.toFeaturesWithQuarantine(alerts)
    val (features, quarantine) = (fanOut.features, fanOut.quarantine)

    val q = quarantine.collect()
    assert(q.map(_.identifier).toSeq == Seq("bad-1"))
    assert(q.head.error.nonEmpty)

    val featIds = features.collect().map(_.id).toSet
    // polygon + centroid features for each valid alert, none for bad-1
    assert(featIds.exists(_.startsWith("ok-1")))
    assert(featIds.exists(_.startsWith("ok-2")))
    assert(!featIds.exists(_.startsWith("bad-1")))
    // identical to the plain toFeatures output
    assert(featIds == CapPipeline.toFeatures(alerts).collect().map(_.id).toSet)
    fanOut.unpersist()
  }

  test("fixture corpus quarantines nothing (all failures are handled fallbacks)") {
    import spark.implicits._
    val xml = spark.read.option("wholetext", "true").text("fixtures/cap").as[String]
    val fanOut = CapPipeline.toFeaturesWithQuarantine(
      CapPipeline.parseAlerts(xml), persist = false)
    assert(fanOut.quarantine.count() == 0,
      s"unexpected quarantine: ${fanOut.quarantine.collect().toSeq}")
  }
}
