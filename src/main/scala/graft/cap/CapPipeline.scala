package graft.cap

import java.time.Instant

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.util.Try

/** The CAP dataflow as first-class Spark operators (SURVEY.md §2/§3).
  *
  * Reference pipeline (`task.ts:598-883`): feed → link extraction →
  * per-URL fetch → XML parse/validate → expiry filter → fan-out →
  * FeatureCollection. Here each stage is a declarative Dataset
  * transform; the reference's *serial* per-alert loop (`task.ts:626`)
  * becomes partition-parallel execution — the engine's main scalability
  * win. Fetching is decoupled: these operators take `Dataset[String]`
  * of feed/alert bodies, so any source (files, a DSv2 HTTP connector,
  * a stream) plugs in front.
  */
object CapPipeline {

  // ---------------------------------------------------------------
  // P4 schema — all leaves forced to StringType so from_xml cannot
  // numeric-coerce text nodes (fast-xml-parser quirk parity,
  // SURVEY.md §7 risk register); polygon/parameter declared as arrays
  // so the scalar-or-array XML quirk normalizes at parse time
  // (task.ts:458, 647).
  // ---------------------------------------------------------------
  val parameterType: ArrayType = ArrayType(StructType(Seq(
    StructField("valueName", StringType),
    StructField("value", StringType))))

  /** One <info> element. Declared separately because `info` itself is an
    * ARRAY in the alert schema: fast-xml-parser yields an array for
    * repeated <info> elements, and the reference then reads `info.x` off
    * the ARRAY — undefined → '' for every field (task.ts:427-453). A
    * struct schema here would silently keep the LAST <info> instead. */
  val infoType: StructType = StructType(Seq(
    StructField("category", StringType),
    StructField("event", StringType),
    StructField("urgency", StringType),
    StructField("severity", StringType),
    StructField("certainty", StringType),
    StructField("senderName", StringType),
    StructField("headline", StringType),
    StructField("description", StringType),
    StructField("instruction", StringType),
    StructField("responseType", StringType),
    StructField("onset", StringType),
    StructField("expires", StringType),
    StructField("web", StringType),
    StructField("area", StructType(Seq(
      StructField("areaDesc", StringType),
      StructField("polygon", ArrayType(StringType)),
      StructField("circle", StringType)))),
    StructField("parameter", parameterType)))

  val alertSchema: StructType = StructType(Seq(
    StructField("identifier", StringType),
    StructField("sender", StringType),
    StructField("sent", StringType),
    StructField("status", StringType),
    StructField("msgType", StringType),
    StructField("scope", StringType),
    StructField("info", ArrayType(infoType)),
    StructField("Signature", StructType(Seq(
      StructField("KeyInfo", StructType(Seq(
        StructField("X509Data", StructType(Seq(
          StructField("X509Certificate", StringType))))))))))))

  // ---------------------------------------------------------------
  // P1-P3: feed link extraction — regexp_extract_all for both RSS
  // (<link>text</link>) and Atom (<link href="...">) shapes, with the
  // reference's {1,1000} ReDoS length caps (task.ts:563, 572), then
  // the /cap/-or-alert predicate and distinct. Patterns are shared
  // with the capfeed connector's driver-side planner (FeedLinks) so
  // the two paths cannot drift apart.
  // ---------------------------------------------------------------
  private val rssLinkRe = graft.sources.FeedLinks.RssLinkPattern
  private val atomLinkRe = graft.sources.FeedLinks.AtomLinkPattern

  /** Order-preserving dedup, mirroring the reference's
    * `[...new Set(links)]` (task.ts:580): each link keeps its FIRST
    * extraction position and the result is ordered by it — RSS matches
    * before Atom matches within a body, exactly like the reference,
    * which concatenates the two regex passes before dedup. The
    * reference processes one feed per invocation, so within-body order
    * is the reference semantics; across multiple feed bodies (which
    * have no reference counterpart) ties on position break by link for
    * a deterministic total order. */
  def parseFeedLinks(feeds: Dataset[String]): Dataset[String] = {
    val spark = feeds.sparkSession
    import spark.implicits._
    feeds.toDF("body")
      .select(posexplode(concat(
        regexp_extract_all(col("body"), lit(rssLinkRe), lit(1)),
        regexp_extract_all(col("body"), lit(atomLinkRe), lit(1)))).as(Seq("pos", "link")))
      .select(col("pos"), trim(col("link")).as("link"))
      .filter(col("link").contains("/cap/") || col("link").contains("alert"))
      .groupBy(col("link")).agg(min(col("pos")).as("first_pos"))
      .orderBy(col("first_pos"), col("link"))
      .select(col("link"))
      .as[String]
  }

  // ---------------------------------------------------------------
  // P4-P7: XML parse + projection + '' defaulting + validity filter +
  // colour-code priority — all as declarative column expressions so
  // Catalyst prunes/pushes around them.
  // ---------------------------------------------------------------
  def parseAlerts(xml: Dataset[String]): Dataset[CapAlert] = {
    val spark = xml.sparkSession
    import spark.implicits._

    def s(c: Column): Column = coalesce(c, lit(""))

    val a = from_xml(col("xml"), alertSchema)
    // JS semantics over the repeated-<info> quirk (task.ts:427-453): with
    // exactly one <info>, fields project from it; with several, the
    // reference reads `info.x` off the ARRAY → undefined → '' for every
    // info-derived field (empty area → NZ-center fallback point). The
    // Signature branch is independent of info and still applies.
    val info = when(size(col("a.info")) === 1, element_at(col("a.info"), 1))
      .otherwise(lit(null).cast(infoType))
    val params = coalesce(info.getField("parameter"), lit(null).cast(parameterType))
    // P7 (task.ts:456-476): a present ColourCodeHex param wins even when
    // its value is empty/null — no fallthrough to ColourCode.
    val hexParam = get(filter(params, p => p("valueName") === "ColourCodeHex"), lit(0))
    val namedParam = get(filter(params, p => p("valueName") === "ColourCode"), lit(0))
    val colorCode = when(hexParam.isNotNull, s(hexParam("value")))
      .otherwise(s(try_element_at(typedLit(graft.functions.Lookups.ColorMap), namedParam("value"))))

    xml.toDF("xml")
      .select(a.as("a"))
      .select(
        s(col("a.identifier")).as("identifier"),
        s(col("a.sender")).as("sender"),
        s(col("a.sent")).as("sent"),
        s(col("a.status")).as("status"),
        s(col("a.msgType")).as("msgType"),
        s(col("a.scope")).as("scope"),
        // P6 `no info` check (task.ts:427-430): fast-xml-parser parses
        // an EMPTY <info/> as '' (falsy → dropped), but from_xml yields
        // a single all-null struct — detect it via to_json = "{}" so
        // empty-info alerts drop here like the reference.
        (col("a.info").isNotNull &&
          !(size(col("a.info")) === 1 &&
            to_json(element_at(col("a.info"), 1)) === "{}")).as("hasInfo"),
        s(info.getField("category")).as("category"),
        s(info.getField("event")).as("event"),
        s(info.getField("urgency")).as("urgency"),
        s(info.getField("severity")).as("severity"),
        s(info.getField("certainty")).as("certainty"),
        s(info.getField("senderName")).as("senderName"),
        s(info.getField("headline")).as("headline"),
        s(info.getField("description")).as("description"),
        s(info.getField("instruction")).as("instruction"),
        s(info.getField("responseType")).as("responseType"),
        s(info.getField("onset")).as("onset"),
        s(info.getField("expires")).as("expires"),
        s(info.getField("web")).as("web"),
        s(info.getField("area").getField("areaDesc")).as("areaDesc"),
        transform(
          coalesce(info.getField("area").getField("polygon"),
            array().cast(ArrayType(StringType))),
          p => coalesce(p, lit(""))).as("polygon"),
        s(info.getField("area").getField("circle")).as("circle"),
        colorCode.as("colorCode"),
        s(col("a.Signature.KeyInfo.X509Data.X509Certificate")).as("cert"))
      // P6 validity filter (task.ts:415-434): no <alert> root → all-null
      // struct → dropped here too.
      .filter(col("hasInfo") &&
        col("identifier") =!= "" && col("sender") =!= "" && col("sent") =!= "")
      .drop("hasInfo")
      .as[CapAlert]
  }

  // ---------------------------------------------------------------
  // F1 expiry filter with an injected asOf clock (deterministic —
  // SURVEY.md §5). Parsing goes through JsCompat.jsDateParse — the SAME
  // clock/parse semantics as feature rendering (fixed UTC, JS shapes) —
  // so no session-timezone dependence and no alert kept here only to be
  // dropped by iso()'s throw later. JS semantics: invalid `expires`
  // compares NaN<now → false → alert kept (UDF None → coalesce true).
  // The UDF blocks Catalyst pushdown, but it runs post-XML-parse where
  // nothing remains to push past; correctness over pushdown here.
  // ---------------------------------------------------------------
  private val jsExpiresMs =
    udf((s: String) => graft.functions.JsCompat.jsDateParse(s).map(_.toEpochMilli))

  def filterActive(alerts: Dataset[CapAlert], asOf: Instant): Dataset[CapAlert] =
    alerts.filter(
      col("expires") === "" ||
      coalesce(jsExpiresMs(col("expires")) >= lit(asOf.toEpochMilli), lit(true)))

  // ---------------------------------------------------------------
  // X2 fan-out — typed flatMap over the heavily unit-tested pure
  // function; per-alert error isolation (F2) mirrors the reference's
  // try/catch-and-continue (task.ts:876-878).
  // ---------------------------------------------------------------
  def toFeatures(alerts: Dataset[CapAlert]): Dataset[CotFeature] = {
    val spark = alerts.sparkSession
    import spark.implicits._
    alerts.flatMap(a => Try(Features.alertToFeatures(a)).getOrElse(Seq.empty))
  }

  /** The X2 fan-out as a TAGGED UNION in ONE narrow pass:
    * `alertToFeatures` is evaluated exactly once per alert; success
    * rows carry a feature each, a failure contributes one quarantine
    * row. Callers that materialize both sides persist this Dataset so
    * the alerts source is scanned once (what
    * [[toFeaturesWithQuarantine]] does). */
  def fanOutTagged(alerts: Dataset[CapAlert]): Dataset[FanOutRow] = {
    val spark = alerts.sparkSession
    import spark.implicits._
    alerts.flatMap { a =>
      Try(Features.alertToFeatures(a)) match {
        case scala.util.Success(fs) =>
          fs.iterator.map(f => FanOutRow(Some(f), None))
        case scala.util.Failure(e) =>
          Iterator.single(FanOutRow(None, Some(QuarantinedAlert(a.identifier,
            Option(e.getMessage).getOrElse(e.getClass.getSimpleName)))))
      }
    }
  }

  /** Both sides of the fused fan-out plus the lifecycle handle for the
    * persisted tagged intermediate. `unpersist()` releases the cache
    * entry (a no-op when the fan-out ran with `persist = false`) — call
    * it once both sides are materialized, so long-lived sessions don't
    * accumulate cache entries across repeated pipeline runs.
    */
  final case class QuarantineFanOut(
      features: Dataset[CotFeature],
      quarantine: Dataset[QuarantinedAlert],
      private val tagged: Option[Dataset[FanOutRow]]) {
    def unpersist(): Unit = tagged.foreach(_.unpersist())
  }

  /** F2 with a quarantine side-channel — the engine's improvement over
    * the reference, which only console-logs and drops (task.ts:876-878):
    * alerts whose fan-out throws (e.g. an unparseable `sent` making
    * `toISOString` fail, matching the reference's per-alert catch) come
    * back as (identifier, error) rows instead of vanishing.
    *
    * Fused via [[fanOutTagged]]: ONE pass evaluates the fan-out, and
    * with `persist` (the default) the tagged intermediate is cached so
    * materializing both outputs scans the alerts source exactly once
    * (plan-asserted in PlanShapeSpec). The returned [[QuarantineFanOut]]
    * owns the cache entry — call `unpersist()` when done. Pass
    * `persist = false` when only one side will be materialized, or
    * manage [[fanOutTagged]] and its lifecycle directly.
    */
  def toFeaturesWithQuarantine(alerts: Dataset[CapAlert], persist: Boolean = true)
      : QuarantineFanOut = {
    val spark = alerts.sparkSession
    import spark.implicits._
    val tagged0 = fanOutTagged(alerts)
    val tagged =
      if (persist) tagged0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else tagged0
    QuarantineFanOut(
      tagged.flatMap(_.feature), tagged.flatMap(_.quarantined),
      if (persist) Some(tagged) else None)
  }

  /** End-to-end over a directory of CAP alert XML files (one alert per
    * file, read whole-file so documents aren't line-split). */
  def run(spark: SparkSession, xmlDir: String, asOf: Instant): Dataset[CotFeature] = {
    import spark.implicits._
    val xml = spark.read
      .option("wholetext", "true")
      .text(xmlDir)
      .as[String]
    toFeatures(filterActive(parseAlerts(xml), asOf))
  }
}
