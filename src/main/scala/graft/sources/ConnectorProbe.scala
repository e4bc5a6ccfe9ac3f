package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

/** CAP connector throughput envelope (r15 verdict task 6) — the
  * measured counterpart to BASELINE.md's prose claim that the
  * `capfeed` connector turns the reference's serial fetch loop
  * (reference `task.ts:626`: one alert at a time, await per fetch)
  * into bounded parallelism where total wall ≈ max, not sum.
  *
  * An in-JVM HTTP server publishes a feed of `nAlerts` links, each
  * alert body a real CAP fixture with a rewritten identifier, and each
  * response delayed `latencyMs` to model network RTT (the regime the
  * connector exists for — CAP feeds are many small documents behind
  * real latency). Three measured walls:
  *
  *  - serial   — numPartitions=1, fetchConcurrency=1: the reference's
  *               loop shape, measured not modeled;
  *  - parallel — numPartitions × fetchConcurrency bounded in-flight
  *               fetches (the production default shape);
  *  - model    — nAlerts × latencyMs, the analytic floor of the serial
  *               form, printed for the sum-vs-max comparison.
  *
  * The serial leg runs over `serialAlerts` links (default nAlerts/10)
  * and is reported per-alert — measuring 1000 serial 20 ms fetches
  * would spend 20 s proving a multiplication.
  *
  * Usage: runMain graft.sources.ConnectorProbe
  *          [nAlerts] [latencyMs] [numPartitions] [fetchConcurrency]
  */
object ConnectorProbe {

  private def jnum(v: Double): String = f"$v%.3f"

  def main(args: Array[String]): Unit = {
    val nAlerts = args.headOption.map(_.toInt).getOrElse(1000)
    val latencyMs = args.lift(1).map(_.toLong).getOrElse(20L)
    val parts = args.lift(2).map(_.toInt).getOrElse(8)
    val conc = args.lift(3).map(_.toInt).getOrElse(8)
    val serialAlerts = math.max(1, nAlerts / 10)

    val body = new String(
      Files.readAllBytes(Paths.get("fixtures/cap/metservice-polygon.xml")),
      StandardCharsets.UTF_8)
    val hits = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    def respond(ex: HttpExchange, code: Int, s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
    def feedOf(n: Int): String =
      (0 until n).map(i => s"<item><link>$base/cap/$i</link></item>")
        .mkString("<rss><channel>", "", "</channel></rss>")
    server.createContext("/feed", (ex: HttpExchange) =>
      respond(ex, 200, feedOf(nAlerts)))
    server.createContext("/feedSerial", (ex: HttpExchange) =>
      respond(ex, 200, feedOf(serialAlerts)))
    server.createContext("/cap/", (ex: HttpExchange) => {
      val i = ex.getRequestURI.getPath.stripPrefix("/cap/")
      hits.incrementAndGet()
      Thread.sleep(latencyMs) // modeled network RTT
      respond(ex, 200, body.replaceAll(
        "<identifier>([^<]*)</identifier>", s"<identifier>$$1-a$i</identifier>"))
    })
    // a cached pool so server-side threading never serializes what the
    // client overlaps (same reasoning as ConnectorSpec)
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()

    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-connector-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def fetchWall(url: String, np: Int, fc: Int, expect: Int): Double = {
      val t0 = System.nanoTime()
      val n = spark.read.format("capfeed")
        .option("url", url)
        .option("numPartitions", np)
        .option("fetchConcurrency", fc)
        .option("timeout", 30000)
        .load()
        .count()
      require(n == expect, s"fetched $n of $expect alerts")
      (System.nanoTime() - t0) / 1e9
    }

    // warmup (JVM/codegen/connection pool) on a small feed
    fetchWall(s"$base/feedSerial", parts, conc, serialAlerts)

    val serialWall = fetchWall(s"$base/feedSerial", 1, 1, serialAlerts)
    val parallelWall = fetchWall(s"$base/feed", parts, conc, nAlerts)
    val perAlertSerial = serialWall / serialAlerts
    val modelSerialFull = perAlertSerial * nAlerts
    println(
      s"""{"probe":"connector_throughput","alerts":$nAlerts""" +
        s""","latency_ms":$latencyMs,"num_partitions":$parts""" +
        s""","fetch_concurrency":$conc""" +
        s""","parallel_wall_sec":${jnum(parallelWall)}""" +
        s""","parallel_alerts_per_sec":${jnum(nAlerts / parallelWall)}""" +
        s""","serial_wall_sec_${serialAlerts}_alerts":${jnum(serialWall)}""" +
        s""","serial_per_alert_ms":${jnum(perAlertSerial * 1000)}""" +
        s""","serial_model_full_sec":${jnum(modelSerialFull)}""" +
        s""","speedup_vs_serial":${jnum(modelSerialFull / parallelWall)}""" +
        s""","server_hits":${hits.get()}}""")
    server.stop(0)
    spark.stop()
  }
}
