package graft.sources

import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Typed connector configuration — the engine's counterpart of the
  * reference's typebox `Environment` (task.ts:7-23): `url` required,
  * optional `headers`, `timeout` defaulting to 30000 ms, `retries`
  * defaulting to 2. Both DSv2 connectors (capfeed source, cloudtak
  * sink) parse their options through [[EtlConfig.fromOptions]], so the
  * defaults, validation, and the published JSON schema are one
  * definition that cannot drift apart.
  *
  * `failFast` and `fetchConcurrency` are engine-only (strict error
  * propagation instead of the reference's log-and-skip; bounded
  * per-partition async fetch instead of the reference's strictly
  * serial loop) and deliberately absent from the published input
  * schema, which mirrors the reference environment surface.
  */
final case class EtlConfig(
    url: String,
    headers: Map[String, String] = Map.empty,
    timeoutMs: Long = EtlConfig.DefaultTimeoutMs,
    retries: Int = EtlConfig.DefaultRetries,
    failFast: Boolean = false,
    fetchConcurrency: Int = 1)

object EtlConfig {
  /** Reference defaults (task.ts:15-22). */
  val DefaultTimeoutMs: Long = 30000L
  val DefaultRetries: Int = 2

  /** Parse + validate connector options. `who` prefixes error messages
    * with the connector short name (capfeed / cloudtak). */
  def fromOptions(options: CaseInsensitiveStringMap, who: String): EtlConfig = {
    val url = Option(options.get("url")).map(_.trim).filter(_.nonEmpty)
      .getOrElse(throw new IllegalArgumentException(s"$who: 'url' option is required"))
    val timeoutMs = options.getLong("timeout", DefaultTimeoutMs)
    if (timeoutMs <= 0)
      throw new IllegalArgumentException(s"$who: 'timeout' must be positive, got $timeoutMs")
    val retries = options.getInt("retries", DefaultRetries)
    if (retries < 0)
      throw new IllegalArgumentException(s"$who: 'retries' must be >= 0, got $retries")
    val fetchConcurrency = options.getInt("fetchConcurrency", 1)
    if (fetchConcurrency < 1)
      throw new IllegalArgumentException(
        s"$who: 'fetchConcurrency' must be >= 1, got $fetchConcurrency")
    EtlConfig(url, Http.parseHeaders(options.getOrDefault("headers", "")),
      timeoutMs, retries, options.getBoolean("failFast", false), fetchConcurrency)
  }

  /** JSON-schema rendering of the input configuration — the engine's
    * `schema(Input, Incoming)` (task.ts:583-596). Stable literal: the
    * options above, their defaults, and `url` as the only required
    * field. */
  val inputJsonSchema: String =
    """{"type":"object","properties":{
      |"url":{"type":"string","description":"CAP RSS or Atom feed URL"},
      |"headers":{"type":"string","description":"Extra request headers, 'K1=V1;K2=V2'"},
      |"timeout":{"type":"number","default":30000,"description":"Request timeout in milliseconds"},
      |"retries":{"type":"number","default":2,"description":"Number of retry attempts on failure"}
      |},"required":["url"]}""".stripMargin.replace("\n", "")

  /** The outgoing/output schemas are empty objects, as in the
    * reference (task.ts:590-595). */
  val emptyJsonSchema: String = """{"type":"object","properties":{}}"""
}
