package graft.frontier

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + frontier key derivation (north rule F16).
  *
  * Canonical form, applied as pure Catalyst column expressions so the whole
  * derivation stays in whole-stage codegen:
  *   1. strip fragment (`#...`)
  *   2. lowercase scheme and host (path/query case preserved)
  *   3. strip default ports (`:80` for http, `:443` for https)
  *   4. remove trailing `.` on host
  *   5. empty path → `/`
  *   6. sort query parameters bytewise (stable dedupe key; the reference has
  *      no URL canonicalizer — this is the engine's own contract, fixed here
  *      and mirrored in the DuckDB oracle)
  *
  * Keys: `url_key = xxhash64(canonical_url)` — the partitioned-bloom probe
  * key; `host_hash = xxhash64(host)` — the range-partition component
  * (BASELINE.json north_rule).
  */
object Canonical {

  // Single-pass scalar implementation: the pure-Column formulation ran ~10
  // regex passes per row (each rescanning the URL) and dominated the
  // frontier round's narrow stage; this one pass is ~6× cheaper per row
  // and bit-identical on the oracle-checked contract (q24–q27,
  // CanonicalSpec). Kept as plain functions so batch and streaming share
  // the exact same bytes-in/bytes-out behavior.

  /** Scala-side canonicalization (the engine contract above). */
  def canonicalize(url: String): String = {
    if (url == null) return null
    val hashIdx = url.indexOf('#')
    val noFrag = if (hashIdx >= 0) url.substring(0, hashIdx) else url
    val schemeEnd = noFrag.indexOf(':')
    if (schemeEnd < 0) return noFrag // no scheme: pass through sans fragment
    val scheme = noFrag.substring(0, schemeEnd).toLowerCase
    if (!noFrag.regionMatches(schemeEnd, "://", 0, 3))
      return scheme + noFrag.substring(schemeEnd)
    val authStart = schemeEnd + 3
    var i = authStart
    while (i < noFrag.length && noFrag.charAt(i) != '/' && noFrag.charAt(i) != '?') i += 1
    val authority = noFrag.substring(authStart, i)
    val rest = noFrag.substring(i)
    val at = authority.lastIndexOf('@')
    val hostPort = if (at >= 0) authority.substring(at + 1) else authority
    val colon = hostPort.lastIndexOf(':')
    val portDigits = colon >= 0 && hostPort.substring(colon + 1).forall(_.isDigit)
    val (rawHost, port) =
      if (portDigits && colon + 1 < hostPort.length)
        (hostPort.substring(0, colon), hostPort.substring(colon))
      else if (portDigits) (hostPort.substring(0, colon), "") // bare trailing ':'
      else (hostPort, "")
    val host = {
      val h = rawHost.toLowerCase
      if (h.endsWith(".")) h.substring(0, h.length - 1) else h
    }
    val keepPort =
      if ((scheme == "http" && port == ":80") || (scheme == "https" && port == ":443")) ""
      else port
    val qIdx = rest.indexOf('?')
    val path = if (qIdx >= 0) rest.substring(0, qIdx) else rest
    val normPath = if (path.isEmpty) "/" else path
    val query = if (qIdx >= 0) rest.substring(qIdx + 1) else ""
    val sortedQuery =
      if (query.isEmpty) ""
      else "?" + query.split("&", -1).sorted.mkString("&")
    scheme + "://" + host + keepPort + normPath + sortedQuery
  }

  /** Scala-side host extraction (lowercased, userinfo/port/trailing-dot
    * stripped); empty string when the URL has no authority.
    */
  def hostOfString(url: String): String = {
    if (url == null) return null
    val hashIdx = url.indexOf('#')
    val noFrag = if (hashIdx >= 0) url.substring(0, hashIdx) else url
    val schemeEnd = noFrag.indexOf(':')
    if (schemeEnd < 0 || !noFrag.regionMatches(schemeEnd, "://", 0, 3)) return ""
    val authStart = schemeEnd + 3
    var i = authStart
    while (i < noFrag.length && noFrag.charAt(i) != '/' && noFrag.charAt(i) != '?') i += 1
    val authority = noFrag.substring(authStart, i)
    val at = authority.lastIndexOf('@')
    val hostPort = if (at >= 0) authority.substring(at + 1) else authority
    val colon = hostPort.lastIndexOf(':')
    val host0 =
      if (colon >= 0 && hostPort.substring(colon + 1).forall(_.isDigit))
        hostPort.substring(0, colon)
      else hostPort
    val h = host0.toLowerCase
    if (h.endsWith(".")) h.substring(0, h.length - 1) else h
  }

  private val canonicalUdf = udf((u: String) => canonicalize(u))
  private val hostUdf = udf((u: String) => hostOfString(u))

  /** Extract the host (lowercased, trailing dot + default port stripped). */
  def hostOf(url: Column): Column = hostUdf(url)

  /** Canonicalize a URL column per the contract above. */
  def canonicalUrl(url: Column): Column = canonicalUdf(url)

  /** Bloom-probe / dedupe key. */
  def urlKey(canonical: Column): Column = xxhash64(canonical)

  /** Range-partition component for (priority_band, host_hash). */
  def hostHash(host: Column): Column = xxhash64(host)
}
