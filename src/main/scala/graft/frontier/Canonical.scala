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

  /** Extract the host (lowercased, trailing dot + default port stripped). */
  def hostOf(url: Column): Column = {
    val authority = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val hostPort = regexp_replace(authority, "^[^@]*@", "") // strip userinfo
    val host = lower(regexp_replace(hostPort, ":[0-9]*$", ""))
    regexp_replace(host, "\\.$", "")
  }

  /** Canonicalize a URL column per the contract above. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    val host = hostOf(noFrag)
    val port = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*?(:[0-9]+)[/?#]?", 1)
    val keepPort = when(
      (scheme === "http" && port === ":80") || (scheme === "https" && port === ":443"),
      lit("")
    ).otherwise(coalesce(port, lit("")))
    val path = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val normPath = when(path === "", lit("/")).otherwise(path)
    val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val sortedQuery = when(
      query === "",
      lit("")
    ).otherwise(concat(lit("?"), array_join(array_sort(split(query, "&")), "&")))
    concat(scheme, lit("://"), host, keepPort, normPath, sortedQuery)
  }

  /** Bloom-probe / dedupe key. */
  def urlKey(canonical: Column): Column = xxhash64(canonical)

  /** Range-partition component for (priority_band, host_hash). */
  def hostHash(host: Column): Column = xxhash64(host)
}
