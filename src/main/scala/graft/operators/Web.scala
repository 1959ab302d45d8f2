package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the key of web-crawl deduplication.
  *
  * Crawl pipelines (C4, RefinedWeb, CommonCrawl dedup) key documents by a
  * NORMALIZED form of their fetch URL: the same page is otherwise counted
  * once per scheme-case / www-prefix / default-port / tracking-param /
  * trailing-slash / fragment variant, and URL-level dedup silently stops
  * working. The rules here are the standard RFC 3986 syntax-based
  * normalizations plus tracking-parameter (utm_*) removal:
  *
  *  1. fragment dropped (`#...` is client-side only);
  *  2. `utm_*` query parameters removed, separators repaired, a
  *     now-empty query dropped;
  *  3. scheme and host lowercased; a `www.` host prefix dropped;
  *  4. default ports stripped (`:80` for http, `:443` for https);
  *  5. trailing path slashes dropped (an empty path becomes `/`).
  *
  * Everything is built from codegen'd string expressions (`regexp_*`,
  * `substring`, `concat`) — a row-local scan stage with NO shuffle and no
  * UDF: at corpus scale the canonical key is computed inline in whatever
  * stage already reads the row (usually the dedup digest aggregate).
  * Oracle parity: every regex below is RE2-safe (works identically in
  * DuckDB's regexp_* family, where replace needs the 'g' flag to match
  * Spark's replace-all semantics).
  */
object Web {

  /** Scheme-relative remainder after `scheme://`. */
  private def afterScheme(u: Column): Column =
    regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")

  /** Lowercased scheme of the URL ('' when absent). */
  def urlScheme(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Lowercased host with any `www.` prefix and `:port` dropped. */
  def urlHost(u: Column): Column =
    regexp_replace(
      lower(regexp_extract(afterScheme(u), "^([^/?#]+)", 1)),
      "^www\\.|:[0-9]+$", "")

  /** Port as a string ('' when absent). */
  def urlPort(u: Column): Column =
    regexp_extract(afterScheme(u), "^[^/?#]*?:([0-9]+)(?:[/?#]|$)", 1)

  /** Registered domain via a public-suffix-lite rule: the last two host
    * labels, or three when the suffix is itself two labels (`co.br`,
    * `com.br`, `co.uk` — the forms in our corpus; a production deployment
    * swaps in the full public-suffix list as a broadcast map). */
  def registeredDomain(host: Column): Column =
    when(host.rlike("\\.(co|com)\\.(br|uk)$"),
      regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1))
      .otherwise(regexp_extract(host, "([^.]+\\.[^.]+)$", 1))

  /** The full canonical URL (rules 1–5 above). */
  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    val scheme = urlScheme(noFrag)
    val host = urlHost(noFrag)
    val port = urlPort(noFrag)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val portSuffix = when(keepPort, concat(lit(":"), port)).otherwise("")
    val tail = afterPrefix(afterScheme(noFrag),
      regexp_extract(afterScheme(noFrag), "^([^/?#]+)", 1))
    val path = regexp_extract(tail, "^([^?]*)", 1)
    val canonPath = {
      val trimmed = regexp_replace(path, "/+$", "")
      when(trimmed === "", "/").otherwise(trimmed)
    }
    // rule 2 runs on the QUERY STRING ONLY — a path segment or a param
    // whose NAME merely contains "utm_" (xutm_source) must survive. Each
    // removed param takes its LEADING separator; if the first surviving
    // param then dangles after '&', it is promoted back to '?'.
    val rawQuery = afterPrefix(tail, path)
    val stripped = regexp_replace(rawQuery, "(?i)[?&]utm_[A-Za-z0-9_]*=[^&]*", "")
    val query = when(stripped === "", "")
      .when(stripped.startsWith("&"),
        concat(lit("?"), stripped.substr(lit(2), length(stripped))))
      .otherwise(stripped)
    concat(scheme, lit("://"), host, portSuffix, canonPath, query)
  }

  /** `s` minus its `prefix` (both columns; prefix is always a true
    * prefix of s here). */
  private def afterPrefix(s: Column, prefix: Column): Column =
    s.substr(length(prefix) + 1, length(s))
}
