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

  /** Two-label public suffixes (publicsuffix.org ICANN-section form),
    * loaded at plan-build time from the bundled snapshot resource
    * `graft/public_suffix_2label.txt` (~700 curated rules across ~80
    * ccTLDs, plus the fixture entries this corpus's synthetic URLs
    * exercise). The lookup in [[registeredDomain]] is a set MEMBERSHIP
    * over the candidate suffix, which Catalyst compiles to an `InSet`
    * O(1) hash-set probe inside codegen at any list size (the set ships
    * to executors inside the generated class, the codegen analog of a
    * broadcast map — no join, no shuffle, still row-local in the scan
    * stage). Scope: exactly-two-label ICANN rules; 3+-label rules
    * (`pvt.k12.ma.us`-style state trees) and the PSL private section
    * (`github.io`-style) are out of scope — a host under one of those
    * resolves by the generic two-label rule instead. Refreshing the
    * snapshot = replacing the resource file; no code changes. */
  val publicSuffixes2: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_2label.txt")
    require(in != null, "missing resource graft/public_suffix_2label.txt")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toVector
    finally in.close()
  }

  /** Registered domain under the public-suffix rule: the suffix plus one
    * more label — three host labels when the last two are a listed public
    * suffix, two otherwise. A host that IS a bare two-label suffix (no
    * third label to take) falls back to itself, and a single-label host
    * yields '' (no registered domain), both matching the prior behavior. */
  def registeredDomain(host: Column, suffixes2: Seq[String] = publicSuffixes2): Column = {
    val last2 = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val last3 = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    when(last2.isin(suffixes2: _*) && last3 =!= "", last3).otherwise(last2)
  }

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
