package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** robots.txt (RFC 9309, the Robots Exclusion Protocol) parsing and URL
  * admission — the crawl-politeness gate a web-scale corpus builder runs
  * before fetching (and re-runs over an existing crawl to drop pages the
  * site has since disallowed).
  *
  *  - [[parse]]: group selection per §2.2.1 (consecutive `User-agent`
  *    lines share one group; the most specific matching group wins, `*`
  *    as fallback; comments stripped; unknown directives ignored);
  *  - [[matches]]: path patterns with `*` wildcards and the `$` end
  *    anchor per §2.2.3, greedy two-pointer with backtracking;
  *  - [[isAllowed]]: longest-match-wins by pattern OCTET length, `Allow`
  *    beating `Disallow` on ties, empty-pattern rules ignored, default
  *    allow (§2.2.2) — a missing robots.txt is also allow-all.
  *
  * Scale shape in [[filterUrls]]: the robots corpus is parsed ONCE per
  * host (not per URL) on the dim side, then broadcast-joined to the URL
  * fact table; rule evaluation is a row-local loop over that host's rule
  * list — no shuffle of the fact beyond the join Spark picks.
  */
object Robots {

  final case class Rule(pattern: String, allow: Boolean)

  /** Rules of the group governing `agent` (exact case-insensitive match
    * preferred, `*` group as fallback), in file order. */
  def parse(body: String, agent: String = "*"): Seq[Rule] = {
    final case class Group(agents: Seq[String], rules: Seq[Rule])
    val groups = scala.collection.mutable.Buffer[Group]()
    var curAgents = scala.collection.mutable.Buffer[String]()
    var curRules = scala.collection.mutable.Buffer[Rule]()
    var inHeader = true // consecutive user-agent lines extend the group
    def flush(): Unit = {
      if (curAgents.nonEmpty) groups += Group(curAgents.toSeq, curRules.toSeq)
      curAgents = scala.collection.mutable.Buffer[String]()
      curRules = scala.collection.mutable.Buffer[Rule]()
    }
    for (raw <- body.linesIterator) {
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inHeader) flush()
            curAgents += value.toLowerCase
            inHeader = true
          case "allow" | "disallow" =>
            inHeader = false
            if (value.nonEmpty) curRules += Rule(value, key == "allow")
          // sitemap / crawl-delay / unknown lines neither start rules nor
          // break a User-agent header run (mainstream-parser behavior:
          // 'User-agent: a\nSitemap: …\nUser-agent: b' is ONE group)
          case _ => ()
        }
      }
    }
    flush()
    // §2.2.1: ALL groups matching the agent merge — a site repeating
    // 'User-agent: *' contributes every group's rules, in file order
    val want = agent.toLowerCase
    val exact = groups.filter(_.agents.contains(want))
    val chosen = if (exact.nonEmpty) exact else groups.filter(_.agents.contains("*"))
    chosen.flatMap(_.rules).toSeq
  }

  /** §2.2.3 pattern match: prefix semantics with `*` (any run) and a
    * trailing `$` anchoring the end of the path. */
  def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    if (pat.isEmpty) return !anchored || path.isEmpty // "" is an empty prefix
    var pi = 0
    var si = 0
    var starPi = -1
    var starSi = -1
    while (si < path.length) {
      // '*' is ALWAYS a wildcard (§2.2.3) — test it before the literal
      // branch, else a literal '*' in the path consumes the pattern's '*'
      // without recording a backtrack point (e.g. '/p*df' vs '/p*xdf')
      if (pi < pat.length && pat.charAt(pi) == '*') { starPi = pi; pi += 1; starSi = si }
      else if (pi < pat.length && (pat.charAt(pi) == path.charAt(si))) { pi += 1; si += 1 }
      else if (starPi >= 0) { pi = starPi + 1; starSi += 1; si = starSi }
      else return false
      if (pi == pat.length && !anchored) return true // prefix satisfied
    }
    while (pi < pat.length && pat.charAt(pi) == '*') pi += 1
    pi == pat.length // (anchored: must also have consumed the path)
  }

  /** (allowed, winning pattern): longest pattern wins, Allow wins ties,
    * no match → (true, ""). */
  def isAllowed(rules: Seq[Rule], path: String): (Boolean, String) =
    isAllowedT(rules.map(r => (r.pattern, r.allow)), path)

  /** Tuple form — the broadcast-join hot path evaluates the host's rule
    * list AS SHIPPED (no per-row Rule re-wrapping in the inner loop). */
  def isAllowedT(rules: Seq[(String, Boolean)], path: String): (Boolean, String) = {
    var bestLen = -1
    var bestAllow = true
    var bestPat = ""
    for ((pattern, allow) <- rules if matches(pattern, path)) {
      val len = pattern.length
      if (len > bestLen || (len == bestLen && allow && !bestAllow)) {
        bestLen = len; bestAllow = allow; bestPat = pattern
      }
    }
    if (bestLen < 0) (true, "") else (bestAllow, bestPat)
  }

  final case class UrlVerdict(host: String, path: String, allowed: Boolean,
                              matched_rule: String, has_robots: Boolean)

  // shared parse-once-per-host rule-set frame for the two admission APIs.
  // One row per host is ENFORCED, not assumed: a duplicate host row in the
  // robots frame would otherwise multiply every joined fact row (row
  // duplication, not just a wrong verdict). Duplicate bodies resolve by
  // RULE-SET UNION — every observed rule applies, the same way RFC 9309
  // §2.2.1 merges multiple matching groups WITHIN one file. Set union is
  // associative/commutative (reduce order and task retries cannot flip
  // verdicts) and genuinely fail-closed: no permissive body can shadow
  // another body's Disallow (a count- or length-based "most restrictive
  // body wins" pick fails open whenever the permissive body happens to
  // carry more rules — e.g. `Disallow: /tmp` + `Disallow: /var` outvoting
  // `Disallow: /`). The evaluator (longest match, Allow wins length ties)
  // is order-independent, so the union's sort is only canonicalization.
  // A host whose only bodies are null parses as the empty file
  // (allow-all).
  private def parsedRules(robots: DataFrame,
                          agent: String): Dataset[(String, Seq[(String, Boolean)])] = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col("host"), col("robots_txt"))
      .as[(String, String)]
      .map { case (h, body) => (h, parse(if (body == null) "" else body, agent)
        .map(r => (r.pattern, r.allow))) }
      .groupByKey(_._1)
      .reduceGroups { (a, b) => (a._1, (a._2 ++ b._2).distinct) }
      .map { case (h, (_, rules)) => (h, rules.distinct.sorted) }
  }

  /** Admission verdict per URL row: `urls(host, path)` against
    * `robots(host, robots_txt)`. Hosts without a robots.txt row are
    * allow-all with `has_robots = false`. The robots side parses once per
    * HOST and broadcasts (robots bodies are small and per-host unique by
    * contract); at 100 TB the fact side never re-parses a body. */
  def filterUrls(urls: DataFrame, robots: DataFrame,
                 agent: String = "*"): Dataset[UrlVerdict] = {
    val spark = urls.sparkSession
    import spark.implicits._
    val parsed = parsedRules(robots, agent).toDF("host", "rules")
    urls.select(col("host"), col("path"))
      .join(broadcast(parsed), Seq("host"), "left")
      .as[(String, String, Option[Seq[(String, Boolean)]])]
      .map { case (h, p, rules) =>
        // a null host or path is unfetchable and unmatchable — fail
        // closed (allowed=false) instead of NPEing in the matcher or
        // silently riding the no-robots-row allow-all arm (a null host
        // matches no robots row by SQL null equality, which is absence
        // of EVIDENCE, not absence of rules)
        if (h == null || p == null)
          UrlVerdict(h, p, allowed = false, "", rules.isDefined)
        else rules match {
          case None => UrlVerdict(h, p, allowed = true, "", has_robots = false)
          case Some(rs) =>
            val (ok, pat) = isAllowedT(rs, p)
            UrlVerdict(h, p, ok, pat, has_robots = true)
        }
      }
  }

  /** Row-local admission on an arbitrary fact frame: broadcast-join the
    * parsed per-host rule sets onto `fact` and keep only allowed rows
    * (hosts without a robots row are allow-all, RFC 9309 §2.3.1.4).
    * Unlike deriving a [[filterUrls]] verdict frame from the same
    * lineage and joining it back — which executes the fact's lineage
    * TWICE and shuffles on (host, path) — this is ONE linear plan: the
    * fact executes once and admission is a per-row filter behind a
    * broadcast hash join, the shape that holds at crawl scale. */
  def admitted(fact: DataFrame, robots: DataFrame,
               hostCol: String, pathCol: String,
               agent: String = "*"): DataFrame = {
    val spark = fact.sparkSession
    import spark.implicits._
    val parsed = parsedRules(robots, agent).toDF(hostCol, "__robots_rules")
    val joined = fact.join(broadcast(parsed), Seq(hostCol), "left")
    val schema = joined.schema
    val rulesIdx = schema.fieldIndex("__robots_rules")
    val pathIdx = schema.fieldIndex(pathCol)
    val hostIdx = schema.fieldIndex(hostCol)
    joined.mapPartitions { it =>
      it.filter { row =>
        // a null host or path is unfetchable — fail closed (drop the
        // row): the matcher would NPE on a null path, and a null host
        // rides the allow-all arm only because SQL null equality matched
        // no robots row, which proves nothing
        !row.isNullAt(pathIdx) && !row.isNullAt(hostIdx) &&
          (row.isNullAt(rulesIdx) || { // no robots.txt → allow-all
            val rs = row.getSeq[org.apache.spark.sql.Row](rulesIdx)
              .map(r => (r.getString(0), r.getBoolean(1)))
            isAllowedT(rs, row.getString(pathIdx))._1
          })
      }
    }(org.apache.spark.sql.Encoders.row(schema))
      .drop("__robots_rules")
  }
}
