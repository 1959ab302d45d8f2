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

  /** The parsed public-suffix snapshot, by PSL rule class.
    *
    * @param lit2  two-label literal rules (`co.uk`)
    * @param lit3  three-label literal rules (`k12.ma.us`)
    * @param wild2 TLDs of `*.X` rules (stores `X`, e.g. `ck`)
    * @param wild3 bases of `*.Y.X` rules (stores `Y.X`, e.g. `kawasaki.jp`)
    * @param exc2  two-label exception hosts (`www.ck` from `!www.ck`)
    * @param exc3  three-label exception hosts (`city.kawasaki.jp`)
    */
  final case class PslRules(lit2: Seq[String], lit3: Seq[String],
                            wild2: Seq[String], wild3: Seq[String],
                            exc2: Seq[String], exc3: Seq[String])

  /** Public-suffix rules (publicsuffix.org ICANN-section syntax), loaded
    * at plan-build time from the bundled snapshot resource
    * `graft/public_suffix_snapshot.txt` (~900 rules: two-label literals
    * across ~80 ccTLDs, the US `k12/cc/lib.<state>.us` three-label trees,
    * the `*.bd`-family wildcard ccTLDs, the Japanese ordinance-city
    * `*.<city>.jp` wildcards, and the `!www.ck` / `!city.<city>.jp`
    * exceptions). Every lookup in [[registeredDomain]] is a set MEMBERSHIP
    * over a candidate suffix, which Catalyst compiles to an `InSet` O(1)
    * hash-set probe inside codegen at any list size (the sets ship to
    * executors inside the generated class, the codegen analog of a
    * broadcast map — no join, no shuffle, still row-local in the scan
    * stage). The snapshot also carries a curated PRIVATE-section block
    * (`github.io`-style hosting platforms — plain literal rules, no code
    * path of their own). Out of scope, by documented choice: 4+-label
    * rules (`pvt.k12.ma.us`-style) — hosts under those resolve by the
    * longest in-scope rule instead. Refreshing the snapshot = replacing
    * the resource file; rule classes are recognized from the syntax, no
    * code changes. */
  val publicSuffixRules: PslRules = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_snapshot.txt")
    require(in != null, "missing resource graft/public_suffix_snapshot.txt")
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toVector
      finally in.close()
    def labels(s: String) = s.count(_ == '.') + 1
    val (excLines, rest) = lines.partition(_.startsWith("!"))
    val (wildLines, litLines) = rest.partition(_.startsWith("*."))
    val exc = excLines.map(_.stripPrefix("!"))
    val wild = wildLines.map(_.stripPrefix("*."))
    PslRules(
      lit2 = litLines.filter(labels(_) == 2),
      lit3 = litLines.filter(labels(_) == 3),
      wild2 = wild.filter(labels(_) == 1),
      wild3 = wild.filter(labels(_) == 2),
      exc2 = exc.filter(labels(_) == 2),
      exc3 = exc.filter(labels(_) == 3))
  }

  /** Registered domain under the PSL algorithm: the public suffix of the
    * prevailing rule plus one more label. Precedence follows the PSL spec
    * — an exception rule beats everything (its suffix is the rule minus
    * the leading label, so the exception host itself IS the registered
    * domain), otherwise the longest matching rule wins (three-label
    * literal / `*.Y.X` wildcard before two-label literal / `*.X` wildcard
    * before the default `X` rule). A host that IS a bare suffix (no extra
    * label to take) falls back to itself, and a single-label host yields
    * '' — both matching the prior behavior. Pure row-local codegen: four
    * anchored regexp_extracts + InSet probes, no shuffle, no Expand. */
  def registeredDomain(host: Column, rules: PslRules = publicSuffixRules): Column = {
    def inSet(c: Column, s: Seq[String]): Column =
      if (s.isEmpty) lit(false) else c.isin(s: _*)
    val last1 = regexp_extract(host, "([^.]+)$", 1)
    val last2 = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val last3 = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    val last4 = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+\\.[^.]+)$", 1)
    when(inSet(last3, rules.exc3), last3)
      .when(inSet(last2, rules.exc2), last2)
      // wild3 needs last3 non-empty: a bare 2-label host equal to a
      // `*.Y.X` BASE (host = kawasaki.jp itself) is not matched by the
      // wildcard (the rule is longer than the host) and falls through to
      // the default rule
      .when(inSet(last3, rules.lit3) ||
          (inSet(last2, rules.wild3) && last3 =!= ""),
        when(last4 =!= "", last4).otherwise(last3))
      .when(inSet(last2, rules.lit2) || inSet(last1, rules.wild2),
        when(last3 =!= "", last3).otherwise(last2))
      .otherwise(last2)
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
  /** PageRank power iteration in exact integer micro-units — link-graph
    * authority scoring, the canonical iterative join+aggregate of web-scale
    * corpora (crawl frontier prioritization, quality priors for training-
    * data selection).
    *
    * All arithmetic is BIGINT in 1e-9 units with integer division, so the
    * result is bit-identical under ANY partitioning/fold order (BIGINT sums
    * commute exactly; doubles would drift by partition count) and exactly
    * replayable by an unrolled SQL oracle. Per iteration, each node sends
    * `rank_e9 div out_degree` along every out-edge and re-forms as
    * `(15·base + 85·inflow) div 100` (damping 0.85, teleport base =
    * 1e9 div N); mass from dangling nodes leaks (the documented variant —
    * no dense teleport redistribution term), nodes with no in-edges keep
    * the teleport term via the left join.
    *
    * Scale shape: the edge list (src, dst, odeg) is the standing structure
    * — built ONCE (one groupBy + one join) and persisted; every iteration
    * is then exactly one join shuffled on src=id and one aggregate shuffled
    * on dst, both O(E), no driver-side state beyond the node count. On a
    * cluster the edge table would be written bucketed by src so the
    * per-iteration join reuses its partitioning (the mart_bucketed_join
    * technique); hot dsts (popular pages) are plain aggregate skew, which
    * AQE splits. Iteration count is a fixed small constant (rank deltas
    * shrink geometrically), so total cost is k·O(E) — no convergence scan.
    *
    * @param edges (src, dst) BIGINT pairs; multi-edges count multiply
    * @param nodes one `id` BIGINT column, the rank domain
    * @return (id, rank_e9) — Σ rank_e9 ≤ 1e9, < only by leak/rounding
    */
  def pageRankE9(edges: org.apache.spark.sql.DataFrame,
                 nodes: org.apache.spark.sql.DataFrame,
                 iterations: Int): org.apache.spark.sql.DataFrame = {
    require(iterations >= 1 && iterations <= 50, "iterations in [1, 50]")
    val n = nodes.count()
    require(n > 0, "empty node set")
    val base = 1000000000L / n
    // standing edge structure: out-degree attached once, persisted for the
    // k iteration joins (released via CacheRegistry like the dedup marts)
    val odeg = edges.groupBy("src").agg(count(lit(1)).as("odeg"))
    val edgesW = graft.CacheRegistry.register(
      edges.join(odeg, "src")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val ids = nodes.select(col("id"))
    var ranks = ids.withColumn("rank_e9", lit(base))
    (1 to iterations).foreach { i =>
      val inflow = edgesW.join(ranks, col("src") === col("id"))
        .select(col("dst"), expr("rank_e9 div odeg").as("c"))
        .groupBy("dst").agg(sum("c").as("inflow"))
      ranks = ids.join(inflow, col("id") === col("dst"), "left")
        .select(col("id"),
          expr(s"(${15L * base} + 85 * coalesce(inflow, 0)) div 100")
            .as("rank_e9"))
      // production PageRank runs 20-40 iterations; unbounded lineage makes
      // analysis/planning time itself grow per round. Truncate every 8
      // rounds (same recipe as the CC loop) — never reached by the
      // 3-iteration gate row, exercised by the 10-iteration spec.
      if (i % 8 == 0 && i < iterations) ranks = ranks.localCheckpoint(true)
    }
    ranks
  }

  private def afterPrefix(s: Column, prefix: Column): Column =
    s.substr(length(prefix) + 1, length(s))
}
