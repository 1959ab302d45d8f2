package graft.functions

import java.text.Normalizer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale corpus pipelines: language ID,
  * quality scoring, token counting, fingerprinting, plus the reference's
  * label-cleanup semantics (NFKD fold + mojibake repair,
  * api/app/main.py:624-657).
  *
  * Everything here is row-local (no shuffle); the heuristics are pure
  * functions so they stay inside whole-stage codegen where built-ins are used
  * and cost one virtual call where a UDF is unavoidable.
  */
object TextFunctions {

  // ----------------------------------------------------------- language id

  /** Tiny stopword inventories for an n-gram-free language-ID heuristic.
    * Deterministic and dependency-free; scores = stopword hit ratio.
    */
  private[graft] val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "a", "of", "and", "to", "in", "is", "that", "it", "for", "on", "with", "as", "was", "at"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "por", "con", "para", "es", "del"),
    "pt" -> Set("o", "a", "de", "que", "e", "em", "um", "uma", "os", "as", "por", "com", "para", "não", "do"),
    "fr" -> Set("le", "la", "de", "que", "et", "en", "un", "une", "les", "des", "pour", "avec", "est", "du", "ne"),
    "de" -> Set("der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist", "des", "im", "nicht", "ein", "eine"),
  )

  /** Deterministic tie-break order (ties above the 0.05 floor go to the
    * earliest language here — pinned explicitly rather than leaking the
    * JVM's HashMap iteration order into results). */
  private val langOrder = Seq("en", "es", "pt", "fr", "de")

  def detectLanguage(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    // CJK codepoint share decides zh before any latin stopword voting
    var cjk = 0; var letters = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (Character.isLetter(c)) {
        letters += 1
        val b = Character.UnicodeBlock.of(c)
        if (b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
            b == Character.UnicodeBlock.HIRAGANA || b == Character.UnicodeBlock.KATAKANA) cjk += 1
      }
      i += 1
    }
    if (letters > 0 && cjk.toDouble / letters > 0.3) return "zh"
    val toks = text.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty)
    if (toks.isEmpty) return "und"
    val best = langOrder.iterator.map { lang =>
      lang -> toks.count(stopwords(lang).contains).toDouble / toks.length
    }.maxByOption(_._2) // maxBy keeps the FIRST max → langOrder breaks ties
    best match {
      case Some((lang, score)) if score > 0.05 => lang
      case _ => "und"
    }
  }

  val detectLanguageUdf = udf((t: String) => detectLanguage(t))

  // --------------------------------------------------------- quality score

  /** Composite document-quality heuristics, all expressible as Spark
    * built-ins so they survive whole-stage codegen. Returns the component
    * columns; callers combine them. Ratios are guarded against empty text.
    */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val len = length(text)
    val nonEmpty = len > 0
    val words = split(trim(text), "\\s+")
    val nWords = when(length(trim(text)) === 0, 0).otherwise(size(words))
    val alphaLen = length(regexp_replace(text, "[^\\p{L}]", ""))
    val punctLen = length(regexp_replace(text, "[\\p{L}\\p{N}\\s]", ""))
    val upperLen = length(regexp_replace(text, "[^A-Z]", ""))
    Seq(
      "n_chars_q" -> len.cast("long"),
      "n_words" -> nWords.cast("long"),
      "mean_word_len" -> when(nWords > 0, round(alphaLen.cast("double") / nWords, 4)).otherwise(lit(0.0)),
      "alpha_ratio" -> when(nonEmpty, round(alphaLen.cast("double") / len, 4)).otherwise(lit(0.0)),
      "punct_ratio" -> when(nonEmpty, round(punctLen.cast("double") / len, 4)).otherwise(lit(0.0)),
      "upper_ratio" -> when(nonEmpty, round(upperLen.cast("double") / len, 4)).otherwise(lit(0.0)),
    )
  }

  /** Stopword ratio against the English inventory (codegen-friendly:
    * array built-ins, no UDF). */
  def stopwordRatio(text: Column): Column = {
    val toks = filter(split(lower(text), "[^\\p{L}]+"), t => length(t) > 0)
    // membership via isInCollection (compiles to a hashed InSet), not
    // array_contains over a CreateArray free variable — the latter would
    // rebuild the 15-element array once per token in the HOF path
    val sw = stopwords("en").toSeq.sorted
    when(size(toks) > 0,
      round(size(filter(toks, t => t.isInCollection(sw))).cast("double") / size(toks), 4))
      .otherwise(lit(0.0))
  }

  // -------------------------------------------------------- token counting

  /** Whitespace token count — built-ins only. */
  def tokenCountWs(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(split(trim(text), "\\s+"))).cast("long")

  /** BPE-ish token estimate: split into word pieces / numbers / punctuation
    * runs, the pre-tokenization grammar most BPE vocabularies assume. */
  private val bpePattern = "\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]+".r

  def tokenCountBpeish(text: String): Long =
    if (text == null) 0L else bpePattern.findAllIn(text).length.toLong

  val tokenCountBpeishUdf = udf((t: String) => tokenCountBpeish(t))

  // ------------------------------------------------------ repetition filters

  /** Gopher-style within-document repetition signals (Rae et al. 2021 §A1.1
    * use these to drop boilerplate/spam): duplicate-word fraction and the
    * share of all bigrams taken by the single most frequent bigram. Pure
    * array built-ins — row-local, codegen'd, no shuffle; the per-row
    * distinct×filter count is quadratic in DISTINCT bigrams, bounded by
    * document length (fine for the ≤ thousands-of-words docs this filter
    * targets; chunk longer docs upstream).
    */
  def repetitionMetrics(text: Column): Seq[(String, Column)] = {
    // one primitive-typed kernel pass (word-id interning + packed-long
    // bigram sort) — value-identical to the array-builtin formulation it
    // replaced, see RepetitionKernel; the three getFields collapse to one
    // kernel call under codegen subexpression elimination
    val r = graft.plans.RepetitionStatsExpr(text)
    Seq(
      "n_words_r" -> r.getField("n_words_r"),
      "dup_word_ratio" -> r.getField("dup_word_ratio"),
      "top_bigram_share" -> r.getField("top_bigram_share"))
  }

  // --------------------------------------------------------------- PII scrub

  /** Redaction classes for the PII-removal pass a pre-training pipeline
    * runs over raw text. Priority: the single-pass alternation kernel
    * (PiiScrubExpr) takes the LEFTMOST match first and breaks same-start
    * ties by this class order — emails before IPs before card runs before
    * phone-ish sequences (so "1.2.3.4@x.com" redacts as one email, not an
    * IP). Unlike the pre-round-6 staged fold, an earlier-STARTING match of
    * a later class can consume a later-starting higher-priority one
    * ("tel +1 192.168.0.1" is one <PHONE>, the dotted quad included) —
    * leftmost-first is the one-pass semantics, applied identically by the
    * Spark kernel and the DuckDB oracle. Patterns stay in the Java-regex ∩
    * RE2 common subset (char classes, (?:), bounded repeats, \b — no
    * backrefs/lookaround) so the IDENTICAL strings drive both engines.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "<EMAIL>" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "<IP>" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "<CC>" -> "\\b(?:\\d[ -]?){13,16}\\b",
    "<PHONE>" -> "[+(]?\\d[\\d().\\s-]{6,}\\d")

  /** Count-column name for a redaction token — "<EMAIL>" → "n_emails".
    * Single source of truth shared by the text_pii_scrub query's Spark
    * side and its generated oracle SQL. */
  def piiCountName(tok: String): String =
    "n_" + tok.replaceAll("[<>]", "").toLowerCase + "s"

  /** Replace every PII class occurrence with its token, and count each
    * class, in ONE pass: a single compiled alternation of [[piiPatterns]]
    * walked once per document by a native codegen expression (was a
    * 4-replace + 4-count regexp fold = 8 traversals). Returns
    * struct(clean_text, n_emails, n_ips, n_ccs, n_phones). */
  def scrubPiiWithCounts(text: Column): Column =
    graft.plans.PiiScrubExpr(text)

  /** Scrubbed text only — same single-pass kernel. */
  def scrubPii(text: Column): Column =
    scrubPiiWithCounts(text).getField("clean_text")

  /** HTML → text in ONE pass (tags stripped and counted, script/style
    * content dropped, comments vanish, quoted-attribute `>` honored,
    * core + numeric character references decoded, whitespace-collapsed)
    * as a native codegen expression — the crawl-to-corpus step every
    * quality/dedup operator downstream assumes has already run. Returns
    * struct(text, n_tags, n_links). */
  def htmlExtract(html: Column): Column =
    graft.plans.HtmlExtractExpr(html)

  // --------------------------------------------------------- fingerprinting

  /** 64-bit polynomial rolling hash over the whitespace-normalized,
    * lowercased text — a deterministic document fingerprint for exact-dup
    * detection where md5(text) is too strict (case/whitespace variants).
    */
  def fingerprint64(text: String): Long = {
    if (text == null) return 0L
    val norm = text.toLowerCase.trim.replaceAll("\\s+", " ")
    var h = 1125899906842597L // prime
    var i = 0
    while (i < norm.length) { h = 31 * h + norm.charAt(i); i += 1 }
    h
  }

  val fingerprint64Udf = udf((t: String) => fingerprint64(t))

  // ------------------------------------------------- label cleanup (serve)

  /** Mojibake repair: if a string decodes "better" after a latin1↔utf8
    * round-trip, take the repaired form (api/app/main.py:628-657 does the
    * same double-encode probe).
    */
  def fixMojibake(s: String): String = {
    if (s == null) return null
    val suspicious = s.exists(c => c == 'Ã' || c == 'Â' || c == '�')
    if (!suspicious) return s
    try {
      val repaired = new String(s.getBytes(StandardCharsets.ISO_8859_1), StandardCharsets.UTF_8)
      if (repaired.contains('�')) s else repaired
    } catch { case _: Exception => s }
  }

  /** NFKD fold to ascii (diacritic strip) — the reference's label
    * normalization for matching user filters (api/app/main.py:624-627). */
  def asciiFold(s: String): String =
    if (s == null) null
    else Normalizer.normalize(s, Normalizer.Form.NFKD).replaceAll("\\p{M}+", "")

  /** `_ascii_label` (api/app/main.py:624-625): NFKD then drop every
    * non-ascii codepoint (encode('ascii','ignore')). */
  def asciiLabel(s: String): String =
    Normalizer.normalize(s, Normalizer.Form.NFKD).filter(_ < 128)

  /** Exact port of `_clean_display_label` (api/app/main.py:628-657):
    *  1. strip; empty stays empty;
    *  2. latin1→utf-8 recode probe (strict both ways, as Python raises
    *     UnicodeError on any char > U+00FF or invalid utf-8 byte run) —
    *     adopt the recoding only when it changes the string and introduces
    *     no U+FFFD;
    *  3. if replacement chars remain: patch "S�o"→"São" (both cases, both
    *     the single U+FFFD and the "ï¿½" mojibake triplet), then degrade
    *     leftovers to "a", then ascii-fold if still dirty.
    */
  def cleanDisplayLabel(label: String): String = {
    val repl = "�"
    val bad = "ï¿½" // "ï¿½" — U+FFFD's utf-8 bytes read as latin1
    var out = if (label == null) "" else label.strip()
    if (out.isEmpty) return out
    var hasMojibake = out.contains(repl) || out.contains(bad)
    if (out.forall(_ <= 'ÿ')) {
      try {
        val dec = StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        val bytes = out.map(_.toByte).toArray
        val recoded = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
        if (recoded.nonEmpty && recoded != out && !recoded.contains(repl)) {
          out = recoded
          hasMojibake = out.contains(repl) || out.contains(bad)
        }
      } catch { case _: java.nio.charset.CharacterCodingException => }
    }
    if (!hasMojibake) return out
    var p = out
    p = p.replace(s"S${repl}o", "São").replace(s"s${repl}o", "são")
    p = p.replace(s"S${bad}o", "São").replace(s"s${bad}o", "são")
    p = p.replace(repl, "a").replace(bad, "a")
    if (p.contains(repl) || p.contains(bad)) p = asciiLabel(p)
    p
  }

  val cleanLabelUdf = udf((s: String) => if (s == null) null else fixMojibake(s).trim)
  val cleanDisplayLabelUdf = udf((s: String) => cleanDisplayLabel(s))
  val asciiFoldUdf = udf((s: String) => asciiFold(s))

  def register(spark: SparkSession): Unit = {
    spark.udf.register("lang_id", detectLanguageUdf)
    spark.udf.register("token_count_bpeish", tokenCountBpeishUdf)
    spark.udf.register("fingerprint64", fingerprint64Udf)
    spark.udf.register("clean_label", cleanLabelUdf)
    spark.udf.register("clean_display_label", cleanDisplayLabelUdf)
    spark.udf.register("ascii_fold", asciiFoldUdf)
  }
}
