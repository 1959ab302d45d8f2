package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.serve.Serve

/** Table-driven golden tests for the two multi-branch ports SURVEY §7.4
  * flags as silent-rot risks: the legend quantile-break algorithm
  * (api/app/main.py:255-314) and the display-label mojibake repair
  * (main.py:628-657). Expected values computed by running the reference's
  * Python logic on each input (tools/golden generator).
  */
class ServeGoldenSpec extends AnyFunSuite {

  private def check(in: Seq[Long], breaks: Seq[Double], domain: (Double, Double),
                    method: String, zeroClass: Boolean): Unit = {
    val l = Serve.computeBreaks(in)
    assert(l.breaks == breaks, s"breaks for $in")
    assert(l.domain == domain, s"domain for $in")
    assert(l.method == method, s"method for $in")
    assert(l.zeroClass == zeroClass, s"zero_class for $in")
  }

  test("compute_breaks golden vectors (reference main.py:255-314)") {
    check(Seq(), Seq(0.0, 1.0), (0.0, 0.0), "equal", zeroClass = true)
    check(Seq(5), Seq(5.0, 6.0), (5.0, 5.0), "equal", zeroClass = false)
    check(Seq(0, 0, 0), Seq(0.0, 1.0), (0.0, 0.0), "equal", zeroClass = false)
    check(Seq(0, 5), Seq(5.0, 6.0), (0.0, 5.0), "equal", zeroClass = true)
    check(Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 10),
      Seq(1.0, 3.0, 5.0, 6.0, 8.0, 10.0), (1.0, 10.0), "quantile", zeroClass = false)
    check(Seq(0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10),
      Seq(1.0, 3.0, 5.0, 6.0, 8.0, 10.0), (0.0, 10.0), "quantile", zeroClass = true)
    // non-increasing quantiles -> equal-interval fallback
    check(Seq(1, 1, 1, 1, 1, 1, 2), Seq(1.0, 1.5, 2.0), (1.0, 2.0), "equal", zeroClass = false)
    check(Seq(0, 1, 1, 1, 1, 1, 1, 2), Seq(1.0, 1.5, 2.0), (0.0, 2.0), "equal", zeroClass = true)
    // zero class + single positive value
    check(Seq(0, 7, 7, 7), Seq(7.0, 8.0), (0.0, 7.0), "equal", zeroClass = true)
    check(Seq(3, 3, 3), Seq(3.0, 4.0), (3.0, 3.0), "equal", zeroClass = false)
    // negatives count as zero-or-less
    check(Seq(-2, 0, 4, 9), Seq(4.0, 6.5, 9.0), (-2.0, 9.0), "equal", zeroClass = true)
    check(Seq(10, 1000, 5, 3, 88, 4, 17, 2, 960, 41),
      Seq(2.0, 4.0, 10.0, 17.0, 88.0, 1000.0), (2.0, 1000.0), "quantile", zeroClass = false)
    check(Seq(0, 10, 1000, 5, 3, 88, 4, 17, 2, 960, 41),
      Seq(2.0, 4.0, 10.0, 17.0, 88.0, 1000.0), (0.0, 1000.0), "quantile", zeroClass = true)
    check(Seq(1, 2), Seq(1.0, 1.5, 2.0), (1.0, 2.0), "equal", zeroClass = false)
    check(Seq(0, 1, 2), Seq(1.0, 1.5, 2.0), (0.0, 2.0), "equal", zeroClass = true)
    // heavy ties: quantiles collapse -> 2-class equal fallback
    check(Seq.fill(50)(100L) ++ Seq.fill(3)(200L),
      Seq(100.0, 150.0, 200.0), (100.0, 200.0), "equal", zeroClass = false)
  }

  test("legend monotonicity check mirrors /api/validate (main.py:1792-1820)") {
    assert(Serve.legendMonotonic(Serve.computeBreaks(Seq(1, 5, 9, 14, 200))))
    assert(Serve.legendMonotonic(Serve.computeBreaks(Seq())))
  }

  test("_clean_display_label golden vectors (reference main.py:628-657)") {
    val cases = Seq(
      "" -> "",
      "  " -> "",
      "Brasília" -> "Brasília",
      "  Sao Paulo  " -> "Sao Paulo",
      "São Paulo" -> "São Paulo", // clean utf-8 passes through
      "SÃ£o Paulo" -> "São Paulo", // latin1-read utf-8 recodes
      "S�o Paulo" -> "São Paulo", // replacement-char patch
      "s�o jo�o" -> "são joao",
      "Sï¿½o Luis" -> "São Luis", // mojibake triplet patch
      "Ceará" -> "Ceará",
      "CearÃ¡" -> "Ceará",
      "Amap�" -> "Amapa", // unpatchable -> degrade to 'a'
      "��" -> "aa",
      "ABC" -> "ABC",
      // recode would reintroduce U+FFFD -> rejected; triplet degraded instead
      "CafÃ© ï¿½ x" -> "CafÃ© a x",
      "Ã" -> "Ã" // truncated utf-8 -> UnicodeError path keeps input
    )
    cases.foreach { case (in, want) =>
      assert(TextFunctions.cleanDisplayLabel(in) == want,
        s"clean_display_label(${in.map(c => f"\\u${c.toInt}%04x").mkString}) " +
          s"= ${TextFunctions.cleanDisplayLabel(in)}, want $want")
    }
  }

  test("scrubPii: golden redactions for every class, clean text untouched") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      "mail me at jo.doe+x@sub.example.org today"
        -> "mail me at <EMAIL> today",
      "server 10.0.255.3 rebooted" -> "server <IP> rebooted",
      "card 4111 1111 1111 1111 expires" -> "card <CC>expires",
      "call +55 (11) 91234-5678 now" -> "call <PHONE> now",
      "all: a@b.co 1.2.3.4 4111-1111-1111-1111 then (555) 010-4242"
        -> "all: <EMAIL> <IP> <CC>then <PHONE>",
      "no pii here just words" -> "no pii here just words",
      "" -> "")
    val got = cases.map(_._1).toDF("t")
      .select(TextFunctions.scrubPii(col("t")).as("s"))
      .as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("scrubPiiWithCounts: per-class counts come from the same single pass") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val row = Seq("a@b.co c@d.org 1.2.3.4 4111-1111-1111-1111 (555) 010-4242")
      .toDF("t")
      .select(TextFunctions.scrubPiiWithCounts(col("t")).as("r"))
      .select("r.clean_text", "r.n_emails", "r.n_ips", "r.n_ccs", "r.n_phones")
      .head()
    assert(row.getString(0) === "<EMAIL> <EMAIL> <IP> <CC> <PHONE>",
      s"clean: ${row.getString(0)}")
    assert(row.getLong(1) === 2L, s"emails: $row")
    assert(row.getLong(2) === 1L, s"ips: $row")
    assert(row.getLong(3) === 1L, s"ccs: $row")
    assert(row.getLong(4) === 1L, s"phones: $row")
    // null text → null struct, not a crash
    val n = Seq((1L, null: String)).toDF("id", "t")
      .select(TextFunctions.scrubPiiWithCounts(col("t")).as("r")).head()
    assert(n.isNullAt(0), s"null text must give null struct: $n")
  }
}
