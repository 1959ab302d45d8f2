package graft

/** Silence known-benign per-plan warnings in the batch mains.
  *
  * A full Bench/Verify run emits ~96 `WindowExec: No Partition Defined for
  * Window operation!` warnings. Every one comes from a bins/dims/ranking-
  * sized frame (quantile legends, score bins, top-k fusions) — the
  * corpus-sized windows ARE partitioned, and PlanAuditSpec pins exactly
  * that, so the warning carries no signal here while burying real
  * regressions in the log. Raised to ERROR in the mains only; test suites
  * run with the default config and still see it.
  */
object LogHygiene {
  def quietKnownBenign(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
}
