package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's in-loop degradation canary verdict (round-15): a fixed
  * tiny Spark query sampled through the query loop; any sample > 3× the
  * series minimum flags the artifact. Pure-function tests here — the
  * synthetic-stall check the round-14 verdict asked for, without needing
  * taskset/stress in CI. */
class BenchSpec extends AnyFunSuite {

  test("isDegraded: flat series, mild jitter, and single samples are clean") {
    assert(!Bench.isDegraded(Nil))
    assert(!Bench.isDegraded(Seq(0.12)))
    assert(!Bench.isDegraded(Seq(0.12, 0.13, 0.11, 0.12)))
    assert(!Bench.isDegraded(Seq(0.10, 0.29))) // 2.9x: inside the band
  }

  test("isDegraded: a heavy-tail stall phase mid-series flags the artifact " +
    "(the BENCH_r14 failure mode: probes normal, loop rows 10-100x)") {
    assert(Bench.isDegraded(Seq(0.12, 0.13, 1.9, 0.12))) // transient stall
    assert(Bench.isDegraded(Seq(0.12, 0.12, 0.12, 3.5, 4.1))) // tail phase
    // degradation from sample 0 (whole run in a bad window) still flags
    // as long as ONE sample saw the healthy floor
    assert(Bench.isDegraded(Seq(1.5, 1.6, 1.4, 0.12)))
  }

  test("isDegraded: failed/invalid samples are excluded from the ratio but " +
    "ALWAYS flag — a canary that couldn't run can't vouch for the window") {
    // the -1 failure sentinel must not enter the min (a 5ms time-to-throw
    // would make every healthy sample look >3x the floor) …
    assert(Bench.isDegraded(Seq(-1.0, 0.12, 0.13)))
    assert(Bench.isDegraded(Seq(0.0, 0.12, 0.13)))
    assert(Bench.isDegraded(Seq(Double.PositiveInfinity, 0.12, 0.13)))
    // … and flagging is from the sentinel itself, not a poisoned ratio:
    // the same healthy spread stays clean without the failure
    assert(!Bench.isDegraded(Seq(0.12, 0.13)))
  }
}
