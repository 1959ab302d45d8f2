package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI ratio assertions over [[ScaleProbe]] — the 10×-scale evidence used to
  * live only in README notes and commit messages; here a scale regression
  * (an accidental all-pairs join, a window that went corpus-global, a
  * driver-side loop that grew with the input) fails a test, not a vibe.
  *
  * Runs at sf0.001 where a 10× replication is cheap. Ceilings are set for
  * signal, not precision: at this scale fixed overhead dominates, so a
  * scale-linear operator lands well under 13× (typically 2–8×) while a
  * quadratic regression does ~100× the work and blows far past it.
  * Connected components is pinned tighter: the probe graph has fixed
  * diameter, so rounds stay constant and cost must track edges (~linear,
  * measured 1.2× at sf0.1) — a ceiling of 4× leaves noise headroom while
  * still catching a rounds-grow-with-n or state-not-shrinking regression.
  */
class ScaleProbeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val timings: Map[String, ScaleProbe.Timing] =
    // configure() sets nanosAsLong — without it a TIMESTAMP(NANOS)
    // testdata generation fails the events scan (order-dependently, when
    // no earlier suite has configured the shared session)
    ScaleProbe.run(SparkEntry.configure(spark), sf, mult = 10)
      .map(t => t.op -> t).toMap

  private val linearCeiling = 13.0
  private val ccCeiling = 4.0

  test("scale probe: flagship operators stay ~linear at 10x (ceiling 13x)") {
    val linear = timings.keySet - "connected_components"
    val over = linear.filter(op => timings(op).ratio > linearCeiling)
    assert(over.isEmpty, over.map { op =>
      val t = timings(op)
      f"$op: ${t.t1}%.2fs -> ${t.tN}%.2fs (${t.ratio}%.1fx)"
    }.mkString("; "))
  }

  test("scale probe: connected components cost tracks edges, not rounds " +
    "(fixed-diameter graph, ceiling 4x)") {
    val t = timings("connected_components")
    assert(t.ratio <= ccCeiling,
      f"CC: ${t.t1}%.2fs -> ${t.tN}%.2fs (${t.ratio}%.1fx) exceeds $ccCeiling%.1fx")
  }

  test("scale probe: memory footprint scales like the data, not worse " +
    "(CC + LSH, ceiling 13x over a 1 MiB floor)") {
    // the regression time alone can't see: an operator that stays
    // time-linear by CACHING corpus-super-linear state. State for both of
    // these is data-proportional by design (active subgraph / banded
    // shingle projections), so 10x data may cost ~10x memory — never ~100x
    for (op <- Seq("connected_components", "dedup_minhash_lsh")) {
      val t = timings(op)
      assert(t.memRatio <= linearCeiling,
        f"$op memory: ${t.mem1} -> ${t.memN} bytes " +
          f"(${t.memRatio}%.1fx) exceeds $linearCeiling%.1fx")
    }
  }

  test("scale probe: no operator spills at 10x (state mis-sizing shows as " +
    "spill long before it shows as wall time)") {
    // zero-spill is only an ENGINE claim when the box has the memory to
    // honor it: on a constrained JVM a fine, data-proportional operator can
    // legitimately spill. Below the heap floor, require instead that spill
    // stays proportional (≤8× the 1× spill over a 64 MiB floor) — state
    // super-linearity still fails, environment pressure doesn't.
    val spilled = timings.values.filter(_.spillN > 0)
    if (Runtime.getRuntime.maxMemory >= (4L << 30)) {
      assert(spilled.isEmpty, spilled.map(t =>
        s"${t.op}: ${t.spillN} bytes spilled").mkString("; "))
    } else {
      val bad = spilled.filter(t => t.spillN > 8L * math.max(t.spill1, 64L << 20))
      assert(bad.isEmpty, bad.map(t =>
        s"${t.op}: spill ${t.spill1} -> ${t.spillN} bytes (super-proportional)")
        .mkString("; "))
    }
  }
}
