package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's intra-run spread flag (review r15): t06 ran iterations
  * [2.14, 37.16, 30.19] s and was invisible to BOTH existing signals
  * — the min-vs-min regression flag (the min looked healthy) and the
  * slowest-8-by-min spread (2.14 s never ranks). The max/min ratio is
  * the only statistic that sees a warm-slower-than-cold shape.
  */
class BenchFlagSpec extends AnyFunSuite {

  test("a warm-slow entry with a healthy min is flagged") {
    val results = Seq(
      "t06_minhash_lsh" -> Seq(2.14, 37.16, 30.19),
      "q01_pruned_scan" -> Seq(0.20, 0.21, 0.19))
    val flagged = Bench.wideSpreadEntries(results)
    assert(flagged.map(_._1) === Seq("t06_minhash_lsh"))
    assert(flagged.head._3 > 17.0 && flagged.head._3 < 17.5)
  }

  test("uniform spreads and cold-start-only entries stay unflagged") {
    val results = Seq(
      // normal cold-start shape: first iteration slower, under 4x
      "a_q" -> Seq(3.0, 1.0, 1.1),
      // uniformly shifted (a real regression, min-flag territory)
      "b_q" -> Seq(5.0, 5.1, 4.9))
    assert(Bench.wideSpreadEntries(results).isEmpty)
  }

  test("failed iterations and single-iteration runs are excluded") {
    val results = Seq(
      "failed_q" -> Seq(1.0, Double.PositiveInfinity, 1.2),
      "single_q" -> Seq(9.0),
      "zero_q" -> Seq(0.0, 1.0))
    assert(Bench.wideSpreadEntries(results).isEmpty)
  }

  test("worst ratios sort first") {
    val results = Seq(
      "mild" -> Seq(1.0, 4.5),
      "severe" -> Seq(1.0, 20.0))
    assert(Bench.wideSpreadEntries(results).map(_._1) ===
      Seq("severe", "mild"))
  }

  // --- self-healing retake (VERDICT r17 item 4) ---

  private def snap(load100: Long): Bench.JvmSnap =
    Bench.JvmSnap(0, 0, 0, 0, 0, 0, 0, 0, load100)

  test("loadContaminated flags windows whose EITHER end exceeds the " +
      "limit, worst-first; clean windows pass") {
    val limit = Bench.retakeLimit100(32) // 48.0 load -> 4800
    assert(limit === 4800L)
    val entries = Seq(
      "clean" -> (snap(900), snap(1200)),
      "spike_end" -> (snap(1000), snap(6000)),
      "spike_start" -> (snap(9000), snap(800)),
      "at_limit" -> (snap(4800), snap(4800)))
    assert(Bench.loadContaminated(entries, limit) ===
      Seq("spike_start", "spike_end"))
  }

  test("mergeRetakes: mins merge first pass ++ retake " +
      "unconditionally, so an all-failed retake degrades to the " +
      "measured first-pass min instead of nulling the entry") {
    val first = Seq(
      "hot" -> Seq(5.0, 5.2),      // contaminated, retaken
      "calm" -> Seq(1.0, 1.1))     // untouched
    val retake = Map("hot" -> Seq(Double.PositiveInfinity,
      Double.PositiveInfinity))    // retake failed outright
    val (results, _) = Bench.mergeRetakes(first, retake, Set("hot"))
    val mins = results.toMap.map { case (k, ts) => k -> ts.min }
    assert(mins("hot") === 5.0,
      "a failed retake must fall back to the first-pass min")
    assert(mins("calm") === 1.0)
    // and a SUCCESSFUL retake's faster iterations win the min
    val (r2, _) = Bench.mergeRetakes(first,
      Map("hot" -> Seq(2.0, 2.1)), Set.empty)
    assert(r2.toMap.apply("hot").min === 2.0)
  }

  test("mergeRetakes: the wide flag reads the clean retake alone " +
      "(never the cross-regime seam) and skips still-dirty entries") {
    val first = Seq(
      // looks wide ONLY across the seam: slow contaminated pass,
      // fast clean retake — the flag must not see 10.0 vs 1.0
      "retaken" -> Seq(10.0, 9.5),
      "dirty" -> Seq(30.0, 2.0),   // genuinely wide but still dirty
      "calm" -> Seq(1.0, 1.05))
    val retake = Map("retaken" -> Seq(1.0, 1.1))
    val (_, wideBasis) =
      Bench.mergeRetakes(first, retake, Set("dirty"))
    val basis = wideBasis.toMap
    assert(basis("retaken") === Seq(1.0, 1.1),
      "wide basis must be the clean retake, not the merged list")
    assert(!basis.contains("dirty"),
      "still-dirty entries must not feed the wide flag")
    assert(Bench.wideSpreadEntries(wideBasis).isEmpty,
      "no flag may fire off the retake seam or a dirty entry")
  }

  test("retakeDirty: a loaded retake window is dirty, a clean one " +
      "is not — unless the retake measured nothing (all iterations " +
      "failed), which cannot certify the contaminated first pass") {
    assert(Bench.retakeDirty(loadExceeded = true, Seq(1.0, 1.1)))
    assert(!Bench.retakeDirty(loadExceeded = false, Seq(1.0, 1.1)))
    // partial failure still measured something: the surviving min
    // stands, entry is clean
    assert(!Bench.retakeDirty(loadExceeded = false,
      Seq(Double.PositiveInfinity, 2.0)))
    // all-failed clean-window retake: first-pass numbers remain
    // uncertified -> dirty
    assert(Bench.retakeDirty(loadExceeded = false,
      Seq(Double.PositiveInfinity, Double.PositiveInfinity)))
    assert(Bench.retakeDirty(loadExceeded = false, Seq.empty))
  }

  test("parseDirty reads the prev record's dirty list; records " +
      "without one (every record before r18) parse empty") {
    val raw = """...,"n_ok":183,"load":{"p50":26.0,"max":30.4},""" +
      """"dirty":["s03","t08_winnow_fingerprint"],"sf":"/x"}"""
    assert(Bench.parseDirty(raw) ===
      Set("s03", "t08_winnow_fingerprint"))
    assert(Bench.parseDirty("""{"queries":{},"sf":"/x"}""") ===
      Set.empty[String])
    assert(Bench.parseDirty(""","dirty":[],"sf":"/x"""") ===
      Set.empty[String])
  }
}
