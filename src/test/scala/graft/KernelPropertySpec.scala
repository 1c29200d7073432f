package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters, Passed, Proved}

/** Property-based pins for the round-12 pure kernels: invariants that
  * hold for ALL inputs, not just the corpus (the explicit-case specs
  * in TextSpec/GeoSpec stay as the readable examples; these close the
  * space around them).
  */
class KernelPropertySpec extends AnyFunSuite {

  private def holds(p: Prop): Unit = {
    val r = check(Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.status == Passed || r.status == Proved, r.status.toString)
  }

  // small alphabet so merge rules actually fire under random inputs
  private val tok: Gen[String] = Gen.oneOf("a", "b", "c", "ab", "x")
  private val toks: Gen[List[String]] = Gen.listOfN(30, tok)
    .flatMap(l => Gen.choose(0, 30).map(l.take))
  private val rule: Gen[(String, String)] = Gen.zip(tok, tok)
  private val rules: Gen[List[(String, String)]] =
    Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, rule))

  test("bpeApplyRules: splicing merged tokens back on spaces always " +
      "reproduces the input sequence (merges never lose or reorder " +
      "content)") {
    holds(forAll(toks, rules) { (ts, rs) =>
      val out = graft.queries.TextOps
        .bpeApplyRules(ts.toArray, rs)
      out.flatMap(_.split(" ", -1)).toSeq == ts
    })
  }

  test("bpeApplyRules: output length never grows and never falls " +
      "below half the input (each merge consumes exactly two tokens)") {
    holds(forAll(toks, rules) { (ts, rs) =>
      val out = graft.queries.TextOps
        .bpeApplyRules(ts.toArray, rs)
      out.length <= ts.length && 2 * out.length >= ts.length ||
        ts.isEmpty && out.isEmpty
    })
  }

  test("bpeApplyRules: a pass over a rule leaves no adjacent " +
      "UNMERGED occurrence untouched except overlap-consumed ones " +
      "(idempotence: re-applying the same single rule changes " +
      "nothing)") {
    holds(forAll(toks, rule) { (ts, r) =>
      val once = graft.queries.TextOps
        .bpeApplyRules(ts.toArray, Seq(r))
      val twice = graft.queries.TextOps
        .bpeApplyRules(once, Seq(r))
      twice.toSeq == once.toSeq
    })
  }

  test("gridCols: result is always in the doubling chain, meets the " +
      "density target, and is minimal (monotone in n)") {
    holds(forAll(Gen.choose(0L, 5_000_000_000L)) { n =>
      val k = graft.queries.GeoOps.gridCols(n)
      val chain = Iterator.iterate(12L)(_ * 2)
        .takeWhile(_ <= k).toSeq
      val inChain = chain.lastOption.contains(k.toLong)
      val meets = 2L * n <= 32L * k.toLong * k.toLong
      val minimal = k == 12 ||
        2L * n > 32L * (k / 2).toLong * (k / 2).toLong
      inChain && meets && minimal
    })
  }
}
