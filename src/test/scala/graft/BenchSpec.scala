package graft

import org.scalatest.funsuite.AnyFunSuite

/** The excursion-robust bench stat (r10 verdict item 2), verified by
  * replaying the recorded r10 driver spreads through it — no Spark
  * session needed; the policy is a pure function over run stats. */
class BenchSpec extends AnyFunSuite {

  private def rs(sec: Double) = Bench.RunStat(sec, 10.0, 10.0, 0.0)

  test("r10 pagerank spread [5.79, 5.96, 44.2]: the 44.2 s GC " +
      "excursion is discarded and replaced, median lands on the plan") {
    val raw = Vector(rs(5.79), rs(5.96), rs(44.2))
    val (out, n) = Bench.dropExcursions(raw, () => rs(6.1))
    assert(n == 1)
    assert(out.map(_.sec).sorted == Vector(5.79, 5.96, 6.1))
  }

  test("r10 kcore_ann spread [3.95, 4.85, 14.4] likewise") {
    val raw = Vector(rs(3.95), rs(4.85), rs(14.4))
    val (out, n) = Bench.dropExcursions(raw, () => rs(4.2))
    assert(n == 1)
    assert(!out.exists(_.sec > 2.5 * out.map(_.sec).min))
  }

  test("tight triple passes through untouched") {
    val raw = Vector(rs(5.0), rs(5.2), rs(5.1))
    val (out, n) = Bench.dropExcursions(raw, () => fail("must not re-run"))
    assert(n == 0 && out == raw)
  }

  test("sub-second noise is not an excursion (absolute gap guard): " +
      "0.6 s vs 0.2 s min is 3x but only 0.4 s apart") {
    val raw = Vector(rs(0.2), rs(0.3), rs(0.6))
    val (out, n) = Bench.dropExcursions(raw, () => fail("must not re-run"))
    assert(n == 0 && out == raw)
  }

  test("a replacement that is itself an excursion is kept once " +
      "retries are exhausted (evidence over silence)") {
    val raw = Vector(rs(5.0), rs(5.2), rs(40.0))
    val (out, n) = Bench.dropExcursions(raw, () => rs(41.0), maxRetries = 3)
    assert(n == 3)
    assert(out.map(_.sec).max >= 40.0) // still visible in the spread
  }

  test("two excursions in one triple both get replaced within budget") {
    val raw = Vector(rs(5.0), rs(30.0), rs(40.0))
    var i = 0
    val (out, n) = Bench.dropExcursions(raw,
      () => { i += 1; rs(5.0 + i * 0.1) })
    assert(n == 2)
    assert(out.map(_.sec).forall(_ < 6.0))
  }

  test("median-of-2 top-up (r12 lesson): a multi-second 2-run row gets " +
      "one extra run; sub-second, 3-run, and failed rows do not") {
    // the r11 adamic_adar false alarm: [18.6, 18.7]-style pairs report
    // the slower run as "median" and the excursion policy can't fire
    assert(Bench.topUpRuns(Vector(rs(13.2), rs(18.6))) == 1)
    assert(Bench.topUpRuns(Vector(rs(0.4), rs(0.5))) == 0) // sub-second
    assert(Bench.topUpRuns(Vector(rs(6.0), rs(6.1), rs(6.2))) == 0) // 3 runs
    assert(Bench.topUpRuns(Vector(rs(-1.0), rs(9.0))) == 0) // failed query
  }

  test("vs_prior classification (r12 standing rule, mechanized): " +
      "±15% wall + 1% bytes = noise; either breach = signal") {
    // the r12 bracket itself: 86.844 vs 83.542 over a shared set with
    // bytes stable — noise, exactly what the round concluded by hand
    val pSec = Map("a" -> 40.0, "b" -> 43.5)
    val cSec = Map("a" -> 42.0, "b" -> 44.8, "new_q" -> 0.7)
    val pB = Map("a" -> 100.0, "b" -> 50.0)
    val cB = Map("a" -> 100.4, "b" -> 49.9, "new_q" -> 3.0)
    val (cls, pTot, cTot, drift, nCommon) =
      Bench.classifyVsPrior(pSec, cSec, pB, cB)
    assert(cls == "noise" && drift.isEmpty)
    // the emitted comparison-set size is the FILTERED set, not the raw
    // key intersection (r13 advice): new_q is absent from the prior
    assert(nCommon == 2)
    // totals are like-for-like: new_q's 0.7 s is NOT in the total
    assert(pTot == 83.5 && cTot == 86.8)
    // wall breach alone → signal
    val (c2, _, _, _, _) = Bench.classifyVsPrior(
      pSec, Map("a" -> 50.0, "b" -> 50.0), pB, cB)
    assert(c2 == "signal")
    // byte drift alone (>1% and >0.3 MB) → signal even with flat wall
    val (c3, _, _, d3, _) = Bench.classifyVsPrior(
      pSec, cSec, pB, Map("a" -> 103.0, "b" -> 50.0))
    assert(c3 == "signal" && d3 == Seq(("a", 100.0, 103.0)))
    // sub-floor byte wiggle on small rows is NOT drift (0.1 MB
    // resolution: 0.2 MB on a 5 MB row is 4% but below the floor)
    val (c4, _, _, d4, _) = Bench.classifyVsPrior(
      pSec, cSec, Map("a" -> 5.0), Map("a" -> 5.2))
    assert(c4 == "noise" && d4.isEmpty)
    // failed rows (sec<0) drop out of the comparison set
    val (_, p5, _, _, n5) = Bench.classifyVsPrior(
      Map("a" -> 40.0, "b" -> -1.0), cSec, pB, cB)
    assert(p5 == 40.0 && n5 == 1)
    // empty filtered common set (disjoint subset / all failed) is
    // "incomparable", never a 0/0 "signal" (r13 advice)
    val (c6, _, _, _, n6) = Bench.classifyVsPrior(
      Map("x" -> 1.0), cSec, Map.empty, Map.empty)
    assert(c6 == "incomparable" && n6 == 0)
    val (c7, _, _, _, _) = Bench.classifyVsPrior(
      Map("a" -> -1.0), Map("a" -> 5.0), Map.empty, Map.empty)
    assert(c7 == "incomparable")
  }
}
