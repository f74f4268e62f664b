package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the exact-replay iteration-cap contract: each Newton/IRLS/EM gate
  * family's oracle unroll must terminate at exactly the shared
  * [[SparkEntry.IterCaps]] constant — the same constant its query lambda
  * passes explicitly — so an edit to either side desyncs THIS spec before
  * it can desync the driver gate. The checks read the generated SQL text:
  * the terminal step CTE must be referenced in the final SELECT and the
  * next index must not exist anywhere. */
class IterCapsSpec extends AnyFunSuite {
  private def sql(q: String): String = SparkEntry.oracleSql(q)

  test("cox family unrolls exactly IterCaps.cox Newton steps") {
    val k = SparkEntry.IterCaps.cox
    for (q <- Seq("q380_cox", "q393_cox_stratified")) {
      val t = sql(q)
      assert(t.contains(s"FROM evt CROSS JOIN e$k p"), s"$q terminal e$k")
      assert(t.contains(s"FROM b$k CROSS JOIN fin"), s"$q terminal b$k")
      assert(t.contains(s"THEN b$k.b END AS beta"), s"$q publishes b$k.b")
      assert(!t.contains(s"b${k + 1}") && !t.contains(s"e${k + 1}"),
        s"$q unrolls past the cap")
      // no stray step reference other than the terminal: every bN/eN
      // mention below the cap only appears inside the step builder's
      // own chain, so a hardcoded earlier index in the publish tail
      // (the b4-at-cap-5 trap) cannot hide
      for (j <- 1 until k)
        assert(!t.contains(s"THEN b$j.b END"), s"$q publishes stale b$j")
    }
  }

  test("gmm unrolls exactly IterCaps.gmm EM steps") {
    val k = SparkEntry.IterCaps.gmm
    val t = sql("q385_gmm")
    assert(t.contains(s"FROM p$k p CROSS JOIN tot"))
    assert(!t.contains(s"sc${k + 1}") && !t.contains(s"p${k + 1} "))
  }

  test("calibrationSlope unrolls exactly IterCaps.calibration Newton steps") {
    val k = SparkEntry.IterCaps.calibration
    val t = sql("q386_calibration_slope")
    assert(t.contains(s"FROM p$k p CROSS JOIN tots"))
    assert(!t.contains(s"g${k + 1}") && !t.contains(s"p${k + 1} "))
  }

  test("huberMean unrolls exactly IterCaps.huber IRLS steps") {
    val k = SparkEntry.IterCaps.huber
    val t = sql("q387_huber_mean")
    assert(t.contains(s"round(m$k.m, 6) AS huber_mean"))
    assert(t.contains(s"FROM m$k CROSS JOIN tot"))
    assert(!t.contains(s"s${k + 1}") && !t.contains(s"m${k + 1} "))
  }
}
