package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench adjudicator's pure predicates (round 18 — the r17
  * artifact certified 5-7x contamination rows as quiet because the
  * flag threshold had no absolute floor and nothing re-checked the
  * re-measure against the threshold it was rebutting).
  */
class BenchAdjudicationSpec extends AnyFunSuite {

  test("flag threshold: 2x AND an absolute floor above baseline") {
    // a 40 ms row at 0.25 s is >6x but only +0.21 s — JVM noise, not a
    // regression (the exact ta_rolling_hash shape from round 17)
    assert(!Bench.overThreshold(0.25, 0.04, floor = 0.25))
    // the same ratio on a second-scale row IS a flag
    assert(Bench.overThreshold(2.5, 0.4, floor = 0.25))
    // over 2x but within the floor: not flagged
    assert(!Bench.overThreshold(0.45, 0.2, floor = 0.25))
    // over 2x and over the floor: flagged
    assert(Bench.overThreshold(1.2, 0.5, floor = 0.25))
    // under 2x is never flagged no matter the absolute excess
    assert(!Bench.overThreshold(19.0, 10.0, floor = 0.25))
  }

  test("re-measure stability: consecutive reps agree within 20%, floored at 50 ms") {
    assert(Bench.agrees(1.0, 1.15))
    assert(!Bench.agrees(1.0, 1.3))
    // sub-100 ms rows: the 50 ms floor absorbs scheduler noise
    assert(Bench.agrees(0.04, 0.08))
    assert(!Bench.agrees(0.04, 0.12))
    // symmetric
    assert(Bench.agrees(1.15, 1.0) == Bench.agrees(1.0, 1.15))
  }

  test("rep loop: a failed rep breaks the streak but keeps earlier successes") {
    // success, success-that-agrees → stable after 2 reps
    val (t1, s1) = Bench.stableReps(mkMeasure(Seq(1.0, 1.05)))
    assert(s1 && t1 == Seq(1.0, 1.05))
    // the round-19 advisor shape: two valid agreeing reps, then a failed
    // rep — the failure must NOT discard the valid measurements
    val (t2, s2) = Bench.stableReps(mkMeasure(Seq(1.0, 1.4, -1.0, 1.38, 1.41)))
    assert(s2 && t2 == Seq(1.0, 1.4, 1.38, 1.41) && t2.min == 1.0)
    // failure RESETS the streak: agree-across-a-failure is not agreement
    val (t3, s3) = Bench.stableReps(mkMeasure(Seq(1.0, -1.0, 1.02, 5.0, 9.0)))
    assert(!s3 && t3 == Seq(1.0, 1.02, 5.0, 9.0))
    // all reps fail: empty times, never stable, loop bounded
    val (t4, s4) = Bench.stableReps(mkMeasure(Seq(-1, -1, -1, -1, -1, -1)))
    assert(!s4 && t4.isEmpty)
  }

  private def mkMeasure(reps: Seq[Double]): () => Double = {
    val it = reps.iterator
    () => if (it.hasNext) it.next() else -1.0
  }

  test("baseline table parse: last occurrence wins, soak rows ignored") {
    val text =
      """| q1_agg | 0.5 |
        || q1_agg | 0.4 |
        || soak_row | 1.0 | 2.0 |
        || Q_UPPER | 1.0 |""".stripMargin
    val rows = Bench.baselineRows(text)
    assert(rows == Map("q1_agg" -> 0.4))
  }
}
