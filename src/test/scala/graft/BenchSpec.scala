package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure harness arithmetic: the post-sweep self-check trigger. The
  * REPORT grades any row >2× its committed baseline as a hard-bar
  * breach, so the trigger must guarantee no such row ships without an
  * isolated re-run (r13 shipped a 2.07× row that missed the old
  * `max(1.4·b, b+0.75)` band by 0.03 s and was pure gate-box noise).
  */
class BenchSpec extends AnyFunSuite {

  test("selfCheckLimit never lets a would-grade->2x row skip isolation") {
    // big row: the additive slack is dwarfed — cap binds at 2b
    assert(Bench.selfCheckLimit(Some(10.0), med = 1.0) === 14.0) // 1.4b < 2b
    // small row: b+0.75 would exceed 2b (the r13 escape: b=0.68,
    // old limit 1.43 s, gate read 1.40 s = 2.07x) — cap binds
    assert(Bench.selfCheckLimit(Some(0.68), med = 1.0) === 1.36)
    // mid row where 1.4b < b+0.75 < 2b: additive slack binds
    assert(Bench.selfCheckLimit(Some(1.0), med = 1.0) === 1.75)
    // the invariant itself: limit <= 2b for every baseline
    for (b <- Seq(0.1, 0.3, 0.68, 1.0, 2.0, 5.0, 17.3))
      assert(Bench.selfCheckLimit(Some(b), med = 1.0) <= 2.0 * b + 1e-12,
        s"baseline $b")
    // no baseline: structural threshold, floored at 2 s
    assert(Bench.selfCheckLimit(None, med = 0.1) === 2.0)
    assert(Bench.selfCheckLimit(None, med = 1.0) === 4.0)
  }
}
