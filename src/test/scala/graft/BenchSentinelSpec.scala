package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-18 Bench failure-sentinel semantics (verdict #8): a
  * query whose passes ALL throw must land in the per-query map as -1 and
  * be excluded from the total — never timed at its time-to-throw, which
  * used to masquerade as a speedup. One successful pass still wins the
  * min-of-2 over a failed one.
  */
class BenchSentinelSpec extends AnyFunSuite {

  test("both passes failed -> -1 sentinel") {
    assert(Bench.combinePasses(
      Double.PositiveInfinity, Double.PositiveInfinity) == -1.0)
  }

  test("one failed pass keeps the successful pass's time") {
    assert(Bench.combinePasses(Double.PositiveInfinity, 1.25) == 1.25)
    assert(Bench.combinePasses(0.75, Double.PositiveInfinity) == 0.75)
  }

  test("two successful passes keep the min") {
    assert(Bench.combinePasses(2.0, 1.5) == 1.5)
  }

  test("sentinels are excluded from the total") {
    assert(Bench.totalOf(Seq(1.0, -1.0, 2.5)) == 3.5)
    assert(Bench.totalOf(Nil) == 0.0)
  }
}
