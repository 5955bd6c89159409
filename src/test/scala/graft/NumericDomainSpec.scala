package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the numeric safe-domain bounds the fuzz plant contract documents
  * (tools/fuzz_degen.py, r16 numeric plants). These are MATH pins, not
  * Spark tests: the point is that the contract's stated ceilings are
  * derived, machine-checked numbers — if a future query changes the
  * fixed-point scale or frame width, the failing assertion names the
  * contract to renegotiate rather than letting the fuzzer plant values
  * both engines crash on (bigint overflow ERRORS on both sides break the
  * harness; they are a domain violation, not a cross-engine divergence).
  */
class NumericDomainSpec extends AnyFunSuite {

  test("a25 integer-cents window algebra is bigint-safe at the fuzz ceiling and overflows past the documented bound") {
    // a25 (Queries.scala): vc = cast(value*100 as long) inside a 20-row
    // trailing frame; with the current row included the worst terms are
    //   s2      <= 20 * vc^2
    //   d2      =  n*s2 - s1^2   <= 20 * s2 = 400 * vc^2
    //   gate    compares 9*d2 and zn^2 <= (21*vc)^2 = 441 * vc^2
    // so the binding constraint is 9*400*vc^2 = 3600*vc^2 < 2^63.
    def safe(value: BigDecimal): Boolean = {
      val vc = (value * 100).toBigInt.abs
      val worst = Seq(vc * vc * 20, vc * vc * 400 * 9, (vc * 21) * (vc * 21))
      worst.forall(_ <= BigInt(Long.MaxValue))
    }
    assert(safe(BigDecimal(200000)),
      "the fuzz plant ceiling |value| <= 2e5 must sit inside a25's bigint-safe domain")
    assert(safe(BigDecimal(500000)),
      "|vc| < sqrt(2^63/3600) ~= 5.06e7 — 5e5 is the last safe decade")
    assert(!safe(BigDecimal(600000)),
      "the documented unsafe region must actually overflow; if this fails, widen the contract instead")
  }

  test("user_id extreme plants keep every group sum far from bigint overflow on both engines") {
    // fuzz contract: at most 8 extreme plants per corpus, each <= 2^59-1,
    // on top of a natural sum bounded by (rows * max natural id). The
    // sf0.1 corpus is < 10^7 rows with ids < 10^5.
    val plants = BigInt(8) * ((BigInt(1) << 59) - 1)
    val natural = BigInt(10).pow(7) * BigInt(10).pow(5)
    assert(plants + natural <= BigInt(Long.MaxValue),
      "8 plants of 2^59-1 plus the natural sum must stay under 2^63-1")
  }

  test("event_id extreme plants leave the changestream's +1e7 shift inside the long range") {
    val eidCeiling = (BigInt(1) << 63) - 1 - (BigInt(1) << 31)
    assert(eidCeiling + BigInt(10000000L) <= BigInt(Long.MaxValue),
      "s15 shifts event ids by +1e7; the plant ceiling must leave that headroom")
  }
}
