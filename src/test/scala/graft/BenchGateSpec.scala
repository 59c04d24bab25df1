package graft

import org.scalatest.funsuite.AnyFunSuite

class BenchGateSpec extends AnyFunSuite {

  private def loadSeq(xs: Double*): () => Double = {
    val it = Iterator(xs: _*) ++ Iterator.continually(xs.last)
    () => it.next()
  }

  test("gateWait passes immediately on an idle box, no sleeping") {
    var slept = 0
    val (load, waited) = BenchGate.gateWait(loadSeq(0.1), s => slept += s, 0.5, 600)
    assert(load === 0.1 && waited === 0 && slept === 0)
  }

  test("gateWait sleep-waits until loadavg decays under the threshold") {
    val (load, waited) = BenchGate.gateWait(loadSeq(3.2, 1.9, 0.9, 0.4), _ => (), 0.5, 600)
    assert(load === 0.4)
    assert(waited === 15) // three 5-second steps
  }

  test("gateWait exhausts the budget under sustained load (refusal path)") {
    val (load, waited) = BenchGate.gateWait(loadSeq(4.0), _ => (), 0.5, 30)
    assert(load === 4.0)
    assert(waited >= 30) // budget spent, load still over — caller must refuse
  }

  test("gateWait passes when /proc/loadavg is unreadable (sentinel -1)") {
    val (load, waited) = BenchGate.gateWait(loadSeq(-1.0), _ => (), 0.5, 600)
    assert(load === -1.0 && waited === 0)
  }

  test("agreeWithin: 1.3x boundary inclusive, order-independent, zero-guarded") {
    assert(BenchGate.agreeWithin(1.0, 1.3))
    assert(BenchGate.agreeWithin(1.3, 1.0))
    assert(!BenchGate.agreeWithin(1.0, 1.31))
    assert(BenchGate.agreeWithin(0.0, 0.0)) // zero-time batches agree, no NaN
  }

  test("settled needs at least two batches and compares the LAST two only") {
    assert(!BenchGate.settled(Seq(1.0)))
    assert(BenchGate.settled(Seq(1.0, 1.1)))
    assert(!BenchGate.settled(Seq(1.0, 5.0)))
    // a noisy first batch followed by two agreeing clean ones settles
    assert(BenchGate.settled(Seq(9.0, 1.0, 1.1)))
    // agreement in the PAST does not settle a diverging present
    assert(!BenchGate.settled(Seq(1.0, 1.1, 7.0)))
  }

  test("headline is the min of batch medians — contamination can only lose") {
    assert(BenchGate.headline(Seq(4.2, 1.1, 1.2)) === 1.1)
    assert(BenchGate.headline(Seq(0.7)) === 0.7)
  }
}
