package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class LzwDebug extends AnyFunSuite {
  test("find minimal failing prefix") {
    val data = Array.tabulate(40000)(i => ((i * 7919 + (i >> 3)) % 256).toByte)
    var lo = 0; var hi = data.length // lo = works, hi = fails
    def works(n: Int): Boolean =
      try java.util.Arrays.equals(Pdf.lzwDecode(Pdf.lzwEncode(data.take(n))), data.take(n))
      catch { case _: Exception => false }
    assert(!works(hi))
    while (hi - lo > 1) {
      val mid = (lo + hi) / 2
      if (works(mid)) lo = mid else hi = mid
    }
    info(s"first failing prefix length: $hi")
    // count encoder-emitted codes up to there to see the boundary
    assert(works(lo))
  }
}
