package graft.tools
object Scratch {
  def main(args: Array[String]): Unit = {
    // replicate RandomProjectionLsh.hyperplanes(4, 8, 64, 42) and dump
    var x = 42L
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def gauss(): Double =
      (0 until 4).map(_ => (next() >>> 11).toDouble / (1L << 53).toDouble - 0.5).sum
    val vals = Array.fill(4 * 8 * 64)(gauss())
    val out = new java.io.PrintWriter("/tmp/planes_scala.txt")
    vals.foreach { v =>
      val f = v.toFloat
      out.println(java.lang.Double.doubleToLongBits(v).toString + " " +
        java.lang.Float.floatToIntBits(f).toString)
    }
    out.close()
    println("wrote " + vals.length)
  }
}
