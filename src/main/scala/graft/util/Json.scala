package graft.util

/** Minimal self-contained JSON reader/writer shared by the modules
  * that carry small JSON documents (Avro schema headers, the TxLog
  * transaction log). Objects → Map[String, Any], arrays →
  * Vector[Any]; numbers parse EXACTLY — an integral literal with no
  * fraction/exponent becomes Long (transaction versions and row
  * counts round-trip bit-exact), anything else Double. Writer is the
  * inverse: Long renders with no decimal point, Double via
  * java.lang.Double.toString (round-trips), strings with full
  * control-character escaping.
  */
object Json {
  def parse(s: String): Any = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    require(p.done, "json: trailing content")
    v
  }

  /** Render Map[String, Any] / Vector[Any] / String / Long / Int /
    * Double / Boolean / null back to JSON. Map iteration order is
    * preserved (callers pass insertion-ordered maps for stable logs).
    */
  def write(v: Any): String = {
    val sb = new StringBuilder
    wr(v, sb)
    sb.toString
  }

  private def wr(v: Any, sb: StringBuilder): Unit = v match {
    case null => sb.append("null")
    case b: Boolean => sb.append(if (b) "true" else "false")
    case i: Int => sb.append(i)
    case l: Long => sb.append(l)
    case d: Double =>
      require(!d.isNaN && !d.isInfinite, "json: non-finite double")
      sb.append(java.lang.Double.toString(d))
    case s: String => str(s, sb)
    case m: collection.Map[_, _] =>
      sb.append('{')
      var first = true
      m.foreach { case (k, x) =>
        if (!first) sb.append(',')
        first = false
        str(k.asInstanceOf[String], sb); sb.append(':'); wr(x, sb)
      }
      sb.append('}')
    case a: collection.Seq[_] =>
      sb.append('[')
      var first = true
      a.foreach { x =>
        if (!first) sb.append(',')
        first = false
        wr(x, sb)
      }
      sb.append(']')
    case other => throw new IllegalArgumentException(s"json: unwritable ${other.getClass}")
  }

  private def str(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  private final class P(s: String) {
    private var i = 0
    def done: Boolean = i >= s.length
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def ch(): Char = { require(i < s.length, "json: truncated"); s.charAt(i) }
    private def expect(c: Char): Unit = {
      require(ch() == c, s"json: expected $c at $i"); i += 1
    }
    def value(): Any = {
      ws()
      ch() match {
        case '{' =>
          i += 1; ws()
          val m = Map.newBuilder[String, Any]
          if (ch() == '}') { i += 1 }
          else {
            var more = true
            while (more) {
              ws(); val k = str(); ws(); expect(':')
              m += (k -> value()); ws()
              if (ch() == ',') i += 1 else { expect('}'); more = false }
            }
          }
          m.result()
        case '[' =>
          i += 1; ws()
          val a = Vector.newBuilder[Any]
          if (ch() == ']') { i += 1 }
          else {
            var more = true
            while (more) {
              a += value(); ws()
              if (ch() == ',') i += 1 else { expect(']'); more = false }
            }
          }
          a.result()
        case '"' => str()
        case 't' => require(s.startsWith("true", i), "json: bad literal"); i += 4; true
        case 'f' => require(s.startsWith("false", i), "json: bad literal"); i += 5; false
        case 'n' => require(s.startsWith("null", i), "json: bad literal"); i += 4; null
        case _ =>
          val start = i
          if (ch() == '-') i += 1
          while (i < s.length && (s.charAt(i).isDigit || "+-.eE".indexOf(s.charAt(i)) >= 0)) i += 1
          val lit = s.substring(start, i)
          if (lit.indexOf('.') < 0 && lit.indexOf('e') < 0 && lit.indexOf('E') < 0)
            lit.toLong
          else lit.toDouble
      }
    }
    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (ch() != '"') {
        val c = ch()
        if (c == '\\') {
          i += 1
          ch() match {
            case 'n' => sb.append('\n'); i += 1
            case 't' => sb.append('\t'); i += 1
            case 'r' => sb.append('\r'); i += 1
            case 'b' => sb.append('\b'); i += 1
            case 'f' => sb.append('\f'); i += 1
            case '/' => sb.append('/'); i += 1
            case '\\' => sb.append('\\'); i += 1
            case '"' => sb.append('"'); i += 1
            case 'u' =>
              require(i + 5 <= s.length, "json: bad \\u")
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 5
            case e => throw new IllegalStateException(s"json: bad escape \\$e")
          }
        } else { sb.append(c); i += 1 }
      }
      i += 1
      sb.toString
    }
  }
}
