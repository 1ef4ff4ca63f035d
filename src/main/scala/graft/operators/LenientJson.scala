package graft.operators

/** Minimal lenient JSON for FORMAT-INTERNAL documents the byte
  * readers carry (an Avro schema, a notebook file) — parsed on the
  * executor inside the per-blob walk, where Spark's column-level
  * from_json cannot reach. Objects/arrays/strings (with escapes and
  * \\uXXXX)/numbers/bools/null; depth-capped; throws
  * IllegalArgumentException on junk (callers catch and degrade
  * visibly). NOT a general ingest path: line-JSON corpora go through
  * the lenient from_json reader ([[AuditJson]]).
  */
private[graft] object LenientJson {

  sealed trait J
  final case class JStr(s: String) extends J
  final case class JNum(d: Double) extends J
  final case class JBool(b: Boolean) extends J
  case object JNull extends J
  final case class JArr(xs: Vector[J]) extends J
  final case class JObj(m: Map[String, J]) extends J

  final class JParse(s: String) {
    var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i) <= ' ') i += 1
    def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)
    def value(depth: Int): J = {
      if (depth > 32) fail("nesting")
      ws()
      if (i >= s.length) fail("eof")
      s.charAt(i) match {
        case '{' =>
          i += 1
          val m = Map.newBuilder[String, J]
          ws()
          if (i < s.length && s.charAt(i) == '}') { i += 1; return JObj(m.result()) }
          var going = true
          while (going) {
            ws()
            val k = str()
            ws()
            if (i >= s.length || s.charAt(i) != ':') fail("colon")
            i += 1
            m += k -> value(depth + 1)
            ws()
            if (i < s.length && s.charAt(i) == ',') i += 1
            else if (i < s.length && s.charAt(i) == '}') { i += 1; going = false }
            else fail("obj")
          }
          JObj(m.result())
        case '[' =>
          i += 1
          val xs = Vector.newBuilder[J]
          ws()
          if (i < s.length && s.charAt(i) == ']') { i += 1; return JArr(xs.result()) }
          var going = true
          while (going) {
            xs += value(depth + 1)
            ws()
            if (i < s.length && s.charAt(i) == ',') i += 1
            else if (i < s.length && s.charAt(i) == ']') { i += 1; going = false }
            else fail("arr")
          }
          JArr(xs.result())
        case '"' => JStr(str())
        case 't' => if (s.startsWith("true", i)) { i += 4; JBool(true) } else fail("lit")
        case 'f' => if (s.startsWith("false", i)) { i += 5; JBool(false) } else fail("lit")
        case 'n' => if (s.startsWith("null", i)) { i += 4; JNull } else fail("lit")
        case _ =>
          val start = i
          while (i < s.length && (s.charAt(i) == '-' || s.charAt(i) == '+' ||
            s.charAt(i) == '.' || s.charAt(i) == 'e' || s.charAt(i) == 'E' ||
            (s.charAt(i) >= '0' && s.charAt(i) <= '9'))) i += 1
          if (i == start) fail("num")
          JNum(java.lang.Double.parseDouble(s.substring(start, i)))
      }
    }
    def str(): String = {
      if (i >= s.length || s.charAt(i) != '"') fail("str")
      i += 1
      val sb = new java.lang.StringBuilder()
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          i += 1
          s.charAt(i) match {
            case 'n' => sb.append('\n')
            case 't' => sb.append('\t')
            case 'r' => sb.append('\r')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case '/' => sb.append('/')
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case 'u' if i + 4 < s.length =>
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case other => sb.append(other)
          }
          i += 1
        } else { sb.append(c); i += 1 }
      }
      if (i >= s.length) fail("torn str")
      i += 1
      sb.toString
    }
  }

}
