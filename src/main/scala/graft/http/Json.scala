package graft.http

import scala.collection.immutable.ListMap

/** Minimal dependency-free JSON codec for the HTTP façade: the reference's
  * envelopes are flat objects of strings/numbers/arrays
  * (`/root/reference/backend/main.py:106-111`, `:149-153`, `:196-202`,
  * `:288-294`, `:321-328`), so a compact recursive-descent parser and a
  * field-order-preserving writer cover the whole surface — the container has
  * no JSON library on the unmanaged classpath and the build adds no
  * dependencies by contract.
  */
object Json {

  sealed trait JValue {
    def render: String = Json.render(this)
  }
  final case class JObj(fields: ListMap[String, JValue]) extends JValue {
    def apply(key: String): JValue = fields.getOrElse(key, JNull)
    def get(key: String): Option[JValue] = fields.get(key)
  }
  object JObj {
    def apply(fields: (String, JValue)*): JObj = new JObj(ListMap(fields: _*))
  }
  final case class JArr(items: Vector[JValue]) extends JValue
  final case class JStr(value: String) extends JValue
  final case class JNum(value: Double) extends JValue {
    def toInt: Int = value.toInt
    def toLong: Long = value.toLong
  }
  final case class JBool(value: Boolean) extends JValue
  case object JNull extends JValue

  /** Convenience extractors with pydantic-ish defaults. */
  implicit final class JValueOps(private val v: JValue) extends AnyVal {
    def str: Option[String] = v match { case JStr(s) => Some(s); case _ => None }
    def num: Option[Double] = v match { case JNum(n) => Some(n); case _ => None }
    def bool: Option[Boolean] = v match { case JBool(b) => Some(b); case _ => None }
    def arr: Option[Vector[JValue]] = v match { case JArr(a) => Some(a); case _ => None }
    def obj: Option[JObj] = v match { case o: JObj => Some(o); case _ => None }
  }

  def render(v: JValue): String = {
    val sb = new StringBuilder
    write(v, sb)
    sb.toString
  }

  private def write(v: JValue, sb: StringBuilder): Unit = v match {
    case JObj(fields) =>
      sb.append('{')
      var first = true
      fields.foreach { case (k, fv) =>
        if (!first) sb.append(',')
        first = false
        writeString(k, sb); sb.append(':'); write(fv, sb)
      }
      sb.append('}')
    case JArr(items) =>
      sb.append('[')
      var first = true
      items.foreach { it =>
        if (!first) sb.append(',')
        first = false
        write(it, sb)
      }
      sb.append(']')
    case JStr(s) => writeString(s, sb)
    case JNum(n) =>
      if (n.isWhole && math.abs(n) < 1e15) sb.append(n.toLong) else sb.append(n)
    case JBool(b) => sb.append(b)
    case JNull => sb.append("null")
  }

  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  /** Parse a complete JSON document; trailing garbage or malformed input
    * throws IllegalArgumentException (the façade maps it to a 422, the
    * FastAPI body-validation analogue).
    */
  def parse(input: String): JValue = {
    val p = new Parser(input)
    val v = p.parseValue()
    p.skipWs()
    if (!p.atEnd) throw new IllegalArgumentException(s"trailing input at ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def atEnd: Boolean = pos >= s.length
    private def peek: Char =
      if (atEnd) throw new IllegalArgumentException("unexpected end of input")
      else s.charAt(pos)
    private def next(): Char = { val c = peek; pos += 1; c }
    def skipWs(): Unit =
      while (!atEnd && Character.isWhitespace(s.charAt(pos))) pos += 1
    private def expect(c: Char): Unit = {
      if (peek != c) throw new IllegalArgumentException(s"expected '$c' at $pos, got '$peek'")
      pos += 1
    }
    private def expectWord(w: String): Unit =
      if (s.regionMatches(pos, w, 0, w.length)) pos += w.length
      else throw new IllegalArgumentException(s"invalid literal at $pos")

    def parseValue(): JValue = {
      skipWs()
      peek match {
        case '{' => parseObj()
        case '[' => parseArr()
        case '"' => JStr(parseString())
        case 't' => expectWord("true"); JBool(true)
        case 'f' => expectWord("false"); JBool(false)
        case 'n' => expectWord("null"); JNull
        case _ => parseNum()
      }
    }

    private def parseObj(): JObj = {
      expect('{'); skipWs()
      var fields = ListMap.empty[String, JValue]
      if (peek == '}') { pos += 1; return new JObj(fields) }
      var done = false
      while (!done) {
        skipWs()
        val k = parseString()
        skipWs(); expect(':')
        fields = fields.updated(k, parseValue())
        skipWs()
        next() match {
          case ',' => ()
          case '}' => done = true
          case c => throw new IllegalArgumentException(s"expected ',' or '}' at ${pos - 1}, got '$c'")
        }
      }
      new JObj(fields)
    }

    private def parseArr(): JArr = {
      expect('['); skipWs()
      val items = Vector.newBuilder[JValue]
      if (peek == ']') { pos += 1; return JArr(items.result()) }
      var done = false
      while (!done) {
        items += parseValue()
        skipWs()
        next() match {
          case ',' => ()
          case ']' => done = true
          case c => throw new IllegalArgumentException(s"expected ',' or ']' at ${pos - 1}, got '$c'")
        }
      }
      JArr(items.result())
    }

    private def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (peek != '"') {
        next() match {
          case '\\' =>
            next() match {
              case '"' => sb.append('"')
              case '\\' => sb.append('\\')
              case '/' => sb.append('/')
              case 'b' => sb.append('\b')
              case 'f' => sb.append('\f')
              case 'n' => sb.append('\n')
              case 'r' => sb.append('\r')
              case 't' => sb.append('\t')
              case 'u' =>
                if (pos + 4 > s.length) throw new IllegalArgumentException("bad \\u escape")
                sb.append(Integer.parseInt(s.substring(pos, pos + 4), 16).toChar)
                pos += 4
              case c => throw new IllegalArgumentException(s"bad escape '\\$c'")
            }
          case c => sb.append(c)
        }
      }
      pos += 1
      sb.toString
    }

    private def parseNum(): JNum = {
      val start = pos
      if (!atEnd && (peek == '-' || peek == '+')) pos += 1
      while (!atEnd && (peek.isDigit || peek == '.' || peek == 'e' || peek == 'E' ||
        peek == '-' || peek == '+')) pos += 1
      if (pos == start) throw new IllegalArgumentException(s"invalid value at $start")
      try JNum(s.substring(start, pos).toDouble)
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(s"invalid number at $start")
      }
    }
  }
}
