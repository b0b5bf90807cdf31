package graft

/** Minimal JSON string escaping shared by the Verify and Bench mains: the
  * driver parses their output with a strict JSON parser, so backslash,
  * quote, and ALL control characters (<0x20) must be escaped — a stray tab
  * or ESC in an error message or builder-authored SQL would otherwise void
  * the whole round's artifact. */
object JsonUtil {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def obj(kvs: Seq[(String, String)]): String =
    kvs.map { case (k, v) => quote(k) + ":" + v }.mkString("{", ",", "}")
}
