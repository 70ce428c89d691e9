package graft

/** JSON string escaping shared by the driver-contract mains (Bench,
  * Verify): backslash, quote, and ALL control chars (<0x20). A stray
  * form-feed or NUL in an exception message or builder-authored SQL
  * would otherwise make the driver's `json.load` fail and silently zero
  * the round's bench/correctness data.
  */
private[graft] object JsonEscape {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
