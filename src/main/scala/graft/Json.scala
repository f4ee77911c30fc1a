package graft

/** Minimal JSON string escaping shared by the driver-run mains (the
  * bench detail file and Verify's oracle_sql.json). One definition —
  * escaping is correctness-sensitive (a stray control char in
  * builder-authored SQL would break the driver's json.load and zero
  * the round's correctness), so the two emitters must never diverge.
  */
object Json {
  /** Escape backslash, quote, and ALL control chars (< 0x20). */
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
