package graft.util

/** Shared hand-rolled JSON emission bits for the artifact mains (Bench,
  * Chaos) — one escaper, so an escaping fix can never land in one
  * artifact writer and not the other.
  */
object Jsons {
  /** A JSON string literal: quotes, backslashes, and control characters
    * escaped.
    */
  def str(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  } + "\""
}
