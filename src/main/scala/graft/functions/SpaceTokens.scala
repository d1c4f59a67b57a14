package graft.functions

/** Space-only trim + `split(" +")` — the EXACT tokenization of the
  * composable form `split(trim(text), " +")` and of the DuckDB oracle's
  * `string_split_regex(trim(text), ' +')`: both `trim`s strip only the
  * space character. Java's `String.trim` strips every char <= U+0020
  * (tabs, newlines), which silently diverges from the oracle on
  * edge-whitespace text — every native one-pass expression must tokenize
  * through here, never through `.trim`.
  */
private[functions] object SpaceTokens {
  def apply(s: String): Array[String] = {
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    s.substring(lo, hi).split(" +")
  }
}
