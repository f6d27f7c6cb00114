package graft.core

/** Whitespace character classes spelled EXPLICITLY for cross-engine
  * regexes. Java's `\s` is exactly `[ \t\n\x0B\f\r]`; RE2's `\s` (what
  * DuckDB evaluates) LACKS `\x0B` (vertical tab), so a pattern shipped
  * verbatim to both engines tokenizes VT-containing documents
  * differently — a latent, data-dependent oracle divergence. Every
  * cross-engine pattern in the repo uses these fragments instead of
  * `\s`/`\S`; on the Java side the replacement is semantically
  * IDENTICAL to `\s` on every input, and on the RE2 side it pins the
  * Java meaning. The values are regex-source fragments (escapes, not
  * raw control characters) so the same text embeds into a DuckDB
  * string literal. */
object Ws {
  /** The class body — Java's \s, spelled out. */
  val Body = " \\t\\n\\x0B\\f\\r"
  /** `\s+` */
  val Plus = s"[$Body]+"
  /** `\s` */
  val One = s"[$Body]"
  /** `\S` */
  val Not = s"[^$Body]"
  /** The HORIZONTAL subset — [[Body]] minus `\n` — for per-line rules
    * applied to text whose line terminators are structural (a rule
    * must not let a ws class eat the `\n` that ends the line). */
  val HorizBody = " \\t\\x0B\\f\\r"
  /** Horizontal `\s` / `\s*` */
  val HorizOne = s"[$HorizBody]"
  val HorizStar = s"[$HorizBody]*"
}
