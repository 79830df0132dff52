package graft.needleql

/** NeedleQL lexer (reference: src/search/query_lang/lexer.rs).
  *
  * Produces a flat token stream: identifiers/keywords (case-insensitive,
  * matched in the parser), string literals ('...' or "..."), numbers,
  * `$param` references, duration literals (`7d`, `2h`, `30m`, `45s`, `1w` —
  * lexer.rs:57-72), operators and punctuation.
  */
object Lexer {

  sealed trait Tok
  final case class TIdent(s: String) extends Tok    // keyword or identifier
  final case class TStr(s: String) extends Tok
  final case class TNum(d: Double) extends Tok
  final case class TParam(name: String) extends Tok
  final case class TDuration(seconds: Long) extends Tok
  final case class TOp(s: String) extends Tok       // = != <> < <= > >= * , ( ) [ ]
  case object TEof extends Tok

  final case class LexError(msg: String, pos: Int)
    extends RuntimeException(s"$msg at position $pos")

  private val durationUnits = Map('s' -> 1L, 'm' -> 60L, 'h' -> 3600L,
    'd' -> 86400L, 'w' -> 604800L)

  def tokenize(input: String): Vector[Tok] =
    tokenizeWithOffsets(input).map(_._1)

  /** Tokens paired with their 0-based start offset in the input — the
    * position substrate the language service's diagnostics build ranges
    * from (TEof carries the input length). Same token stream as
    * [[tokenize]] by construction.
    */
  def tokenizeWithOffsets(input: String): Vector[(Tok, Int)] = {
    val out = Vector.newBuilder[(Tok, Int)]
    var i = 0
    val n = input.length
    def peek(off: Int = 0): Char = if (i + off < n) input.charAt(i + off) else '\u0000'
    while (i < n) {
      val c = input.charAt(i)
      val t0 = i
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        while (i < n && input.charAt(i) != quote) {
          // backslash escape for the quote char
          if (input.charAt(i) == '\\' && i + 1 < n) { sb.append(input.charAt(i + 1)); i += 2 }
          else { sb.append(input.charAt(i)); i += 1 }
        }
        if (i >= n) throw LexError("Unterminated string literal", i)
        i += 1
        out += (TStr(sb.toString) -> t0)
      } else if (c == '$') {
        i += 1
        val start = i
        while (i < n && (input.charAt(i).isLetterOrDigit || input.charAt(i) == '_')) i += 1
        if (i == start) throw LexError("Empty parameter name", i)
        out += (TParam(input.substring(start, i)) -> t0)
      } else if (c.isDigit || (c == '-' && peek(1).isDigit)) {
        val start = i
        if (c == '-') i += 1
        while (i < n && input.charAt(i).isDigit) i += 1
        var isFloat = false
        if (i < n && input.charAt(i) == '.' && i + 1 < n && input.charAt(i + 1).isDigit) {
          isFloat = true
          i += 1
          while (i < n && input.charAt(i).isDigit) i += 1
        }
        // duration suffix: integer immediately followed by s/m/h/d/w and a
        // non-identifier char after (so `7d` is a duration but `7days` not)
        val numStr = input.substring(start, i)
        if (!isFloat && i < n && durationUnits.contains(input.charAt(i).toLower) &&
          (i + 1 >= n || !(input.charAt(i + 1).isLetterOrDigit || input.charAt(i + 1) == '_'))) {
          val unit = durationUnits(input.charAt(i).toLower)
          i += 1
          out += (TDuration(numStr.toLong * unit) -> t0)
        } else out += (TNum(numStr.toDouble) -> t0)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (input.charAt(i).isLetterOrDigit || input.charAt(i) == '_' ||
          input.charAt(i) == '.')) i += 1
        out += (TIdent(input.substring(start, i)) -> t0)
      } else {
        c match {
          case '=' => out += (TOp("=") -> t0); i += 1
          case '!' if peek(1) == '=' => out += (TOp("!=") -> t0); i += 2
          case '<' if peek(1) == '=' => out += (TOp("<=") -> t0); i += 2
          case '<' if peek(1) == '>' => out += (TOp("!=") -> t0); i += 2
          case '<' => out += (TOp("<") -> t0); i += 1
          case '>' if peek(1) == '=' => out += (TOp(">=") -> t0); i += 2
          case '>' => out += (TOp(">") -> t0); i += 1
          case '*' => out += (TOp("*") -> t0); i += 1
          case ',' => out += (TOp(",") -> t0); i += 1
          case '(' => out += (TOp("(") -> t0); i += 1
          case ')' => out += (TOp(")") -> t0); i += 1
          case '[' => out += (TOp("[") -> t0); i += 1
          case ']' => out += (TOp("]") -> t0); i += 1
          case other => throw LexError(s"Unexpected character '$other'", i)
        }
      }
    }
    out += (TEof -> n)
    out.result()
  }
}
