package graft.cdc

/** Statement normalization + DDL/DCL classification — semantics of
  * /root/reference/canal/sync.go:37-44 (the six regexes) and
  * :388-409 (TrimStatement / IsDdlOrDclStatement), re-expressed in Scala.
  */
object Statement {
  private val singleComment1 = "--[^\r\n]*".r
  private val singleComment2 = "^#[^\r\n]*".r
  private val newLine = "[\r\n]+".r
  private val multiLineComment = "(?s)/\\*.*?\\*/".r
  private val spaces = "\\s+".r
  private val leadingSpace = "^\\s+".r

  /** Strip comments, collapse whitespace, uppercase — the cheap normalize
    * applied before prefix classification. */
  def trim(statement: String): String = {
    var s = statement
    s = singleComment1.replaceAllIn(s, "")
    s = singleComment2.replaceAllIn(s, "")
    s = newLine.replaceAllIn(s, " ")
    s = multiLineComment.replaceAllIn(s, " ")
    s = spaces.replaceAllIn(s, " ")
    s = leadingSpace.replaceAllIn(s, "")
    s.toUpperCase
  }

  private val ddlDclPrefixes =
    Seq("CREATE", "DROP", "ALTER", "RENAME", "TRUNCATE", "GRANT", "REVOKE", "FLUSH")

  /** Prefix test over the NORMALIZED statement (caller trims first, like the
    * reference's sync loop). */
  def isDdlOrDcl(normalized: String): Boolean =
    ddlDclPrefixes.exists(normalized.startsWith)

  private val ddlPrefixes = Seq("CREATE", "DROP", "ALTER", "RENAME", "TRUNCATE")

  /** True DDL (schema-changing) — the reference asks its DDL executor
    * (/root/reference/schema/tracker.go:85-87); we test against the subset
    * grammar the tracker interprets. */
  def isDdl(normalized: String): Boolean =
    ddlPrefixes.exists(normalized.startsWith)

  def isBegin(normalized: String): Boolean = normalized.startsWith("BEGIN")
  def isCommit(normalized: String): Boolean = normalized.startsWith("COMMIT")
}
