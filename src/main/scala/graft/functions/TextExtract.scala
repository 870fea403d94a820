package graft.functions

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** `extract_text(html) → text` — THE byte-identity invariant of the engine
  * (BASELINE.json input_hint: "byte-identical extracted text per url").
  *
  * This function is FROZEN: a pure, deterministic `Array[Byte] => String`
  * whose rules are pinned by golden vectors in `TextExtractSpec` (plus a
  * differential test against the original regex formulation). Changing any
  * rule silently breaks replay reconvergence — never edit without updating
  * the golden vectors and bumping a table schema-id.
  *
  * Rules (applied in order, UTF-8 only):
  *  1. decode bytes as UTF-8 (malformed input → U+FFFD, java default)
  *  2. drop `<script>…</script>` and `<style>…</style>` blocks
  *     (case-insensitive; an unclosed block is NOT a block — its open tag
  *     falls through to rule 4)
  *  3. drop HTML comments `<!-- … -->` (unclosed falls through to rule 4)
  *  4. replace every remaining complete tag `<…>` with a single space
  *     (a `<` with no closing `>` stays literal)
  *  5. decode entities: &lt; &gt; &quot; &#39; &apos; &nbsp; then &amp;
  *     last (so `&amp;lt;` decodes to `&lt;`, not `<`)
  *  6. collapse all whitespace runs to one space; trim
  *
  * Implementation is hand-rolled scanner passes, not regex: the extractor
  * runs once per applied row — at 10^10 events it is the single hottest
  * scalar — and the scanner allocates one builder per pass instead of the
  * regex engine's per-match garbage (allocation rate, not arithmetic, is
  * what limits multi-core scaling of this stage).
  */
object TextExtract {

  private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  private def isWs(c: Char): Boolean = // java regex \s
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  private def regionMatchesCi(s: String, at: Int, lit: String): Boolean =
    s.regionMatches(true, at, lit, 0, lit.length)

  /** Pass 1: drop script/style blocks (rule 2). */
  private def dropBlocks(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      var consumed = false
      if (c == '<') {
        val name =
          if (regionMatchesCi(s, i + 1, "script")) "script"
          else if (regionMatchesCi(s, i + 1, "style")) "style"
          else null
        if (name != null) {
          val afterName = i + 1 + name.length
          // \b: next char must be a non-word char (e.g. '>', space, '/')
          if (afterName < n && !isWordChar(s.charAt(afterName))) {
            // attrs: [^>]* then '>'
            var j = afterName
            while (j < n && s.charAt(j) != '>') j += 1
            if (j < n) { // open tag complete; find </name\s*>
              var k = j + 1
              var endAt = -1
              val close = "</" + name
              while (endAt < 0 && k < n) {
                if (s.charAt(k) == '<' && regionMatchesCi(s, k, close)) {
                  var m = k + close.length
                  while (m < n && isWs(s.charAt(m))) m += 1
                  if (m < n && s.charAt(m) == '>') endAt = m
                }
                k += 1
              }
              if (endAt >= 0) {
                out.append(' ')
                i = endAt + 1
                consumed = true
              }
            }
          }
        }
      }
      if (!consumed) { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Pass 2: drop complete comments (rule 3). */
  private def dropComments(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      if (s.charAt(i) == '<' && s.regionMatches(i, "<!--", 0, 4)) {
        val end = s.indexOf("-->", i + 4)
        if (end >= 0) { out.append(' '); i = end + 3 }
        else { out.append('<'); i += 1 }
      } else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** Pass 3: strip remaining complete tags (rule 4). */
  private def dropTags(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        var j = i + 1
        while (j < n && s.charAt(j) != '>') j += 1
        if (j < n) { out.append(' '); i = j + 1 }
        else { out.append('<'); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  // entity table, tried in the replace-chain's order; &amp; deliberately
  // last so &amp;lt; → &lt; (not <)
  private val entities = Array(
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""), ("&#39;", "'"),
    ("&apos;", "'"), ("&nbsp;", " "), ("&amp;", "&"))

  /** Pass 4: entity decode + whitespace collapse + trim (rules 5-6). */
  private def decodeAndCollapse(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      var c = s.charAt(i)
      var advance = 1
      if (c == '&') {
        var e = 0
        var hit = false
        while (!hit && e < entities.length) {
          val (lit, repl) = entities(e)
          if (s.regionMatches(i, lit, 0, lit.length)) {
            c = repl.charAt(0)
            advance = lit.length
            hit = true
          }
          e += 1
        }
      }
      if (isWs(c)) pendingSpace = true
      else {
        if (pendingSpace && out.length > 0) out.append(' ')
        pendingSpace = false
        out.append(c)
      }
      i += advance
    }
    out.toString
  }

  def extract(html: Array[Byte]): String = {
    if (html == null) return null
    decodeAndCollapse(dropTags(dropComments(dropBlocks(
      new String(html, StandardCharsets.UTF_8)))))
  }

  /** Column form. A plain Scala UDF is adequate: the function runs once per
    * *applied* row after dedup, off the scan hot path, and is scanner-bound
    * (no codegen win available beyond avoiding regex).
    */
  val extractTextUdf = udf((b: Array[Byte]) => extract(b))

  def extract_text(c: Column): Column = extractTextUdf(c)
}
