package graft.functions

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** `extract_text(html) → text` — THE byte-identity invariant of the engine
  * (BASELINE.json input_hint: "byte-identical extracted text per url").
  *
  * This function is FROZEN: a pure, deterministic `Array[Byte] => String`
  * whose rules are pinned by golden vectors in `TextExtractSpec`. Changing
  * any rule silently breaks replay reconvergence — never edit without
  * updating the golden vectors and bumping a table schema-id.
  *
  * Rules (applied in order, UTF-8 only):
  *  1. decode bytes as UTF-8 (malformed input → U+FFFD, java default)
  *  2. drop `<script>…</script>` and `<style>…</style>` blocks (case-insensitive)
  *  3. drop HTML comments `<!-- … -->`
  *  4. replace every remaining tag `<…>` with a single space
  *  5. decode entities: &amp; &lt; &gt; &quot; &#39; &apos; &nbsp;
  *  6. collapse all whitespace runs to one space; trim
  */
object TextExtract {

  private val scriptStyle =
    "(?is)<(script|style)\\b[^>]*>.*?</\\1\\s*>".r
  private val comments = "(?s)<!--.*?-->".r
  private val tags = "<[^>]*>".r
  private val ws = "\\s+".r

  def extract(html: Array[Byte]): String = {
    if (html == null) return null
    val s0 = new String(html, StandardCharsets.UTF_8)
    val s1 = scriptStyle.replaceAllIn(s0, " ")
    val s2 = comments.replaceAllIn(s1, " ")
    val s3 = tags.replaceAllIn(s2, " ")
    val s4 = s3
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&apos;", "'")
      .replace("&nbsp;", " ")
      .replace("&amp;", "&") // last, so &amp;lt; decodes to &lt; not <
    ws.replaceAllIn(s4, " ").trim
  }

  /** Column form. A plain Scala UDF is correct and adequate here: the
    * function is regex-dominated (no codegen win available), and it runs
    * once per *applied* row after dedup, off the scan hot path.
    */
  val extractTextUdf = udf((b: Array[Byte]) => extract(b))

  def extract_text(c: Column): Column = extractTextUdf(c)
}
