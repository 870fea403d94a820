package graft

import graft.functions.TextExtract
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** Golden vectors freezing the `extract_text` byte-identity contract
  * (FIXTURES.md §B.4). These pin the function for all time: any change to
  * extraction rules MUST fail here before it silently breaks replay
  * reconvergence.
  */
class TextExtractSpec extends AnyFunSuite {

  private def x(html: String): String = TextExtract.extract(html.getBytes(UTF_8))

  val golden: Seq[(String, String)] = Seq(
    ("<html><body>hello world</body></html>", "hello world"),
    ("<p>a</p><p>b</p>", "a b"),
    ("<P CLASS=\"x\">upper</P>", "upper"),
    ("no tags at all", "no tags at all"),
    ("", ""),
    ("<script>var x=1;</script>visible", "visible"),
    ("<SCRIPT src='a.js'>ignore()</SCRIPT>ok", "ok"),
    ("<style>body{color:red}</style>styled", "styled"),
    ("<!-- secret -->shown", "shown"),
    ("a&amp;b", "a&b"),
    ("&lt;tag&gt;", "<tag>"),
    ("&quot;q&quot; &#39;a&#39; &apos;b&apos;", "\"q\" 'a' 'b'"),
    ("x&nbsp;y", "x y"),
    ("&amp;lt;", "&lt;"), // double-escaped stays single-escaped
    ("  a \t b\n\nc  ", "a b c"),
    ("<div>a</div>\n<div>b</div>", "a b"),
    ("héllo wörld — 中文 проверка", "héllo wörld — 中文 проверка"),
    ("<p>mixed <b>bold</b> &amp; <i>italic</i></p>", "mixed bold & italic"),
    ("<br/><br >solo", "solo"),
    ("<script>a</script><style>b</style><p>c</p><!--d-->e", "c e"))

  test("golden vectors are frozen") {
    golden.zipWithIndex.foreach { case ((in, want), i) =>
      assert(x(in) == want, s"golden vector #$i for input: $in")
    }
  }

  test("null html -> null text") {
    assert(TextExtract.extract(null) == null)
  }

  test("differential: scanner implementation == original regex formulation") {
    // the rules were first written as this regex chain; the shipping
    // scanner must agree byte-for-byte on every input we can generate
    def reference(html: Array[Byte]): String = {
      val scriptStyle = "(?is)<(script|style)\\b[^>]*>.*?</\\1\\s*>".r
      val comments = "(?s)<!--.*?-->".r
      val tags = "<[^>]*>".r
      val ws = "\\s+".r
      val s0 = new String(html, java.nio.charset.StandardCharsets.UTF_8)
      val s3 = tags.replaceAllIn(
        comments.replaceAllIn(scriptStyle.replaceAllIn(s0, " "), " "), " ")
      val s4 = s3.replace("&lt;", "<").replace("&gt;", ">")
        .replace("&quot;", "\"").replace("&#39;", "'").replace("&apos;", "'")
        .replace("&nbsp;", " ").replace("&amp;", "&")
      ws.replaceAllIn(s4, " ").trim
    }
    val cfg = graft.sources.Ledger.Config(seed = 13)
    val gens = (0 until 300).map(i =>
      graft.sources.Ledger.makeHtml(cfg, s"https://d.example.com/$i", i.toLong))
    val tricky = Seq(
      "<script>unclosed", "<!-- unclosed", "a < b > c", "<scriptx>keep</scriptx>",
      "<script >x</script >done", "<STYLE a='>'>gone</style>kept",
      "<script>a<!-- </script> -->b</script>", "&&amp;", "&amp;amp;",
      "< script>not a block</script>", "x<>y", "a&unknown;b",
      "<script src=x>a</script><p>b</p><script>c</script>d")
      .map(_.getBytes(UTF_8))
    (gens ++ tricky ++ golden.map(_._1.getBytes(UTF_8))).foreach { h =>
      assert(TextExtract.extract(h) == reference(h),
        s"differential mismatch on: ${new String(h, UTF_8).take(120)}")
    }
  }

  test("determinism: same bytes, same text, every time") {
    val html = graft.sources.Ledger.makeHtml(
      graft.sources.Ledger.Config(seed = 7), "https://x.example.com/1", 123L)
    val a = TextExtract.extract(html)
    val b = TextExtract.extract(html.clone())
    assert(a == b && a.nonEmpty)
    assert(!a.contains("<") || a.contains("<tail>")) // tags gone, entity decoded
    assert(a.contains("<tail>")) // &lt;tail&gt; decodes
  }
}
