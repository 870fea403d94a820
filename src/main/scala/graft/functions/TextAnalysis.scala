package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, document fingerprinting.
  *
  * All are pure Catalyst expression compositions (codegen'd, no UDFs):
  * at 100 TB these run inside WholeStageCodegen directly over the parquet
  * scan with nothing but a projection — no shuffle, no JVM boundary.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: split on whitespace + common punctuation — a
    * cheap, deterministic proxy for subword tokenizer load estimation.
    */
  def tokenCountBpeish(text: Column): Column =
    size(split(text, "[\\s.,;:!?]+"))

  /** Marker stopword lists for the n-gram/stopword language heuristic. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "que"))

  private def markerHits(toks: Column, markers: Seq[String]): Column = {
    val set = markers.map(lit)
    size(filter(toks, t => array_contains(array(set: _*), t)))
  }

  /** Heuristic language ID: most marker-stopword hits wins (fixed
    * precedence en > de > fr > es on ties; "und" = undetermined when no
    * marker hits at all). Deterministic, oracle-expressible.
    */
  def langId(text: Column): Column = langIdFromTokens(tokens(lower(text)))

  /** [[langId]] over an ALREADY-MATERIALIZED lowercased token-array
    * column. Callers on a hot path should bind `toks` to a concrete
    * attribute (explode(array(split(…))) Generate): with a plain
    * projected alias, each of the four marker counts inlines its own
    * copy of the split — four tokenizations per row.
    */
  def langIdFromTokens(toks: Column): Column = {
    val en = markerHits(toks, langMarkers("en"))
    val de = markerHits(toks, langMarkers("de"))
    val fr = markerHits(toks, langMarkers("fr"))
    val es = markerHits(toks, langMarkers("es"))
    val top = greatest(en, de, fr, es)
    when(top === 0, lit("und"))
      .when(en === top, lit("en"))
      .when(de === top, lit("de"))
      .when(fr === top, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Quality score in [0,1]: length saturation + stopword ratio + lexical
    * diversity. Every term is a ratio of integer counts computed in double
    * with a fixed operation order, so the score is BIT-identical across
    * engines — deliberately not rounded (rounding functions differ across
    * engines at half-way points; identical doubles never do).
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(lower(text))
    val nTok = size(toks).cast("double")
    val lenTerm = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val stopTerm = markerHits(toks, langMarkers("en")).cast("double") /
      greatest(nTok, lit(1.0))
    val divTerm = size(array_distinct(toks)).cast("double") /
      greatest(nTok, lit(1.0))
    lit(0.4) * lenTerm + lit(0.3) * stopTerm + lit(0.3) * divTerm
  }

  /** Deterministic document fingerprint: md5 over whitespace-normalized,
    * lowercased text. The exact-dedup / near-dup blocking key.
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Intra-document repetition ratio (a Gopher/RefinedWeb-style quality
    * signal): the fraction of token BIGRAMS that are repeats of an
    * earlier bigram in the same document — near 0 for natural prose,
    * rising toward 1 for looping boilerplate / keyword stuffing. Pure
    * codegen-free-of-shuffle projection; documents with fewer than two
    * tokens score 0 (the <2 guard also keeps the DuckDB oracle
    * bit-exact: out-of-range list indexing nulls differ between engines
    * without it). The single double division is the only float op, so
    * cross-engine values are bit-identical.
    */
  def repetitionRatio(text: Column): Column = {
    val toks = split(text, " ")
    val grams = bigramsFromToks(toks)
    val n = size(toks)
    when(n < 2, lit(0.0))
      .otherwise(repetitionRatioFromGrams(grams))
  }

  /** Token-bigram array. Bigrams = the array zipped with its shifted
    * self. NOT the `transform(sequence, i => element_at(toks, i)...)`
    * form: CollapseProject inlines `toks` into every lambda reference, so
    * element_at re-evaluates the whole split PER ELEMENT — O(tokens²)
    * work per document (measured 6.8 s over sf0.1 documents vs well
    * under a second for this form, the CLAUDE.md HOF trap). zip_with
    * references `toks` a constant number of times per row. zip_with
    * pads the shorter side with null (last gram = bare final token);
    * the outer slice drops it.
    */
  def bigramsFromToks(toks: Column): Column = {
    val n = size(toks)
    slice(
      zip_with(toks, slice(toks, lit(2), greatest(n - 1, lit(1))),
        (a, b) => concat_ws(" ", a, b)),
      lit(1), greatest(n - 1, lit(1)))
  }

  /** Duplicate-bigram fraction of an ALREADY-MATERIALIZED gram array.
    * Hot paths should bind `grams` to a Generate attribute: interpreted
    * array expressions get NO common-subexpression elimination, so a
    * projected grams alias is re-evaluated once per reference (three
    * times in this ratio).
    */
  def repetitionRatioFromGrams(grams: Column): Column =
    (size(grams) - size(array_distinct(grams))).cast("double") /
      size(grams).cast("double")
}
