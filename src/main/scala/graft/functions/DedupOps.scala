package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-deduplication operators for training-data pipelines: exact,
  * n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design: every variant is expressed so the expensive pairwise step
  * only ever runs inside a CANDIDATE set bounded by blocking/banding —
  * exact dedup is a pure hash aggregation; n-gram Jaccard blocks on
  * (lang, length-bucket); MinHash goes through LSH band buckets (pairs
  * only form inside a bucket); SimHash pairs only within blocking keys.
  * Nothing here is O(n²) over the corpus at 100 TB.
  */
object DedupOps {

  /** Exact duplicate groups by normalized-text fingerprint: one row per
    * group with its size and the kept (minimum) doc id. A single hash
    * aggregation — partial/final, map-side combined.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  /** Distinct whitespace-token set. */
  def tokenSet(text: Column): Column = array_distinct(split(text, " "))

  /** Character n-gram (shingle) set of a string. */
  def shingles(text: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => text.substr(i, lit(n))))

  /** Token-set Jaccard similarity of two token-set columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      (size(a) + size(b) - size(array_intersect(a, b))).cast("double")

  /** Near-duplicate pairs by token-set Jaccard with LOSSLESS blocking on
    * (lang, size bucket): J(A,B) ≥ t implies |A∩B| ≥ t·max(|A|,|B|) and
    * |A∩B| ≤ min(|A|,|B|), hence min ≥ t·max — sizes within factor 1/t.
    * Bucketing sizes by log base 1/t, a qualifying pair differs by at most
    * one bucket, so side A explodes to {k-1, k, k+1} and the join is a pure
    * equi-join on (lang, bucket): no O(n²)-per-language blowup, identical
    * result set. The exact size guard + Jaccard filter run inside the
    * (small) candidate set; the intersection is computed once per pair.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold < 1.0)
    val logBase = math.log(1.0 / threshold)
    val toks = docs.select(col(idCol).as("id"), col(langCol).as("lang"),
      tokenSet(col(textCol)).as("toks"))
      .withColumn("sz", size(col("toks")))
      .withColumn("bkt", floor(log(greatest(col("sz"), lit(1))
        .cast("double")) / lit(logBase)).cast("int"))
    val a = toks.select(col("id").as("a_id"), col("lang"),
      col("toks").as("a_toks"), col("sz").as("a_sz"),
      explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1)).as("bkt"))
    val b = toks.select(col("id").as("b_id"), col("lang"),
      col("toks").as("b_toks"), col("sz").as("b_sz"), col("bkt"))
    a.join(b, Seq("lang", "bkt"))
      .filter(col("a_id") < col("b_id"))
      .filter(least(col("a_sz"), col("b_sz")).cast("double") >=
        lit(threshold) * greatest(col("a_sz"), col("b_sz")).cast("double"))
      .withColumn("isect", size(array_intersect(col("a_toks"), col("b_toks"))))
      .withColumn("jaccard", round(col("isect").cast("double") /
        (col("a_sz") + col("b_sz") - col("isect")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** MinHash signature (k hash functions) over the token set, as a
    * k-element array. Hash family: xxhash64 salted by the function index —
    * codegen'd, no UDF. Signature equality probability ≈ Jaccard.
    */
  def minhashSignature(toksCol: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(toksCol,
        t => xxhash64(concat(i.cast("string"), lit(":"), t)))))

  /** LSH candidate pairs: signatures banded into `bands` groups of
    * `rowsPerBand`; a pair is a candidate iff some band matches exactly.
    * The self-join runs on (band index, band hash) — bucket-local — and the
    * final Jaccard estimate is the matching-minhash fraction.
    */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
      bands: Int, rowsPerBand: Int, minEstimate: Double): DataFrame = {
    val k = bands * rowsPerBand
    val sigs = docs.select(col(idCol).as("id"),
      minhashSignature(tokenSet(col(textCol)), k).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws("|",
          slice(col("sig"), b * rowsPerBand + lit(1), lit(rowsPerBand))
            .cast("array<string>")))))
        .as(Seq("band", "band_hash")))
    val l = banded.select(col("band"), col("band_hash"),
      col("id").as("a_id"), col("sig").as("a_sig"))
    val r = banded.select(col("band"), col("band_hash"),
      col("id").as("b_id"), col("sig").as("b_sig"))
    l.join(r, Seq("band", "band_hash"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_sig"), col("b_sig"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("a_sig"), col("b_sig"), (x, y) => x === y),
          m => m)).cast("double") / lit(k.toDouble))
      .filter(col("est_jaccard") >= minEstimate)
      .select(col("a_id"), col("b_id"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** 64-bit SimHash over a token-set column, as a two-stage projection:
    * stage 1 accumulates the per-bit ±1 vote array in ONE `aggregate` pass
    * over the tokens; stage 2 folds the 64 votes into a long. Staged so the
    * (large) vote expression is evaluated once per row, not 64 times.
    * Near-duplicates have small Hamming distance.
    */
  def withSimhash(df: DataFrame, toksCol: Column, out: String): DataFrame = {
    val hashes = transform(toksCol, t => xxhash64(t))
    val votes = aggregate(hashes, array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc,
        array((0 until 64).map(i =>
          when(shiftright(h, i).bitwiseAND(1L) === 1L, lit(1L))
            .otherwise(lit(-1L))): _*),
        (a, v) => a + v))
    df.withColumn("__votes", votes)
      .withColumn(out, (0 until 64).map(i =>
        when(element_at(col("__votes"), i + 1) > 0, lit(1L << i))
          .otherwise(lit(0L))).reduce(_ + _))
      .drop("__votes")
  }

  /** SimHash near-duplicate pairs within (lang) blocks, by Hamming
    * distance ≤ maxDistance (bit_count of xor).
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, maxDistance: Int): DataFrame = {
    val sh = withSimhash(
      docs.select(col(idCol).as("id"), col(langCol).as("lang"),
        tokenSet(col(textCol)).as("toks")),
      col("toks"), "sh").select("id", "lang", "sh")
    val a = sh.select(col("lang"), col("id").as("a_id"), col("sh").as("a_sh"))
    val b = sh.select(col("lang"), col("id").as("b_id"), col("sh").as("b_sh"))
    a.join(b, Seq("lang"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("hamming", bit_count(col("a_sh").bitwiseXOR(col("b_sh"))))
      .filter(col("hamming") <= maxDistance)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }
}
