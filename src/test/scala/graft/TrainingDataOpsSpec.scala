package graft

import graft.functions.{DedupOps, Multimodal, Similarity, TextAnalysis}
import graft.util.Det
import org.apache.spark.sql.functions._

/** Training-data-pipeline operators: dedup (exact / jaccard / minhash /
  * simhash), similarity search (brute force + LSH), text analysis,
  * multimodal plumbing. Planted duplicates/near-duplicates give known
  * ground truth.
  */
class TrainingDataOpsSpec extends SparkTestBase {
  import spark.implicits._

  // vocabulary wide enough that token SETS are distinctive per doc —
  // with a tiny vocab every doc has the same token set and set-based
  // near-dup detection (correctly) cannot separate anything
  private val words = Array.tabulate(120)(i => s"w$i")

  /** Deterministic doc of ~n words from a seed. */
  private def doc(seed: Long, n: Int): String =
    (0 until n).map(i => words(Det.uniformInt(seed, i, 1, words.length)))
      .mkString(" ")

  /** 200 base docs + exact dups of 0..9 + near-dups (one word changed)
    * of 10..19.
    */
  private lazy val docs = {
    val base = (0 until 200).map(i => (i.toLong, doc(i, 60), "en"))
    val exact = (0 until 10).map(i => (1000L + i, doc(i, 60), "en"))
    val near = (10 until 20).map { i =>
      val t = doc(i, 60).split(' ')
      t(30) = "REPLACED"
      (2000L + i, t.mkString(" "), "en")
    }
    (base ++ exact ++ near).toDF("doc_id", "text", "lang").cache()
  }

  test("exact dedup finds exactly the planted duplicate groups") {
    val groups = DedupOps.exactGroups(docs, "doc_id", "text")
      .filter(col("n_docs") > 1)
    val found = groups.collect().map(r => (r.getLong(2), r.getLong(1)))
    assert(found.length == 10)
    found.foreach { case (keepId, n) =>
      assert(keepId < 10 && n == 2, s"group keep=$keepId n=$n")
    }
  }

  test("token-set jaccard pairs find planted near-duplicates") {
    val pairs = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", "lang", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted pair (i, 1000+i) and (i, 2000+i) must be found
    (0 until 10).foreach(i => assert(pairs.contains((i.toLong, 1000L + i))))
    (10 until 20).foreach(i => assert(pairs.contains((i.toLong, 2000L + i))))
  }

  test("minhash LSH finds planted near-duplicates without full cross join") {
    val cands = DedupOps.minhashCandidates(docs, "doc_id", "text",
      bands = 8, rowsPerBand = 2, minEstimate = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 10).foreach(i => assert(cands.contains((i.toLong, 1000L + i)),
      s"exact dup $i via LSH"))
    val nearFound = (10 until 20).count(i => cands.contains((i.toLong, 2000L + i)))
    assert(nearFound >= 8, s"LSH recall on near-dups: $nearFound/10")
  }

  test("simhash hamming pairs find planted near-duplicates") {
    val pairs = DedupOps.simhashPairs(docs, "doc_id", "text", "lang", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 10).foreach(i => assert(pairs.contains((i.toLong, 1000L + i))))
    val nearFound = (10 until 20).count(i => pairs.contains((i.toLong, 2000L + i)))
    assert(nearFound >= 8, s"simhash recall on near-dups: $nearFound/10")
    // precision: unrelated docs must not flood in
    val falsePairs = pairs.filterNot { case (a, b) =>
      (b == a + 1000L) || (b == a + 2000L)
    }
    assert(falsePairs.size <= pairs.size / 2, s"simhash false pairs: $falsePairs")
  }

  private lazy val embeddings = {
    val rows = (0 until 300).map { i =>
      val v = Array.tabulate(64)(d => (Det.uniform(i.toLong, d, 3) * 2 - 1).toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (i.toLong, v.map(_ / n))
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  test("LSH ANN achieves decent recall vs brute-force top-k") {
    val q = col("id") < 10
    val exact = Similarity.bruteForceTopK(embeddings, "vec_id", "embedding", q, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(embeddings, "vec_id", "embedding", q, 5,
      nPlanes = 3, nTables = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    // random uniform vectors are a worst case for LSH (neighbors barely
    // closer than random); 6 tables x 8 buckets still must beat chance
    assert(recall >= 0.5, s"LSH recall $recall")
    assert(approx.nonEmpty && approx.size <= exact.size)
  }

  test("brute-force cosine of identical vectors is 1") {
    val dup = embeddings.limit(1)
      .select(lit(9999L).as("vec_id"), col("embedding"))
    val withDup = embeddings.unionByName(dup)
    val top = Similarity.bruteForceTopK(withDup, "vec_id", "embedding",
      col("id") === 9999L, 1).collect()
    assert(top.length == 1 && top(0).getLong(1) == 0L &&
      top(0).getDouble(2) == 1.0)
  }

  test("text analysis: langId, quality, tokens, fingerprint") {
    val df = Seq(
      (1L, "the cat and the dog of a house is that big"),
      (2L, "der Hund und die Katze ist nicht ein Tier zu"),
      (3L, "xyzzy plugh")).toDF("id", "text")
      .select(col("id"), TextAnalysis.langId(col("text")).as("lang"),
        TextAnalysis.tokenCount(col("text")).as("n"),
        TextAnalysis.qualityScore(col("text")).as("q"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
    val rows = df.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getString(1) == "en")
    assert(rows(2L).getString(1) == "de")
    assert(rows(3L).getString(1) == "und")
    assert(rows(1L).getInt(2) == 11)
    val q1 = rows(1L).getDouble(3)
    assert(q1 > 0 && q1 <= 1)
    assert(rows(1L).getString(4).length == 32)
  }

  test("multimodal metadata extraction: real plumbing, stub decode") {
    val media = (0 until 50)
      .map(i => (i.toLong, graft.sources.Ledger.makeHtml(
        graft.sources.Ledger.Config(seed = 5), s"https://m.example.com/$i", i)))
      .toDF("media_id", "payload")
    val meta = Multimodal.extractMeta(media, "media_id", "payload", 4)
    assert(meta.count() == 50)
    assert(meta.columns.toSet == Set("media_id", "n_bytes", "format",
      "width", "height", "n_frames", "checksum"))
    val r = meta.filter(col("media_id") === 7L).collect()(0)
    // deterministic: same payload → same metadata on every run
    val again = Multimodal.extractMeta(media, "media_id", "payload", 2)
      .filter(col("media_id") === 7L).collect()(0)
    assert(r.getLong(6) == again.getLong(6) && r.getInt(3) == again.getInt(3))
    assert(meta.filter(col("width") < 64).count() == 0)
  }
}
