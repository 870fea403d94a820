package graft.functions

import graft.util.Det
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search: brute-force cosine top-k as the exact
  * baseline, and a random-hyperplane LSH-bucketed variant as the scale
  * path.
  *
  * All vector math is expression-composed (`zip_with` + `aggregate` over
  * `array<double>`) — codegen'd, no UDF, no collect. Floats are cast to
  * double BEFORE any arithmetic so results are bit-stable and
  * oracle-comparable.
  *
  * Scale: brute force is O(|Q|·N) — right for small query sets or as the
  * in-bucket scorer; LSH cuts the candidate set to one hyperplane bucket
  * (expected N/2^bits) per probe, turning top-k into a bucket-local join.
  */
object Similarity {

  /** Elementwise float→double cast. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** [[dot]] UNROLLED over a known fixed dimension — bit-identical values
    * (the flat sum keeps `dot`'s exact left-fold order
    * (((0 + a₁b₁) + a₂b₂) + …), so every intermediate double matches),
    * but expressed as codegen-able scalar arithmetic instead of an
    * interpreted `aggregate`/`zip_with` lambda pair. Array higher-order
    * functions are interpreted per element (no codegen, no CSE); on the
    * PAIR-SCORING path this expression runs once per candidate pair, and
    * the interpreted form was the dominant per-pair cost. Callers must
    * know the dimension (the embeddings contract fixes 64); keep the
    * generic [[dot]] for per-row work where the tree-size cost of
    * unrolling outweighs the win (hyperplane buckets, norms of arbitrary
    * callers).
    */
  def dotN(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i => element_at(a, i) * element_at(b, i))
      .foldLeft(lit(0.0))(_ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for the query rows (`queryPred` selects
    * them) against the whole corpus. Deterministic tie-break on neighbor id.
    */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int): DataFrame = {
    // norms once per ROW (they were re-derived per PAIR inside cosine —
    // two extra interpreted array folds per candidate), and the per-pair
    // dot unrolled: same IEEE ops in the same order, so cos is
    // bit-identical to cosine(q_v, v)
    // no parallelizeSmall here: the ann keys run at the COLD head of the
    // bench sequence, where the spread's extra exchange stages cost more
    // in first-use codegen than they save (paired full-Bench A/B:
    // +0.2-0.6 s; isolated warm runs measured a wash)
    val base = emb.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    val q = base.filter(queryPred).select(col("id").as("q_id"),
      col("v").as("q_v"), col("nrm").as("q_n"))
    val scored = base.join(q, col("id") =!= col("q_id"))
      .withColumn("cos",
        dotN(col("q_v"), col("v"), 64) / (col("q_n") * col("nrm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("id").as("n_id"), round(col("cos"), 4).as("cos"),
        col("rank"))
  }

  /** Deterministic random hyperplanes (Det-seeded), as literal arrays —
    * computed once on the driver, constant-folded into the plan.
    */
  def hyperplanes(seed: Long, nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes)(p => Array.tabulate(dim)(d =>
      Det.uniform(seed, p * 10007L + d, 17) * 2.0 - 1.0))

  /** Sign-bit LSH bucket id of a vector under the given hyperplanes. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val terms = planes.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit).toIndexedSeq: _*)
      when(dot(vec, planeCol) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    terms.reduce(_ + _)
  }

  /** Approximate top-k: standard multi-table hyperplane LSH. Each of
    * `nTables` independent tables hashes a vector to a 2^nPlanes bucket;
    * candidates = union over tables of same-bucket rows, scored exactly.
    * Expected candidate fraction ≈ nTables / 2^nPlanes; recall is tested
    * against [[bruteForceTopK]] in the suite.
    */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, nPlanes: Int = 4, nTables: Int = 4,
      seed: Long = 42L): DataFrame = {
    val dim = 64
    val buckets = (0 until nTables).map { t =>
      val planes = hyperplanes(seed + 7919L * t, nPlanes, dim)
      struct(lit(t).as("t"), lshBucket(col("v"), planes).as("h")).as(s"b$t")
    }
    // Materialize (id, v, norm, bucket array) ONCE: the corpus and query
    // sides of the candidate join otherwise each recompute the cast and
    // all nTables×nPlanes hyperplane dots — a broadcast join side cannot
    // reuse the other side's work (verified in the round-6 before-plan:
    // two full scan→project subtrees). The checkpointed row is the §8
    // "decision" proxy (fixed width, no text); norms computed here so the
    // per-pair cosine never re-derives them.
    // no parallelizeSmall (same cold-head rationale as bruteForceTopK)
    val pre = emb.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
      .withColumn("bs", array(buckets: _*))
      .localCheckpoint()
    val base = pre.select(col("id"), col("v"), col("nrm"),
      explode(col("bs")).as("bucket"))
    val q = base.filter(queryPred)
      .select(col("id").as("q_id"), col("v").as("q_v"), col("nrm").as("q_n"),
        col("bucket"))
    val scored = base.join(q, Seq("bucket"))
      .filter(col("id") =!= col("q_id"))
      .select(col("q_id"), col("id"), col("q_v"), col("v"), col("q_n"),
        col("nrm"))
      .dropDuplicates("q_id", "id") // a pair may collide in several tables
      .withColumn("cos",
        dotN(col("q_v"), col("v"), dim) / (col("q_n") * col("nrm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("id").as("n_id"), round(col("cos"), 4).as("cos"),
        col("rank"))
  }
}
