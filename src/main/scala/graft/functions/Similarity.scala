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

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for the query rows (`queryPred` selects
    * them) against the whole corpus. Deterministic tie-break on neighbor id.
    */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int): DataFrame = {
    val base = emb.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
    val q = base.filter(queryPred).select(col("id").as("q_id"), col("v").as("q_v"))
    val scored = base.join(q, col("id") =!= col("q_id"))
      .withColumn("cos", cosine(col("q_v"), col("v")))
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
    val base = emb.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("bucket", explode(array(buckets: _*)))
    val q = base.filter(queryPred)
      .select(col("id").as("q_id"), col("v").as("q_v"), col("bucket"))
    val scored = base.join(q, Seq("bucket"))
      .filter(col("id") =!= col("q_id"))
      .select(col("q_id"), col("id"), col("q_v"), col("v"))
      .dropDuplicates("q_id", "id") // a pair may collide in several tables
      .withColumn("cos", cosine(col("q_v"), col("v")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("id").as("n_id"), round(col("cos"), 4).as("cos"),
        col("rank"))
  }
}
