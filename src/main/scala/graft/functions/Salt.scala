package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions
import org.apache.spark.sql.functions._

/** Explicit skew handling (BASELINE.json north_rule: "salted repartitioning
  * on url-hash to defuse hot-domain skew").
  *
  * Two DISTINCT hash roles — never conflate them (SURVEY.md §7 watch list):
  *
  *  - [[bucket]] — the STORAGE bucket: `pmod(xxhash64(url), nBuckets)`.
  *    Stable table layout; unsalted, so a key always lives in one bucket.
  *  - [[salted]] — the SHUFFLE key: `bucket * nSalts + salt` where the salt
  *    is derived from a per-row value (`offset`). Spreads a hot bucket's
  *    *write/compute* work over `nSalts` tasks without changing layout.
  *
  * All expression composition (codegen'd builtins) — no UDF.
  */
object Salt {

  /** Storage bucket for a url. */
  def bucket(url: Column, nBuckets: Int): Column =
    pmod(xxhash64(url), lit(nBuckets.toLong)).cast("int")

  /** Salted shuffle key: deterministic, derived from (url-bucket, rowSalt). */
  def salted(url: Column, rowSalt: Column, nBuckets: Int, nSalts: Int): Column =
    bucket(url, nBuckets) * lit(nSalts) + pmod(rowSalt, lit(nSalts)).cast("int")

  /** [[bucket]] of one literal key, evaluated DRIVER-SIDE (metadata/bucket
    * pruning from point predicates). Built from the same Catalyst
    * expressions `bucket`'s Column resolves to — `cast(pmod(xxhash64(v),
    * n) as int)`, seed 42 — because a Column built from
    * `functions.xxhash64` holds an UNRESOLVED function until the analyzer
    * runs and cannot be `eval`'d directly. The data-source pruning spec
    * pins read/write agreement by destroying every other bucket's files.
    */
  def bucketOfLiteral(l: expressions.Literal, nBuckets: Int): Int =
    expressions.Cast(
      expressions.Pmod(new expressions.XxHash64(Seq(l)),
        expressions.Literal(nBuckets.toLong)),
      org.apache.spark.sql.types.IntegerType).eval(null).asInstanceOf[Int]

  /** [[bucketOfLiteral]] over a plain Scala/Java value. */
  def bucketOfValue(v: Any, nBuckets: Int): Int =
    bucketOfLiteral(expressions.Literal(v), nBuckets)
}
