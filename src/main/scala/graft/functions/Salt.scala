package graft.functions

import org.apache.spark.sql.Column
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
}
