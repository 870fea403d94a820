package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / split assignment for training-data pipelines.
  *
  * A 100 TB corpus needs its train/val/test membership to be (a) a pure
  * per-row projection — no shuffle, no global state, no sampling pass —
  * and (b) REPRODUCIBLE: the same document must land in the same split
  * on every re-run, after reprocessing, and across engines (leakage
  * between splits on a re-crawl silently invalidates evals). Both follow
  * from keying the decision on a stable id through the engine-portable
  * 60-bit md5 hash ([[DedupOps.portableHash]]), salted per PURPOSE so
  * the split decision, sampling decision, etc. on one id are mutually
  * independent. All thresholds are INTEGER lane comparisons (`hash %
  * 100`), so any engine that can md5 reproduces membership bit-exactly
  * (the DuckDB oracles do).
  */
object Sampling {

  /** Uniform lane in [0, mod) from a stable id: salted portable hash.
    * The salt is appended to the id's string form — decisions with
    * different salts are independent.
    */
  def lane(id: Column, salt: String, mod: Int): Column =
    pmod(DedupOps.portableHash(concat(id.cast("string"), lit(":" + salt))),
      lit(mod.toLong))

  /** Assign `train`/`valid`/`test` by id: `trainPct`% of lanes to train,
    * `validPct`% to valid, the rest to test. Pure projection; codegen'd.
    */
  def splitColumn(id: Column, trainPct: Int = 80, validPct: Int = 10,
      salt: String = "split"): Column = {
    require(trainPct > 0 && validPct >= 0 && trainPct + validPct < 100,
      s"bad split percentages: $trainPct/$validPct")
    val l = lane(id, salt, 100)
    when(l < trainPct, lit("train"))
      .when(l < trainPct + validPct, lit("valid"))
      .otherwise(lit("test"))
  }

  /** Keep a deterministic `pct`% of rows by id. Unlike `TABLESAMPLE` /
    * `df.sample`, membership is stable across runs and engines — the
    * right tool for carving a fixed eval subset out of a moving corpus.
    */
  def deterministicSample(df: DataFrame, id: Column, pct: Int,
      salt: String = "sample"): DataFrame = {
    require(pct > 0 && pct <= 100, s"bad sample percentage: $pct")
    df.filter(lane(id, salt, 100) < pct)
  }
}
