package graft.util

/** Deterministic, splittable, counter-based randomness.
  *
  * Every generated value is a pure function of `(seed, counter, stream)`, so
  * the synthetic ledger is byte-identical regardless of Spark partitioning,
  * task order, or parallelism level — a requirement for the replay /
  * reconvergence tests (SURVEY.md §5.3) and for the two-parallelism scaling
  * bench to run on the *same* input.
  *
  * The mixer is SplitMix64 (public domain, Steele et al., "Fast Splittable
  * Pseudorandom Number Generators", OOPSLA 2014) — the same finalizer Spark
  * itself uses to seed per-partition RNGs.
  */
object Det {

  /** SplitMix64 finalizer over a combined (seed, counter, stream) state. */
  def mix64(seed: Long, counter: Long, stream: Long): Long = {
    var z = seed + counter * 0x9E3779B97F4A7C15L + stream * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Uniform double in [0, 1). */
  def uniform(seed: Long, counter: Long, stream: Long): Double =
    (mix64(seed, counter, stream) >>> 11) * 1.1102230246251565e-16 // 2^-53

  /** Uniform int in [0, n). */
  def uniformInt(seed: Long, counter: Long, stream: Long, n: Int): Int =
    ((mix64(seed, counter, stream) >>> 1) % n).toInt

  /** Zipf(s) sampler over ranks [0, n) via precomputed CDF.
    * Returns the CDF array; binary-search it with a uniform draw.
    */
  def zipfCdf(n: Int, s: Double): Array[Double] = {
    val w = Array.tabulate(n)(i => 1.0 / math.pow(i + 1.0, s))
    val total = w.sum
    val cdf = new Array[Double](n)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf(n - 1) = 1.0
    cdf
  }

  def zipfPick(cdf: Array[Double], u: Double): Int = {
    val i = java.util.Arrays.binarySearch(cdf, u)
    if (i >= 0) i else math.min(-(i + 1), cdf.length - 1)
  }
}
