package graft.util

/** Opt-in phase timing for the replay path (set `SPARK_GRAFT_PHASE_TIMING`
  * to enable): wall-times driver-visible actions so the FIXED per-replay
  * cost — the Amdahl term that bounds scaling efficiency at 1000
  * executors just as it does between local[2] and local[8] — can be
  * attributed and attacked instead of guessed at. Zero overhead when off.
  */
object Phase {
  private val enabled = sys.env.contains("SPARK_GRAFT_PHASE_TIMING")

  def apply[A](name: String)(f: => A): A = {
    if (!enabled) f
    else {
      val t0 = System.nanoTime()
      try f
      finally System.err.println(
        f"[phase] $name%-24s ${(System.nanoTime() - t0) / 1e3}%.0f us")
    }
  }
}
