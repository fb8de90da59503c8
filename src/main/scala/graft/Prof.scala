package graft

/** Opt-in step profiler for the composed store-build paths (guide §1:
  * measure first). OFF unless SPARK_GRAFT_PROF=1 (or -Dgraft.prof=1) —
  * production/bench behavior is unchanged; when on, each wrapped step
  * prints one `[prof] <label> <sec>s` stderr line, so a 40–95 s
  * composed build decomposes into the sink/gate/read-back steps that
  * actually carry the time instead of being re-run folklore. Driver-
  * side wall time only: every wrapped step is a synchronous Spark
  * action or commit, so the wall time IS the step's cost.
  */
object Prof {
  val enabled: Boolean =
    sys.env.get("SPARK_GRAFT_PROF").contains("1") ||
      sys.props.get("graft.prof").contains("1")

  def apply[T](label: String)(f: => T): T =
    if (!enabled) f
    else {
      val t0 = System.nanoTime()
      try f
      finally System.err.println(
        f"[prof] $label ${(System.nanoTime() - t0) / 1e9}%.3fs " +
          s"@${System.currentTimeMillis() / 1000}")
    }
}
