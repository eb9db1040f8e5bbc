package graft.util

/** Opt-in phase timing for engine internals: enable with
  * `-Dgraft.timing=1` (or env GRAFT_TIMING=1). Zero overhead when off
  * beyond a volatile read; never enabled in bench/verify runs. */
object Timing {
  val enabled: Boolean =
    sys.props.get("graft.timing").contains("1") || sys.env.get("GRAFT_TIMING").contains("1")

  def timed[A](label: => String)(body: => A): A =
    if (!enabled) body
    else {
      val t0 = System.nanoTime()
      try body
      finally println(f"[graft-timing] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
}
