package graft.relational

/** Dev profiling main for the q537 selection passes.
  * Usage: runMain graft.relational.ProfHl <sfDir>
  */
object ProfHl {
  def main(args: Array[String]): Unit = {
    val s = graft.core.GraftSession.local("prof-hl")
    val t0 = System.nanoTime()
    val out = HodgesLehmann.q537HodgesLehmann(s, args(0)).collect()
    println(s"total ${(System.nanoTime() - t0) / 1e9}s -> " +
      out.head.toString)
    s.stop()
  }
}
