package graft

/** Run the time-boxed scaling child INLINE (no fork) — for profiling a
  * single level interactively. args = cpus [budgetSec] [path]. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val budget = if (args.length > 1) args(1) else "90"
    val path =
      if (args.length > 2) args(2)
      else Bench.materializePublic(128, 1024)
    System.err.println(s"[probe] inline ScaleChild cpus=${args(0)} budget=${budget}s $path")
    ScaleChild.main(Array(args(0), path, budget))
  }
}
