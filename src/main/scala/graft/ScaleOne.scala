package graft

/** Full-pass probe in a fresh JVM: args = cpus [reps] [mode] [path].
  * Prints "SCALE cpus=N mode=M rep=I rows=R rps=X" per rep (best-of-k in
  * flagshipRps). For driver scaling, Bench spawns the time-boxed
  * graft.ScaleChild instead; this stays for manual full-pass comparisons. */
object ScaleOne {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val reps = if (args.length > 1) args(1).toInt else 1
    val mode = if (args.length > 2) args(2) else "full"
    val path = if (args.length > 3) args(3) else s"/tmp/graft_bench_images_128x1024_c${Bench.NChunks}"
    (1 to reps).foreach { i =>
      val (rows, rps) = Bench.flagshipRpsPublic(cpus, path, mode)
      println(f"SCALE cpus=$cpus mode=$mode rep=$i rows=$rows rps=$rps%.1f")
    }
  }
}
