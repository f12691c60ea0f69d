package graft

/** Single-level scaling run in a fresh JVM: args = cpus [reps] [mode] [path].
  * Prints "SCALE cpus=N mode=M rep=I rows=R rps=X" lines; Bench spawns this
  * per level so each measurement gets a pristine JVM (sequential
  * SparkSessions in one JVM degrade unpredictably — JIT/metaspace churn). */
object ScaleOne {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val reps = if (args.length > 1) args(1).toInt else 1
    val mode = if (args.length > 2) args(2) else "full"
    val path = if (args.length > 3) args(3) else "/tmp/graft_bench_images_64x1024"
    (1 to reps).foreach { i =>
      val (rows, rps) = Bench.flagshipRpsPublic(cpus, path, mode)
      println(f"SCALE cpus=$cpus mode=$mode rep=$i rows=$rows rps=$rps%.1f")
    }
  }
}
