package graft

object SpawnTest {
  def main(args: Array[String]): Unit = {
    Seq(16, 32).foreach { c =>
      val (rows, rps) = Bench.spawnLevelPublic(c, "/tmp/graft_bench_images_64x1024")
      println(f"SPAWNED cpus=$c rows=$rows rps=$rps%.1f")
    }
  }
}
