package graft

/** Smoke test of the child-JVM spawn path: one short time-boxed child per
  * level, printing what the parent harvested. */
object SpawnTest {
  def main(args: Array[String]): Unit = {
    val path = Bench.materializePublic(128, 1024)
    Seq(8, 32).foreach { c =>
      val r = Bench.spawnLevelPublic(c, path, 45L)
      println(s"SPAWNTEST cpus=$c harvested=$r")
    }
  }
}
