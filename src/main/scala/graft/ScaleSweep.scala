package graft

/** Manual scaling sweep (tuning loop): spawn one time-boxed child per level
  * and print per-level best rps + pair efficiencies.
  * args = [budgetPerChildSec] [levels...] (default 90 over 2 8 32). */
object ScaleSweep {
  def main(args: Array[String]): Unit = {
    val budget = if (args.length > 0) args(0).toLong else 90L
    val levels = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(2, 8, 32)
    val path = Bench.materializePublic(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_ENTITIES", "128").toInt,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_FRAMES", "1024").toInt)
    val rps = levels.flatMap { c =>
      val r = Bench.spawnLevelPublic(c, path, budget)
      println(s"SWEEP cpus=$c -> $r")
      r.map(c -> _._2)
    }.toMap
    for (Seq(lo, hi) <- levels.sliding(2))
      for (l <- rps.get(lo); h <- rps.get(hi))
        println(f"SWEEP eff_${lo}_$hi=${(h / l) / (hi.toDouble / lo)}%.3f")
  }
}
