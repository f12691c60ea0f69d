package graft

/** Standalone scaling probe: flagship rows/sec at local[8] vs local[32] only
  * (no per-query loop) — used while tuning; Bench embeds the same logic. */
object ScaleProbe {
  def main(args: Array[String]): Unit = Bench.scaleOnly()
}
