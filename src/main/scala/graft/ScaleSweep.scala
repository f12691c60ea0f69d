package graft

/** Just the two-sweep scaling section of Bench (no query loop). */
object ScaleSweep {
  def main(args: Array[String]): Unit = Bench.scaleSweepOnly()
}
