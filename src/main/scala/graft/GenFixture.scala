package graft

/** Materialize a bench fixture: args = entities frames. */
object GenFixture {
  def main(args: Array[String]): Unit =
    println("fixture: " + Bench.materializePublic(args(0).toInt, args(1).toInt))
}
