package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Optimization-round plan artifact: dumps `explain("formatted")` for the
  * named driver queries to `plans/<tag>/<query>_<suffix>.txt` using the SAME
  * session shape as the bench loop (local[N], shuffle.partitions=N, AQE on)
  * so exchange counts / join strategies match what the bench executes.
  *
  * args: suffix [queries-csv|all] [sfDir] [cpus] [tag]
  *
  * Queries whose construction is eager-and-expensive or runs a stream
  * (q_streaming_*, q_resume_manifest) are skipped unless named explicitly —
  * same exclusions as ExplainAll.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = if (args.nonEmpty) args(0) else "before"
    val names =
      if (args.length > 1 && args(1) != "all") args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
        .filterNot(Set("q_streaming_tumbling", "q_streaming_session", "q_resume_manifest"))
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 3) args(3).toInt else 32
    val tag = if (args.length > 4) args(4) else "r08"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Paths.get(s"plans/$tag")
    Files.createDirectories(dir)
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          Files.writeString(dir.resolve(s"${name}_$suffix.txt"), plan)
          val exchanges = "Exchange".r.findAllIn(plan).length
          println(s"PLANDUMP $name exchanges=$exchanges chars=${plan.length}")
        } catch {
          case e: Exception => println(s"PLANDUMP $name FAILED: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
