package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.feats.VecOps

/** SQL front door for the native expressions: `cosine_sim` planned from SQL
  * text must be the same CosineSim expression the DataFrame surface uses. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim is callable from SQL and equals the DataFrame form") {
    GraftExtensions.register(spark)
    Seq(
      (Seq(1.0, 2.0, 2.0), Seq(2.0, 0.0, 1.0)),
      (Seq(0.0, 0.0, 0.0), Seq(1.0, 1.0, 1.0)))
      .toDF("a", "b")
      .createOrReplaceTempView("cos_in")
    val sqlOut = spark.sql("SELECT cosine_sim(a, b) AS c FROM cos_in").collect()
    val dfOut = spark.table("cos_in").select(VecOps.cosineFast($"a", $"b").as("c")).collect()
    assert(sqlOut.map(_.toSeq).toSeq == dfOut.map(_.toSeq).toSeq)
    assert(!sqlOut(0).isNullAt(0) && sqlOut(0).getDouble(0) ==
      4.0 / (3.0 * math.sqrt(5.0)))
    assert(sqlOut(1).isNullAt(0), "zero-norm input must yield null")
  }

  test("the extensions class injects the same functions at session build") {
    // same builders the spark.sql.extensions path would inject
    assert(GraftExtensions.functions.map(_._1) == Seq("cosine_sim"))
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val e = GraftExtensions.functions.head._3
    val expr = e(Seq(
      ColumnBridge.expression(lit(Array(1.0))),
      ColumnBridge.expression(lit(Array(1.0)))))
    assert(expr.isInstanceOf[CosineSim])
    intercept[IllegalArgumentException](e(Seq(ColumnBridge.expression(lit(1)))))
  }
}
