package graft.props

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.SparkSpec
import graft.ops.{AsOfJoin, Backfill, IntervalJoin, Sessionize, Windows}

/** Property-based laws for the core temporal operators: randomized inputs
  * (duplicate timestamps, empty sides, skewed entities, arbitrary bucket
  * widths) against executable-specification brute forces. Complements the
  * example-based specs: these explore the corner lattice (empty group ×
  * duplicate ts × negative ts × bucket boundary) no hand-written case
  * list covers. */
object EngineProps extends Properties("graft") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  // keep Spark-job count sane: each case runs real (local) jobs
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12).withMaxDiscardRatio(10)

  private val rowGen: Gen[(String, Long, Double)] = for {
    e <- Gen.oneOf("a", "b", "c") // few entities → dense ts collisions
    ts <- Gen.choose(-20L, 120L)
    v <- Gen.choose(-400, 400).map(_.toDouble / 4)
  } yield (e, ts, v)

  private val rowsGen: Gen[List[(String, Long, Double)]] =
    Gen.choose(0, 50).flatMap(n => Gen.listOfN(n, rowGen))

  property("asOf/asOfMerge == brute force for any input and bucket width") =
    Prop.forAll(rowsGen, rowsGen, Gen.oneOf(1L, 3L, 7L, 64L, 1000L)) { (b, p, width) =>
      val build = b.toDF("entity", "ts", "v")
      val probes = p.zipWithIndex
        .map { case ((e, ts, _), i) => (e, ts, i) }
        .toDF("entity", "ts", "pid")
      // executable spec: dedupe build per (entity, ts) by max v, then for
      // each probe the latest build at-or-before, ties by max v
      val dedup = b.groupBy(r => (r._1, r._2)).map { case ((e, t), rs) => (e, t, rs.map(_._3).max) }
      val want = p.zipWithIndex.map { case ((e, ts, _), i) =>
        val c = dedup.filter(x => x._1 == e && x._2 <= ts)
        i -> (if (c.isEmpty) None else Some(c.maxBy(x => (x._2, x._3))).map(x => (x._2, x._3)))
      }.toMap
      def got(merge: Boolean) = {
        val out =
          if (merge) AsOfJoin.asOfMerge(probes, build, "entity", "ts", Seq("v"), width)
          else AsOfJoin.asOf(probes, build, "entity", "ts", Seq("v"), width)
        out.collect().map { r =>
          val i = r.getInt(r.fieldIndex("pid"))
          val src = r.fieldIndex(AsOfJoin.SrcTs)
          i -> (if (r.isNullAt(src)) None
                else Some((r.getLong(src), r.getDouble(r.fieldIndex("v")))))
        }.toMap
      }
      val w = got(merge = false)
      val m = got(merge = true)
      (w == want) :| s"window variant: $w != $want" &&
      (m == want) :| s"merge variant: $m != $want"
    }

  property("locf: fill equals last non-null at-or-before, in any bucket width") =
    Prop.forAll(rowsGen, Gen.oneOf(1L, 5L, 64L)) { (rows, width) =>
      // unique (entity, ts): keep max v, null out ~half the values as gaps
      val uniq = rows.groupBy(r => (r._1, r._2)).map { case ((e, t), rs) =>
        (e, t, if (t % 2 == 0) Some(rs.map(_._3).max) else None)
      }.toList
      val df = uniq.toDF("entity", "ts", "v")
      val want = uniq.map { case (e, t, _) =>
        (e, t) -> uniq.filter(x => x._1 == e && x._2 <= t && x._3.isDefined)
          .sortBy(_._2).lastOption.flatMap(_._3)
      }.toMap
      def toMapOut(df2: org.apache.spark.sql.DataFrame, c: String) =
        df2.collect().map { r =>
          (r.getString(r.fieldIndex("entity")), r.getLong(r.fieldIndex("ts"))) ->
            (if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getDouble(r.fieldIndex(c))))
        }.toMap
      val plain = toMapOut(Backfill.locf(df, "entity", "ts", Seq("v")), "v_filled")
      val bucketed = toMapOut(
        Backfill.locfBucketed(df, "entity", "ts", "v", width), "v_filled")
      (plain == want) :| s"locf: $plain != $want" &&
      (bucketed == want) :| s"locfBucketed($width): $bucketed != $want"
    }

  property("sessionize: consecutive gaps <= threshold inside, > threshold across") =
    Prop.forAll(rowsGen, Gen.oneOf(1L, 10L, 40L)) { (rows, gap) =>
      val uniq = rows.groupBy(r => (r._1, r._2)).map { case ((e, t), rs) =>
        (e, t, rs.head._3)
      }.toList
      val out = Sessionize.sessionize(uniq.toDF("entity", "ts", "v"), "entity", "ts", gap)
        .select("entity", "ts", "session_id")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1)
      out.values.forall { es =>
        val sorted = es.sortBy(_._2)
        sorted.zip(sorted.drop(1)).forall { case ((_, t1, s1), (_, t2, s2)) =>
          if (t2 - t1 > gap) s2 == s1 + 1 else s2 == s1
        }
      }
    }

  property("asOfWithin: infinite tolerance == asOf; any tolerance == brute bound") =
    Prop.forAll(rowsGen, rowsGen, Gen.oneOf(0L, 3L, 25L, Long.MaxValue)) { (b, p, tol) =>
      val build = b.toDF("entity", "ts", "v")
      val probes = p.zipWithIndex
        .map { case ((e, ts, _), i) => (e, ts, i) }
        .toDF("entity", "ts", "pid")
      val dedup = b.groupBy(r => (r._1, r._2)).map { case ((e, t), rs) => (e, t, rs.map(_._3).max) }
      val want = p.zipWithIndex.map { case ((e, ts, _), i) =>
        val c = dedup.filter(x => x._1 == e && x._2 <= ts && ts - x._2 <= tol)
        i -> (if (c.isEmpty) None else Some(c.maxBy(x => (x._2, x._3))).map(x => (x._2, x._3)))
      }.toMap
      val got = AsOfJoin
        .asOfWithin(probes, build, "entity", "ts", Seq("v"), 7L, tol)
        .collect()
        .map { r =>
          val pid = r.getInt(r.fieldIndex("pid"))
          pid -> (if (r.isNullAt(r.fieldIndex(AsOfJoin.SrcTs))) None
                  else Some((r.getLong(r.fieldIndex(AsOfJoin.SrcTs)), r.getDouble(r.fieldIndex("v")))))
        }
        .toMap
      (got == want) :| s"asOfWithin($tol): $got != $want"
    }

  property("rangeJoin == brute-force interval filter for any window/bucket") =
    Prop.forAll(
      rowsGen, rowsGen,
      Gen.oneOf(0L, 2L, 10L), Gen.oneOf(0L, 3L, 15L), Gen.oneOf(0L, 1L, 7L, 100L)) {
      (ls, rs, before, after, width) =>
        (before + after > 0) ==> {
          val left = ls.zipWithIndex
            .map { case ((e, ts, _), i) => (e, ts, i) }
            .toDF("entity", "lts", "lid")
          val right = rs.zipWithIndex
            .map { case ((e, ts, _), i) => (e, ts, i) }
            .toDF("entity", "rts", "rid")
          val want = (for {
            ((le, lts, _), li) <- ls.zipWithIndex
            ((re, rts, _), ri) <- rs.zipWithIndex
            if le == re && rts >= lts - before && rts < lts + after
          } yield (li, ri)).toSet
          val got = IntervalJoin
            .rangeJoin(left, right, "entity", "lts", "rts", before, after, width)
            .select("lid", "rid")
            .collect()
            .map(r => (r.getInt(0), r.getInt(1)))
            .toSet
          (got == want) :| s"rangeJoin($before,$after,$width): $got != $want"
        }
    }

  property("nocb == locf on the time-reversed axis") =
    Prop.forAll(rowsGen) { rows =>
      val uniq = rows.groupBy(r => (r._1, r._2)).map { case ((e, t), rs) =>
        (e, t, if (t % 2 == 0) Some(rs.map(_._3).max) else None)
      }.toList
      val df = uniq.toDF("entity", "ts", "v")
      def toMapOut(df2: org.apache.spark.sql.DataFrame, c: String, negate: Boolean) =
        df2.collect().map { r =>
          val t = r.getLong(r.fieldIndex("ts"))
          (r.getString(r.fieldIndex("entity")), if (negate) -t else t) ->
            (if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getDouble(r.fieldIndex(c))))
        }.toMap
      val bfill = toMapOut(Backfill.nocb(df, "entity", "ts", Seq("v")), "v_bfilled", negate = false)
      val mirrored = toMapOut(
        Backfill.locf(
          uniq.map { case (e, t, v) => (e, -t, v) }.toDF("entity", "ts", "v"),
          "entity", "ts", Seq("v")),
        "v_filled", negate = true)
      (bfill == mirrored) :| s"nocb: $bfill != mirrored locf $mirrored"
    }

  property("tumbling tails: ceil keeps every row, floor drops only short tails") =
    Prop.forAll(rowsGen, Gen.oneOf(2L, 7L, 30L)) { (rows, width) =>
      val uniq = rows.groupBy(r => (r._1, r._2)).map { case ((e, t), rs) =>
        (e, math.abs(t), rs.head._3) // tumblingAgg buckets need ts >= 0
      }.toList
      val df = uniq.toDF("entity", "ts", "v")
      import org.apache.spark.sql.functions._
      def total(tail: Windows.TailMode) = Windows
        .tumblingAgg(df, "entity", "ts", width, tail, Seq(count(lit(1)).as("n")))
        .agg(coalesce(sum("win_n"), lit(0L))).head().getLong(0)
      val n = uniq.size.toLong
      // FloorTail's criterion is win_n == size (dense-axis fullness)
      val floorWant = uniq
        .groupBy(r => (r._1, r._2 / width))
        .values.map(_.size.toLong).filter(_ == width).sum
      val ceil = total(Windows.CeilTail)
      val floor = total(Windows.FloorTail)
      (ceil == n) :| s"ceil lost rows: $ceil != $n" &&
      (floor == floorWant) :| s"floor: $floor != $floorWant"
    }
}
