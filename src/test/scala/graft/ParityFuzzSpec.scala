package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeSeries

/** Independent-implementation parity on seeded random data: the custom
  * AsOfJoinExec must agree with the union+window formulation row for
  * row, and the native graft_topk aggregate must agree with a window
  * ranking — including timestamp collisions, duplicate scores and NaN.
  */
class ParityFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("custom as-of operator == window formulation on random event streams") {
    import spark.implicits._
    val rnd = new scala.util.Random(42L)
    (1 to 10).foreach { trial =>
      val n = rnd.nextInt(300) + 20
      // coarse timestamp grid forces click-at-purchase-time collisions,
      // but at most ONE CLICK per (user, ts): two same-instant clicks
      // would make last_click_val genuinely ambiguous (resolved only by
      // physical row order, which neither implementation promises)
      val rows = (0 until n).map { i =>
        (i.toLong, (rnd.nextInt(40) * 1000000000L), rnd.nextInt(4).toLong,
          if (rnd.nextBoolean()) "click" else "purchase", rnd.nextInt(100).toDouble)
      }.groupBy(r => (r._3, r._2, r._4)).values.map(_.head).toSeq
      val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("{}"))
      val dir = java.nio.file.Files.createTempDirectory("asof").toString
      df.write.mode("overwrite").parquet(s"$dir/events.parquet")
      val t = Tables(spark, dir)
      val a = TimeSeries.tsAsof(t).collect().map(_.toSeq).toSeq
      val b = TimeSeries.tsAsofNative(t).collect().map(_.toSeq).toSeq
      assert(a == b, s"trial $trial (n=$n): window vs native diverged")
    }
  }

  test("graft_topk aggregate == window ranking on random scores with NaN") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    (1 to 10).foreach { trial =>
      val n = rnd.nextInt(400) + 10
      val rows = (0 until n).map { i =>
        val s = rnd.nextInt(6) match {
          case 0 => Double.NaN
          case 1 => rnd.nextInt(3).toDouble // heavy duplicate scores
          case _ => rnd.nextDouble() * 100
        }
        (rnd.nextInt(3).toLong, s, i.toLong)
      }
      val df = rows.toDF("g", "score", "id").repartition(5)
      val agg = df.groupBy(col("g"))
        .agg(expr("graft_topk(struct(score, id), 3)").as("top"))
        .select(col("g"), posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("g"), col("pos"), col("e.score"), col("e.id"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3))).sortBy(x => (x._1, x._2))
      val win = df.withColumn("rk",
          row_number().over(Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))))
        .filter(col("rk") <= 3)
        .select(col("g"), (col("rk") - 1).cast("int").as("pos"), col("score"), col("id"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3))).sortBy(x => (x._1, x._2))
      // NaN != NaN under ==, so compare with an NaN-aware equality
      def same(x: (Long, Int, Double, Long), y: (Long, Int, Double, Long)) =
        x._1 == y._1 && x._2 == y._2 && x._4 == y._4 &&
          (x._3 == y._3 || (x._3.isNaN && y._3.isNaN))
      assert(agg.length == win.length && agg.zip(win).forall((same _).tupled),
        s"trial $trial (n=$n): agg ${agg.toSeq} vs window ${win.toSeq}")
    }
  }
}
