package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsOf

/** Custom AsOfJoin operator: edge cases + parity with the window-based
  * formulation on real data.
  */
class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("matches the union+window as-of on sf0.001 row for row") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val a = graft.operators.TimeSeries.tsAsof(t).collect().toSeq
    val b = graft.operators.TimeSeries.tsAsofNative(t).collect().toSeq
    assert(a == b)
  }

  test("null-pads when no earlier right row; equality counts as at-or-before") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 100L, 10.0), (1L, 150L, 20.0), (3L, 1L, 99.0))
      .toDF("rk", "rt", "rv")
    val out = AsOf.join(left, right, "k", "rk", "t", "rt")
      .orderBy(col("k"), col("t")).collect()
    // p1 at t=100 matches the rt=100 row (<=); p2 matches rt=150; p3 has no match
    assert(out(0).getAs[Double]("rv") == 10.0)
    assert(out(1).getAs[Double]("rv") == 20.0)
    assert(out(2).isNullAt(out(2).fieldIndex("rv")))
  }

  test("null keys never match key 0 and produce null-padded output") {
    import spark.implicits._
    val left = Seq((Some(0L), 100L, "zero-key"), (None, 100L, "null-key"))
      .toDF("k", "t", "tag")
    val right = Seq((Some(0L), 50L, 7.0), (None, 1L, 99.0)).toDF("rk", "rt", "rv")
    val out = AsOf.join(left, right, "k", "rk", "t", "rt").collect()
      .map(r => Option(r.getAs[String]("tag")).get -> (if (r.isNullAt(r.fieldIndex("rv"))) None else Some(r.getDouble(r.fieldIndex("rv"))))).toMap
    assert(out("zero-key") == Some(7.0), "key 0 matches only the key-0 right row")
    assert(out("null-key") == None, "null key matches nothing")
  }

  test("keys scattered across partitions still co-locate") {
    import spark.implicits._
    val left = (0L until 100L).map(i => (i % 7, i * 10, i)).toDF("k", "t", "id").repartition(5)
    val right = (0L until 50L).map(i => (i % 7, i * 19, i * 1.0)).toDF("rk", "rt", "rv").repartition(3)
    val out = AsOf.join(left, right, "k", "rk", "t", "rt").collect()
    assert(out.length == 100)
    // spot-check against a driver-side reference computation
    val rightRows = (0L until 50L).map(i => (i % 7, i * 19, i * 1.0))
    out.foreach { r =>
      val k = r.getLong(0); val t = r.getLong(1)
      val expect = rightRows.filter(x => x._1 == k && x._2 <= t).sortBy(_._2).lastOption
      expect match {
        case Some((_, _, rv)) => assert(r.getAs[Double]("rv") == rv, s"k=$k t=$t")
        case None => assert(r.isNullAt(r.fieldIndex("rv")), s"k=$k t=$t expect null")
      }
    }
  }
}
