package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics

/** Property armor for the histogram-select exact quantiles: on arbitrary
  * data (duplicates, negatives, skew, tiny groups) the two-pass bucketed
  * selection must agree with Spark's builtin exact `percentile`
  * aggregate — same interpolation semantics, totally different plan.
  * Deterministic seeded generation, 30 shapes.
  */
class QuantilesPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("bucketed selection == builtin percentile on arbitrary data") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    def value(): Double = rnd.nextInt(4) match {
      case 0 => (rnd.nextDouble() - 0.5) * 2e6
      case 1 => (rnd.nextDouble() - 0.5) * 2.0
      case 2 => Seq(0.0, -0.0, 1.0, -1.0, 42.42, 1e300, -1e300)(rnd.nextInt(7))
      case _ => (rnd.nextInt(5) + 1).toDouble // heavy duplicates
    }
    (1 to 30).foreach { trial =>
      val n = rnd.nextInt(120) + 1
      val rows = (0 until n).map(_ => (Seq("a", "b", "c")(rnd.nextInt(3)), value()))
      val df = rows.toDF("g", "v")
      val got = Analytics.exactQuantiles(df, "g",
        Seq("v" -> Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9)))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      val ref = df.groupBy(col("g"))
        .agg(expr("transform(percentile(v, array(0.25, 0.5, 0.9)), " +
          // the engine's deterministic rounding contract: floor half-up
          // idiom under |x| < 1e14, pass-through above (4 dp is sub-ulp
          // there and Spark floor's LONG output would overflow)
          "x -> CASE WHEN abs(x) < 1e14 THEN floor(x * 10000.0 + 0.5) / 10000.0 ELSE x END)").as("ps"))
        .collect().map { r =>
          val ps = r.getSeq[Double](1)
          r.getString(0) -> (ps(0), ps(1), ps(2))
        }.toMap
      assert(got == ref, s"trial $trial (n=$n): $got vs $ref\nrows=$rows")
    }
  }
}
