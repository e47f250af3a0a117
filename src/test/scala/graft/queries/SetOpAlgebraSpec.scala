package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.TestSpark

/** SURVEY §5.2.4: set-operation algebra (b44-b47) checked against the
  * Scala-collection reference model on generated data. */
class SetOpAlgebraSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val lists = Gen.listOfN(12, Gen.choose(0, 6))

  test("unionAll = bag concat; union = set union; intersect/except = set semantics") {
    (0 until 8).foreach { trial =>
      val xs = lists.pureApply(Gen.Parameters.default, Seed(7L + trial))
      val ys = lists.pureApply(Gen.Parameters.default, Seed(77L + trial))
      val a = xs.toDF("k")
      val b = ys.toDF("k")

      val unionAll = a.unionByName(b).as[Int].collect().sorted.toSeq
      assert(unionAll == (xs ++ ys).sorted, "UNION ALL is bag concat")

      val union = a.unionByName(b).distinct().as[Int].collect().sorted.toSeq
      assert(union == (xs.toSet ++ ys.toSet).toSeq.sorted, "UNION dedups")

      // Spark intersect/except are SET ops (dedup), matching SQL
      val inter = a.intersect(b).as[Int].collect().sorted.toSeq
      assert(inter == (xs.toSet & ys.toSet).toSeq.sorted, "INTERSECT")

      val except = a.except(b).as[Int].collect().sorted.toSeq
      assert(except == (xs.toSet -- ys.toSet).toSeq.sorted, "EXCEPT")
    }
  }
}
