package graft.icelite

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.TestSpark

/** Schema evolution on append (Iceberg v2 semantics the reference
  * inherits via format-version=2): new columns appear table-wide,
  * older files surface null. */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("append with an added column evolves the schema; old rows read null") {
    val wh = Files.createTempDirectory("evo_spec").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplace(ref, Seq((1, "a")).toDF("k", "v"))
    IceLite.append(ref, Seq((2, "b", 9.5)).toDF("k", "v", "score"))

    val got = IceLite.read(spark, ref)
    assert(got.columns.sorted.toSeq == Seq("k", "score", "v"))
    val rows = got.select($"k", $"v", $"score")
      .as[(Int, String, Option[Double])].collect().sortBy(_._1).toSeq
    assert(rows == Seq((1, "a", None), (2, "b", Some(9.5))))
  }

  test("time travel before the evolution sees the original schema") {
    val wh = Files.createTempDirectory("evo_spec2").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    val s1 = IceLite.createOrReplace(ref, Seq((1, "a")).toDF("k", "v"))
    IceLite.append(ref, Seq((2, "b", 9.5)).toDF("k", "v", "score"))
    assert(IceLite.readAt(spark, ref, s1.id).columns.sorted.toSeq == Seq("k", "v"))
  }
}
