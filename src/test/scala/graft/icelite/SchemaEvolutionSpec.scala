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
    val wh = graft.GraftTmp.dir("evo_spec").toString
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

  test("merge whose updates lack an evolved column still applies") {
    // Reads use mergeSchema=true, so after a schema-evolving append a
    // merge keyed on the original columns must not throw and must
    // null-fill the missing column on the update rows.
    val wh = graft.GraftTmp.dir("evo_spec3").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplace(ref, Seq((1, "a")).toDF("k", "v"))
    IceLite.append(ref, Seq((2, "b", 9.5)).toDF("k", "v", "score"))
    IceLite.merge(spark, ref, Seq((1, "A"), (3, "c")).toDF("k", "v"), Seq("k"))

    val rows = IceLite.read(spark, ref).select($"k", $"v", $"score")
      .as[(Int, String, Option[Double])].collect().sortBy(_._1).toSeq
    assert(rows == Seq((1, "A", None), (2, "b", Some(9.5)), (3, "c", None)))
  }

  test("merge threads statsCols into the committed snapshot") {
    val wh = graft.GraftTmp.dir("evo_spec4").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplace(ref, Seq((1, 10.0), (2, 20.0)).toDF("k", "x"),
      statsCols = Seq("k"))
    val snap = IceLite.merge(spark, ref, Seq((3, 30.0)).toDF("k", "x"),
      Seq("k"), statsCols = Seq("k"))
    assert(snap.fileStats.nonEmpty, "merge snapshot lost file stats")
    val allStats = snap.fileStats.values.flatten.filter(_.col == "k")
    assert(allStats.nonEmpty)
    assert(allStats.map(_.min).min == 1.0 && allStats.map(_.max).max == 3.0)
  }

  test("time travel before the evolution sees the original schema") {
    val wh = graft.GraftTmp.dir("evo_spec2").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    val s1 = IceLite.createOrReplace(ref, Seq((1, "a")).toDF("k", "v"))
    IceLite.append(ref, Seq((2, "b", 9.5)).toDF("k", "v", "score"))
    assert(IceLite.readAt(spark, ref, s1.id).columns.sorted.toSeq == Seq("k", "v"))
  }
}
