package graft.icelite

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Model-equivalence fuzz for the MoR machinery: random interleavings
  * of append / atomic upsert / equality delete / compact against an
  * in-memory key→value model, asserting the logical read matches
  * after EVERY op. Fixed seeds — failures reproduce exactly. This is
  * the class of test that catches sequence-rule off-by-ones (a
  * re-insert wrongly folded, an upsert hiding its own rows) that
  * single-scenario specs miss. */
class EqMorModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def readState(ref: TableRef): Map[Long, String] =
    IceLite.read(spark, ref).as[(Long, String)].collect().toMap

  // r15: the DECIMAL-keyed twin — same model, keys stored as
  // decimal(12,2) (k/100, exactly representable) and folded back to
  // Long for the model compare. Runs with the driver-fold budget at
  // ZERO so every eq read exercises the executor-side key decode the
  // r15 gate closure added.
  private def runDecimal(seed: Long, ops: Int): Unit = {
    spark.conf.set("spark.graft.icelite.eqDeleteDriverFoldBytes", "0")
    try run(seed, ops, decimalKeyed = true)
    finally spark.conf.unset("spark.graft.icelite.eqDeleteDriverFoldBytes")
  }

  private def run(seed: Long, ops: Int,
      decimalKeyed: Boolean = false): Unit = {
    val rnd = new scala.util.Random(seed)
    val wh = graft.GraftTmp.dir(s"eqmor_model_$seed").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    var model = Map.empty[Long, String]
    var nextKey = 0L
    def freshKeys(n: Int): Seq[Long] = {
      val ks = (nextKey until nextKey + n); nextKey += n; ks
    }
    def existing(n: Int): Seq[Long] =
      rnd.shuffle(model.keys.toSeq).take(n)

    import org.apache.spark.sql.functions.col
    def rowsDf(rows: Seq[(Long, String)]) = {
      val df = rows.toDF("k", "s")
      if (!decimalKeyed) df
      else df.select((col("k") / 100).cast("decimal(12,2)").as("k"), col("s"))
    }
    def keysDf(keys: Seq[Long]) = {
      val df = keys.toDF("k")
      if (!decimalKeyed) df
      else df.select((col("k") / 100).cast("decimal(12,2)").as("k"))
    }
    def state(): Map[Long, String] =
      if (!decimalKeyed) readState(ref)
      else IceLite.read(spark, ref)
        .select((col("k") * 100).cast("long").as("k"), col("s"))
        .as[(Long, String)].collect().toMap

    // seed the table
    val seedRows = freshKeys(5).map(k => (k, s"v$seed-$k"))
    IceLite.createOrReplace(ref, rowsDf(seedRows))
    model ++= seedRows

    (0 until ops).foreach { i =>
      rnd.nextInt(10) match {
        case 0 | 1 => // append fresh keys
          val rows = freshKeys(1 + rnd.nextInt(3)).map(k => (k, s"a$i-$k"))
          IceLite.append(ref, rowsDf(rows))
          model ++= rows
        case 2 | 3 | 4 => // atomic upsert: mix of existing + fresh
          val rows = (existing(rnd.nextInt(3)) ++
            freshKeys(1 + rnd.nextInt(2))).distinct.map(k => (k, s"u$i-$k"))
          if (rows.nonEmpty) {
            IceLite.upsertByKeysMoR(spark, ref, rowsDf(rows), Seq("k"))
            model ++= rows
          }
        case 5 | 6 | 7 => // equality delete: known + unknown keys
          val keys = (existing(rnd.nextInt(3)) ++
            Seq(9_000_000L + rnd.nextInt(100))).distinct
          if (keys.nonEmpty) {
            IceLite.deleteByKeysMoR(spark, ref, keysDf(keys), Seq("k"))
            model --= keys
          }
        case 8 => // compact materializes everything
          IceLite.compact(spark, ref, targetFiles = 1 + rnd.nextInt(3))
        case 9 => // re-insert a recently deleted key region (appends are
          // fresh-key only in this model, so upsert plays that role)
          val k = 9_000_000L + rnd.nextInt(100)
          IceLite.upsertByKeysMoR(spark, ref,
            rowsDf(Seq((k, s"r$i"))), Seq("k"))
          model += (k -> s"r$i")
      }
      val got = state()
      assert(got == model,
        s"seed=$seed op=$i diverged:\n extra=${got.toSet -- model.toSet}\n " +
          s"missing=${model.toSet -- got.toSet}")
      val m = IceLite.readManifest(ref)
      assert(m.current.rowCount == model.size,
        s"seed=$seed op=$i rowCount ${m.current.rowCount} != ${model.size}")
    }
  }

  Seq(11L, 42L, 1337L).foreach { seed =>
    test(s"random append/upsert/eq-delete/compact interleavings match the model (seed $seed)") {
      run(seed, ops = 18)
    }
  }

  Seq(23L, 71L).foreach { seed =>
    test(s"decimal-keyed interleavings match the model on the " +
        s"executor-side eq regime (seed $seed)") {
      runDecimal(seed, ops = 14)
    }
  }

  // Wide sweep (round gates, same pattern as the other model
  // fuzzers):
  //   GRAFT_EQMOR_SEEDS=50 [GRAFT_EQMOR_BASE=17000] \
  //     sbt "testOnly graft.icelite.EqMorModelSpec"
  sys.env.get("GRAFT_EQMOR_SEEDS").map(_.trim.toInt).foreach { n =>
    val base = sys.env.get("GRAFT_EQMOR_BASE").map(_.trim.toLong)
      .getOrElse(17000L)
    (1 to n).foreach { i =>
      test(s"eqmor wide sweep (seed ${base + i})") {
        if (i % 3 == 0) runDecimal(base + i, ops = 14)
        else run(base + i, ops = 18)
      }
    }
  }
}
