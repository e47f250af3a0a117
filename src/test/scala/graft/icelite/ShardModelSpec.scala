package graft.icelite

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Model-equivalence fuzz for the SHARDED MANIFEST layer: random
  * interleavings of append / merge / compact / rollback / tag /
  * snapshot-expiry / metadata-expiry against an in-memory model,
  * asserting after EVERY op that (a) the logical read matches, (b)
  * every segment a surviving manifest version references exists on
  * disk, and (c) no CAS tmp residue leaks. Fixed seeds — failures
  * reproduce exactly. This is the class of test that catches chain
  * bookkeeping bugs (a delta segment double-counted, a reused chain
  * whose base was swept, a stale cache serving another table's
  * content) that single-scenario specs miss. */
class ShardModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def readState(ref: TableRef): Map[Long, String] =
    IceLite.read(spark, ref).as[(Long, String)].collect().toMap

  /** Every segment referenced from any surviving manifest version
    * must exist; no .manifest.tmp residue. */
  private def invariants(ref: TableRef): Unit = {
    import org.json4s._
    def strings(jv: JValue): Seq[String] = jv match {
      case JString(s) => Seq(s)
      case JArray(vs) => vs.flatMap(strings)
      case _ => Nil
    }
    val entries = IceLite.listDir(Files.list(ref.dir))(_.toSeq)
    assert(!entries.exists(_.getFileName.toString.startsWith(".manifest.tmp")),
      "CAS tmp residue leaked")
    entries.filter(_.getFileName.toString.startsWith("manifest.v")).foreach { p =>
      val refs = strings(org.json4s.jackson.JsonMethods.parse(
        Files.readString(p)) \ "snapshots" \ "segments")
      refs.foreach(rel => assert(Files.exists(ref.dir.resolve(rel)),
        s"${p.getFileName} references missing segment $rel"))
    }
  }

  private def run(seed: Long, ops: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val wh = graft.GraftTmp.dir(s"shard_model_$seed").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    var model = Map.empty[Long, String]
    var nextKey = 0L
    def freshKeys(n: Int): Seq[Long] = {
      val ks = (nextKey until nextKey + n); nextKey += n; ks
    }
    // snapshot-id → model at that commit, for rollback checks
    var history = Map.empty[Long, Map[Long, String]]

    val seedRows = freshKeys(5).map(k => (k, s"v$seed-$k"))
    val s0 = IceLite.createOrReplace(ref, seedRows.toDF("k", "s"))
    model ++= seedRows
    history += s0.id -> model

    (0 until ops).foreach { i =>
      rnd.nextInt(12) match {
        case 0 | 1 | 2 | 3 => // append — the chain-extension path
          val rows = freshKeys(1 + rnd.nextInt(3)).map(k => (k, s"a$i-$k"))
          val snap = IceLite.append(ref, rows.toDF("k", "s"))
          model ++= rows
          history += snap.id -> model
        case 4 | 5 => // merge upsert — a replace commit (fresh chain)
          val rows = (rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(2)) ++
            freshKeys(1)).distinct.map(k => (k, s"m$i-$k"))
          val snap = IceLite.merge(spark, ref, rows.toDF("k", "s"), Seq("k"))
          model ++= rows
          history += snap.id -> model
        case 6 => // compact — merged chain
          val snap = IceLite.compact(spark, ref, targetFiles = 1 + rnd.nextInt(2))
          history += snap.id -> model
        case 7 => // rollback to a random surviving snapshot
          val m = IceLite.readManifest(ref)
          val target = m.snapshots(rnd.nextInt(m.snapshots.size)).id
          val snap = IceLite.rollback(ref, target)
          model = history(target)
          history += snap.id -> model
        case 8 => // tag the current snapshot (pins it through expiry)
          val m = IceLite.readManifest(ref)
          IceLite.createTag(ref, s"t$i", m.currentSnapshotId)
        case 9 => // expire all but the newest few snapshots
          IceLite.expireSnapshotsRetainLast(ref, 1 + rnd.nextInt(3))
        case 10 => // expire old manifest versions (sweeps segments)
          IceLite.expireMetadata(ref, keepLast = 1 + rnd.nextInt(3), segGraceMs = 0L)
        case 11 => // no-op readManifest round-trip (cache exercise)
          val m = IceLite.readManifest(ref)
          assert(m.current.rowCount == model.size,
            s"op $i: rowCount ${m.current.rowCount} != model ${model.size}")
      }
      val got = readState(ref)
      assert(got == model,
        s"seed $seed op $i: table ${got.size} rows != model ${model.size}; " +
          s"missing=${(model.keySet -- got.keySet).take(5)} " +
          s"extra=${(got.keySet -- model.keySet).take(5)}")
      invariants(ref)
    }
  }

  test("random append/merge/compact/rollback/expire interleavings match the model (seed 7)") {
    run(7, 40)
  }
  test("random append/merge/compact/rollback/expire interleavings match the model (seed 23)") {
    run(23, 40)
  }
  test("random append/merge/compact/rollback/expire interleavings match the model (seed 4242)") {
    run(4242, 40)
  }
}
