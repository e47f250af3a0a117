package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.icelite.{IceLite, PartitionField, TableRef}

/** Round-10 shadow-bench probe for the REST/transform family
  * (round-9 verdict task #3). The DECLARED ids of this family
  * (d76/d84/d86/d80/s24) run on bounded keyed slices — correct for
  * protocol scenarios, but flat by construction under a 10× fixture.
  * This probe scales the TABLE instead: it drives one transformed
  * table through the full remote lifecycle on the WHOLE events table
  * at the given SF and times each leg, plus the wire cost of an
  * unchanged-table re-attach (which must stay ~1 GET / O(pointer)
  * bytes no matter how many files the table accumulated — the
  * pointer-only property at 10×).
  *
  * Output: one JSON line
  *   {"sf":…, "rows":N, "files":N, "legs":{…sec}, "wire":{…}}
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> java … graft.ScaleProbeR10
  */
object ScaleProbeR10 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-scale-probe-r10")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val wh = graft.GraftTmp.dir("scale_probe_r10").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "ev_scale")
    val ev = Tables.load(spark, sfDir, "events")
      .select($"event_id", $"user_id", $"ts", $"event_type", $"value")
    val rows = ev.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val legs = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    // leg 1: transformed CTAS over the full table (engine API — the
    // d84 write shape at table scale: 4 buckets × 30 days)
    val spec = Seq(PartitionField("user_id_bucket", "bucket", "user_id", 4),
      PartitionField("ts_day", "days", "ts", 0))
    legs("create_transformed") = timed {
      IceLite.createOrReplaceTransformed(ref, ev.filter($"event_id" % 2 === 0),
        spec, statsCols = Seq("event_id"))
    }._2

    val srv = new graft.sources.rest.CatalogServer(wh).start()
    try {
      val cat = s"sp10_${java.util.UUID.randomUUID.toString.take(6)}"
      spark.conf.set(s"spark.sql.catalog.$cat",
        "graft.sources.rest.IceLiteRestCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.uri", srv.uri)
      val tbl = s"$cat.src.ev_scale"

      // leg 2: remote transformed INSERT (the d84 wire commit) of the
      // other half — another 120 derived dirs
      ev.filter($"event_id" % 2 === 1).createOrReplaceTempView("sp10_b")
      legs("rest_insert_transformed") = timed {
        spark.sql(s"INSERT INTO $tbl SELECT * FROM sp10_b")
      }._2

      // leg 3: remote row-level DELETE (the d86 wire replace —
      // touched-file-groups-only CoW under the hidden layout)
      legs("rest_delete_where") = timed {
        spark.sql(s"DELETE FROM $tbl WHERE event_id % 10 = 3")
      }._2

      // leg 4: remote full read-back (data plane over the attachment)
      legs("rest_full_agg") = timed {
        spark.sql(s"SELECT COUNT(*), SUM(value) FROM $tbl").collect()
      }._2

      // leg 5: compact through the OWNING engine (remote compact
      // refuses transform layouts by design — the staged bytes are a
      // function of the local layout machinery)
      legs("owner_compact") = timed {
        IceLite.compact(spark, ref)
      }._2

      // wire probe: a SECOND attachment re-resolving an UNCHANGED
      // table must cost ~1 GET and O(pointer) bytes — files on disk
      // don't matter (the pointer-only property)
      val cat2 = s"sp10b_${java.util.UUID.randomUUID.toString.take(6)}"
      spark.conf.set(s"spark.sql.catalog.$cat2",
        "graft.sources.rest.IceLiteRestCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat2.uri", srv.uri)
      spark.sql(s"SELECT COUNT(*) FROM $cat2.src.ev_scale").collect() // spool
      val (req0, bytes0) = (srv.requests.get, srv.bytesSent.get)
      val ((), tUnchanged) = timed {
        spark.sql(s"SELECT COUNT(*) FROM $cat2.src.ev_scale").collect(); ()
      }
      legs("rest_reread_unchanged") = tUnchanged
      val gets = srv.requests.get - req0
      val bytes = srv.bytesSent.get - bytes0

      val files = IceLite.readManifest(ref).current.files.size
      val legsJson = legs.map { case (k, v) =>
        s""""$k":${f"$v%.3f"}""" }.mkString(",")
      println(s"""{"sf":"$sfDir","rows":$rows,"files":$files,""" +
        s""""legs":{$legsJson},""" +
        s""""wire_unchanged":{"gets":$gets,"bytes":$bytes}}""")
    } finally { srv.stop(); spark.stop() }
  }
}
