package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** One declared operator (SURVEY.md §2): a stable id, a Spark-first
  * query over the fixture tables in `sfDir`, and (where
  * SQL-expressible) a DuckDB oracle over the same parquet files.
  */
final case class Decl(
    id: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait Pack {
  def decls: Seq[Decl]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    decls.map(d => d.id -> d.fn).toMap
  final def oracleSql: Map[String, String] =
    decls.collect { case Decl(id, _, Some(sql)) => id -> sql }.toMap
}

/** A one-slot persist cache scoped to the SparkContext that filled it.
  *
  * Pack queries persist an intermediate stage that backs the returned
  * lazy plan, so the previous invocation's stage can only be
  * unpersisted on the NEXT call (NOTES.md rule 16). Naively caching
  * the DataFrame is global mutable state: after a session restart in
  * the same JVM (the Bench/driver pattern — same hazard as the
  * eq-index broadcast cache, `sources/IceLiteSource.scala`), the slot
  * would hold a frame of a dead context, and in a multi-tenant JVM it
  * could unpersist another context's frame. `swap` therefore records
  * the owning context with each frame and only unpersists occupants
  * created on the SAME live context; frames of dead contexts are
  * dropped without touching them (their storage died with the
  * context).
  */
final class PersistSlot {
  private var last: Seq[(org.apache.spark.SparkContext, DataFrame)] = Nil
  def swap(next: DataFrame*): Unit = synchronized {
    val sc = SparkSession.active.sparkContext
    last.foreach { case (owner, df) =>
      if ((owner eq sc) && !owner.isStopped)
        scala.util.Try(df.unpersist(blocking = false))
    }
    last = next.map(d => (sc, d)).toSeq
  }
}

/** Shared pack helpers: `$"col"` without a live session, and the
  * exact-decimal aggregation pattern (NOTES.md rules 1-3).
  */
object syntax {
  implicit class ColStr(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column =
      org.apache.spark.sql.functions.col(sc.s(args: _*))
  }

  /** Deterministic money sum: the fixture's money columns are exact
    * low-scale decimals (NOTES.md "decimal-exact accumulation"), so
    * summing after a cast to DECIMAL(18,s) is order-independent; the
    * final cast back to double is then bitwise identical in Spark and
    * DuckDB. Mirror with
    * `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)` in the oracle.
    */
  def dsum(c: Column, scale: Int): Column = {
    import org.apache.spark.sql.functions.sum
    sum(c.cast(s"decimal(18,$scale)")).cast("double")
  }
}
