package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}

/** Morton (Z-order) key construction shared by the query-layer
  * clustering ops (d16/d28) and the table-maintenance rewrite
  * (IceLite.rewriteZOrder, d59).
  *
  * Interleaving the bits of two keys makes lexicographic order on the
  * combined key preserve LOCALITY in both dimensions, so range
  * partitioning on it yields files whose (x, y) bounding rectangles
  * are small — per-file min/max stats then prune on BOTH columns at
  * once (the multi-dimensional clustering Iceberg exposes as
  * `rewrite_data_files(sort_order => zorder(...))`).
  */
object ZOrder {

  /** 2-column Morton key over 16-bit non-negative keys: bit i of x
    * lands at 2i, bit i of y at 2i+1. The loop unrolls at
    * plan-build time into a static tree of 32 shift/mask terms —
    * pure built-ins, whole-stage codegen, no UDF.
    */
  def key2(x: Column, y: Column): Column =
    (0 until 16).foldLeft(lit(0L)) { (z, i) =>
      z.bitwiseOR(shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
}
