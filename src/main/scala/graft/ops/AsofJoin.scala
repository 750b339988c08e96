package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-timestamp) join — the event-data operator Spark has
  * no native form of (DuckDB spells it `ASOF JOIN`: for each left row,
  * the single right row with the LARGEST right timestamp ≤ the left
  * timestamp, per key; `forward` flips to the smallest ≥).
  *
  * Spark-first plan: instead of a range join (whose candidate set is
  * every (left, right) pair within a key — quadratic in the dense
  * case) the two sides are UNIONED, tagged, and sorted once per key;
  * a running `last(right_payload, ignoreNulls)` window then carries
  * the in-effect right row onto every left row in the same pass.
  *
  * 100 TB design: ONE shuffle of left+right on the key columns, no
  * join node, no candidate-pair blowup — cost is the sort, linear in
  * rows per key. A pathologically hot key serializes into one
  * partition's sort (the same bound any PARTITION BY window has); for
  * that shape, pre-bucket the timeline into coarse ranges and asof
  * within buckets carrying the previous bucket's tail row. AQE keeps
  * partition sizes balanced otherwise.
  *
  * Contract: `right` should be unique per (keys, rightTs) — with
  * duplicates the surviving payload among equal timestamps is
  * arbitrary, as in DuckDB. Non-key column names must not collide
  * across the sides (rename before joining).
  */
object AsofJoin {

  def asof(left: DataFrame,
           right: DataFrame,
           keys: Seq[String],
           leftTs: String,
           rightTs: String,
           forward: Boolean = false,
           tolerance: Option[Column] = None,
           inner: Boolean = true): DataFrame = {
    val lCols    = left.columns.toSeq
    val rPayload = right.columns.toSeq.filterNot(keys.contains)
    val overlap  = lCols.filterNot(keys.contains).toSet
      .intersect(rPayload.toSet)
    require(overlap.isEmpty,
      s"asof: non-key columns present on both sides: ${overlap.mkString(", ")}")

    val lPrep = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__t"),
        struct(lCols.map(col): _*).as("__l"), lit(1).as("__tag")): _*)
    // equi semantics: a NULL key never matches (the window PARTITION
    // BY would group left and right NULLs together otherwise), and a
    // NULL right timestamp can never be "the latest at-or-before"
    val rPrep = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__t"),
        struct(rPayload.map(col): _*).as("__r"), lit(0).as("__tag")): _*)
      .where(keys.map(col(_).isNotNull).foldLeft(col(rightTs).isNotNull)(_ && _))
    val u = lPrep.unionByName(rPrep, allowMissingColumns = true)

    // at equal timestamps the right row sorts FIRST (tag 0), so the
    // running last() includes it — the inclusive >= / <= of ASOF.
    // NULLs FIRST in both directions: a left row with a NULL probe
    // timestamp must sort before every right row (no match inherited);
    // desc's Spark default is nulls-LAST, which would hand such a row
    // the running last() of the whole partition
    val ord =
      if (forward) Seq(col("__t").desc_nulls_first, col("__tag").asc)
      else Seq(col("__t").asc_nulls_first, col("__tag").asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withMatch = u
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)

    val bounded = tolerance match {
      case None => withMatch
      case Some(tol) =>
        val gap =
          if (forward) col("__m").getField(rightTs).cast("double") - col("__t").cast("double")
          else col("__t").cast("double") - col("__m").getField(rightTs).cast("double")
        withMatch.withColumn("__m", when(gap <= tol.cast("double"), col("__m")))
    }
    val kept = if (inner) bounded.where(col("__m").isNotNull) else bounded
    kept.select(
      lCols.map(c => col("__l").getField(c).as(c)) ++
        rPayload.map(c => col("__m").getField(c).as(c)): _*)
  }
}
