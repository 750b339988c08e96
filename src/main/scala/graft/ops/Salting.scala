package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew-salting for equi-joins whose key distribution is too
  * skewed even for AQE's runtime skew-join splitting — e.g. a grid
  * cell holding a metropolis, or a shingle shared by half a corpus.
  *
  * Pattern: the BIG side gets a deterministic salt in [0, factor)
  * hashed from its full row, the SMALL side is replicated `factor`
  * times, and the join key becomes (key..., salt) — each hot key
  * splits into `factor` independently-shuffled streams. The result is
  * row-identical to the unsalted join (the salt always matches exactly
  * one of the replicas).
  *
  * Cost model: small-side bytes × factor extra shuffle volume buys a
  * `factor`-way split of the hottest reducer — use on joins where one
  * reducer dominates the stage, keep `factor` near the observed skew
  * ratio. Deterministic (hash, not rand), so retried tasks and
  * re-runs produce identical plans and results.
  */
object Salting {

  /** Join types whose results survive small-side replication: for
    * inner/left/semi/anti every replica either matches (and the salt
    * picks exactly one) or silently drops. Right/full outer would emit
    * each UNMATCHED small-side replica `factor` times as null-extended
    * output — not row-identical — so they are rejected.
    */
  private val SafeJoinTypes = Set(
    "inner", "left", "leftouter", "left_outer",
    "leftsemi", "left_semi", "semi", "leftanti", "left_anti", "anti", "cross")

  def saltedEquiJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                     factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    require(keys.nonEmpty, "equi-join needs at least one key")
    val normalizedType = joinType.toLowerCase.replace(" ", "")
    require(SafeJoinTypes.contains(normalizedType),
      s"saltedEquiJoin supports inner/left/semi/anti join types only; '$joinType' " +
        "would replicate unmatched small-side rows (salt the other side instead)")
    val b = big.withColumn("_salt_b", pmod(hash(big.columns.map(col): _*), lit(factor)))
    val renamed = small.columns.map(c => if (keys.contains(c)) s"_r_$c" else c)
    val s = small.toDF(renamed.toIndexedSeq: _*)
      .withColumn("_salt_s", explode(sequence(lit(0), lit(factor - 1))))
    val cond = (keys.map(k => col(k) === col(s"_r_$k")) :+
      (col("_salt_b") === col("_salt_s"))).reduce(_ && _)
    b.join(s, cond, joinType)
      .drop("_salt_b", "_salt_s")
      .drop(keys.map(k => s"_r_$k"): _*)
  }
}
