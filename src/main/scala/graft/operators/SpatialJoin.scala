package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Grid-bucketed spatial joins — "all pairs within distance r" without
  * the O(n²) cross join.
  *
  * The cell trick (the standard fixed-radius near-neighbor blocking):
  * bucket every point into a square cell of side `radius`; any pair
  * within distance r differs by at most 1 in each cell coordinate, so
  * candidates are exactly "my cell or one of its 8 neighbors". One
  * side keeps its own cell (the owner), the other explodes to the 3×3
  * neighborhood — each qualifying pair meets EXACTLY once (the owner
  * cell is unique), so no candidate dedup shuffle is needed; the exact
  * distance predicate then filters candidates to true pairs.
  *
  * At 100 TB: one shuffle on the cell id; cost is Σ|cell|·|probe
  * neighborhood| — linear in points for data whose density is bounded
  * relative to the chosen radius. Like every blocker in
  * [[Dedup]] (`blockedJaccardPairs`, `minhashPairs`, `semanticDedup`),
  * a DENSE cell (population above `maxCellSize`) would go quadratic,
  * so oversized cells fall back to CHAIN pairing — id-sorted adjacent
  * pairs inside the cell, still distance-verified — which keeps a
  * dense cluster connected transitively at linear cost. The trade
  * (documented, same class as `minhashPairs`): pairs SKIPPED inside an
  * oversized cell, and cross-cell pairs whose owner cell is oversized,
  * are not emitted. The default cap is OFF (exact join semantics);
  * size `radius` so that expected cell population stays bounded, or
  * set the cap when ingesting adversarially clustered data.
  */
object SpatialJoin {

  /** All unordered pairs (id < id_2) within euclidean `radius`, by the
    * cell-grid blocking above. Output: `idCol`, `idCol_2`, `dist2`
    * (squared distance — pure arithmetic), `dist` (IEEE sqrt).
    */
  def radiusPairs(df: DataFrame, idCol: String, xCol: String, yCol: String,
      radius: Double, maxCellSize: Int = Int.MaxValue): DataFrame = {
    require(radius > 0.0 && java.lang.Double.isFinite(radius),
      s"radius must be a positive finite double, got $radius")
    require(maxCellSize >= 2, s"maxCellSize must be >= 2, got $maxCellSize")
    val id2 = idCol + "_2"
    val base = df
      .select(col(idCol), col(xCol).cast(DoubleType).as("__x"),
        col(yCol).cast(DoubleType).as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .withColumn("__cx", floor(col("__x") / lit(radius)).cast(LongType))
      .withColumn("__cy", floor(col("__y") / lit(radius)).cast(LongType))
    val owners =
      if (maxCellSize == Int.MaxValue) base
      else base.withColumn("__cn", count(lit(1)).over(
        Window.partitionBy(col("__cx"), col("__cy"))))
    val small =
      if (maxCellSize == Int.MaxValue) owners
      else owners.where(col("__cn") <= maxCellSize).drop("__cn")
    // probe side: each point visits its 3x3 cell neighborhood
    val probes = base
      .select(col(idCol).as(id2), col("__x").as("__x2"),
        col("__y").as("__y2"), col("__cx").as("__pcx"),
        col("__cy").as("__pcy"))
      .withColumn("__dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col(id2), col("__x2"), col("__y2"),
        (col("__pcx") + col("__dx")).as("__cx"),
        (col("__pcy") + col("__dy")).as("__cy"))
    val gridPairs = small.join(probes, Seq("__cx", "__cy"))
      .where(col(idCol) < col(id2))
    // oversized cells: id-sorted adjacent chain, linear in cell size
    val chainPairs =
      if (maxCellSize == Int.MaxValue) None
      else Some {
        val big = owners.where(col("__cn") > maxCellSize)
          .withColumn("__r", row_number().over(Window
            .partitionBy(col("__cx"), col("__cy")).orderBy(col(idCol))))
        big.select(col("__cx"), col("__cy"), col(idCol), col("__x"),
          col("__y"), (col("__r") + 1).as("__r"))
          .join(big.select(col("__cx"), col("__cy"),
            col(idCol).as(id2), col("__x").as("__x2"),
            col("__y").as("__y2"), col("__r")),
            Seq("__cx", "__cy", "__r"))
      }
    val cand = chainPairs.fold(gridPairs)(c =>
      gridPairs.unionByName(c.select(gridPairs.columns.map(col): _*)))
    val ddx = col("__x") - col("__x2")
    val ddy = col("__y") - col("__y2")
    val dist2 = ddx * ddx + ddy * ddy
    cand
      .withColumn("dist2", dist2)
      .where(col("dist2") <= lit(radius) * lit(radius))
      .select(col(idCol), col(id2), col("dist2"),
        sqrt(col("dist2")).as("dist"))
  }
}
