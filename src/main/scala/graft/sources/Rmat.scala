package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic R-MAT synthetic link-graph generator (Chakrabarti–
  * Zhan–Faloutsos; the Graph500 generator family) — recursive quadrant
  * subdivision with probabilities (a,b,c,d) = (0.57, 0.19, 0.19, 0.05),
  * which yields the skewed in-degree distribution real web graphs show.
  *
  * Scale shape: one output row per `spark.range` index, each edge's bits
  * derived by pure column arithmetic from its index — embarrassingly
  * parallel, ZERO shuffles, whole-stage codegen end to end, so edge
  * lists of any size generate at scan speed across any executor count
  * (the way you synthesize a 100 TB test graph in place instead of
  * copying one). Replayable: the per-level quadrant draw is
  * ((i·A + B·l + seed) mod M) mod 1000 with A < 2^20 and M ≈ 10^6, so
  * every product stays far below 2^63 for edge indices up to 2^40 (the
  * RandomWalks overflow lesson) and the draw replays exactly in ANSI
  * SQL — the gate's oracle recomputes every edge bit-for-bit.
  */
object Rmat {

  val MixA = 1048573L  // < 2^20
  val MixStep = 4099L  // per-level multiplier step — a LEVEL-DEPENDENT
                       // MULTIPLIER is load-bearing: an additive level
                       // offset c·l survives the final mod-1000 as a
                       // constant stride (97003 ≡ 3 mod 1000 made every
                       // edge's bit vector a function of i mod 1000 and
                       // collapsed the graph to ~24 distinct vertices)
  val MixM = 1000003L  // prime

  // cumulative per-mille thresholds for (a,b,c,d) = (.57,.19,.19,.05):
  // r < 570 → quadrant (0,0); 570..759 → (0,1); 760..949 → (1,0);
  // 950..999 → (1,1)
  val ThreshB = 570L
  val ThreshC = 760L
  val ThreshD = 950L

  private def draw(l: Int, seed: Long): Column =
    (col("i") * (MixA + MixStep * l) + lit(seed)) % MixM % 1000L

  /** (i, src, dst) for i in [0, nEdges); vertex ids in [0, 2^scale). */
  def edges(spark: SparkSession, nEdges: Long, scale: Int,
            seed: Long = 0L): DataFrame = {
    require(scale >= 1 && scale <= 40 && nEdges >= 1 && seed >= 0)
    val bits = (0 until scale).map { l =>
      val r = draw(l, seed)
      (when(r >= ThreshC, lit(1L << l)).otherwise(lit(0L)),
        when((r >= ThreshB && r < ThreshC) || r >= ThreshD,
          lit(1L << l)).otherwise(lit(0L)))
    }
    spark.range(nEdges).select(col("id").as("i"))
      .select(col("i"),
        bits.map(_._1).reduce(_ + _).as("src"),
        bits.map(_._2).reduce(_ + _).as("dst"))
  }
}
