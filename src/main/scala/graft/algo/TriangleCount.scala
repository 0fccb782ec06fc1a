package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.graph.GraphOps

/** Triangle counting (north_rule algorithm; SURVEY.md §2.8).
  *
  * Plan: orient each undirected edge from its lower-(degree, id) endpoint
  * to its higher one, enumerate wedges by self-joining the oriented edge
  * table on its middle vertex, and close them with a third join. The
  * degree orientation bounds every vertex's oriented out-degree by
  * O(sqrt(E)) on any graph, which caps the wedge blow-up on power-law
  * graphs — the textbook (Schank–Wagner / "compact-forward") trick and the
  * difference between "works on 60k rows" and "works on 100 TB". All three
  * joins are plain equi-joins, so Catalyst plans shuffle hash/SMJ with
  * partial aggregation and AQE skew splitting.
  */
object TriangleCount {

  /** Degree-ordered orientation of the canonical edge set. */
  def oriented(edges: DataFrame): DataFrame = {
    val canon = GraphOps.canonical(edges) // src<dst, one row per pair
    val deg = canon
      .select(col("src").as("id")).union(canon.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val withDeg = canon
      .join(deg.withColumnRenamed("id", "src").withColumnRenamed("deg", "sdeg"), "src")
      .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "ddeg"), "dst")
    withDeg.select(
      when(struct(col("sdeg").as("d"), col("src").as("i")) <
             struct(col("ddeg").as("d"), col("dst").as("i")),
        struct(col("src").as("u"), col("dst").as("v")))
        .otherwise(struct(col("dst").as("u"), col("src").as("v")))
        .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
  }

  /** Global triangle count. */
  def countTriangles(edges: DataFrame): Long =
    triangles(edges).count()

  /** One row (a, b, c) per triangle, in oriented order. */
  def triangles(edges: DataFrame): DataFrame = {
    val o = oriented(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val e1 = o.select(col("u").as("a"), col("v").as("b"))
    val e2 = o.select(col("u").as("b2"), col("v").as("c"))
    val e3 = o.select(col("u").as("a3"), col("v").as("c3"))
    e1.join(e2, col("b") === col("b2"))
      .join(e3, col("a") === col("a3") && col("c") === col("c3"))
      .select(col("a"), col("b"), col("c"))
  }

  /** Per-vertex triangle participation counts (vertices in no triangle are
    * absent; join with the vertex table and fill 0 if totals are needed).
    */
  def perVertex(edges: DataFrame): DataFrame = {
    val t = triangles(edges)
    t.select(col("a").as("id"))
      .union(t.select(col("b").as("id")))
      .union(t.select(col("c").as("id")))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
  }

  /** Local clustering coefficient per vertex (Watts–Strogatz):
    *
    *   lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)),  0 when deg(v) < 2
    *
    * over the canonical (deduplicated, undirected) adjacency — the wedge
    * closure rate that separates organically-linked pages from link farms.
    * Cost: [[perVertex]] plus one degree aggregation and a broadcast-able
    * join; every vertex appears in the output.
    */
  def localClustering(edges: DataFrame): DataFrame = {
    val canon = GraphOps.canonical(edges)
    val deg = canon
      .select(col("src").as("id")).union(canon.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    deg.join(perVertex(edges).withColumnRenamed("triangles", "tri"),
        Seq("id"), "left")
      .select(col("id"),
        when(col("deg") < 2, lit(0.0))
          .otherwise(lit(2.0) * coalesce(col("tri"), lit(0L)) /
            (col("deg") * (col("deg") - 1)))
          .as("lcc"))
  }
}
