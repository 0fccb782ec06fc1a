package graft

import org.apache.spark.sql.functions._

/** Round-5 batch az: per-community triangle census. */
class CommTrianglesSpec extends GraftSuite {

  test("per-community triangles: clique triangles stay, bridge adds none") {
    import spark.implicits._
    val e = edgesDf(undirected(Fixtures.twoCliquesBridge))
    // perfect labeling: vertices 0-3 community 0, 10-13 community 1
    val lab = (Seq(0L, 1L, 2L, 3L).map((_, 0L))
      ++ Seq(10L, 11L, 12L, 13L).map((_, 1L))).toDF("id", "label")
    val canon = e.filter(col("src") < col("dst"))
    val tri = canon.select(col("src").as("a"), col("dst").as("b"))
      .join(canon.select(col("src").as("b"), col("dst").as("c")), Seq("b"))
      .join(canon.select(col("src").as("a"), col("dst").as("c")),
        Seq("a", "c"))
    val rows = tri
      .join(lab.select(col("id").as("a"), col("label").as("la")), "a")
      .join(lab.select(col("id").as("b"), col("label").as("lb")), "b")
      .join(lab.select(col("id").as("c"), col("label").as("lc")), "c")
      .filter(col("la") === col("lb") && col("lb") === col("lc"))
      .groupBy(col("la").as("label")).agg(count(lit(1)).as("n_triangles"))
      .collect()
      .map(r => r.getAs[Long]("label") -> r.getAs[Long]("n_triangles"))
      .toMap
    // each K4 carries C(4,3) = 4 triangles; the bridge closes none
    assert(rows === Map(0L -> 4L, 1L -> 4L))
  }
}
