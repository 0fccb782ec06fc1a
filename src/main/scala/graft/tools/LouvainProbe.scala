package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algo.Louvain
import graft.graph.GraphOps

/** Diagnostic main: per-round wall time + community counts for the
  * synchronous damped Louvain on a small deterministic blob graph.
  */
object LouvainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // deterministic small community-ish graph: 3 blobs of 20 + sparse bridges
    val pairs = (for {
      b <- 0 until 3; i <- 0 until 20; j <- (i + 1) until 20
      if (i * 31 + j * 17 + b) % 4 == 0
    } yield (b * 20L + i, b * 20L + j)) ++ Seq((0L, 20L), (20L, 40L), (5L, 45L))
    val base = (pairs ++ pairs.map(p => (p._2, p._1))).distinct
    val e = base.toDF("src", "dst").withColumn("weight", lit(1L)).persist()
    val strength = Louvain.strengths(e).persist()
    val m2 = e.agg(sum(col("weight")).cast("long")).first().getLong(0)
    var assign = GraphOps.vertices(e).select(col("id"), col("id").as("com"))
      .persist()
    var r = 0
    var moved = -1L
    while (r < 12 && moved != 0L) {
      r += 1
      val t0 = System.nanoTime()
      val next = Louvain.moveRound(e, strength, assign, m2, r)
        .localCheckpoint(eager = true)
      moved = next.join(assign.withColumnRenamed("com", "prev"), "id")
        .filter(col("com") =!= col("prev")).count()
      assign = next
      val coms = assign.select("com").distinct().count()
      println(s"[probe] round=$r moved=$moved communities=$coms " +
        s"ms=${(System.nanoTime() - t0) / 1000000}")
    }
    val t1 = System.nanoTime()
    val (full, levels) = Louvain.run(e)
    val finalComs = full.select("com").distinct().count()
    println(s"[probe] full run levels=$levels communities=$finalComs " +
      s"ms=${(System.nanoTime() - t1) / 1000000}")
    spark.stop()
  }
}
