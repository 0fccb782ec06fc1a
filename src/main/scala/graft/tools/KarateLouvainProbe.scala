package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algo.Louvain
import graft.graph.GraphOps
import graft.measures.Measures
import graft.sources.GraphReaders

/** Diagnostic main: multi-level Louvain modularity on the reference's own
  * karate.net at several level budgets (VERDICT r4 task 5 probe).
  */
object KarateLouvainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val f = args.headOption.getOrElse("karate.net")
    val (weighted, _) = GraphReaders.readPajekNet(spark,
      s"/root/reference/datasets/converted/$f")
    val edges = GraphOps.prepareForGather(
      weighted.select(col("src"), col("dst")), 8)
    val we = edges.withColumn("weight", lit(1L))
    for (levels <- Seq(1, 2, 3, 5)) {
      val (assign, ran) = Louvain.run(we, maxLevels = levels)
      val q = Measures.modularity(edges,
        assign.withColumnRenamed("com", "label"))
      val c = assign.select("com").distinct().count()
      println(s"[probe] $f louvain maxLevels=$levels ran=$ran coms=$c Q=$q")
    }
    spark.stop()
  }
}
