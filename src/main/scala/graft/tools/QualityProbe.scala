package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algo.{AsyncEmuLP, LabelPropagation, SemiSyncLP}
import graft.graph.GraphOps
import graft.measures.Measures
import graft.sources.GraphReaders

/** Dev utility: print the (communities, modularity) the engine reaches on
  * the reference's own datasets under each schedule/tie-break, next to the
  * reference's published envelope — for picking/validating the default
  * quality-mode seed.
  */
object QualityProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-quality-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val files = if (args.nonEmpty) args.toSeq else Seq("karate.net", "football.net")
    for (f <- files) {
      val (weighted, _) = GraphReaders.readPajekNet(spark,
        s"/root/reference/datasets/converted/$f")
      val edges = GraphOps.prepareForGather(
        weighted.select(col("src"), col("dst")), 8)
      val n = GraphOps.vertices(edges).count()
      for (seed <- Seq[Option[Long]](None, Some(1L), Some(2L), Some(3L))) {
        val sync = LabelPropagation.run(edges, n, symmetric = true,
          tieBreakSeed = seed).labels
        println(s"[probe] $f sync seed=$seed: " +
          s"${Measures.communityCount(sync)} com Q=${Measures.modularity(edges, sync)}")
      }
      for (seed <- Seq[Option[Long]](None, Some(1L), Some(2L))) {
        val (semi, _) = SemiSyncLP.run(edges, n, tieBreakSeed = seed)
        println(s"[probe] $f semi seed=$seed: " +
          s"${Measures.communityCount(semi)} com Q=${Measures.modularity(edges, semi)}")
        val (asy, _) = AsyncEmuLP.run(edges, n, batches = 8, tieBreakSeed = seed)
        println(s"[probe] $f async seed=$seed: " +
          s"${Measures.communityCount(asy)} com Q=${Measures.modularity(edges, asy)}")
      }
      edges.unpersist(blocking = false)
    }
    spark.stop()
  }
}
