package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for declared queries (SparkEntry.queries)
  * to files — the plans/r06/ evidence the optimization round commits.
  *
  * Usage: sbt "runMain graft.tools.PlanDump <sfDir> <outDir> <q1,q2,...>"
  * For loop-shaped queries whose final frame is checkpoint-truncated
  * (seeding loops etc.), set SPARK_GRAFT_PLANDUMP_EXEC=1 to ALSO execute
  * the query and append every executed physical plan, which is where the
  * real per-step shape lives.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val exec = sys.env.contains("SPARK_GRAFT_PLANDUMP_EXEC")
    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    if (exec)
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(name: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit =
            plans.synchronized { plans += qe.executedPlan.toString() }
          override def onFailure(name: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              e: Exception): Unit = ()
        })
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      // loop-shaped queries execute (checkpoint) DURING construction, so
      // the capture window must open before the query function runs
      plans.synchronized(plans.clear())
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val sb = new StringBuilder
      sb ++= s"== $name: explain(formatted) ==\n"
      sb ++= df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      if (exec) {
        df.collect()
        Thread.sleep(2000) // async listener drain
        val ps = plans.synchronized(plans.toSeq)
        ps.zipWithIndex.foreach { case (p, i) =>
          sb ++= s"\n== $name: executed plan #$i ==\n"
          sb ++= p
        }
      }
      Files.writeString(Paths.get(s"$outDir/$name.txt"), sb.toString)
      System.err.println(s"[plandump] wrote $outDir/$name.txt")
    }
    spark.stop()
  }
}
