package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.algo.LabelPropagation
import graft.graph.GraphOps

/** Scratch plan/throughput probe (not part of the public API).
  * Usage: Probe <variant> [cores] — fresh JVM per invocation.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val variant = args.headOption.getOrElse("base")
    val cores = if (args.length > 1) args(1).toInt else 32
    val aqe = !variant.endsWith("noaqe")
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nVerts = sys.env.getOrElse("PROBE_VERTS", "1500000").toLong
    val nSteps = sys.env.getOrElse("PROBE_STEPS", "3").toInt
    val id = col("id")
    val targets = transform(sequence(lit(0), lit(7)), k => {
      val u = pmod(xxhash64(id, k, lit(42L)), lit(1000000L)).cast("double") / 1000000.0
      least(floor(pow(u, 3.0) * nVerts).cast("long"), lit(nVerts - 1))
    })
    val raw = spark.range(nVerts).select(id.as("src"), explode(targets).as("dst"))
    val edges = GraphOps.prepareForGather(
      GraphOps.symmetrize(GraphOps.dropSelfLoops(raw)), cores * 2)
    val slots = edges.count()

    def superstepRepart(labels: DataFrame): DataFrame = {
      val msgs = edges.join(labels, edges("dst") === labels("id"))
        .select(edges("src").as("id"), labels("label"))
        .repartition(cores * 2, col("id"))
      val counts = msgs.groupBy(col("id"), col("label")).agg(count(lit(1)).as("cnt"))
      val winners = counts.groupBy(col("id"))
        .agg(max_by(col("label"), struct(col("cnt"), negate(col("label")))).as("newLabel"))
      labels.join(winners, Seq("id"), "left")
        .select(col("id"), coalesce(col("newLabel"), col("label")).as("label"))
    }

    def superstepNoFb(labels: DataFrame): DataFrame = {
      val msgs = edges.join(labels, edges("dst") === labels("id"))
        .select(edges("src").as("id"), labels("label"))
      val counts = msgs.groupBy(col("id"), col("label")).agg(count(lit(1)).as("cnt"))
      counts.groupBy(col("id"))
        .agg(max_by(col("label"), struct(col("cnt"), negate(col("label")))).as("label"))
    }

    // hash-only argmax: max-count, join back, min-label — no SortAggregate
    def superstepHashArgmax(labels: DataFrame): DataFrame = {
      val msgs = edges.join(labels, edges("dst") === labels("id"))
        .select(edges("src").as("id"), labels("label"))
      val counts = msgs.groupBy(col("id"), col("label")).agg(count(lit(1)).as("cnt"))
      val maxes = counts.groupBy(col("id")).agg(max(col("cnt")).as("mx"))
        .select(col("id").as("mid"), col("mx"))
      counts.join(maxes, col("id") === col("mid") && col("cnt") === col("mx"))
        .groupBy(col("id")).agg(min(col("label")).as("label"))
    }
    // packed-long argmax: single hash agg, (cnt << 40 | ~label) max
    def superstepPacked(labels: DataFrame): DataFrame = {
      val msgs = edges.join(labels, edges("dst") === labels("id"))
        .select(edges("src").as("id"), labels("label"))
      val counts = msgs.groupBy(col("id"), col("label")).agg(count(lit(1)).as("cnt"))
      val packed = counts.groupBy(col("id"))
        .agg(max(shiftleft(col("cnt"), 40) + (lit((1L << 40) - 1) - col("label")))
          .as("p"))
      packed.select(col("id"),
        (lit((1L << 40) - 1) - (col("p").bitwiseAND(lit((1L << 40) - 1)))).as("label"))
    }
    val step: DataFrame => DataFrame = variant match {
      case "repart" | "repart-noaqe" => superstepRepart
      case "nofb" | "nofb-noaqe"     => superstepNoFb
      case "hashargmax"              => superstepHashArgmax
      case "packed"                  => superstepPacked
      case _ => l => LabelPropagation.superstep(edges, l)
    }
    var labels = LabelPropagation.initLabels(GraphOps.vertices(edges))
    for (_ <- 1 to nSteps)
      labels = step(labels).persist(StorageLevel.MEMORY_AND_DISK)
    val t0 = System.nanoTime()
    labels.agg(bit_xor(xxhash64(col("id"), col("label")))).first().getLong(0)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[probe] $variant%-14s cores=$cores%2d ${sec}%8.2f s  ${slots * nSteps / sec}%12.0f edges/s/step")
    if (args.contains("explain")) step(labels).explain("formatted")
    spark.stop()
  }
}

/** CPU-bound scaling witness: text+outlink extraction over synthesized
  * pages (regex-dominated, no shuffle) — where local-mode core scaling is
  * actually observable.
  */
object ProbeExtract {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32").toInt
    val n = if (args.length > 1) args(1).toLong else 400000L
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val pages = graft.sources.PagesSynth.pages(spark, n)
      .repartition(cores * 4).persist()
    pages.count()
    val t0 = System.nanoTime()
    val c = pages.select(
        graft.sources.TextExtract.extractText(col("html")).as("t"),
        explode(graft.sources.TextExtract.extractOutlinks(col("html"))).as("l"))
      .filter(length(col("t")) > 0).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[probex] cores=$cores%2d ${sec}%8.2f s  ${n / sec}%12.0f pages/s  ($c links)")
    spark.stop()
  }
}
