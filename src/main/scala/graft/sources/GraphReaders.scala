package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.GraphOps

/** Legacy reference-format readers/writers (SURVEY.md §2.1): tab-separated
  * edge lists, Pajek `.net`, ground-truth label files, and the
  * `name\tlabel` communities sink. These exist for parity with the
  * reference's inputs and for fixture tests; the production ingest path is
  * [[TextExtract.buildEdges]] over the pages table.
  */
object GraphReaders {

  /** Edge-list `.txt` scan (reference `Graph::createFromFile`,
    * `Graph.cu:200-328`): `#`-comment lines skipped, tab-separated
    * `src\tdst` names; `directed = false` adds the reverse edge (the
    * reference stores undirected edges twice, `Graph.cu:234-236`).
    * Multi-edges are NOT dedup'd (txt input keeps them, `Graph.cu:234`).
    *
    * @return (edges(src, dst), dict(name, id)) — ids lexicographic,
    *         matching `std::map` order (`Graph.cu:284-292`)
    */
  def readEdgeListTxt(spark: SparkSession, path: String, directed: Boolean)
      : (DataFrame, DataFrame) = {
    val pairs = spark.read.text(path)
      .filter(!col("value").startsWith("#") && trim(col("value")) =!= "")
      .select(split(col("value"), "\t").as("p"))
      .select(trim(col("p").getItem(0)).as("srcName"),
              trim(col("p").getItem(1)).as("dstName"))
    encodePairs(pairs, directed, dedup = false)
  }

  /** Pajek `.net` scan (reference `Graph::createFromFileNET`,
    * `Graph.cu:334-478`): skip to the `*Arcs`/`*Edges` marker, parse
    * space-separated `i j cost`, always undirected, dedup multi-edges
    * (`Graph.cu:338,377-378`).
    *
    * Header scanning is inherently line-order-sequential; the file head is
    * split on the driver (Pajek is a small legacy fixture format), the
    * edge body is parsed distributed.
    */
  def readPajekNet(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val whole = spark.read.option("wholetext", "true").text(path)
      .as[String].head()
    val lines = whole.split("\n")
    val marker = lines.indexWhere { l =>
      val t = l.trim.toLowerCase
      t.startsWith("*arcs") || t.startsWith("*edges")
    }
    require(marker >= 0, s"no *Arcs/*Edges marker in $path")
    val body = spark.createDataset(lines.drop(marker + 1).toSeq)
    val pairs = body
      .filter(l => l.trim.nonEmpty && !l.trim.startsWith("*"))
      .map { l =>
        val t = l.trim.split("\\s+")
        (t(0), t(1), if (t.length > 2) t(2).toFloat else 1.0f)
      }
      .toDF("srcName", "dstName", "weight")
    val (edges, dict) = encodePairs(pairs.select("srcName", "dstName"),
      directed = false, dedup = true)
    // re-attach parsed costs (reference keeps edges_cost, Graph.cu:442-447;
    // multi-edge dedup keeps the minimum cost deterministically)
    val srcD = dict.select(col("name").as("srcName"), col("id").as("wsrc"))
    val dstD = dict.select(col("name").as("dstName"), col("id").as("wdst"))
    val costs = pairs.join(srcD, "srcName").join(dstD, "dstName")
      .select(col("wsrc"), col("wdst"), col("weight"))
    val sym = costs.union(costs.select(col("wdst").as("wsrc"),
      col("wsrc").as("wdst"), col("weight")))
      .groupBy(col("wsrc").as("src"), col("wdst").as("dst"))
      .agg(min("weight").as("weight"))
    (edges.join(sym, Seq("src", "dst"), "left").na.fill(1.0, Seq("weight")),
      dict)
  }

  /** Ground-truth labels scan (reference `getRealCommunities`,
    * `Graph.cu:120-170`): tab-separated `node\tlabel`, `#` comments
    * skipped, FIRST occurrence per node wins (`Graph.cu:148-150`) —
    * line-order-dependent, so resolved with min-by-line-index.
    *
    * @param dict (name, id) from the matching graph read
    * @return (id, label) with labels dictionary-encoded the same way the
    *         reference reuses its node map
    */
  def readGroundTruth(spark: SparkSession, path: String, dict: DataFrame): DataFrame = {
    import spark.implicits._
    val whole = spark.read.option("wholetext", "true").text(path).as[String].head()
    val rows = whole.split("\n").iterator.zipWithIndex
      .map { case (l, i) => (l.trim, i.toLong) }
      .filter { case (l, _) => l.nonEmpty && !l.startsWith("#") }
      .map { case (l, i) =>
        val t = l.split("\t")
        (t(0).trim, t(1).trim, i)
      }.toSeq
    val df = spark.createDataset(rows).toDF("name", "labelName", "lineNo")
    val firstWins = df.groupBy("name")
      .agg(min_by(col("labelName"), col("lineNo")).as("labelName"))
    val labelDict = GraphOps.dictionaryEncode(firstWins.select(col("labelName")))
      .withColumnRenamed("name", "labelName").withColumnRenamed("id", "label")
    firstWins.join(dict, "name").join(labelDict, "labelName")
      .select(col("id"), col("label"))
  }

  /** Communities sink (reference `saveCommunitiesinFile`,
    * `Graph.cu:175-194`): `name\tlabel` per vertex. Alias-qualified join:
    * `labels` often CONTAINS `dict` in its lineage (ground-truth labels,
    * the flagship pipeline), and dataset-attached column refs would trip
    * the ambiguous-self-join detector.
    */
  def writeCommunities(labels: DataFrame, dict: DataFrame, path: String): Unit =
    labels.alias("lab").join(dict.alias("dic"), col("lab.id") === col("dic.id"))
      .select(col("dic.name"), col("lab.label"))
      .write.mode("overwrite").option("sep", "\t").csv(path)

  /** Parity formats ONLY (reference `.txt`/`.net`/ground-truth files,
    * which are small by construction): uses the single-partition-window
    * [[GraphOps.dictionaryEncode]] to reproduce the reference's exact
    * first-seen id order. The flagship pages→edges path uses the
    * distributed [[GraphOps.dictionaryEncodeScalable]] default
    * ([[TextExtract.buildEdges]]) — do not point this reader at a
    * billion-name edge list.
    */
  private def encodePairs(pairs: DataFrame, directed: Boolean, dedup: Boolean)
      : (DataFrame, DataFrame) = {
    val names = pairs.select(col("srcName").as("name"))
      .union(pairs.select(col("dstName").as("name")))
    val dict = GraphOps.dictionaryEncode(names)
    val srcD = dict.select(col("name").as("srcName"), col("id").as("src"))
    val dstD = dict.select(col("name").as("dstName"), col("id").as("dst"))
    var edges = pairs.join(srcD, "srcName").join(dstD, "dstName")
      .select(col("src"), col("dst"))
    if (!directed)
      edges = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
    if (dedup) edges = edges.distinct()
    (edges, dict)
  }
}
