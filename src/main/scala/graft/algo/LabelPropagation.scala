package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.{Checkpointer, Superstep}
import graft.graph.GraphOps

/** Synchronous (Jacobi) label propagation — the engine's ground-truth mode
  * (SURVEY.md §2.3; reference `labelPropagationSequential(sync=true)`,
  * `algorithms.h:373-473`, and the V2 dataflow pipeline
  * `algorithms.h:1084-1296`).
  *
  * Per-vertex update rule (reference `getMaximumLabel`,
  * `algorithms.h:263-334`): gather the labels of all out-neighbors, count
  * occurrences per label, and take a label of maximum count. The reference
  * breaks ties uniformly at random (`algorithms.h:327`, `kernels.h:382`),
  * which makes its own runs irreproducible (its published seq/par goldens
  * disagree); per BASELINE.json determinism we pin the tie-break to the
  * MINIMUM label among the maxima. Vertices with no in-edges keep their
  * label (the reference's zero-degree CSR rows behave the same,
  * `algorithms.h:283-285`).
  *
  * Relational shape of one superstep — literally the reference's V2 CUDA
  * pipeline (SURVEY.md §2.4) expressed in Catalyst:
  *   gather  = inner equi-join  edges ⋈_{dst=id} labels   (lp_gather)
  *   count   = groupBy(src,label).count                    (sort+scan+W)
  *   argmax  = groupBy(src).max_by(label,(cnt,-label))     (lp_reduce)
  * Catalyst's partial+final hash aggregation is the two-level segmented
  * reduce of `reduce.h:360-476`, for free.
  *
  * Scale: edges arrive dst-partitioned and persisted (no per-iteration
  * edge shuffle); `groupBy(src,label)` partial-aggregates map-side, so the
  * per-superstep shuffle volume is the number of distinct (vertex,
  * neighbor-label) pairs, not the edge count. Hot-vertex skew is removed
  * by routing high-in-degree vertices through a broadcast gather
  * ([[GraphOps.planSkew]]).
  */
object LabelPropagation {

  /** One synchronous superstep: returns the new (id, label) table.
    * Vertices receiving no messages are left at their previous label.
    *
    * @param symmetric caller guarantees the edge table is symmetrized, so
    *        every vertex has in-edges and the winners table covers all
    *        vertices — the keep-previous fallback join (one join + one
    *        exchange per superstep) is skipped. Zero-degree vertices never
    *        enter the vertex set (vertices are defined by edge endpoints),
    *        matching the reference's zero-degree CSR rows keeping their
    *        initial label (`algorithms.h:283-285`).
    */
  /** Bit budget of the packed argmax: labels in the low 40 bits
    * (ids < 2^40 ≈ 1.1e12 — the 10^12-document ceiling), counts in the
    * next 23 (per-label neighbor counts < 8.4M). Outside that envelope
    * [[run]] selects the unpacked hash-argmax path automatically.
    */
  val PackLabelBits = 40
  private val LabelMask = (1L << PackLabelBits) - 1

  def superstep(edges: DataFrame, labels: DataFrame,
                symmetric: Boolean = false,
                packedArgmax: Boolean = true): DataFrame = {
    val msgs = gather(edges, labels)
    val winners = argmax(msgs, packedArgmax)
    if (symmetric) winners
    else labels.join(winners.withColumnRenamed("label", "newLabel"), Seq("id"), "left")
      .select(col("id"), coalesce(col("newLabel"), col("label")).as("label"))
  }

  /** mode-label with deterministic (max count, min label) tie-break.
    *
    * Packed form: one extra hash agg of `max(cnt << 40 | (2^40-1-label))`
    * — a single-long DeclarativeAggregate, so BOTH aggregation levels stay
    * in HashAggregate/whole-stage-codegen. The naive
    * `max_by(label, struct(cnt, -label))` has a struct buffer, which
    * Catalyst can only plan as SortAggregate (a per-superstep sort that
    * measured 3× slower at 24M edges). Unpacked form: max-count →
    * join-back → min-label, also hash-only, for graphs outside the bit
    * budget.
    */
  private def argmax(msgs: DataFrame, packed: Boolean): DataFrame = {
    val counts = msgs.groupBy(col("id"), col("label")).agg(count(lit(1)).as("cnt"))
    if (packed) {
      counts.groupBy(col("id"))
        .agg(max(shiftleft(col("cnt"), PackLabelBits) +
          (lit(LabelMask) - col("label"))).as("p"))
        .select(col("id"),
          (lit(LabelMask) - col("p").bitwiseAND(lit(LabelMask))).as("label"))
    } else {
      val maxes = counts.groupBy(col("id")).agg(max(col("cnt")).as("mx"))
        .select(col("id").as("mid"), col("mx"))
      counts.join(maxes, col("id") === col("mid") && col("cnt") === col("mx"))
        .groupBy(col("id")).agg(min(col("label")).as("label"))
    }
  }

  /** Skew-aware superstep: cold edges gather via shuffle join, hot edges
    * (high-in-degree dst) via broadcast of the hot vertices' labels.
    */
  def superstepSkewAware(plan: GraphOps.SkewPlan, labels: DataFrame,
                         packedArgmax: Boolean = true): DataFrame = {
    val hotLabels = labels.join(broadcast(plan.hotIds), Seq("id"), "left_semi")
    val coldMsgs = gather(plan.coldEdges, labels)
    val hotMsgs = plan.hotEdges
      .join(broadcast(hotLabels), plan.hotEdges("dst") === hotLabels("id"))
      .select(plan.hotEdges("src").as("id"), hotLabels("label"))
    val winners = argmax(coldMsgs.union(hotMsgs), packedArgmax)
    labels.join(winners.withColumnRenamed("label", "newLabel"), Seq("id"), "left")
      .select(col("id"), coalesce(col("newLabel"), col("label")).as("label"))
  }

  private def gather(edges: DataFrame, labels: DataFrame): DataFrame =
    edges.join(labels, edges("dst") === labels("id"))
      .select(edges("src").as("id"), labels("label"))

  /** Superstep over the CSR-blocked adjacency form (north_star:
    * "CSR-blocked adjacency partitions"): one row per vertex with its
    * neighbor array ([[GraphOps.csrBlocks]]). The gather explodes blocks
    * back to COO lazily inside the plan — same messages, same argmax —
    * while the stored/persisted representation is the compact blocked one
    * (one row per vertex, array-encoded: smaller cache footprint and
    * per-vertex locality). Equality with the COO superstep is asserted in
    * tests.
    */
  def superstepCsr(blocks: DataFrame, labels: DataFrame,
                   packedArgmax: Boolean = true): DataFrame = {
    val msgs = GraphOps.cooFromCsr(blocks)
      .join(labels, col("dst") === labels("id"))
      .select(col("src").as("id"), labels("label"))
    argmax(msgs, packedArgmax)
  }

  /** Initial state: every vertex labeled with its own id
    * (`algorithms.h:402-404`).
    */
  def initLabels(vertices: DataFrame): DataFrame =
    vertices.select(col("id"), col("id").as("label"))

  /** Exactly `supersteps` updates, no convergence actions — for
    * oracle-checked fixed-step queries and benchmarks where the step
    * count must be identical across engines and parallelism levels.
    */
  def runFixed(edges: DataFrame, supersteps: Int,
               symmetric: Boolean = false): DataFrame = {
    var labels = initLabels(GraphOps.vertices(edges))
    var i = 0
    while (i < supersteps) {
      i += 1
      labels = superstep(edges, labels, symmetric)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        .localCheckpoint(eager = true)
    }
    labels
  }

  /** Lazily chained fixed supersteps: ONE action executes the whole
    * multi-superstep DAG (each superstep's aggregations are shuffle
    * boundaries, so stages run exactly once). No per-step materialization
    * job — used by the throughput benchmark, where per-action fixed
    * overhead would otherwise mask compute scaling. Depth-limited by plan
    * size; use [[runFixed]]/[[run]] beyond ~10 steps.
    */
  def chainFixed(edges: DataFrame, supersteps: Int): DataFrame = {
    var labels = initLabels(GraphOps.vertices(edges))
    var i = 0
    while (i < supersteps) { i += 1; labels = superstep(edges, labels) }
    labels
  }

  /** Run to convergence. `edges` should be symmetrized for undirected
    * semantics and pre-partitioned via [[GraphOps.prepareForGather]].
    */
  def run(
      edges: DataFrame,
      nNodes: Long,
      checkpointer: Option[Checkpointer] = None,
      checkpointEvery: Int = 5,
      maxIter: Option[Int] = None,
      skewPlan: Option[GraphOps.SkewPlan] = None,
      earlyStop: Boolean = true,
      symmetric: Boolean = false): Superstep.Result = {
    val init = initLabels(GraphOps.vertices(edges))
    // packed argmax is valid iff every label (= vertex id) fits 40 bits
    // and every per-label count (≤ max in-degree) fits 23 bits
    val maxId = init.agg(max("id")).first().getLong(0)
    val maxDeg = edges.groupBy("dst").count().agg(max("count")).first().getLong(0)
    val packed = maxId < (1L << PackLabelBits) && maxDeg < (1L << 23)
    val step: DataFrame => DataFrame = skewPlan match {
      case Some(p) => labels => superstepSkewAware(p, labels, packed)
      case None    => labels => superstep(edges, labels, symmetric, packed)
    }
    Superstep.run("lp", init, step, nNodes,
      earlyStop = earlyStop, checkpointer = checkpointer,
      checkpointEvery = checkpointEvery, maxIter = maxIter)
  }
}
