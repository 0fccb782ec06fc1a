package graft.model

import java.sql.Timestamp

/** Core data model for the link-graph engine.
  *
  * The reference engine (carlosmata/LabelPropagation) models a graph as
  * in-memory CSR arrays (`Graph.h:58-61`: `edges_cost`, `edges_tail`,
  * `indexs`) plus a `map<string,int>` name dictionary (`Graph.h:49`).
  * Spark-native equivalent: a distributed COO edge table (`Edge`) plus a
  * vertex-state table per algorithm; CSR never needs materializing — the
  * gather step is an equi-join and Catalyst's partial+final hash
  * aggregation plays the role of the reference's segmented sort/scan/reduce
  * pipeline (`algorithms.h:1084-1296`).
  */

/** One directed edge slot. Undirected graphs are stored symmetrized (both
  * directions present), matching the reference's accounting
  * (`Graph.cu:234-236`; karate = 34 nodes / 156 slots).
  */
final case class Edge(src: Long, dst: Long, weight: Float = 1.0f)

/** Vertex community/component state (reference: `labels[nNodes]`,
  * `algorithms.h:402-404` — initialized to the vertex's own id).
  */
final case class VertexLabel(id: Long, label: Long)

/** Vertex PageRank state. */
final case class VertexRank(id: Long, rank: Double)

/** name → dense id dictionary entry. Ids are assigned in lexicographic
  * name order, replicating the reference's `std::map` iteration-order id
  * assignment (`Graph.cu:284-292`).
  */
final case class NameId(name: String, id: Long)

/** Common-Crawl-style page row (BASELINE.json `input_hint`). */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Per-superstep convergence/lineage metrics, checkpointed every iteration
  * (north_rule: "every superstep checkpoints per-partition lineage and
  * iteration metrics"). `changes` mirrors the reference's change counter
  * (`kernels.h:719-735`), `communities` its per-iteration
  * `countCommunities` (`community_measures.cu:75-78`).
  */
final case class SuperstepMetrics(
    algorithm: String,
    iteration: Int,
    changes: Long,
    communities: Long,
    wallMillis: Long)

/** Per-partition lineage record written alongside each checkpoint so a
  * resumed run can verify it reads exactly the rows the killed run wrote.
  */
final case class PartitionLineage(
    iteration: Int,
    partitionId: Int,
    rowCount: Long,
    labelSum: Long)
