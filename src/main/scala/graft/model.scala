package graft

import java.sql.Timestamp

/** Core row types for the link-graph engine.
  *
  * The reference engine (`/root/reference/nvtc/TrCountingGraph.h:9-31`) models a graph
  * as columnar CSR arrays of int32 node ids. We use sparse `Long` ids (hashed from
  * participant strings at ingest) — the int32 ceiling in the reference is an
  * implementation limit, not a semantic one (SURVEY.md §1.5).
  */

/** One undirected (or, post-orientation, directed low-degree→high-degree) edge.
  * Reference input format: flat little-endian uint32 pairs
  * (TrCountingGraph.cpp:48-53). */
final case class Edge(src: Long, dst: Long)

/** Vertex degree row — the Spark analog of the reference's `degree` array
  * (TrCountingGraph.h:19). */
final case class VertexDeg(v: Long, deg: Long)

/** Per-vertex sorted adjacency segment — the Spark analog of one CSR row
  * (`offset[v] .. offset[v+1]` into `neighboor`, TrCountingGraph.h:15-22). */
final case class Adjacency(v: Long, deg: Int, nbrs: Array[Long])

/** One turn of a multi-turn conversation transcript (BASELINE.json input_hint).
  * `tool` is null for turns that invoke no tool. */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)
