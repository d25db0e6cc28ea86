package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge tables — the family a
  * token-cooccurrence or citation graph needs at corpus scale. The
  * reference's NetPLSA regularizer consumes a weighted vertex graph
  * (cooccurrence_collector.cc builds it; net_plsa_phi.cc:61-104 walks
  * edges); PageRank is the canonical standalone query over that same
  * graph, re-expressed as Spark joins + aggregations. */
object Graph {

  /** Weighted PageRank with a fixed number of power iterations.
    *
    * Input: an edge table with one row per DIRECTED edge (symmetrize an
    * undirected graph first — e.g. `Cooc.symmetrize`); parallel edges
    * are allowed (weights add). Semantics:
    * r_0(v) = 1/N;
    * r_{k+1}(v) = (1−d)/N + d·Σ_{(u,v)∈E} r_k(u)·w(u,v)/outw(u)
    * where outw(u) = Σ_v w(u,v) and N = |vertices| (distinct sources; a
    * symmetrized graph has no dangling vertices — every vertex with an
    * in-edge also has the mirrored out-edge).
    *
    * Shape at scale: the normalized edge table (one out-degree
    * aggregation + a key-partitioned join, persisted once) is the only
    * corpus-sized build; each iteration is ONE join of edges to the
    * current rank vector on `src` (both sides key-partitioned — AQE
    * broadcasts the rank side while it fits) + ONE map-side-combined
    * groupBy on `dst`. Rank lineage is cut with an eager
    * localCheckpoint per iteration (the duplicateClusters pattern), so
    * plans stay O(1) deep regardless of `iters`. N is a single driver
    * count — one scalar, the IVF bounded-sample precedent.
    *
    * Returns [vertex, r] (unrounded; callers round for reporting). */
  def pageRank(edges: DataFrame, iters: Int = 5, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst",
      wCol: String = "weight"): DataFrame = {
    require(iters >= 0)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).cast("double").as("w"))
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    val norm = e.join(outw, Seq("src"))
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("w") / col("outw")).as("p"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vertices = norm.select(col("src")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = vertices.count()
    val teleport = (1.0 - damping) / n
    var r = vertices.withColumn("r", lit(1.0 / n)).localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contrib = norm.join(r, Seq("src"))
        .groupBy(col("dst")).agg(sum(col("p") * col("r")).as("rin"))
      r = vertices.join(contrib, vertices("src") === contrib("dst"), "left")
        .select(col("src"),
          (lit(teleport) + lit(damping) * coalesce(col("rin"), lit(0.0))).as("r"))
        .localCheckpoint(true)
    }
    norm.unpersist()
    vertices.unpersist()
    r.select(col("src").as("vertex"), col("r"))
  }
}
