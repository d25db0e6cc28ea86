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

  /** PERSONALIZED PageRank — relevance to a SEED SET instead of global
    * importance (the related-item/expansion primitive: "tokens/docs
    * near these seeds" for query expansion, related-document panels,
    * topic neighborhoods): the teleport mass lands only on the seeds,
    * r_{k+1}(v) = (1−d)·1{v∈S}/|S| + d·Σ_{(u,v)} r_k(u)·p(u,v),
    * initialized with all mass on S. Same per-iteration shape as
    * [[pageRank]] (ONE edge-to-rank join + ONE map-side-combined
    * groupBy, localCheckpoint lineage cuts); the seed set rides as a
    * literal predicate (bounded — tens of seeds, never data-sized).
    * Every seed must be a graph vertex (raises otherwise — a silently
    * absent seed would leak its teleport mass and the ranks would no
    * longer sum to 1). Returns [vertex, r] (unrounded). */
  def personalizedPageRank(edges: DataFrame, seeds: Seq[Any],
      iters: Int = 5, damping: Double = 0.85, srcCol: String = "src",
      dstCol: String = "dst", wCol: String = "weight"): DataFrame = {
    require(iters >= 0)
    require(seeds.nonEmpty, "personalizedPageRank: empty seed set")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).cast("double").as("w"))
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    val norm = e.join(outw, Seq("src"))
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("w") / col("outw")).as("p"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vertices = norm.select(col("src")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val isSeed = col("src").isin(seeds: _*)
    val nSeeds = vertices.filter(isSeed).count()
    require(nSeeds == seeds.distinct.size,
      s"personalizedPageRank: ${seeds.distinct.size - nSeeds} seed(s) are" +
        " not graph vertices — their teleport mass would silently leak")
    val seedMass = 1.0 / seeds.distinct.size
    // divide, don't multiply by seedMass: X/n is one rounding, matching
    // any SQL mirror's `(1-d)/n.0` bit for bit at every seed count
    val teleport = (1.0 - damping) / seeds.distinct.size
    var r = vertices
      .withColumn("r", when(isSeed, lit(seedMass)).otherwise(lit(0.0)))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contrib = norm.join(r, Seq("src"))
        .groupBy(col("dst")).agg(sum(col("p") * col("r")).as("rin"))
      r = vertices.join(contrib, vertices("src") === contrib("dst"), "left")
        .select(col("src"),
          (when(isSeed, lit(teleport)).otherwise(lit(0.0)) +
            lit(damping) * coalesce(col("rin"), lit(0.0))).as("r"))
        .localCheckpoint(true)
    }
    norm.unpersist()
    vertices.unpersist()
    r.select(col("src").as("vertex"), col("r"))
  }

  /** Connected components by pointer-jumping min-label propagation over
    * an arbitrary (orderable) vertex type — the generic form of
    * [[Dedup.duplicateClusters]] (which delegates here after its long
    * cast): per round each vertex takes the least of its own label, its
    * neighbors' labels, and its label's label (the pointer jump that
    * makes convergence O(log diameter) instead of O(diameter)). At
    * fixpoint the label is the component's minimum vertex. Directed or
    * undirected input — edges are symmetrized internally.
    *
    * Scale: each round is two node-sized joins + one edge-sized
    * map-side-combined groupBy(min); ONE action per round reads the
    * changed-count off the job that materializes the round's lazy
    * localCheckpoint (plans never stack `maxRounds` joins deep).
    * Raises instead of emitting non-converged labels (2^maxRounds-deep
    * components are unreachable in practice, so a raise means bad input
    * or a bug, not a tuning problem). Returns [vertex, component]. */
  def connectedComponents(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", maxRounds: Int = 30): DataFrame = {
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var round = 0
    var changed = true
    while (changed && round < maxRounds) {
      val viaNeighbors = sym
        .join(labels.select(col("id").as("src"), col("label")), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("label")).as("nlabel"))
      val viaJump = labels.select(col("id"), col("label").as("jid"))
        .join(labels.select(col("id").as("jid"), col("label").as("jlabel")),
          Seq("jid"), "left")
        .select(col("id"), col("jlabel"))
      val next = labels
        .join(viaNeighbors, Seq("id"), "left")
        .join(viaJump, Seq("id"), "left")
        .select(col("id"),
          least(col("label"),
            coalesce(col("nlabel"), col("label")),
            coalesce(col("jlabel"), col("label"))).as("newlabel"),
          col("label").as("prev"))
        .select(col("id"), col("newlabel").as("label"),
          (col("newlabel") =!= col("prev")).cast("int").as("chg"))
        .localCheckpoint(eager = false)
      val row = next.agg(sum(col("chg"))).first()
      changed = !row.isNullAt(0) && row.getLong(0) > 0L
      labels = next.drop("chg")
      round += 1
    }
    sym.unpersist(false)
    if (changed)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds — " +
          "labels still moving; raise maxRounds (component deeper than " +
          s"2^$maxRounds should be impossible: this indicates a bug or bad input)")
    labels.select(col("id").as("vertex"), col("label").as("component"))
  }

  /** Multi-source BFS hop distances: for every vertex reachable within
    * `maxHops` of the seed set (undirected), the minimum hop count — the
    * link-distance primitive behind crawl-frontier prioritization,
    * contamination blast-radius audits ("everything within 2 hops of a
    * flagged document") and seed-expansion labeling over a k-NN graph.
    * Unreached vertices are absent (maxHops is the contract, so the
    * bounded loop needs no convergence raise). Returns [vertex, dist].
    *
    * Shape at scale: classic frontier expansion — round r joins only the
    * FRONTIER (vertices first reached at r−1) against the edge table and
    * anti-joins the visited set, so per-round work is frontier-edges,
    * not graph-edges; each round localCheckpoints (plans stay O(1)
    * deep) and the loop exits early on an empty frontier. */
  def bfsDistances(edges: DataFrame, seeds: DataFrame, maxHops: Int,
      srcCol: String = "src", dstCol: String = "dst",
      seedCol: String = "vertex"): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0: $maxHops")
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var visited = seeds.select(col(seedCol).as("vertex")).distinct()
      .withColumn("dist", lit(0))
      .localCheckpoint(true)
    var frontier = visited.select(col("vertex"))
    var hop = 0
    var exhausted = frontier.isEmpty
    while (hop < maxHops && !exhausted) {
      hop += 1
      val next = sym
        .join(frontier.select(col("vertex").as("src")), Seq("src"))
        .select(col("dst").as("vertex")).distinct()
        .join(visited.select("vertex"), Seq("vertex"), "left_anti")
        .withColumn("dist", lit(hop))
        .localCheckpoint(true)
      exhausted = next.isEmpty
      if (!exhausted) {
        visited = visited.union(next).localCheckpoint(true)
        frontier = next.select(col("vertex"))
      }
    }
    sym.unpersist(false)
    visited
  }

  /** k-core decomposition (the k-core): iteratively peel vertices of
    * degree < k until none remain — the standard dense-subgraph screen
    * (a vertex in the k-core has ≥ k neighbors that ALSO survive; for
    * copy-family graphs the 2-core separates genuine duplicate clusters
    * from incidental pairwise chains). Each round is one map-side-
    * combined degree count + two anti-joins on the (small, shrinking)
    * dropped-vertex set; the edge table localCheckpoints per round so
    * plans stay O(1) deep. Peel depth is bounded by the degeneracy
    * ordering length — tiny in practice; raises past `maxRounds` rather
    * than emitting a non-converged core. Input may be directed/parallel
    * (canonicalized + deduplicated). Returns the surviving vertices
    * with their core degree [vertex, degree]. */
  def kCore(edges: DataFrame, k: Int, srcCol: String = "src",
      dstCol: String = "dst", maxRounds: Int = 30): DataFrame = {
    require(k >= 1)
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b")).distinct()
    var e = und.union(und.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(true)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val deg = e.groupBy(col("a")).agg(count(lit(1)).as("n"))
      val drop = deg.filter(col("n") < k).select(col("a")).localCheckpoint(true)
      if (drop.isEmpty) converged = true
      else {
        e = e.join(drop, Seq("a"), "left_anti")
          .join(drop.select(col("a").as("b")), Seq("b"), "left_anti")
          .select(col("a"), col("b"))
          .localCheckpoint(true)
        round += 1
      }
    }
    if (!converged)
      throw new IllegalStateException(
        s"kCore did not converge in $maxRounds peel rounds — degeneracy " +
          "ordering deeper than expected; raise maxRounds")
    e.groupBy(col("a").as("vertex")).agg(count(lit(1)).as("degree"))
  }

  /** Per-vertex triangle counts via DEGREE-ORDERED edge orientation —
    * the distributed triangle algorithm: orient every undirected edge
    * from its lower-(degree, id) endpoint to the higher one, so each
    * vertex's out-degree is O(√m) and the wedge (two-path) generation
    * join — the only superlinear step — touches Σ outdeg² ≈ m^1.5
    * candidates instead of the Σ deg² a naive formulation pays (a hub
    * with degree 10⁶ would otherwise produce 10¹² wedges from one key).
    * A wedge (u→v, u→w) closes iff the oriented edge v→w exists — the
    * orientation is a total order, so each triangle is found exactly
    * once, from its minimum vertex.
    *
    * Input may be directed/symmetrized/parallel — edges are canonicalized
    * and de-duplicated first. Returns [vertex, n_triangles] for vertices
    * in ≥1 triangle. Two shuffles on the edge table (distinct + degree),
    * then the self-join pipeline on the oriented table, all
    * key-partitioned; nothing is ever collected. */
  def triangles(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("v")).unionAll(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val lower = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
      .select(
        when(lower, col("a")).otherwise(col("b")).as("s"),
        when(lower, col("b")).otherwise(col("a")).as("d"),
        when(lower, col("db")).otherwise(col("da")).as("dd"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val e1 = oriented.select(col("s"), col("d").as("v"), col("dd").as("dv"))
    val e2 = oriented.select(col("s"), col("d").as("w"), col("dd").as("dw"))
    val wedges = e1.join(e2, "s").where(col("dv") < col("dw") ||
      (col("dv") === col("dw") && col("v") < col("w")))
    val tri = wedges
      .join(oriented.select(col("s").as("v"), col("d").as("w")), Seq("v", "w"))
      .select(col("s"), col("v"), col("w"))
    tri.select(explode(array(col("s"), col("v"), col("w"))).as("vertex"))
      .groupBy("vertex").agg(count(lit(1)).as("n_triangles"))
  }

  /** Adamic–Adar link prediction over the undirected graph: for every
    * non-adjacent vertex pair (u, v) sharing at least one neighbor,
    * score = Σ_z 1/ln(deg(z)) over common neighbors z — the classic
    * "who should be linked" signal (dataset use: recommending related
    * documents from a kNN graph, finding missing edges in citation or
    * co-occurrence graphs). Degree-1 common neighbors (ln 1 = 0) are
    * excluded per the standard definition. The per-pair sum runs in
    * DECIMAL(28,12) so it is summation-order-proof; callers rank on the
    * ROUNDED score (6 dp) with (u, v) tiebreak — the text_tfidf rank
    * discipline. Returns [u, v, aa_score] with u < v.
    *
    * Shape at scale: two-hop wedge join keyed on the shared neighbor.
    * A kNN graph bounds OUT-degree at k, but symmetrization leaves
    * IN-degree unbounded — a hub vector near everything fans the
    * deg²-per-z wedge table quadratically (measured: 6,012 → 2,444
    * rows/s from 64× to 256× replication on the routed kNN graph, 87%
    * of wall in the hub wedges). `maxDegree` is the standard
    * frequent-neighbor pruning: wedges THROUGH a z with deg > maxDegree
    * are dropped — each such wedge contributes only 1/ln(deg) ≈ nothing
    * to its pair's score while costing deg² to enumerate, which is why
    * every production Adamic–Adar (and the common-neighbor literature)
    * caps it. Default unbounded = exact (the oracle path); at 100 TB
    * set it to a small multiple of k. */
  def adamicAdar(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", maxDegree: Int = Int.MaxValue): DataFrame = {
    require(maxDegree >= 2, s"maxDegree must be >= 2: $maxDegree")
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sym = und.select(col("a").as("z"), col("b").as("n"))
      .unionAll(und.select(col("b").as("z"), col("a").as("n")))
    val deg = sym.groupBy(col("z")).agg(count(lit(1)).as("deg"))
    // wedges through z: every unordered neighbor pair of z, weighted by
    // z's 1/ln(deg) contribution (deg >= 2 by construction of a wedge,
    // but ln guards the deg == 1 convention anyway)
    val nb = sym.join(deg, "z")
      .filter(col("deg") >= 2 && col("deg") <= maxDegree)
    val wedges = nb.select(col("z"), col("n").as("u"), col("deg"))
      .join(nb.select(col("z"), col("n").as("v")), "z")
      .where(col("u") < col("v"))
      .select(col("u"), col("v"),
        (lit(1.0) / log(col("deg").cast("double")))
          .cast("decimal(28,12)").as("w"))
    wedges.groupBy(col("u"), col("v"))
      .agg(round(sum(col("w")).cast("double"), 6).as("aa_score"))
      .join(und.select(col("a").as("u"), col("b").as("v")),
        Seq("u", "v"), "left_anti")
  }

  /** Neighbor-set Jaccard similarity — [[adamicAdar]]'s unweighted
    * sibling and the other classic link-prediction score:
    * J(u,v) = |N(u) ∩ N(v)| / |N(u) ∪ N(v)| for non-adjacent pairs
    * sharing at least one neighbor. The intersection comes from the
    * same shared-neighbor wedge join (never a pairwise set compare);
    * the union is deg(u) + deg(v) − common, so the whole score is
    * integer arithmetic until one final division — deterministic
    * across engines and partitionings with no DECIMAL machinery.
    * `maxDegree` is the same frequent-neighbor pruning knob (wedges
    * through hubs cost deg² to enumerate); degrees in the DENOMINATOR
    * stay exact regardless of the cap. Returns
    * [u, v, n_common, jaccard] with u < v. */
  def jaccardSimilarity(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", maxDegree: Int = Int.MaxValue): DataFrame = {
    require(maxDegree >= 2, s"maxDegree must be >= 2: $maxDegree")
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sym = und.select(col("a").as("z"), col("b").as("n"))
      .unionAll(und.select(col("b").as("z"), col("a").as("n")))
    val deg = sym.groupBy(col("z")).agg(count(lit(1)).as("deg"))
    val nb = sym.join(deg, "z")
      .filter(col("deg") >= 2 && col("deg") <= maxDegree)
    val common = nb.select(col("z"), col("n").as("u"))
      .join(nb.select(col("z"), col("n").as("v")), "z")
      .where(col("u") < col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(deg.select(col("z").as("u"), col("deg").as("deg_u")), Seq("u"))
      .join(deg.select(col("z").as("v"), col("deg").as("deg_v")), Seq("v"))
      .select(col("u"), col("v"), col("n_common"),
        round(col("n_common").cast("double") /
          (col("deg_u") + col("deg_v") - col("n_common")), 6).as("jaccard"))
      .join(und.select(col("a").as("u"), col("b").as("v")),
        Seq("u", "v"), "left_anti")
  }

  /** Degree ASSORTATIVITY (Newman 2002) — the Pearson correlation of
    * endpoint degrees over the symmetrized edge list: positive = hubs
    * link to hubs (social-graph shape), negative = hubs link to leaves
    * (star/spam shape). On a kNN document graph this is a one-number
    * corpus-structure audit — a crawl whose similarity graph turns
    * strongly disassortative is template-hub-dominated. Degrees and all
    * five moments (Σx, Σy, Σxy, Σx², Σy²) stay INTEGERS (BIGINT-exact
    * on both engines); the closing Pearson formula is the only double
    * arithmetic — fixed operation order, no DECIMAL machinery. Both
    * edge orientations count, per the standard definition. Returns one
    * row [n_edges, assortativity] (n_edges = directed count = 2·|E|;
    * NaN-free: degenerate zero-variance graphs report 0.0).
    *
    * Shape at scale: one degree shuffle + two degree-lookup joins on
    * the edge keys + one scalar aggregate. */
  def assortativity(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val sym = und.select(col("a").as("z"), col("b").as("n"))
      .unionAll(und.select(col("b").as("z"), col("a").as("n")))
    val deg = sym.groupBy(col("z")).agg(count(lit(1)).as("deg"))
    val xy = sym
      .join(deg.select(col("z"), col("deg").as("x")), Seq("z"))
      .join(deg.select(col("z").as("n"), col("deg").as("y")), Seq("n"))
    val m = xy.agg(count(lit(1)).as("m"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val md = col("m").cast("double")
    val num = md * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val varx = md * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vary = md * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    m.select(col("m").as("n_edges"),
      when(varx * vary <= 0.0, lit(0.0))
        .otherwise(round(num / sqrt(varx * vary), 6)).as("assortativity"))
  }

  /** Synchronous label-propagation community detection (Raghavan et al.
    * 2007) over the undirected graph — the near-linear community
    * finder: every vertex starts as its own community and each round
    * adopts the most frequent label among its neighbors, ties broken
    * toward the SMALLEST label (the classic random tie-break replaced
    * by a deterministic one, so the result is reproducible across
    * engines, partitionings and reruns). A fixed round count is the
    * contract (LPA has no monotone convergence guarantee — labels can
    * oscillate on bipartite-ish structures, so "run to convergence" is
    * not well-defined); `rounds` ≈ the label mixing diameter you want.
    *
    * Shape at scale: each round is one edge⋈labels shuffle keyed by
    * vertex plus a (vertex, label) count — map-side combined; labels
    * localCheckpoint every round so plans stay O(1) deep (the
    * connectedComponents lineage-cut discipline). Isolated vertices
    * don't occur (the vertex set comes from the edge list). Returns
    * [vertex, community]. */
  def labelPropagation(edges: DataFrame, rounds: Int = 4,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0: $rounds")
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("v")).distinct()
      .withColumn("lbl", col("v"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      labels = sym
        .join(labels.select(col("v").as("dst"), col("lbl")), Seq("dst"))
        .groupBy(col("src"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("src"))
        .agg(min_by(col("lbl"), struct((-col("c")).as("nc"), col("lbl")))
          .as("lbl"))
        .select(col("src").as("v"), col("lbl"))
        .localCheckpoint(true)
    }
    sym.unpersist(false)
    labels.select(col("v").as("vertex"), col("lbl").as("community"))
  }

  /** Newman modularity report of a community assignment over a
    * directed-SYMMETRIC weighted edge table (both directions present,
    * the cooc/containment graph convention) — the quality audit a
    * community detector (LPA, CC) is judged with:
    *   Q = Σ_c [ w_in(c)/m2 − (k(c)/m2)² ],
    * m2 = total (directed) weight = 2m, k(c) = total degree-weight of
    * c's vertices, w_in(c) = weight of edges with BOTH endpoints in c.
    * Emitted PER COMMUNITY — integer-exact w_in/k_tot plus the rounded
    * contribution — so no cross-community double sum ever happens in an
    * engine-dependent order (sum the column for Q).
    *
    * Shape at scale: degree and community sizes are map-side-combined
    * aggregations; w_in joins the edge table to the vertex→community
    * map on each endpoint key; m2 rides as a broadcast 1-row
    * aggregate. Returns [community, n_vertices, w_in, k_tot,
    * contribution]. */
  def modularity(edges: DataFrame, communities: DataFrame,
      srcCol: String = "src", dstCol: String = "dst",
      wCol: String = "weight"): DataFrame = {
    val e = edges.select(col(srcCol).as("s"), col(dstCol).as("d"),
      col(wCol).cast("long").as("w"))
    val lbl = communities.select(col("vertex").as("v"), col("community").as("c"))
    val m2 = e.agg(sum(col("w")).cast("double").as("m2"))
    val deg = e.groupBy(col("s")).agg(sum(col("w")).as("k_v"))
    val kc = deg.join(lbl, deg("s") === lbl("v"))
      .groupBy(col("c")).agg(sum(col("k_v")).as("k_tot"))
    val nv = lbl.groupBy(col("c")).agg(count(lit(1)).as("n_vertices"))
    val win = e
      .join(lbl.select(col("v").as("s"), col("c").as("ca")), Seq("s"))
      .join(lbl.select(col("v").as("d"), col("c").as("cb")), Seq("d"))
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("c")).agg(sum(col("w")).as("w_in"))
    val kOverM = col("k_tot").cast("double") / col("m2")
    nv.join(kc, Seq("c")).join(win, Seq("c"), "left")
      .crossJoin(broadcast(m2))
      .select(col("c").as("community"), col("n_vertices"),
        coalesce(col("w_in"), lit(0L)).as("w_in"), col("k_tot"),
        round(coalesce(col("w_in"), lit(0L)).cast("double") / col("m2")
          - kOverM * kOverM, 6).as("contribution"))
  }

  /** HITS hubs-and-authorities over a DIRECTED weighted edge table —
    * the bipartite-ranking primitive PageRank can't express (PageRank
    * conflates the two roles; on a doc→token graph HITS separates
    * "documents that cover the characteristic vocabulary" (hubs) from
    * "tokens that characterize the strong documents" (authorities)).
    * Semantics (Kleinberg, L1-normalized):
    * h_0(u) = 1/|H|;
    * a_k'(v) = Σ_{(u,v)} w(u,v)·h_{k−1}(u),  a_k = a_k'/Σ a_k';
    * h_k'(u) = Σ_{(u,v)} w(u,v)·a_k(v),      h_k = h_k'/Σ h_k'.
    * L1 instead of the textbook L2 keeps the normalizer a plain sum
    * (no sqrt) — the fixpoint directions are identical, only the
    * constant differs.
    *
    * Shape at scale: the edge table is aggregated once per (src, dst)
    * and persisted; each half-iteration is ONE join of edges to the
    * current score vector on its key + ONE map-side-combined groupBy;
    * the L1 normalizer is a 1-row aggregate broadcast back (the
    * NormalizeModel pattern — never a window). Score lineage is cut
    * with an eager localCheckpoint per iteration.
    *
    * Returns [side ('hub'|'auth'), vertex, score] (unrounded). */
  def hits(edges: DataFrame, iters: Int = 5, srcCol: String = "src",
      dstCol: String = "dst", wCol: String = "weight"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(wCol).cast("double").as("w"))
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hubs = e.select(col("src")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nH = hubs.count()
    def l1(df: DataFrame, vCol: String, sCol: String): DataFrame = {
      val z = df.agg(sum(col(sCol)).as("_z"))
      df.crossJoin(broadcast(z))
        .select(col(vCol), (col(sCol) / col("_z")).as(sCol))
    }
    var h = hubs.withColumn("h", lit(1.0 / nH)).localCheckpoint(true)
    var a: DataFrame = null
    for (_ <- 1 to iters) {
      a = l1(
        e.join(h, Seq("src")).groupBy(col("dst"))
          .agg(sum(col("w") * col("h")).as("a")), "dst", "a")
        .localCheckpoint(true)
      h = l1(
        e.join(a, Seq("dst")).groupBy(col("src"))
          .agg(sum(col("w") * col("a")).as("h")), "src", "h")
        .localCheckpoint(true)
    }
    e.unpersist(); hubs.unpersist()
    h.select(lit("hub").as("side"), col("src").as("vertex"),
        col("h").as("score"))
      .union(a.select(lit("auth").as("side"), col("dst").as("vertex"),
        col("a").as("score")))
  }
}
