package graft.pipeline

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Power-iteration PCA over an embedding column — the spectral family a
  * training-data pipeline needs for whitening, drift monitoring and
  * anisotropy diagnostics (embedding collections are notoriously
  * anisotropic; the top principal direction and its explained-variance
  * share are the standard health report).
  *
  * Shape at scale: ONE corpus pass builds the mean (positional decimal
  * means — the embed_kmeans pattern) and ONE builds the d×d Gram/scatter
  * table of the centered data (double posexplode → map-side-combined
  * (i, j) sums: the shuffle carries d² partials per partition, never
  * vectors — the treeAggregate shape, d² bounded by contract: d = 64 is
  * a 4096-row table). The d×d scatter then collects to the driver and
  * the power iterations run locally (the trainCentroids codebook
  * precedent — iterating 4096 numbers through Spark jobs would pay ~1 s
  * of scheduler overhead per step for microseconds of arithmetic); the
  * corpus is never touched again.
  *
  * Determinism across engines (what puts a real eigensolver under the
  * DuckDB oracle): every unordered sum is an exact DECIMAL sum (products
  * are computed in double — bit-identical on both sides — then cast
  * HALF_UP and summed exactly); every ordered reduction (vector norm,
  * trace) is a sequential fold over a position-sorted list, the ivf
  * distance pattern. The start vector is md5-derived (planeComponent
  * seed 'pca'), so the iteration trajectory — including the eigenvector
  * SIGN, which is otherwise arbitrary — is a pure function of the data
  * replayable in any engine with md5. */
object Pca {

  /** Deterministic md5 start component for position i (uniform
    * [-0.5, 0.5), the Ann.planeComponent trick with a 'pca' tag). */
  private[graft] def startComponent(i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s"pca $i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var u = 0L
    var b = 0
    while (b < 4) { u = (u << 8) | (d(b) & 0xffL); b += 1 }
    u / 4294967296.0 - 0.5
  }

  private def orderedVals(pairs: Column): Column =
    transform(array_sort(pairs), p => p.getField("v"))

  /** Top principal component by `iters` power iterations on the centered
    * scatter matrix. Returns the long-format report
    * [pos, component(6), lambda(6), explained_var(6)] — `lambda` is the
    * estimate ‖S·v‖ from the final iteration, `explained_var` its share
    * of trace(S) (total variance).
    *
    * Convergence contract: the error decays as (λ₂/λ₁)^iters — fast on
    * real (anisotropic) embedding collections (PcaSpec pins cosine ≥
    * 0.99 to the true eigenvector on a planted-direction fixture in 5
    * iterations), slow on near-isotropic data where the "top" direction
    * is barely meaningful anyway. The operator's output is DEFINED as
    * the `iters`-step trajectory from the md5 start (not "the converged
    * eigenvector"), which is what makes it exactly replayable — the
    * embed_pca oracle row pins the full trajectory cross-engine on the
    * driver's (near-isotropic) table; raise `iters` when you need
    * convergence on such data. */
  def topComponent(emb: DataFrame, iters: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(iters >= 1, "power iteration needs at least one step")
    val spark = emb.sparkSession
    val base = emb.select(col(idCol).cast("long").as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val ex = base.select(col("id"), posexplode(col("v")).as(Seq("i", "x")))
    val mean = ex.groupBy(col("i"))
      .agg((sum(col("x").cast("decimal(18,6)")).cast("double") /
        count(lit(1))).as("m"))
    // centered rows regrouped to arrays for the double-explode Gram pass
    // persisted: a materialization barrier between the (explode + join +
    // collect_list) build and the d²-wide double-explode — without it the
    // whole upstream re-evaluates inside the Gram job's generator
    // pipeline (measured 12 s → ~3 s at sf0.1)
    // Gram pass (r14): ONE map-side-combined aggregate over the centered
    // rows (graft.functions.GramDecimal) — the same DECIMAL(28,8)-exact
    // cell sums the former posexplode×posexplode → groupBy(i,j) →
    // sum(decimal) plan produced (exact fixed-scale sums are order-free,
    // so the kernel is value-identical by construction; GramDecimalSpec
    // pins it), without materializing n·d² exploded rows through a
    // shuffle. The shuffle now carries one d²-long array per map
    // partition instead of d² decimal partials per row.
    val xcArr = ex.join(broadcast(mean), Seq("i"))
      .select(col("id"), struct(col("i"), (col("x") - col("m")).as("v")).as("p"))
      .groupBy(col("id"))
      .agg(orderedVals(collect_list(col("p"))).as("a"))
    val gramFlat = xcArr
      .agg(graft.functions.GramDecimal.gramSum(col("a")).as("g"))
      .head().getSeq[Long](0)
    require(gramFlat != null && gramFlat.nonEmpty, "empty embedding table")
    val dim = math.sqrt(gramFlat.length.toDouble).round.toInt
    val g = Array.ofDim[Double](dim, dim)
    var gi = 0
    while (gi < dim) {
      var gj = 0
      while (gj < dim) {
        g(gi)(gj) = graft.functions.GramDecimal.unscaledToDouble(gramFlat(gi * dim + gj))
        gj += 1
      }
      gi += 1
    }

    // power iterations on the d×d scatter — driver-local (the corpus is
    // never touched again), replicating the engine arithmetic exactly:
    // DECIMAL(28,8) HALF_UP matrix-vector sums (scala BigDecimal.decimal
    // IS Spark's double→decimal cast), sequential position-order folds
    // for norms/trace.
    def dec8(x: Double): java.math.BigDecimal =
      BigDecimal.decimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal
    var v = Array.tabulate(dim)(startComponent)
    var lambda = 0.0
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim) { i =>
        var acc = java.math.BigDecimal.ZERO
        var j = 0
        while (j < dim) { acc = acc.add(dec8(g(i)(j) * v(j))); j += 1 }
        acc.doubleValue
      }
      var s = 0.0
      var i = 0
      while (i < dim) { s += w(i) * w(i); i += 1 }
      lambda = math.sqrt(s)
      v = w.map(_ / lambda)
    }
    var tr = 0.0
    var i = 0
    while (i < dim) { tr += g(i)(i); i += 1 }

    import spark.implicits._
    v.zipWithIndex.map { case (c, p) => (p.toLong, c, lambda, lambda / tr) }
      .toSeq.toDF("pos", "component", "lambda", "explained_var")
      .select(col("pos"), round(col("component"), 6).as("component"),
        round(col("lambda"), 6).as("lambda"),
        round(col("explained_var"), 6).as("explained_var"))
  }

  /** Outliers along the top principal direction: per-vector projection
    * score = (x − mean)·v (the standard embedding anomaly screen — the
    * dominant axis of a healthy collection is shared structure; vectors
    * far out on it are batch artifacts, duplicates-of-weird, or
    * contamination). Composes [[topComponent]]: runs it at `iters`, then
    * ONE narrow corpus pass computes every projection (mean and v ride
    * as broadcast literal arrays; the dot product is the sequential
    * zip_with + aggregate fold of the ivf distance pattern), and a
    * top-k window on (|score| desc, id) keeps the report bounded.
    * Returns [vec_id, score(6), abs_score(6)] — the k largest. */
  def topOutliers(emb: DataFrame, k: Int = 20, iters: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val comp = topComponent(emb, iters, idCol, vecCol)
      .orderBy(col("pos")).collect() // d rounded components — bounded
    val vArr = array(comp.map(r => lit(r.getDouble(1))): _*)
    // the UNROUNDED mean must match topComponent's: recompute the same
    // decimal positional means (cheap pass; parity with the SQL mirror
    // matters more than saving one scan)
    val ex = emb.select(col(idCol).cast("long").as("id"),
        posexplode(transform(col(vecCol), x => x.cast("double")))
          .as(Seq("i", "x")))
    val mean = ex.groupBy(col("i"))
      .agg((sum(col("x").cast("decimal(18,6)")).cast("double") /
        count(lit(1))).as("m"))
      .orderBy(col("i")).collect()
    val mArr = array(mean.map(r => lit(r.getDouble(1))): _*)
    val scored = emb.select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("score", aggregate(
        zip_with(zip_with(col("v"), mArr, (a, b) => a - b), vArr,
          (c, w) => c * w),
        lit(0.0), (acc, x) => acc + x))
    scored
      .orderBy(abs(round(col("score"), 6)).desc, col("id"))
      .limit(k) // TakeOrderedAndProject: map-side top-k, no global sort
      .select(col("id").as("vec_id"), round(col("score"), 6).as("score"),
        abs(round(col("score"), 6)).as("abs_score"))
  }
}
