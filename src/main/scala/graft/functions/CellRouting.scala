package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for IVF cell routing — the assignment /
  * probe / PQ-encode inner loops that every IVF(-PQ) build and query
  * pass runs once per corpus or query vector.
  *
  * These replace Scala UDFs over boxed Seq[Float]: with cells scaling
  * proportionally to the corpus (the flat-cell-size contract of
  * [[graft.pipeline.Ann.knnGraphRouted]]), the exact-assignment pass is
  * n·numCentroids·dim multiply-adds — the dominant super-linear term of
  * the routed build — and the UDF boxing multiplied its constant by ~6×
  * (the [[AdcDistance]] lesson; ScaleCheck measured graph_knn_routed
  * FALLING from 1982 to 1319 rows/s between 16× and 64× replication
  * with the UDF, rising after this replacement). The generated code
  * reads floats straight out of columnar ArrayData against a referenced
  * float[][] codebook and stays inside whole-stage codegen.
  *
  * Arithmetic contract (every `ann_*` / `graph_bfs_routed` /
  * `dedup_semantic`-family oracle row depends on it): per-centroid
  * squared-L2 partials accumulate in DOUBLE over double-widened floats
  * in index order, the loop bound is min(vector, centroid) length, and
  * ties resolve to the LOWER centroid index — the exact loops of the
  * driver-side `Ann.nearestCentroid` / `Ann.centroidsByDistance` these
  * mirror, so assignment cannot drift between training and serving. */
object CellRouting {
  /** Shared interpreted L2 between an ArrayData float vector (from
    * `off`, `len` elements) and a centroid, the engine's sequential
    * double-widened fold. */
  private[functions] def l2(v: ArrayData, off: Int, len: Int,
      cc: Array[Float]): Double = {
    var d = 0.0
    var i = 0
    val lim = math.min(len, cc.length)
    while (i < lim) {
      val x = v.getFloat(off + i).toDouble - cc(i).toDouble
      d += x * x
      i += 1
    }
    d
  }
}

/** Index of the L2-nearest centroid (ties → lower index) — the IVF cell
  * assignment of [[graft.pipeline.Ann.buildIvfPq]] / `ivfTopK` /
  * `trainCentroidsDistributed`. */
case class NearestCell(child: Expression, cents: Array[Array[Float]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_cell requires array<float>, got $t")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_cell"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val d = CellRouting.l2(v, 0, n, cents(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("cellCents", cents, "float[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val cc = ctx.freshName("cc")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val lim = ctx.freshName("lim")
      val x = ctx.freshName("x")
      s"""
        final int $n = $v.numElements();
        int $best = 0;
        double $bestD = Double.MAX_VALUE;
        for (int $c = 0; $c < $cb.length; $c++) {
          final float[] $cc = $cb[$c];
          final int $lim = Math.min($n, $cc.length);
          double $d = 0.0;
          for (int $i = 0; $i < $lim; $i++) {
            final double $x = (double) $v.getFloat($i) - (double) $cc[$i];
            $d += $x * $x;
          }
          if ($d < $bestD) { $bestD = $d; $best = $c; }
        }
        ${ev.value} = $best;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

/** Indices of the `nprobe` L2-nearest centroids ordered by
  * (distance, index) — the multi-cell probe routing of
  * [[graft.pipeline.Ann.queryIvfPqCandidates]] / `ivfTopK`. The
  * (distance, index) order replicates the stable `sortBy(_._2).take(n)`
  * of the driver-side `Ann.centroidsByDistance` exactly: equal
  * distances keep ascending index order, and an insertion tied with the
  * current worst of a full shortlist is rejected (the earlier index is
  * already ranked ahead of it). */
case class CentroidProbes(child: Expression, cents: Array[Array[Float]],
    nprobe: Int) extends UnaryExpression {

  require(nprobe >= 1, s"graft_centroid_probes: nprobe=$nprobe must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_centroid_probes requires array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_centroid_probes"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val cap = math.min(nprobe, cents.length)
    val bd = new Array[Double](cap)
    val bi = new Array[Int](cap)
    var filled = 0
    var c = 0
    while (c < cents.length) {
      val d = CellRouting.l2(v, 0, n, cents(c))
      if (filled < cap || d < bd(filled - 1)) {
        var j = if (filled < cap) filled else cap - 1
        while (j > 0 && d < bd(j - 1)) { bd(j) = bd(j - 1); bi(j) = bi(j - 1); j -= 1 }
        bd(j) = d; bi(j) = c
        if (filled < cap) filled += 1
      }
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(bi, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("probeCents", cents, "float[][]")
    val cap = math.min(nprobe, cents.length)
    val bd = ctx.addMutableState("double[]", "probeBd",
      v => s"$v = new double[$cap];")
    val bi = ctx.addMutableState("int[]", "probeBi",
      v => s"$v = new int[$cap];")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val filled = ctx.freshName("filled")
      val c = ctx.freshName("c")
      val cc = ctx.freshName("cc")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val lim = ctx.freshName("lim")
      val x = ctx.freshName("x")
      val j = ctx.freshName("j")
      s"""
        final int $n = $v.numElements();
        int $filled = 0;
        for (int $c = 0; $c < $cb.length; $c++) {
          final float[] $cc = $cb[$c];
          final int $lim = Math.min($n, $cc.length);
          double $d = 0.0;
          for (int $i = 0; $i < $lim; $i++) {
            final double $x = (double) $v.getFloat($i) - (double) $cc[$i];
            $d += $x * $x;
          }
          if ($filled < $cap || $d < $bd[$filled - 1]) {
            int $j = ($filled < $cap) ? $filled : $cap - 1;
            while ($j > 0 && $d < $bd[$j - 1]) {
              $bd[$j] = $bd[$j - 1]; $bi[$j] = $bi[$j - 1]; $j--;
            }
            $bd[$j] = $d; $bi[$j] = $c;
            if ($filled < $cap) $filled++;
          }
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(java.util.Arrays.copyOf($bi, $filled));
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidProbes =
    copy(child = newChild)
}

/** PQ encode: per-subspace index of the L2-nearest sub-codebook entry
  * (ties → lower index) — the corpus-encode pass of
  * [[graft.pipeline.Ann.buildIvfPq]]. Subspace width = ⌊dim / m⌋ with
  * the UDF's exact slice semantics (a trailing remainder is ignored,
  * slices past the vector end compare over the empty prefix). */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode requires array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val m = codebooks.length
    val sub = n / m
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        // slice length is min(sub, remaining) — Array.slice semantics of
        // the UDF this replaces (never reads past the vector end)
        val len = math.min(sub, math.max(0, n - s * sub))
        val d = CellRouting.l2(v, s * sub, len, cb(c))
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    val m = codebooks.length
    val out = ctx.addMutableState("int[]", "pqOut",
      v => s"$v = new int[$m];")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val sub = ctx.freshName("sub")
      val s = ctx.freshName("s")
      val scb = ctx.freshName("scb")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val cc = ctx.freshName("cc")
      val len = ctx.freshName("len")
      val lim = ctx.freshName("lim")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      s"""
        final int $n = $v.numElements();
        final int $sub = $n / $m;
        for (int $s = 0; $s < $m; $s++) {
          final float[][] $scb = $cb[$s];
          int $best = 0;
          double $bestD = Double.MAX_VALUE;
          final int $len = Math.min($sub, Math.max(0, $n - $s * $sub));
          for (int $c = 0; $c < $scb.length; $c++) {
            final float[] $cc = $scb[$c];
            final int $lim = Math.min($len, $cc.length);
            double $d = 0.0;
            for (int $i = 0; $i < $lim; $i++) {
              final double $x = (double) $v.getFloat($s * $sub + $i) - (double) $cc[$i];
              $d += $x * $x;
            }
            if ($d < $bestD) { $bestD = $d; $best = $c; }
          }
          $out[$s] = $best;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(java.util.Arrays.copyOf($out, $m));
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Hierarchically-routed probe selection — the IMI/coarse-quantizer
  * trick that removes the n·numCentroids assignment term: centroids are
  * pre-clustered into ~√c parent groups (driver-side, deterministic —
  * [[graft.pipeline.Ann]] buildRouter), a vector first picks its
  * `parentProbes` nearest parents (√c distances), then ranks ONLY their
  * children (membership gate is an int compare per centroid; distances
  * are computed for ~parentProbes·c/√c children). Per-vector cost falls
  * from c·dim to ~(√c·dim + c + parentProbes·√c·dim) — 16× fewer
  * multiply-adds at c = 4096 — which is what keeps cell assignment
  * LINEAR in the corpus when cells scale with it.
  *
  * APPROXIMATE BY CONSTRUCTION: a vector near a parent boundary can
  * miss the true nearest cell when that cell's parent wasn't probed
  * (recall is pinned by unit test, and grows with `parentProbes`).
  * Within the probed children the order is the exact
  * [[CentroidProbes]] (distance, index) order. Opt-in — the
  * oracle-gated exact entries never route through this. */
case class HierarchicalProbes(child: Expression,
    cents: Array[Array[Float]], parents: Array[Array[Float]],
    parentOf: Array[Int], nprobe: Int, parentProbes: Int)
    extends UnaryExpression {

  require(nprobe >= 1 && parentProbes >= 1,
    s"graft_hier_probes: nprobe=$nprobe / parentProbes=$parentProbes must be >= 1")
  require(parentOf.length == cents.length,
    s"graft_hier_probes: parentOf(${parentOf.length}) != cents(${cents.length})")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hier_probes requires array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hier_probes"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val pcap = math.min(parentProbes, parents.length)
    val pd = new Array[Double](pcap)
    val pi = new Array[Int](pcap)
    var pf = 0
    var p = 0
    while (p < parents.length) {
      val d = CellRouting.l2(v, 0, n, parents(p))
      if (pf < pcap || d < pd(pf - 1)) {
        var j = if (pf < pcap) pf else pcap - 1
        while (j > 0 && d < pd(j - 1)) { pd(j) = pd(j - 1); pi(j) = pi(j - 1); j -= 1 }
        pd(j) = d; pi(j) = p
        if (pf < pcap) pf += 1
      }
      p += 1
    }
    val cap = math.min(nprobe, cents.length)
    val bd = new Array[Double](cap)
    val bi = new Array[Int](cap)
    var filled = 0
    // two passes at most: the gated children-only pass, then — ONLY if
    // every probed parent turned out childless (possible when Lloyd's
    // mean update leaves a parent that is no cell's nearest; a silently
    // empty probe list would DROP the query row after explode) — the
    // exact ungated pass as fallback
    var gated = true
    var done = false
    while (!done) {
      var c = 0
      while (c < cents.length) {
        var hit = !gated
        var t = 0
        while (t < pf && !hit) { hit = pi(t) == parentOf(c); t += 1 }
        if (hit) {
          val d = CellRouting.l2(v, 0, n, cents(c))
          if (filled < cap || d < bd(filled - 1)) {
            var j = if (filled < cap) filled else cap - 1
            while (j > 0 && d < bd(j - 1)) { bd(j) = bd(j - 1); bi(j) = bi(j - 1); j -= 1 }
            bd(j) = d; bi(j) = c
            if (filled < cap) filled += 1
          }
        }
        c += 1
      }
      done = filled > 0 || !gated
      gated = false
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(bi, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("hierCents", cents, "float[][]")
    val pb = ctx.addReferenceObj("hierParents", parents, "float[][]")
    val po = ctx.addReferenceObj("hierParentOf", parentOf, "int[]")
    val pcap = math.min(parentProbes, parents.length)
    val cap = math.min(nprobe, cents.length)
    val pd = ctx.addMutableState("double[]", "hierPd", v => s"$v = new double[$pcap];")
    val pi = ctx.addMutableState("int[]", "hierPi", v => s"$v = new int[$pcap];")
    val bd = ctx.addMutableState("double[]", "hierBd", v => s"$v = new double[$cap];")
    val bi = ctx.addMutableState("int[]", "hierBi", v => s"$v = new int[$cap];")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val pf = ctx.freshName("pf")
      val p = ctx.freshName("p")
      val cc = ctx.freshName("cc")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val lim = ctx.freshName("lim")
      val x = ctx.freshName("x")
      val j = ctx.freshName("j")
      val filled = ctx.freshName("filled")
      val c = ctx.freshName("c")
      val hit = ctx.freshName("hit")
      val t = ctx.freshName("t")
      s"""
        final int $n = $v.numElements();
        int $pf = 0;
        for (int $p = 0; $p < $pb.length; $p++) {
          final float[] $cc = $pb[$p];
          final int $lim = Math.min($n, $cc.length);
          double $d = 0.0;
          for (int $i = 0; $i < $lim; $i++) {
            final double $x = (double) $v.getFloat($i) - (double) $cc[$i];
            $d += $x * $x;
          }
          if ($pf < $pcap || $d < $pd[$pf - 1]) {
            int $j = ($pf < $pcap) ? $pf : $pcap - 1;
            while ($j > 0 && $d < $pd[$j - 1]) {
              $pd[$j] = $pd[$j - 1]; $pi[$j] = $pi[$j - 1]; $j--;
            }
            $pd[$j] = $d; $pi[$j] = $p;
            if ($pf < $pcap) $pf++;
          }
        }
        int $filled = 0;
        // gated pass first; if every probed parent is childless (a
        // Lloyd-orphaned parent — an empty probe list would DROP the
        // query row after explode), one exact ungated fallback pass
        boolean gated$filled = true;
        boolean done$filled = false;
        while (!done$filled) {
          for (int $c = 0; $c < $cb.length; $c++) {
            boolean $hit = !gated$filled;
            for (int $t = 0; $t < $pf && !$hit; $t++) {
              $hit = $pi[$t] == $po[$c];
            }
            if ($hit) {
              final float[] $cc = $cb[$c];
              final int $lim = Math.min($n, $cc.length);
              double $d = 0.0;
              for (int $i = 0; $i < $lim; $i++) {
                final double $x = (double) $v.getFloat($i) - (double) $cc[$i];
                $d += $x * $x;
              }
              if ($filled < $cap || $d < $bd[$filled - 1]) {
                int $j = ($filled < $cap) ? $filled : $cap - 1;
                while ($j > 0 && $d < $bd[$j - 1]) {
                  $bd[$j] = $bd[$j - 1]; $bi[$j] = $bi[$j - 1]; $j--;
                }
                $bd[$j] = $d; $bi[$j] = $c;
                if ($filled < $cap) $filled++;
              }
            }
          }
          done$filled = $filled > 0 || !gated$filled;
          gated$filled = false;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(java.util.Arrays.copyOf($bi, $filled));
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HierarchicalProbes =
    copy(child = newChild)
}

/** TWO-level hierarchically-routed probe selection — the log-depth IMI
  * rung past [[HierarchicalProbes]] (PLANS §22b): at ~10M+ vectors per
  * executor with the flat-cell-size contract, even the √c parent scan
  * becomes the per-vector bottleneck, so the parents get their own
  * coarse layer. A vector first ranks the ~c^(1/4) GRANDPARENTS
  * (`grandProbes` kept), then only parents whose grandparent was probed
  * (`parentProbes` kept), then only cells whose parent was probed
  * (`nprobe` kept). Per-vector multiply-adds fall from c·dim (exact) /
  * ~√c·dim (1-level) to ~c^(1/4)·dim·const.
  *
  * Same arithmetic contract as every CellRouting expression (double-
  * widened sequential L2, ties to the lower index), and the same
  * orphan fallback: if the gated chain produces ZERO cells (possible
  * when Lloyd's mean update orphans every probed branch — an empty
  * probe list would DROP the query row after explode), one exact
  * ungated pass runs instead. Opt-in — the oracle-gated exact entries
  * never route through this. */
case class TreeProbes(child: Expression,
    cents: Array[Array[Float]], parents: Array[Array[Float]],
    parentOf: Array[Int], grands: Array[Array[Float]], grandOf: Array[Int],
    nprobe: Int, parentProbes: Int, grandProbes: Int)
    extends UnaryExpression {

  require(nprobe >= 1 && parentProbes >= 1 && grandProbes >= 1,
    s"graft_tree_probes: nprobe=$nprobe / parentProbes=$parentProbes / " +
      s"grandProbes=$grandProbes must be >= 1")
  require(parentOf.length == cents.length,
    s"graft_tree_probes: parentOf(${parentOf.length}) != cents(${cents.length})")
  require(grandOf.length == parents.length,
    s"graft_tree_probes: grandOf(${grandOf.length}) != parents(${parents.length})")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_tree_probes requires array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tree_probes"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    // stage 1: grandProbes nearest grandparents (exact scan of the tiny top)
    val gcap = math.min(grandProbes, grands.length)
    val gd = new Array[Double](gcap)
    val gi = new Array[Int](gcap)
    var gf = 0
    var g = 0
    while (g < grands.length) {
      val d = CellRouting.l2(v, 0, n, grands(g))
      if (gf < gcap || d < gd(gf - 1)) {
        var j = if (gf < gcap) gf else gcap - 1
        while (j > 0 && d < gd(j - 1)) { gd(j) = gd(j - 1); gi(j) = gi(j - 1); j -= 1 }
        gd(j) = d; gi(j) = g
        if (gf < gcap) gf += 1
      }
      g += 1
    }
    // stage 2: parentProbes nearest parents among the probed grandparents'
    val pcap = math.min(parentProbes, parents.length)
    val pd = new Array[Double](pcap)
    val pi = new Array[Int](pcap)
    var pf = 0
    var p = 0
    while (p < parents.length) {
      var hit = false
      var t = 0
      while (t < gf && !hit) { hit = gi(t) == grandOf(p); t += 1 }
      if (hit) {
        val d = CellRouting.l2(v, 0, n, parents(p))
        if (pf < pcap || d < pd(pf - 1)) {
          var j = if (pf < pcap) pf else pcap - 1
          while (j > 0 && d < pd(j - 1)) { pd(j) = pd(j - 1); pi(j) = pi(j - 1); j -= 1 }
          pd(j) = d; pi(j) = p
          if (pf < pcap) pf += 1
        }
      }
      p += 1
    }
    // stage 3: nprobe nearest cells among the probed parents' children;
    // empty gated result → exact ungated fallback pass
    val cap = math.min(nprobe, cents.length)
    val bd = new Array[Double](cap)
    val bi = new Array[Int](cap)
    var filled = 0
    var gated = true
    var done = false
    while (!done) {
      var c = 0
      while (c < cents.length) {
        var hit = !gated
        var t = 0
        while (t < pf && !hit) { hit = pi(t) == parentOf(c); t += 1 }
        if (hit) {
          val d = CellRouting.l2(v, 0, n, cents(c))
          if (filled < cap || d < bd(filled - 1)) {
            var j = if (filled < cap) filled else cap - 1
            while (j > 0 && d < bd(j - 1)) { bd(j) = bd(j - 1); bi(j) = bi(j - 1); j -= 1 }
            bd(j) = d; bi(j) = c
            if (filled < cap) filled += 1
          }
        }
        c += 1
      }
      done = filled > 0 || !gated
      gated = false
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(bi, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("treeCents", cents, "float[][]")
    val pb = ctx.addReferenceObj("treeParents", parents, "float[][]")
    val po = ctx.addReferenceObj("treeParentOf", parentOf, "int[]")
    val gb = ctx.addReferenceObj("treeGrands", grands, "float[][]")
    val go = ctx.addReferenceObj("treeGrandOf", grandOf, "int[]")
    val gcap = math.min(grandProbes, grands.length)
    val pcap = math.min(parentProbes, parents.length)
    val cap = math.min(nprobe, cents.length)
    val gd = ctx.addMutableState("double[]", "treeGd", v => s"$v = new double[$gcap];")
    val gi = ctx.addMutableState("int[]", "treeGi", v => s"$v = new int[$gcap];")
    val pd = ctx.addMutableState("double[]", "treePd", v => s"$v = new double[$pcap];")
    val pi = ctx.addMutableState("int[]", "treePi", v => s"$v = new int[$pcap];")
    val bd = ctx.addMutableState("double[]", "treeBd", v => s"$v = new double[$cap];")
    val bi = ctx.addMutableState("int[]", "treeBi", v => s"$v = new int[$cap];")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val gf = ctx.freshName("gf")
      val pf = ctx.freshName("pf")
      val idx = ctx.freshName("idx")
      val cc = ctx.freshName("cc")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val lim = ctx.freshName("lim")
      val x = ctx.freshName("x")
      val j = ctx.freshName("j")
      val filled = ctx.freshName("filled")
      val hit = ctx.freshName("hit")
      val t = ctx.freshName("t")
      s"""
        final int $n = $v.numElements();
        int $gf = 0;
        for (int $idx = 0; $idx < $gb.length; $idx++) {
          final float[] $cc = $gb[$idx];
          final int $lim = Math.min($n, $cc.length);
          double $d = 0.0;
          for (int $i = 0; $i < $lim; $i++) {
            final double $x = (double) $v.getFloat($i) - (double) $cc[$i];
            $d += $x * $x;
          }
          if ($gf < $gcap || $d < $gd[$gf - 1]) {
            int $j = ($gf < $gcap) ? $gf : $gcap - 1;
            while ($j > 0 && $d < $gd[$j - 1]) {
              $gd[$j] = $gd[$j - 1]; $gi[$j] = $gi[$j - 1]; $j--;
            }
            $gd[$j] = $d; $gi[$j] = $idx;
            if ($gf < $gcap) $gf++;
          }
        }
        int $pf = 0;
        for (int $idx = 0; $idx < $pb.length; $idx++) {
          boolean $hit = false;
          for (int $t = 0; $t < $gf && !$hit; $t++) {
            $hit = $gi[$t] == $go[$idx];
          }
          if ($hit) {
            final float[] $cc = $pb[$idx];
            final int $lim = Math.min($n, $cc.length);
            double $d = 0.0;
            for (int $i = 0; $i < $lim; $i++) {
              final double $x = (double) $v.getFloat($i) - (double) $cc[$i];
              $d += $x * $x;
            }
            if ($pf < $pcap || $d < $pd[$pf - 1]) {
              int $j = ($pf < $pcap) ? $pf : $pcap - 1;
              while ($j > 0 && $d < $pd[$j - 1]) {
                $pd[$j] = $pd[$j - 1]; $pi[$j] = $pi[$j - 1]; $j--;
              }
              $pd[$j] = $d; $pi[$j] = $idx;
              if ($pf < $pcap) $pf++;
            }
          }
        }
        int $filled = 0;
        boolean gated$filled = true;
        boolean done$filled = false;
        while (!done$filled) {
          for (int $idx = 0; $idx < $cb.length; $idx++) {
            boolean $hit = !gated$filled;
            for (int $t = 0; $t < $pf && !$hit; $t++) {
              $hit = $pi[$t] == $po[$idx];
            }
            if ($hit) {
              final float[] $cc = $cb[$idx];
              final int $lim = Math.min($n, $cc.length);
              double $d = 0.0;
              for (int $i = 0; $i < $lim; $i++) {
                final double $x = (double) $v.getFloat($i) - (double) $cc[$i];
                $d += $x * $x;
              }
              if ($filled < $cap || $d < $bd[$filled - 1]) {
                int $j = ($filled < $cap) ? $filled : $cap - 1;
                while ($j > 0 && $d < $bd[$j - 1]) {
                  $bd[$j] = $bd[$j - 1]; $bi[$j] = $bi[$j - 1]; $j--;
                }
                $bd[$j] = $d; $bi[$j] = $idx;
                if ($filled < $cap) $filled++;
              }
            }
          }
          done$filled = $filled > 0 || !gated$filled;
          gated$filled = false;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(java.util.Arrays.copyOf($bi, $filled));
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TreeProbes =
    copy(child = newChild)
}
