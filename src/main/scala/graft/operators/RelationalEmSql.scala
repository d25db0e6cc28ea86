package graft.operators

/** DuckDB-SQL mirror of [[RelationalEm]], CTE by CTE — the oracle side of
  * the driver's correctness gate. Every generated CTE corresponds 1:1 to a
  * DataFrame in RelationalEm (same join keys, same arithmetic shape, same
  * double precision), so the row hashes match after round(…, 6).
  *
  * Generation (not hand-inlined SQL) keeps the two sides from drifting:
  * pass CTEs for offline/online/hARTM all come from the same template.
  */
object RelationalEmSql {

  /** tok CTE: bag-of-words with weight column, dict_gather tokenization. */
  def tokCte(name: String = "tok", docFilter: String = ""): String = {
    val extra = if (docFilter.isEmpty) "" else s" AND ($docFilter)"
    s"""$name AS (
       |  SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS n_dw, 1.0 AS w
       |  FROM (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
       |        FROM documents WHERE trim(text) <> ''$extra)
       |  WHERE token <> ''
       |  GROUP BY doc_id, token
       |)""".stripMargin
  }

  /** md5-uniform init CTEs producing `phi$s` from `$tok`'s vocabulary. */
  def initCtes(tok: String, t: Int, s: String): String =
    s"""vocab$s AS (SELECT DISTINCT token FROM $tok),
       |phir$s AS (
       |  SELECT token, CAST(topic AS BIGINT) AS topic,
       |         CAST(('0x' || substr(md5(token || '_' || CAST(topic AS VARCHAR)), 1, 8))::UBIGINT AS DOUBLE)
       |           / 4294967296.0 AS raw
       |  FROM vocab$s CROSS JOIN (SELECT unnest(generate_series(0, ${t - 1})) AS topic)
       |),
       |phi$s AS (SELECT token, topic, raw / sum(raw) OVER (PARTITION BY topic) AS p FROM phir$s)""".stripMargin

  /** nwt-path regularizer mix (mirror of RelationalEm.RegCfg's mix path):
    * LabelRegularizationPhi + ImproveCoherencePhi (against a `coocsym`
    * CTE) + SpecifiedSparsePhi SparseTokens keep-top-`sparseKeep`. */
  case class RegMix(labelTau: Double, cohTau: Double, sparseKeep: Int)

  /** Symmetrized windowed-cooc CTEs ending in `coocsym`
    * [token_a, token_b, cooc_tf] — same tokenization and window semantics
    * as the cooc_window oracle. */
  def coocSymCtes(window: Int): String =
    s"""cpostok AS (
       |  SELECT doc_id, token, pos FROM (
       |    SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token,
       |           generate_subscripts(string_split_regex(trim(lower(text)), '\\s+'), 1) AS pos
       |    FROM documents WHERE trim(text) <> '')
       |  WHERE token <> ''),
       |crawpairs AS (
       |  SELECT CASE WHEN a.token <= b.token THEN a.token ELSE b.token END AS token_a,
       |         CASE WHEN a.token <= b.token THEN b.token ELSE a.token END AS token_b,
       |         CASE WHEN a.token = b.token THEN 2.0 ELSE 1.0 END AS tf
       |  FROM cpostok a JOIN cpostok b
       |    ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos <= a.pos + $window),
       |ccooc AS (SELECT token_a, token_b, sum(tf) AS cooc_tf FROM crawpairs GROUP BY token_a, token_b),
       |coocsym AS (
       |  SELECT token_a, token_b, cooc_tf FROM ccooc
       |  UNION ALL
       |  SELECT token_b, token_a, cooc_tf FROM ccooc WHERE token_a <> token_b)""".stripMargin

  /** One EM collection pass: tok `$tok` × phi `$phiIn` → theta$s, pdwb$s,
    * nwt$s, phi$s. `reg` = (smoothTau, decorrTau) relational regularizers;
    * `regMix` = the nwt-path mix (requires a `coocsym` CTE in scope,
    * mutually exclusive with `reg`). */
  def passCtes(tok: String, phiIn: String, t: Int, s: String,
      reg: Option[(Double, Double)] = None,
      thetaTau: Option[Double] = None,
      regMix: Option[RegMix] = None,
      thetaSel: Option[(Double, String)] = None,
      timeBiterms: Option[(Double, Double)] = None,
      netTau: Option[Double] = None): String = {
    val invT = s"(1.0/$t)"
    val thRaw = thetaTau match {
      case None => "n_td"
      case Some(tt) => s"greatest(n_td + ($tt), 0.0)"
    }
    val thetaCte = thetaSel match {
      case Some((tauSel, tvCte)) =>
        s"""theta$s AS (
           |  SELECT doc_id, topic, thr / sum(thr) OVER (PARTITION BY doc_id) AS th
           |  FROM (SELECT n.doc_id, n.topic,
           |               greatest(n.n_td + ($tauSel) * v.tv * n.n_td, 0.0) AS thr
           |        FROM ntd$s n JOIN $tvCte v ON v.topic = n.topic))""".stripMargin
      case None =>
        s"theta$s AS (SELECT doc_id, topic, $thRaw / sum($thRaw) OVER (PARTITION BY doc_id) AS th FROM ntd$s)"
    }
    val em =
      s"""pdwa$s AS (
         |  SELECT t.doc_id, t.token, t.n_dw, t.w, sum(f.p) * $invT AS p_dw
         |  FROM $tok t JOIN $phiIn f ON f.token = t.token
         |  GROUP BY t.doc_id, t.token, t.n_dw, t.w),
         |ntd$s AS (
         |  SELECT t.doc_id, f.topic, sum(t.n_dw * f.p * $invT / a.p_dw) AS n_td
         |  FROM $tok t JOIN $phiIn f ON f.token = t.token
         |  JOIN pdwa$s a ON a.doc_id = t.doc_id AND a.token = t.token
         |  GROUP BY t.doc_id, f.topic),
         |$thetaCte,
         |pdwb$s AS (
         |  SELECT t.doc_id, t.token, t.n_dw, t.w, sum(f.p * h.th) AS p_dw
         |  FROM $tok t JOIN $phiIn f ON f.token = t.token
         |  JOIN theta$s h ON h.doc_id = t.doc_id AND h.topic = f.topic
         |  GROUP BY t.doc_id, t.token, t.n_dw, t.w),
         |nwt$s AS (
         |  SELECT t.token, f.topic, sum(t.w * t.n_dw * f.p * h.th / b.p_dw) AS n_wt
         |  FROM $tok t JOIN $phiIn f ON f.token = t.token
         |  JOIN theta$s h ON h.doc_id = t.doc_id AND h.topic = f.topic
         |  JOIN pdwb$s b ON b.doc_id = t.doc_id AND b.token = t.token
         |  GROUP BY t.token, f.topic)""".stripMargin
    val norm = (reg, regMix, timeBiterms, netTau) match {
      case (None, None, tb, nt) if tb.isDefined || nt.isDefined =>
        // Phi-path extensions (any combination): SmoothTimeInTopicsPhi
        // (lag/lead sign over token adjacency, from the INPUT phi),
        // BitermsPhi (cooc ⋈ phi² pull, per-pair normalized by n_t·p·p
        // mass) and NetPlsaPhi (n_t²-scaled edge-Laplacian pull, unit
        // vertex weights). Biterms/net need a `coocsym` CTE in scope.
        val (tm, bt) = tb.getOrElse((0.0, 0.0))
        val timeCte =
          s"""rwt$s AS (
             |  SELECT token, topic,
             |         ($tm) * p * ((CASE WHEN pprev IS NULL THEN 0.0 WHEN pprev > p THEN 1.0 WHEN pprev < p THEN -1.0 ELSE 0.0 END)
             |                      + (CASE WHEN pnext IS NULL THEN 0.0 WHEN pnext > p THEN 1.0 WHEN pnext < p THEN -1.0 ELSE 0.0 END)) AS r_wt
             |  FROM (SELECT token, topic, p,
             |               lag(p) OVER (PARTITION BY topic ORDER BY token) AS pprev,
             |               lead(p) OVER (PARTITION BY topic ORDER BY token) AS pnext
             |        FROM $phiIn))""".stripMargin
        val bitermCtes = if (bt == 0.0) "" else
          s""",
             |ntb$s AS (SELECT topic, sum(n_wt) AS n_t FROM nwt$s GROUP BY topic),
             |praw$s AS (
             |  SELECT c.token_a, c.token_b, fa.topic, c.cooc_tf, nb.n_t * fa.p * fb.p AS raw
             |  FROM coocsym c
             |  JOIN $phiIn fa ON fa.token = c.token_a
             |  JOIN $phiIn fb ON fb.token = c.token_b AND fb.topic = fa.topic
             |  JOIN ntb$s nb ON nb.topic = fa.topic),
             |pnorm$s AS (SELECT token_a, token_b, sum(raw) AS nrm FROM praw$s GROUP BY token_a, token_b),
             |rb$s AS (
             |  SELECT p.token_a AS token, p.topic,
             |         sum(p.cooc_tf * (CASE WHEN n.nrm > 0 AND p.raw > 0 THEN p.raw / n.nrm ELSE 0.0 END)) AS rb
             |  FROM praw$s p JOIN pnorm$s n ON n.token_a = p.token_a AND n.token_b = p.token_b
             |  GROUP BY p.token_a, p.topic)""".stripMargin
        val netCtes = nt match {
          case None => ""
          case Some(_) =>
            s""",
               |ntn$s AS (SELECT topic, sum(greatest(n_wt, 0.0)) AS n_t FROM nwt$s GROUP BY topic),
               |rnet$s AS (
               |  SELECT g.token_a AS token, g.topic, (g.s * n.n_t) * n.n_t AS rn
               |  FROM (SELECT e.token_a, fu.topic, sum(e.cooc_tf * (fv.p - fu.p)) AS s
               |        FROM coocsym e
               |        JOIN $phiIn fu ON fu.token = e.token_a
               |        JOIN $phiIn fv ON fv.token = e.token_b AND fv.topic = fu.topic
               |        GROUP BY e.token_a, fu.topic) g
               |  JOIN ntn$s n ON n.topic = g.topic)""".stripMargin
        }
        val btTerm = if (bt == 0.0) "" else s" + ($bt) * coalesce(b.rb, 0.0)"
        val ntTerm = nt.map(v => s" + ($v) * coalesce(n2.rn, 0.0)").getOrElse("")
        val btJoin = if (bt == 0.0) "" else
          s"\n        LEFT JOIN rb$s b ON b.token = w.token AND b.topic = w.topic"
        val ntJoin = nt.map(_ =>
          s"\n        LEFT JOIN rnet$s n2 ON n2.token = w.token AND n2.topic = w.topic").getOrElse("")
        s"""$timeCte$bitermCtes$netCtes,
           |phi$s AS (
           |  SELECT token, topic, adj / sum(adj) OVER (PARTITION BY topic) AS p
           |  FROM (SELECT w.token, w.topic,
           |               greatest(w.n_wt + coalesce(r.r_wt, 0.0)$btTerm$ntTerm, 0.0) AS adj
           |        FROM nwt$s w
           |        LEFT JOIN rwt$s r ON r.token = w.token AND r.topic = w.topic$btJoin$ntJoin))""".stripMargin
      case (None, Some(RegMix(lt, ct, keep)), _, _) =>
        s"""rsp$s AS (
           |  SELECT token, topic, n_wt,
           |         row_number() OVER (PARTITION BY token ORDER BY n_wt DESC, topic) AS rk,
           |         sum(n_wt) OVER (PARTITION BY token) AS rowsum
           |  FROM nwt$s),
           |rcoh$s AS (
           |  SELECT c.token_a AS token, v.topic, sum(c.cooc_tf * v.n_wt) AS rc
           |  FROM coocsym c JOIN nwt$s v ON v.token = c.token_b
           |  GROUP BY c.token_a, v.topic),
           |phi$s AS (
           |  SELECT token, topic, adj / sum(adj) OVER (PARTITION BY topic) AS p
           |  FROM (
           |    SELECT r.token, r.topic,
           |           greatest(r.n_wt
           |             + (CASE WHEN r.rowsum <> 0 THEN ($lt) * r.n_wt / r.rowsum ELSE 0.0 END)
           |             + ($ct) * coalesce(h.rc, 0.0)
           |             + (CASE WHEN r.rk > $keep THEN -r.n_wt ELSE 0.0 END), 0.0) AS adj
           |    FROM rsp$s r LEFT JOIN rcoh$s h ON h.token = r.token AND h.topic = r.topic))""".stripMargin
      case (None, None, None, None) =>
        s"""phi$s AS (
           |  SELECT token, topic, adj / sum(adj) OVER (PARTITION BY topic) AS p
           |  FROM (SELECT token, topic, greatest(n_wt, 0.0) AS adj FROM nwt$s))""".stripMargin
      case (Some((sm, de)), _, _, _) =>
        s"""rwt$s AS (
           |  SELECT token, topic,
           |         ($sm) + ($de) * (-p * (sum(p) OVER (PARTITION BY token) - p)) AS r_wt
           |  FROM $phiIn),
           |phi$s AS (
           |  SELECT token, topic, adj / sum(adj) OVER (PARTITION BY topic) AS p
           |  FROM (SELECT n.token, n.topic, greatest(n.n_wt + coalesce(r.r_wt, 0.0), 0.0) AS adj
           |        FROM nwt$s n LEFT JOIN rwt$s r ON r.token = n.token AND r.topic = n.topic))""".stripMargin
    }
    em + ",\n" + norm
  }

  /** Chain `passes` passes from the init, phi0 → phi1 → … → phi$passes. */
  private def offlineChain(tok: String, t: Int, passes: Int,
      reg: Option[(Double, Double)], thetaTau: Option[Double] = None,
      regMix: Option[RegMix] = None,
      timeBiterms: Option[(Double, Double)] = None,
      netTau: Option[Double] = None): String = {
    val ctes = Seq(initCtes(tok, t, "0")) ++
      (1 to passes).map(p =>
        passCtes(tok, s"phi${p - 1}", t, p.toString, reg, thetaTau, regMix,
          timeBiterms = timeBiterms, netTau = netTau))
    ctes.mkString(",\n")
  }

  /** NetPlsaPhi fit oracle (edges = the symmetrized windowed-cooc pairs,
    * unit vertex weights): final pwt [token, topic, p(6)]. */
  def fitOfflineNetPlsa(t: Int, passes: Int, netTau: Double, window: Int): String =
    s"""WITH ${tokCte()},
       |${coocSymCtes(window)},
       |${offlineChain("tok", t, passes, None, None, None, None, Some(netTau))}
       |SELECT token, topic, round(p, 6) AS p FROM phi$passes ORDER BY token, topic""".stripMargin

  /** Rank-only top-k of the NetPlsa fit — the float-safe projection for
    * the KERNEL entry (production NetPlsaPhi): [topic, rank, token]. */
  def topTokensNetPlsaRankOnly(t: Int, passes: Int, k: Int, netTau: Double,
      window: Int): String =
    s"""WITH ${tokCte()},
       |${coocSymCtes(window)},
       |${offlineChain("tok", t, passes, None, None, None, None, Some(netTau))},
       |ranked AS (
       |  SELECT topic, token,
       |         CAST(row_number() OVER (PARTITION BY topic ORDER BY p DESC, token) AS BIGINT) AS rank
       |  FROM phi$passes WHERE p > 0)
       |SELECT topic, rank, token FROM ranked WHERE rank <= $k ORDER BY topic, rank""".stripMargin

  /** SmoothTimeInTopicsPhi + BitermsPhi fit oracle: final pwt
    * [token, topic, p(6)]. */
  def fitOfflineTimeBiterms(t: Int, passes: Int, timeTau: Double,
      bitermsTau: Double, window: Int): String =
    s"""WITH ${tokCte()},
       |${coocSymCtes(window)},
       |${offlineChain("tok", t, passes, None, None, None, Some((timeTau, bitermsTau)))}
       |SELECT token, topic, round(p, 6) AS p FROM phi$passes ORDER BY token, topic""".stripMargin

  /** Rank-only top-k of the time+biterms fit — the float-safe projection
    * for the KERNEL entry (production SmoothTimeInTopicsPhi + BitermsPhi):
    * [topic, rank, token]. */
  def topTokensTimeBitermsRankOnly(t: Int, passes: Int, k: Int,
      timeTau: Double, bitermsTau: Double, window: Int): String =
    s"""WITH ${tokCte()},
       |${coocSymCtes(window)},
       |${offlineChain("tok", t, passes, None, None, None, Some((timeTau, bitermsTau)))},
       |ranked AS (
       |  SELECT topic, token,
       |         CAST(row_number() OVER (PARTITION BY topic ORDER BY p DESC, token) AS BIGINT) AS rank
       |  FROM phi$passes WHERE p > 0)
       |SELECT topic, rank, token FROM ranked WHERE rank <= $k ORDER BY topic, rank""".stripMargin

  /** TopicSelectionTheta CTE chain: plain pass 1 → topic_value[t] =
    * n/(n_t·T) from nwt1 → pass 2 with the theta-select agent; ends in
    * phi2/theta2. */
  private def topicSelectChain(t: Int, tau: Double): String =
    s"""${tokCte()},
       |${offlineChain("tok", t, 1, None)},
       |ntk AS (SELECT topic, sum(n_wt) AS n_t FROM nwt1 GROUP BY topic),
       |tvv AS (SELECT topic, (SELECT sum(n_t) FROM ntk) / (n_t * $t) AS tv FROM ntk),
       |${passCtes("tok", "phi1", t, "2", None, None, None, thetaSel = Some((tau, "tvv")))}""".stripMargin

  /** TopicSelectionTheta fit oracle: final pwt [token, topic, p(6)]. */
  def topicSelectFit(t: Int, tau: Double): String =
    s"""WITH ${topicSelectChain(t, tau)}
       |SELECT token, topic, round(p, 6) AS p FROM phi2 ORDER BY token, topic""".stripMargin

  /** Rank-only top-k of the topic-select fit — the float-safe projection
    * for the KERNEL entry (production TopicSelectionTheta agent +
    * driver-side topicValues recompute): [topic, rank, token]. */
  def topicSelectRankOnly(t: Int, tau: Double, k: Int): String =
    s"""WITH ${topicSelectChain(t, tau)},
       |ranked AS (
       |  SELECT topic, token,
       |         CAST(row_number() OVER (PARTITION BY topic ORDER BY p DESC, token) AS BIGINT) AS rank
       |  FROM phi2 WHERE p > 0)
       |SELECT topic, rank, token FROM ranked WHERE rank <= $k ORDER BY topic, rank""".stripMargin

  /** Regularizer-mix fit oracle (RelationalEm mix path: label balancing +
    * improve-coherence + specified-sparse keep-top-k): final pwt
    * [token, topic, p(6)]. */
  def fitOfflineRegMix(t: Int, passes: Int, mix: RegMix, window: Int): String =
    s"""WITH ${tokCte()},
       |${coocSymCtes(window)},
       |${offlineChain("tok", t, passes, None, None, Some(mix))}
       |SELECT token, topic, round(p, 6) AS p FROM phi$passes ORDER BY token, topic""".stripMargin

  /** Rank-only top-k of the regularizer-mix fit — the float-safe
    * projection for the KERNEL mix entry (production
    * LabelRegularizationPhi + ImproveCoherencePhi + SpecifiedSparsePhi):
    * [topic, rank, token]. */
  def topTokensRegMixRankOnly(t: Int, passes: Int, k: Int, mix: RegMix,
      window: Int): String =
    s"""WITH ${tokCte()},
       |${coocSymCtes(window)},
       |${offlineChain("tok", t, passes, None, None, Some(mix))},
       |ranked AS (
       |  SELECT topic, token,
       |         CAST(row_number() OVER (PARTITION BY topic ORDER BY p DESC, token) AS BIGINT) AS rank
       |  FROM phi$passes WHERE p > 0)
       |SELECT topic, rank, token FROM ranked WHERE rank <= $k ORDER BY topic, rank""".stripMargin

  /** Composed dictionary→fit chain (the reference's canonical workflow:
    * gather → filter bounds → fit on the surviving vocabulary → top
    * tokens) under ONE oracle row. The dictionary CTEs replay the
    * dict_filter oracle (tf = Σ n_dw, df = distinct docs, strict `<` on
    * the maxDfRate bound, num_docs = ALL documents rows); the fit then
    * sees only kept tokens — its md5 init normalizes over the FILTERED
    * vocabulary, so this row fails if filtering composes wrongly with
    * init/fit even when both standalone rows pass. */
  def topTokensDictFiltered(t: Int, passes: Int, k: Int,
      minDf: Double, maxDfRate: Double, minTf: Double): String =
    s"""WITH ${tokCte("tokraw")},
       |dstats AS (SELECT token, sum(n_dw) AS tf,
       |           CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
       |           FROM tokraw GROUP BY token),
       |dn AS (SELECT count(*) AS num_docs FROM documents),
       |dkeep AS (SELECT token FROM dstats, dn
       |          WHERE df >= $minDf AND df < $maxDfRate * num_docs AND tf >= $minTf),
       |tok AS (SELECT tr.doc_id, tr.token, tr.n_dw, tr.w
       |        FROM tokraw tr JOIN dkeep USING (token)),
       |${offlineChain("tok", t, passes, None)},
       |ranked AS (
       |  SELECT topic, token, round(p, 6) AS p,
       |         CAST(row_number() OVER (PARTITION BY topic ORDER BY round(p, 6) DESC, token) AS BIGINT) AS rank
       |  FROM phi$passes)
       |SELECT topic, rank, token, p FROM ranked WHERE rank <= $k ORDER BY topic, rank""".stripMargin

  /** Final pwt after `passes` passes: [token, topic, p(6)]. */
  def fitOffline(t: Int, passes: Int, reg: Option[(Double, Double)] = None,
      thetaTau: Option[Double] = None): String =
    s"""WITH ${tokCte()},
       |${offlineChain("tok", t, passes, reg, thetaTau)}
       |SELECT token, topic, round(p, 6) AS p FROM phi$passes ORDER BY token, topic""".stripMargin

  /** Per-pass perplexity rows: [pass, perplexity(6)]. */
  def perplexity(t: Int, passes: Int): String = {
    val sel = (1 to passes).map { p =>
      s"SELECT CAST(${p - 1} AS BIGINT) AS pass, round(exp(-sum(n_dw * ln(p_dw)) / sum(n_dw)), 6) AS perplexity FROM pdwb$p"
    }.mkString("\n      UNION ALL ")
    s"""WITH ${tokCte()},
       |${offlineChain("tok", t, passes, None)}
       |SELECT * FROM (
       |      $sel
       |) ORDER BY pass""".stripMargin
  }

  /** Inference theta with the fitted phi (one extra E pass):
    * [doc_id, topic, theta(6)]. */
  def transform(t: Int, passes: Int): String = {
    val inf = passCtes("tok", s"phi$passes", t, "Inf", None)
    s"""WITH ${tokCte()},
       |${offlineChain("tok", t, passes, None)},
       |$inf
       |SELECT doc_id, topic, round(th, 6) AS theta FROM thetaInf ORDER BY doc_id, topic""".stripMargin
  }

  /** Per-document perplexity under the fitted phi (inference pass's
    * pdwb): [doc_id, perplexity(6)] — the model-based quality-filter
    * signal (mirror of RelationalEm.docPerplexity). */
  def docPerplexity(t: Int, passes: Int): String = {
    val inf = passCtes("tok", s"phi$passes", t, "Inf", None)
    s"""WITH ${tokCte()},
       |${offlineChain("tok", t, passes, None)},
       |$inf
       |SELECT doc_id, round(exp(-sum(n_dw * ln(p_dw)) / sum(n_dw)), 6) AS perplexity
       |FROM pdwbInf GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Top-k tokens per topic of the fitted phi: [topic, rank, token, p(6)].
    * Rank on the ROUNDED weight (token tie-break) so both engines rank
    * identical values. */
  def topTokens(t: Int, passes: Int, k: Int): String =
    s"""WITH ${tokCte()},
       |${offlineChain("tok", t, passes, None)},
       |ranked AS (
       |  SELECT topic, token, round(p, 6) AS p,
       |         CAST(row_number() OVER (PARTITION BY topic ORDER BY round(p, 6) DESC, token) AS BIGINT) AS rank
       |  FROM phi$passes)
       |SELECT topic, rank, token, p FROM ranked WHERE rank <= $k ORDER BY topic, rank""".stripMargin

  /** Rank-only top-k (for checking the float32 kernel's fit against the
    * double relational ranks — values would differ in the last decimals,
    * ranks don't): [topic, rank, token]. With `reg` the chain is the
    * regularized fit, putting the kernel's regularizer path under the
    * oracle too. */
  def topTokensRankOnly(t: Int, passes: Int, k: Int,
      reg: Option[(Double, Double)] = None,
      thetaTau: Option[Double] = None): String =
    s"""WITH ${tokCte()},
       |${offlineChain("tok", t, passes, reg, thetaTau)},
       |ranked AS (
       |  SELECT topic, token,
       |         CAST(row_number() OVER (PARTITION BY topic ORDER BY p DESC, token) AS BIGINT) AS rank
       |  FROM phi$passes WHERE p > 0)
       |SELECT topic, rank, token FROM ranked WHERE rank <= $k ORDER BY topic, rank""".stripMargin

  /** Value-bearing oracle for the float32 KERNEL fit: the row set is
    * defined by the double mirror (rows whose p sits further than 2e-4
    * from a 3-decimal rounding boundary — `abs(frac(p·1000) − 0.5) > 0.2`),
    * and on those rows the kernel's p must round(3) identically (parity
    * bound 5e-4 spec / ~1e-7 measured ≪ the 2e-4 guard band). A kernel
    * regression beyond 2e-4 breaks the hash: [token, topic, p3]. */
  def fitKernelValues(t: Int, passes: Int): String =
    s"""WITH ${tokCte()},
       |${offlineChain("tok", t, passes, None)}
       |SELECT token, topic, round(p, 3) AS p3 FROM phi$passes
       |WHERE abs(p * 1000 - floor(p * 1000) - 0.5) > 0.2
       |ORDER BY token, topic""".stripMargin

  /** TopicMassPhi oracle (score/topic_mass_phi.cc:18-80): n_t = Σ_w n_wt
    * per topic of the final pass's nwt, plus ratio of the total mass:
    * [topic, mass(6), ratio(6)]. */
  def topicMass(t: Int, passes: Int): String =
    s"""WITH ${tokCte()},
       |${offlineChain("tok", t, passes, None)},
       |masses AS (SELECT topic, sum(n_wt) AS mass FROM nwt$passes GROUP BY topic)
       |SELECT topic, round(mass, 6) AS mass,
       |       round(mass / sum(mass) OVER (), 6) AS ratio
       |FROM masses ORDER BY topic""".stripMargin

  /** TopicKernel score oracle (score/topic_kernel.cc:30-171): kernel
    * W_t = {w : p(t|w) > threshold} with p(t|w) = p_wt·n_t / Σ_s p_ws·n_s,
    * n_t from the final nwt; per topic size / purity = Σ p_wt / contrast =
    * avg p(t|w): [topic, size, purity(6), contrast(6)]. */
  def topicKernelScore(t: Int, passes: Int, threshold: Double): String =
    s"""WITH ${tokCte()},
       |${offlineChain("tok", t, passes, None)},
       |nt AS (SELECT topic, sum(greatest(n_wt, 0.0)) AS n_t FROM nwt$passes GROUP BY topic),
       |cells AS (
       |  SELECT f.token, f.topic, f.p, f.p * n.n_t AS raw
       |  FROM phi$passes f JOIN nt n ON n.topic = f.topic),
       |ptwc AS (
       |  SELECT token, topic, p, raw / sum(raw) OVER (PARTITION BY token) AS ptw FROM cells)
       |SELECT topic, CAST(count(*) AS BIGINT) AS size,
       |       round(sum(p), 6) AS purity, round(avg(ptw), 6) AS contrast
       |FROM ptwc WHERE ptw > $threshold
       |GROUP BY topic ORDER BY topic""".stripMargin

  /** BackgroundTokensRatio oracle (score/background_tokens_ratio.cc:20-92):
    * per token KL(p(t) ‖ p(t|w)) with p(t) = n_t/n, and the background
    * flag kl > delta: [token, kl(6), is_background]. */
  def backgroundTokens(t: Int, passes: Int, delta: Double): String =
    s"""WITH ${tokCte()},
       |${offlineChain("tok", t, passes, None)},
       |nt AS (SELECT topic, sum(greatest(n_wt, 0.0)) AS n_t FROM nwt$passes GROUP BY topic),
       |ntot AS (SELECT sum(n_t) AS n FROM nt),
       |cells AS (
       |  SELECT f.token, f.topic, f.p * n.n_t AS raw, n.n_t / ntot.n AS pt
       |  FROM phi$passes f JOIN nt n ON n.topic = f.topic CROSS JOIN ntot),
       |ptwc AS (
       |  SELECT token, topic, pt, raw / sum(raw) OVER (PARTITION BY token) AS ptw FROM cells),
       |klt AS (
       |  SELECT token,
       |         sum(CASE WHEN pt > 0 AND ptw > 0 THEN pt * ln(pt / ptw) ELSE 0.0 END) AS kl
       |  FROM ptwc GROUP BY token)
       |SELECT token, round(kl, 6) AS kl,
       |       CAST(CASE WHEN kl > $delta THEN 1 ELSE 0 END AS BIGINT) AS is_background
       |FROM klt ORDER BY token""".stripMargin

  /** CountTopicCoherence oracle (core/dictionary.cc:147-193 +
    * top_tokens.cc coherence): average windowed-cooc value over ordered
    * pairs of each topic's top-k tokens — the ranked CTE matches
    * artm_top_tokens, the cooc CTEs match the cooc_window oracle
    * (symmetrized): [topic, coherence(6)]. */
  def topTokensCoherence(t: Int, passes: Int, k: Int, window: Int): String =
    s"""WITH ${tokCte()},
       |${offlineChain("tok", t, passes, None)},
       |ranked AS (
       |  SELECT topic, token,
       |         row_number() OVER (PARTITION BY topic ORDER BY round(p, 6) DESC, token) AS rank
       |  FROM phi$passes),
       |topk AS (SELECT topic, token FROM ranked WHERE rank <= $k),
       |postok AS (
       |  SELECT doc_id, token, pos FROM (
       |    SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token,
       |           generate_subscripts(string_split_regex(trim(lower(text)), '\\s+'), 1) AS pos
       |    FROM documents WHERE trim(text) <> '')
       |  WHERE token <> ''),
       |rawpairs AS (
       |  SELECT CASE WHEN a.token <= b.token THEN a.token ELSE b.token END AS token_a,
       |         CASE WHEN a.token <= b.token THEN b.token ELSE a.token END AS token_b,
       |         CASE WHEN a.token = b.token THEN 2.0 ELSE 1.0 END AS tf
       |  FROM postok a JOIN postok b
       |    ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos <= a.pos + $window),
       |cooc AS (SELECT token_a, token_b, sum(tf) AS cooc_tf FROM rawpairs GROUP BY token_a, token_b),
       |sym AS (
       |  SELECT token_a, token_b, cooc_tf FROM cooc
       |  UNION ALL
       |  SELECT token_b, token_a, cooc_tf FROM cooc WHERE token_a <> token_b),
       |tpairs AS (
       |  SELECT a.topic, a.token AS token_a, b.token AS token_b
       |  FROM topk a JOIN topk b ON b.topic = a.topic AND a.token <> b.token)
       |SELECT p.topic,
       |       round(sum(coalesce(s.cooc_tf, 0.0)) / ($k * ($k - 1.0)), 6) AS coherence
       |FROM tpairs p LEFT JOIN sym s ON s.token_a = p.token_a AND s.token_b = p.token_b
       |GROUP BY p.topic ORDER BY p.topic""".stripMargin

  /** ThetaSnippet oracle (score/theta_snippet.cc): inference theta of the
    * first `numDocs` docs: [doc_id, topic, theta(6)]. */
  def thetaSnippet(t: Int, passes: Int, numDocs: Int): String = {
    val inf = passCtes("tok", s"phi$passes", t, "Inf", None)
    s"""WITH ${tokCte()},
       |${offlineChain("tok", t, passes, None)},
       |$inf
       |SELECT doc_id, topic, round(th, 6) AS theta FROM thetaInf
       |WHERE doc_id < $numDocs ORDER BY doc_id, topic""".stripMargin
  }

  /** Doc-level argmax oracle for the KERNEL transform: docs whose mirror
    * top-1/top-2 theta margin exceeds `margin` (≫ the kernel↔mirror
    * parity bound), with the winning topic — the kernel must produce the
    * same argmax on those docs: [doc_id, topic]. */
  def transformKernelArgmax(t: Int, passes: Int, margin: Double): String = {
    val inf = passCtes("tok", s"phi$passes", t, "Inf", None)
    s"""WITH ${tokCte()},
       |${offlineChain("tok", t, passes, None)},
       |$inf,
       |ranked AS (
       |  SELECT doc_id, topic, th,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY th DESC, topic) AS rn
       |  FROM thetaInf)
       |SELECT a.doc_id, a.topic
       |FROM ranked a JOIN ranked b ON b.doc_id = a.doc_id AND b.rn = 2
       |WHERE a.rn = 1 AND a.th - b.th > $margin
       |ORDER BY a.doc_id""".stripMargin
  }

  /** Multimodal class-weighted fit oracle (mirror of
    * RelationalEm.fitOfflineMm): text tokens + the lang column as a
    * "@lang" modality, per-(class, topic) normalization, class weight
    * multiplying n_td/n_wt contributions. Final pwt
    * [class_id, token, topic, p(6)]. */
  def fitOfflineMm(t: Int, passes: Int, classWeights: Map[String, Double]): String =
    s"""WITH ${mmChain(t, passes, classWeights)}
       |SELECT class_id, token, topic, round(p, 6) AS p FROM phiM$passes
       |ORDER BY class_id, token, topic""".stripMargin

  private def mmChain(t: Int, passes: Int, classWeights: Map[String, Double]): String = {
    val invT = s"(1.0/$t)"
    val cwCase = "CASE class_id " +
      classWeights.map { case (c, w) => s"WHEN '$c' THEN $w" }.mkString(" ") +
      " ELSE 0.0 END"
    def passCtesMm(prev: String, s: String): String =
      s"""pdwaM$s AS (
         |  SELECT t.doc_id, t.class_id, t.token, t.n_dw, t.w, t.cw, sum(f.p) * $invT AS p_dw
         |  FROM tokw t JOIN $prev f ON f.class_id = t.class_id AND f.token = t.token
         |  GROUP BY t.doc_id, t.class_id, t.token, t.n_dw, t.w, t.cw),
         |ntdM$s AS (
         |  SELECT t.doc_id, f.topic, sum(t.cw * t.n_dw * f.p * $invT / a.p_dw) AS n_td
         |  FROM tokw t JOIN $prev f ON f.class_id = t.class_id AND f.token = t.token
         |  JOIN pdwaM$s a ON a.doc_id = t.doc_id AND a.class_id = t.class_id AND a.token = t.token
         |  GROUP BY t.doc_id, f.topic),
         |thetaM$s AS (SELECT doc_id, topic, n_td / sum(n_td) OVER (PARTITION BY doc_id) AS th FROM ntdM$s),
         |pdwbM$s AS (
         |  SELECT t.doc_id, t.class_id, t.token, t.n_dw, t.w, t.cw, sum(f.p * h.th) AS p_dw
         |  FROM tokw t JOIN $prev f ON f.class_id = t.class_id AND f.token = t.token
         |  JOIN thetaM$s h ON h.doc_id = t.doc_id AND h.topic = f.topic
         |  GROUP BY t.doc_id, t.class_id, t.token, t.n_dw, t.w, t.cw),
         |nwtM$s AS (
         |  SELECT t.class_id, t.token, f.topic, sum(t.w * t.cw * t.n_dw * f.p * h.th / b.p_dw) AS n_wt
         |  FROM tokw t JOIN $prev f ON f.class_id = t.class_id AND f.token = t.token
         |  JOIN thetaM$s h ON h.doc_id = t.doc_id AND h.topic = f.topic
         |  JOIN pdwbM$s b ON b.doc_id = t.doc_id AND b.class_id = t.class_id AND b.token = t.token
         |  GROUP BY t.class_id, t.token, f.topic),
         |phiM$s AS (
         |  SELECT class_id, token, topic, adj / sum(adj) OVER (PARTITION BY class_id, topic) AS p
         |  FROM (SELECT class_id, token, topic, greatest(n_wt, 0.0) AS adj FROM nwtM$s))""".stripMargin
    val chain = (1 to passes).map(p => passCtesMm(s"phiM${p - 1}", p.toString)).mkString(",\n")
    s"""tokmm AS (
       |  SELECT doc_id, '@default_class' AS class_id, token,
       |         CAST(count(*) AS DOUBLE) AS n_dw, 1.0 AS w
       |  FROM (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
       |        FROM documents WHERE trim(text) <> '')
       |  WHERE token <> '' GROUP BY doc_id, token
       |  UNION ALL
       |  SELECT doc_id, '@lang', lower(trim(lang)), 1.0, 1.0
       |  FROM documents WHERE lang IS NOT NULL AND trim(lang) <> ''),
       |tokw AS (SELECT *, $cwCase AS cw FROM tokmm),
       |vocabM AS (SELECT DISTINCT class_id, token FROM tokw),
       |phirM AS (
       |  SELECT class_id, token, CAST(topic AS BIGINT) AS topic,
       |         CAST(('0x' || substr(md5(class_id || '|' || token || '_' || CAST(topic AS VARCHAR)), 1, 8))::UBIGINT AS DOUBLE)
       |           / 4294967296.0 AS raw
       |  FROM vocabM CROSS JOIN (SELECT unnest(generate_series(0, ${t - 1})) AS topic)),
       |phiM0 AS (SELECT class_id, token, topic, raw / sum(raw) OVER (PARTITION BY class_id, topic) AS p FROM phirM),
       |$chain""".stripMargin
  }

  /** Rank-only top-k per (class, topic) of the multimodal fit — the
    * float-safe projection for the KERNEL multimodal entry:
    * [class_id, topic, rank, token]. */
  def topTokensMmRankOnly(t: Int, passes: Int, k: Int,
      classWeights: Map[String, Double]): String =
    s"""WITH ${mmChain(t, passes, classWeights)},
       |ranked AS (
       |  SELECT class_id, topic, token,
       |         CAST(row_number() OVER (PARTITION BY class_id, topic ORDER BY p DESC, token) AS BIGINT) AS rank
       |  FROM phiM$passes WHERE p > 0)
       |SELECT class_id, topic, rank, token FROM ranked WHERE rank <= $k
       |ORDER BY class_id, topic, rank""".stripMargin

  /** SparsityPhi oracle on the regularized fit: per-topic fraction of
    * cells whose p rounds to 0 at 6 decimals (round-robust across
    * engines; the regularized mirror produces exact zeros via
    * max(n+r, 0)): [topic, sparsity(6)]. */
  def sparsityPhi(t: Int, passes: Int, reg: (Double, Double)): String =
    s"""WITH ${tokCte()},
       |${offlineChain("tok", t, passes, Some(reg))}
       |SELECT topic,
       |       round(CAST(sum(CASE WHEN round(p, 6) = 0 THEN 1 ELSE 0 END) AS DOUBLE)
       |             / count(*), 6) AS sparsity
       |FROM phi$passes GROUP BY topic ORDER BY topic""".stripMargin

  /** predict_class oracle (mirror of Fit.transformPredict over the
    * multimodal fit): text-only inference theta against the
    * @default_class rows of the multimodal phi, then
    * p(lang|d) = Σ_t φ_lang,t · θ_td: [doc_id, lang_token, p(6)]. */
  def predictClass(t: Int, passes: Int, classWeights: Map[String, Double]): String = {
    val inf = passCtes("tok", "phiDc", t, "Inf", None)
    s"""WITH ${tokCte()},
       |${mmChain(t, passes, classWeights)},
       |phiDc AS (SELECT token, topic, p FROM phiM$passes WHERE class_id = '@default_class'),
       |$inf,
       |pred AS (
       |  SELECT h.doc_id, f.token AS lang_token, sum(f.p * h.th) AS s
       |  FROM (SELECT token, topic, p FROM phiM$passes WHERE class_id = '@lang') f
       |  JOIN thetaInf h ON h.topic = f.topic
       |  GROUP BY h.doc_id, f.token)
       |SELECT doc_id, lang_token, round(s, 6) AS p FROM pred
       |ORDER BY doc_id, lang_token""".stripMargin
  }

  /** Kernel predict_class oracle: argmax lang per doc, restricted to docs
    * whose mirror top1−top2 score margin exceeds `margin`:
    * [doc_id, lang_token]. */
  def predictClassKernelArgmax(t: Int, passes: Int,
      classWeights: Map[String, Double], margin: Double): String = {
    val inf = passCtes("tok", "phiDc", t, "Inf", None)
    s"""WITH ${tokCte()},
       |${mmChain(t, passes, classWeights)},
       |phiDc AS (SELECT token, topic, p FROM phiM$passes WHERE class_id = '@default_class'),
       |$inf,
       |pred AS (
       |  SELECT h.doc_id, f.token AS lang_token, sum(f.p * h.th) AS s
       |  FROM (SELECT token, topic, p FROM phiM$passes WHERE class_id = '@lang') f
       |  JOIN thetaInf h ON h.topic = f.topic
       |  GROUP BY h.doc_id, f.token),
       |ranked AS (
       |  SELECT doc_id, lang_token, s,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, lang_token) AS rn
       |  FROM pred)
       |SELECT a.doc_id, a.lang_token
       |FROM ranked a JOIN ranked b ON b.doc_id = a.doc_id AND b.rn = 2
       |WHERE a.rn = 1 AND a.s - b.s > $margin
       |ORDER BY a.doc_id""".stripMargin
  }

  /** ItemsProcessed oracle (score/items_processed.cc): the E-step's
    * cumulative item / token-weight counters after one pass:
    * [pass, items_processed, token_weight(6)]. */
  def itemsProcessed(): String =
    s"""WITH ${tokCte()}
       |SELECT CAST(0 AS BIGINT) AS pass,
       |       (SELECT CAST(count(*) AS BIGINT) FROM documents) AS items_processed,
       |       round((SELECT sum(n_dw) FROM tok), 6) AS token_weight""".stripMargin

  /** ClassPrecision oracle (score/class_precision.cc:17-93): accuracy of
    * the argmax predicted lang vs the true lang column over the
    * margin-qualified docs: [correct, total, value(6)]. */
  def classPrecision(t: Int, passes: Int, classWeights: Map[String, Double],
      margin: Double): String = {
    val inf = passCtes("tok", "phiDc", t, "Inf", None)
    s"""WITH ${tokCte()},
       |${mmChain(t, passes, classWeights)},
       |phiDc AS (SELECT token, topic, p FROM phiM$passes WHERE class_id = '@default_class'),
       |$inf,
       |pred AS (
       |  SELECT h.doc_id, f.token AS lang_token, sum(f.p * h.th) AS s
       |  FROM (SELECT token, topic, p FROM phiM$passes WHERE class_id = '@lang') f
       |  JOIN thetaInf h ON h.topic = f.topic
       |  GROUP BY h.doc_id, f.token),
       |ranked AS (
       |  SELECT doc_id, lang_token, s,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, lang_token) AS rn
       |  FROM pred),
       |best AS (
       |  SELECT a.doc_id, a.lang_token
       |  FROM ranked a JOIN ranked b ON b.doc_id = a.doc_id AND b.rn = 2
       |  WHERE a.rn = 1 AND a.s - b.s > $margin),
       |acc AS (
       |  SELECT CAST(sum(CASE WHEN p.lang_token = lower(trim(d.lang)) THEN 1 ELSE 0 END) AS BIGINT) AS correct,
       |         CAST(count(*) AS BIGINT) AS total
       |  FROM best p JOIN documents d ON d.doc_id = p.doc_id
       |  WHERE d.lang IS NOT NULL AND trim(d.lang) <> '')
       |SELECT correct, total, round(CAST(correct AS DOUBLE) / total, 6) AS value FROM acc""".stripMargin
  }

  /** General k-token transaction oracle (mirror of RelationalEm.txnFitK,
    * reference processor_transaction_helpers.cc:68-161): consecutive
    * k-token transactions, alternating typenames tt0..tt{n-1} with
    * per-typename weights, n_wt per POSITION: final pwt
    * [token, topic, p(6)]. */
  def txnFitKSql(t: Int, k: Int, numTypenames: Int,
      ttWeights: Map[String, Double]): String = {
    val invT = s"(1.0/$t)"
    val ttwCase = "CASE tt " +
      ttWeights.map { case (n, w) => s"WHEN '$n' THEN $w" }.mkString(" ") +
      " ELSE 0.0 END"
    s"""WITH ttok0 AS (
       |  SELECT doc_id, token, pos FROM (
       |    SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token,
       |           generate_subscripts(string_split_regex(trim(lower(text)), '\\s+'), 1) AS pos
       |    FROM documents WHERE trim(text) <> '')
       |  WHERE token <> ''),
       |sized AS (
       |  SELECT doc_id, (pos - 1) // $k AS txn_id,
       |         'tt' || CAST(((pos - 1) // $k) % $numTypenames AS VARCHAR) AS tt, token
       |  FROM ttok0),
       |fullx AS (SELECT doc_id, txn_id FROM sized GROUP BY doc_id, txn_id HAVING count(*) = $k),
       |txns AS (SELECT s.doc_id, s.txn_id, s.tt, s.token
       |         FROM sized s JOIN fullx f ON f.doc_id = s.doc_id AND f.txn_id = s.txn_id),
       |${initCtes("txns", t, "K")},
       |prod AS (
       |  SELECT x.doc_id, x.txn_id, x.tt, f.topic, exp(sum(ln(f.p))) AS pp
       |  FROM txns x JOIN phiK f ON f.token = x.token
       |  GROUP BY x.doc_id, x.txn_id, x.tt, f.topic),
       |prodw AS (SELECT doc_id, txn_id, topic, pp, $ttwCase AS ttw FROM prod),
       |pdx0 AS (SELECT doc_id, txn_id, sum(pp) * $invT AS pdx FROM prodw GROUP BY doc_id, txn_id),
       |ntdK AS (SELECT p.doc_id, p.topic, sum(p.ttw * p.pp * $invT / d.pdx) AS n_td
       |         FROM prodw p JOIN pdx0 d ON d.doc_id = p.doc_id AND d.txn_id = p.txn_id
       |         GROUP BY p.doc_id, p.topic),
       |thetaK AS (SELECT doc_id, topic, n_td / sum(n_td) OVER (PARTITION BY doc_id) AS th FROM ntdK),
       |pdx1 AS (SELECT p.doc_id, p.txn_id, sum(p.pp * h.th) AS pdx
       |         FROM prodw p JOIN thetaK h ON h.doc_id = p.doc_id AND h.topic = p.topic
       |         GROUP BY p.doc_id, p.txn_id),
       |vals AS (SELECT p.doc_id, p.txn_id, p.topic, p.ttw * p.pp * h.th / d.pdx AS v
       |         FROM prodw p JOIN thetaK h ON h.doc_id = p.doc_id AND h.topic = p.topic
       |         JOIN pdx1 d ON d.doc_id = p.doc_id AND d.txn_id = p.txn_id),
       |nwtK AS (SELECT x.token, v.topic, sum(v.v) AS n_wt
       |         FROM txns x JOIN vals v ON v.doc_id = x.doc_id AND v.txn_id = x.txn_id
       |         GROUP BY x.token, v.topic),
       |phiOut AS (SELECT token, topic, adj / sum(adj) OVER (PARTITION BY topic) AS p
       |           FROM (SELECT token, topic, greatest(n_wt, 0.0) AS adj FROM nwtK))
       |SELECT token, topic, round(p, 6) AS p FROM phiOut ORDER BY token, topic""".stripMargin
  }

  /** Online decay-merge CTE chain over two doc_id-parity chunks, ending in
    * `phiMB` (the final pwt). */
  private def onlineChain(t: Int, tau0: Double, kappa: Double): String = {
    val rho1 = s"pow($tau0 + 1, -$kappa)"
    val rho2 = s"pow($tau0 + 2, -$kappa)"
    s"""${tokCte()},
       |tokA AS (SELECT * FROM tok WHERE doc_id % 2 = 0),
       |tokB AS (SELECT * FROM tok WHERE doc_id % 2 = 1),
       |${initCtes("tok", t, "0")},
       |${passCtes("tokA", "phi0", t, "A", None)},
       |nwtmA AS (SELECT token, topic, n_wt * $rho1 AS n_wt FROM nwtA),
       |phiMA AS (
       |  SELECT token, topic, adj / sum(adj) OVER (PARTITION BY topic) AS p
       |  FROM (SELECT token, topic, greatest(n_wt, 0.0) AS adj FROM nwtmA)),
       |${passCtes("tokB", "phiMA", t, "B", None)},
       |nwtmB AS (
       |  SELECT token, topic, sum(n_wt) AS n_wt FROM (
       |    SELECT token, topic, n_wt * (1.0 - $rho2) AS n_wt FROM nwtmA
       |    UNION ALL
       |    SELECT token, topic, n_wt * $rho2 AS n_wt FROM nwtB)
       |  GROUP BY token, topic),
       |phiMB AS (
       |  SELECT token, topic, adj / sum(adj) OVER (PARTITION BY topic) AS p
       |  FROM (SELECT token, topic, greatest(n_wt, 0.0) AS adj FROM nwtmB))""".stripMargin
  }

  /** Online decay merge over two doc_id-parity chunks: final pwt. */
  def fitOnline(t: Int, tau0: Double, kappa: Double): String =
    s"""WITH ${onlineChain(t, tau0, kappa)}
       |SELECT token, topic, round(p, 6) AS p FROM phiMB ORDER BY token, topic""".stripMargin

  /** Rank-only top-k of the online fit — the float-safe projection for the
    * KERNEL online entry: [topic, rank, token]. */
  def topTokensOnlineRankOnly(t: Int, tau0: Double, kappa: Double, k: Int): String =
    s"""WITH ${onlineChain(t, tau0, kappa)},
       |ranked AS (
       |  SELECT topic, token,
       |         CAST(row_number() OVER (PARTITION BY topic ORDER BY p DESC, token) AS BIGINT) AS rank
       |  FROM phiMB WHERE p > 0)
       |SELECT topic, rank, token FROM ranked WHERE rank <= $k ORDER BY topic, rank""".stripMargin

  /** ptdw CTE chain on a doc subset, ending in `ptdwCells`
    * [doc_id, token, topic, v]. */
  private def ptdwChain(t: Int, docFilter: String): String =
    s"""${tokCte(docFilter = docFilter)},
       |${initCtes("tok", t, "0")},
       |${passCtes("tok", "phi0", t, "1", None)},
       |ptdwCells AS (
       |  SELECT t.doc_id, t.token, f.topic, f.p * h.th / b.p_dw AS v
       |  FROM tok t JOIN phi0 f ON f.token = t.token
       |  JOIN theta1 h ON h.doc_id = t.doc_id AND h.topic = f.topic
       |  JOIN pdwb1 b ON b.doc_id = t.doc_id AND b.token = t.token)""".stripMargin

  /** ptdw of the kernel's final refresh on a doc subset:
    * [doc_id, token, topic, ptdw(6)]. */
  def ptdw(t: Int, docFilter: String): String =
    s"""WITH ${ptdwChain(t, docFilter)}
       |SELECT doc_id, token, topic, round(v, 6) AS ptdw
       |FROM ptdwCells ORDER BY doc_id, token, topic""".stripMargin

  /** Kernel ptdw oracle: per-(doc, token) argmax topic on cells whose
    * mirror top1−top2 ptdw margin exceeds `margin`:
    * [doc_id, token, topic]. */
  def ptdwKernelArgmax(t: Int, docFilter: String, margin: Double): String =
    s"""WITH ${ptdwChain(t, docFilter)},
       |ranked AS (
       |  SELECT doc_id, token, topic, v,
       |         row_number() OVER (PARTITION BY doc_id, token ORDER BY v DESC, topic) AS rn
       |  FROM ptdwCells)
       |SELECT a.doc_id, a.token, a.topic
       |FROM ranked a JOIN ranked b
       |  ON b.doc_id = a.doc_id AND b.token = a.token AND b.rn = 2
       |WHERE a.rn = 1 AND a.v - b.v > $margin
       |ORDER BY a.doc_id, a.token""".stripMargin

  /** SmoothPtdw MovingProduct CTE chain on a doc subset (mirror of
    * RelationalEm.ptdwSmooth), ending in `r1`
    * [doc_id, pos, token, topic, r]. */
  private def ptdwSmoothChain(t: Int, docFilter: String): String = {
    val invT = s"(1.0/$t)"
    s"""ptok AS (
       |  SELECT doc_id, token, CAST(pos - 1 AS BIGINT) AS pos FROM (
       |    SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token,
       |           generate_subscripts(string_split_regex(trim(lower(text)), '\\s+'), 1) AS pos
       |    FROM documents WHERE trim(text) <> '' AND ($docFilter))
       |  WHERE token <> ''),
       |${initCtes("ptok", t, "0")},
       |pd0 AS (SELECT doc_id, pos, sum(p) * $invT AS pdw
       |        FROM ptok k JOIN phi0 f ON f.token = k.token GROUP BY doc_id, pos),
       |b0 AS (
       |  SELECT k.doc_id, k.pos, k.token, f.topic, (f.p * $invT) / d.pdw AS b
       |  FROM ptok k JOIN phi0 f ON f.token = k.token
       |  JOIN pd0 d ON d.doc_id = k.doc_id AND d.pos = k.pos),
       |r0 AS (
       |  SELECT doc_id, pos, token, topic,
       |         (b * coalesce(lead(b) OVER w, 1.0)) * coalesce(lag(b) OVER w, 1.0) AS r
       |  FROM b0 WINDOW w AS (PARTITION BY doc_id, topic ORDER BY pos)),
       |ntdP AS (SELECT doc_id, topic, sum(r) AS n_td FROM r0 GROUP BY doc_id, topic),
       |thetaP AS (SELECT doc_id, topic, n_td / sum(n_td) OVER (PARTITION BY doc_id) AS th FROM ntdP),
       |pd1 AS (SELECT k.doc_id, k.pos, sum(f.p * h.th) AS pdw
       |        FROM ptok k JOIN phi0 f ON f.token = k.token
       |        JOIN thetaP h ON h.doc_id = k.doc_id AND h.topic = f.topic
       |        GROUP BY k.doc_id, k.pos),
       |b1 AS (
       |  SELECT k.doc_id, k.pos, k.token, f.topic, (f.p * h.th) / d.pdw AS b
       |  FROM ptok k JOIN phi0 f ON f.token = k.token
       |  JOIN thetaP h ON h.doc_id = k.doc_id AND h.topic = f.topic
       |  JOIN pd1 d ON d.doc_id = k.doc_id AND d.pos = k.pos),
       |r1 AS (
       |  SELECT doc_id, pos, token, topic,
       |         (b * coalesce(lead(b) OVER w, 1.0)) * coalesce(lag(b) OVER w, 1.0) AS r
       |  FROM b1 WINDOW w AS (PARTITION BY doc_id, topic ORDER BY pos))""".stripMargin
  }

  /** SmoothPtdw (MovingProduct) oracle on a doc subset:
    * [doc_id, pos, token, topic, ptdw(6)]. */
  def ptdwSmooth(t: Int, docFilter: String): String =
    s"""WITH ${ptdwSmoothChain(t, docFilter)}
       |SELECT doc_id, pos, token, topic, round(r, 6) AS ptdw
       |FROM r1 ORDER BY doc_id, pos, topic""".stripMargin

  /** Kernel SmoothPtdw oracle: per-(doc, pos) argmax topic on cells whose
    * mirror top1−top2 margin exceeds `margin`: [doc_id, pos, topic]. */
  def ptdwSmoothKernelArgmax(t: Int, docFilter: String, margin: Double): String =
    s"""WITH ${ptdwSmoothChain(t, docFilter)},
       |ranked AS (
       |  SELECT doc_id, pos, topic, r,
       |         row_number() OVER (PARTITION BY doc_id, pos ORDER BY r DESC, topic) AS rn
       |  FROM r1)
       |SELECT a.doc_id, a.pos, a.topic
       |FROM ranked a JOIN ranked b
       |  ON b.doc_id = a.doc_id AND b.pos = a.pos AND b.rn = 2
       |WHERE a.rn = 1 AND a.r - b.r > $margin
       |ORDER BY a.doc_id, a.pos""".stripMargin

  /** reuse_theta CTE chain (pass 2's theta initialized from pass 1's
    * cached theta), ending in `thetaR`. */
  private def reuseChain(t: Int): String =
    s"""${tokCte()},
       |${offlineChain("tok", t, 1, None)},
       |tpt AS (
       |  SELECT t.doc_id, t.token, t.n_dw, f.topic, f.p, h.th
       |  FROM tok t JOIN phi1 f ON f.token = t.token
       |  JOIN theta1 h ON h.doc_id = t.doc_id AND h.topic = f.topic),
       |pdwR AS (SELECT doc_id, token, n_dw, sum(p * th) AS p_dw
       |         FROM tpt GROUP BY doc_id, token, n_dw),
       |ntdR AS (SELECT tpt.doc_id, tpt.topic, sum(tpt.n_dw * tpt.p * tpt.th / r.p_dw) AS n_td
       |         FROM tpt JOIN pdwR r ON r.doc_id = tpt.doc_id AND r.token = tpt.token
       |         GROUP BY tpt.doc_id, tpt.topic),
       |thetaR AS (SELECT doc_id, topic, n_td / sum(n_td) OVER (PARTITION BY doc_id) AS th FROM ntdR)""".stripMargin

  /** LDA-facade oracle (graft.Lda ≡ reference python/artm/lda_model.py
    * semantics: reuse_theta FORCED true + SmoothSparseTheta(alpha) +
    * SmoothSparsePhi(beta)): a 2-pass fit where pass 1 runs the
    * regularized offline chain and pass 2's theta initializes from pass
    * 1's CACHED theta (the [[reuseChain]] structure) with the same
    * alpha smoothing, phi normalized with the beta smoothing both
    * passes. Rank-only top-k of the final phi — the float32 kernel
    * driven through the Lda facade ranks against this double mirror. */
  def topTokensLdaRankOnly(t: Int, k: Int, alpha: Double,
      beta: Double): String =
    s"""WITH ${tokCte()},
       |${offlineChain("tok", t, 1, Some((beta, 0.0)), Some(alpha))},
       |tptL AS (
       |  SELECT t.doc_id, t.token, t.n_dw, t.w, f.topic, f.p, h.th
       |  FROM tok t JOIN phi1 f ON f.token = t.token
       |  JOIN theta1 h ON h.doc_id = t.doc_id AND h.topic = f.topic),
       |pdwaL AS (SELECT doc_id, token, n_dw, sum(p * th) AS p_dw
       |          FROM tptL GROUP BY doc_id, token, n_dw),
       |ntdL AS (SELECT tptL.doc_id, tptL.topic,
       |                sum(tptL.n_dw * tptL.p * tptL.th / r.p_dw) AS n_td
       |         FROM tptL JOIN pdwaL r
       |           ON r.doc_id = tptL.doc_id AND r.token = tptL.token
       |         GROUP BY tptL.doc_id, tptL.topic),
       |thetaL AS (SELECT doc_id, topic,
       |                  thr / sum(thr) OVER (PARTITION BY doc_id) AS th
       |           FROM (SELECT doc_id, topic,
       |                        greatest(n_td + ($alpha), 0.0) AS thr
       |                 FROM ntdL)),
       |pdwbL AS (
       |  SELECT t.doc_id, t.token, t.n_dw, t.w, sum(f.p * h.th) AS p_dw
       |  FROM tok t JOIN phi1 f ON f.token = t.token
       |  JOIN thetaL h ON h.doc_id = t.doc_id AND h.topic = f.topic
       |  GROUP BY t.doc_id, t.token, t.n_dw, t.w),
       |nwtL AS (
       |  SELECT t.token, f.topic, sum(t.w * t.n_dw * f.p * h.th / b.p_dw) AS n_wt
       |  FROM tok t JOIN phi1 f ON f.token = t.token
       |  JOIN thetaL h ON h.doc_id = t.doc_id AND h.topic = f.topic
       |  JOIN pdwbL b ON b.doc_id = t.doc_id AND b.token = t.token
       |  GROUP BY t.token, f.topic),
       |phiL AS (
       |  SELECT token, topic, adj / sum(adj) OVER (PARTITION BY topic) AS p
       |  FROM (SELECT token, topic, greatest(n_wt + ($beta), 0.0) AS adj
       |        FROM nwtL)),
       |ranked AS (
       |  SELECT topic, token,
       |         CAST(row_number() OVER (PARTITION BY topic ORDER BY p DESC, token) AS BIGINT) AS rank
       |  FROM phiL WHERE p > 0)
       |SELECT topic, rank, token FROM ranked WHERE rank <= $k ORDER BY topic, rank""".stripMargin

  /** reuse_theta oracle (mirror of RelationalEm.emPassReuse):
    * [doc_id, topic, theta(6)]. */
  def reuseTheta(t: Int): String =
    s"""WITH ${reuseChain(t)}
       |SELECT doc_id, topic, round(th, 6) AS theta FROM thetaR ORDER BY doc_id, topic""".stripMargin

  /** Kernel reuse_theta oracle: per-doc argmax topic of the
    * pass-2-with-cached-theta theta, on docs with a mirror margin >
    * `margin`: [doc_id, topic]. */
  def reuseThetaKernelArgmax(t: Int, margin: Double): String =
    s"""WITH ${reuseChain(t)},
       |ranked AS (
       |  SELECT doc_id, topic, th,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY th DESC, topic) AS rn
       |  FROM thetaR)
       |SELECT a.doc_id, a.topic
       |FROM ranked a JOIN ranked b ON b.doc_id = a.doc_id AND b.rn = 2
       |WHERE a.rn = 1 AND a.th - b.th > $margin
       |ORDER BY a.doc_id""".stripMargin

  /** Transaction E-step oracle (mirror of RelationalEm.txnFit — the
    * kernel's product-of-phis path on consecutive-token-pair
    * transactions): final pwt [token, topic, p(6)]. */
  def txnFit(t: Int): String = {
    val invT = s"(1.0/$t)"
    s"""WITH tokp AS (
       |  SELECT doc_id, token, pos FROM (
       |    SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token,
       |           generate_subscripts(string_split_regex(trim(lower(text)), '\\s+'), 1) AS pos
       |    FROM documents WHERE trim(text) <> '')
       |  WHERE token <> ''),
       |pairs AS (
       |  SELECT doc_id, (pos - 1) // 2 AS txn_id,
       |         max(CASE WHEN (pos - 1) % 2 = 0 THEN token END) AS tok_a,
       |         max(CASE WHEN (pos - 1) % 2 = 1 THEN token END) AS tok_b
       |  FROM tokp GROUP BY doc_id, (pos - 1) // 2 HAVING count(*) = 2),
       |pairtok AS (SELECT tok_a AS token FROM pairs UNION ALL SELECT tok_b AS token FROM pairs),
       |${initCtes("pairtok", t, "T")},
       |prod AS (
       |  SELECT p.doc_id, p.txn_id, p.tok_a, p.tok_b, fa.topic, fa.p * fb.p AS pp
       |  FROM pairs p JOIN phiT fa ON fa.token = p.tok_a
       |       JOIN phiT fb ON fb.token = p.tok_b AND fb.topic = fa.topic),
       |pdx0 AS (SELECT doc_id, txn_id, sum(pp) * $invT AS pdx FROM prod GROUP BY doc_id, txn_id),
       |ntdT AS (SELECT pr.doc_id, pr.topic, sum(pr.pp * $invT / d.pdx) AS n_td
       |        FROM prod pr JOIN pdx0 d ON d.doc_id = pr.doc_id AND d.txn_id = pr.txn_id
       |        GROUP BY pr.doc_id, pr.topic),
       |thetaT AS (SELECT doc_id, topic, n_td / sum(n_td) OVER (PARTITION BY doc_id) AS th FROM ntdT),
       |pdx1 AS (SELECT pr.doc_id, pr.txn_id, sum(pr.pp * h.th) AS pdx
       |         FROM prod pr JOIN thetaT h ON h.doc_id = pr.doc_id AND h.topic = pr.topic
       |         GROUP BY pr.doc_id, pr.txn_id),
       |vals AS (SELECT pr.tok_a, pr.tok_b, pr.topic, pr.pp * h.th / d.pdx AS v
       |         FROM prod pr JOIN thetaT h ON h.doc_id = pr.doc_id AND h.topic = pr.topic
       |         JOIN pdx1 d ON d.doc_id = pr.doc_id AND d.txn_id = pr.txn_id),
       |nwtT AS (SELECT token, topic, sum(v) AS n_wt FROM (
       |           SELECT tok_a AS token, topic, v FROM vals
       |           UNION ALL SELECT tok_b AS token, topic, v FROM vals) GROUP BY token, topic),
       |phiOut AS (SELECT token, topic, adj / sum(adj) OVER (PARTITION BY topic) AS p
       |           FROM (SELECT token, topic, greatest(n_wt, 0.0) AS adj FROM nwtT))
       |SELECT token, topic, round(p, 6) AS p FROM phiOut ORDER BY token, topic""".stripMargin
  }

  /** hARTM CTE chain: level-1 (t1 topics) pwt → pseudo-docs → level-2
    * (t2 topics), ending in `thetaP2`. */
  private def hartmChain(t1: Int, t2: Int, parentWeight: Double): String =
    s"""${tokCte()},
       |${initCtes("tok", t1, "L1")},
       |${passCtes("tok", "phiL1", t1, "P1", None)},
       |pseudo AS (
       |  SELECT CAST(-(topic + 1) AS BIGINT) AS doc_id, token, p AS n_dw, $parentWeight AS w
       |  FROM phiP1),
       |tok2 AS (SELECT doc_id, token, n_dw, w FROM tok UNION ALL SELECT doc_id, token, n_dw, w FROM pseudo),
       |${initCtes("tok2", t2, "L2")},
       |${passCtes("tok2", "phiL2", t2, "P2", None)}""".stripMargin

  /** hARTM psi: theta of the pseudo-docs: [parent_topic, topic, psi(6)]. */
  def hartmPsi(t1: Int, t2: Int, parentWeight: Double): String =
    s"""WITH ${hartmChain(t1, t2, parentWeight)}
       |SELECT CAST(-doc_id - 1 AS BIGINT) AS parent_topic, topic, round(th, 6) AS psi
       |FROM thetaP2 WHERE doc_id < 0 ORDER BY parent_topic, topic""".stripMargin

  /** Kernel hARTM oracle: per-parent argmax child topic on parents whose
    * mirror psi top1−top2 margin exceeds `margin`: [parent_topic, topic]. */
  def hartmKernelArgmax(t1: Int, t2: Int, parentWeight: Double, margin: Double): String =
    s"""WITH ${hartmChain(t1, t2, parentWeight)},
       |psi AS (SELECT CAST(-doc_id - 1 AS BIGINT) AS parent_topic, topic, th
       |        FROM thetaP2 WHERE doc_id < 0),
       |ranked AS (
       |  SELECT parent_topic, topic, th,
       |         row_number() OVER (PARTITION BY parent_topic ORDER BY th DESC, topic) AS rn
       |  FROM psi)
       |SELECT a.parent_topic, a.topic
       |FROM ranked a JOIN ranked b ON b.parent_topic = a.parent_topic AND b.rn = 2
       |WHERE a.rn = 1 AND a.th - b.th > $margin
       |ORDER BY a.parent_topic""".stripMargin
}
