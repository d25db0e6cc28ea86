package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-based document classification for training-data pipelines: a
  * multinomial Naive Bayes classifier over the shared whitespace
  * tokenizer, trained and applied in one declarative plan (closed-form
  * counts — no SGD, no driver loop), plus the fastText-style usage:
  * label = the corpus `source`/`lang` column, score every document.
  *
  * The add-1 smoothed log-likelihood is computed with the log-count
  * trick, which keeps the plan sparse: for class s and doc d,
  *
  *   score_s(d) = ln P(s) − len_d·ln(c_s + V) + Σ_{t∈d} n_dt·ln(c_st + 1)
  *
  * — the Σ term is zero for (t,s) pairs the class never saw (ln 1 = 0),
  * so the join only touches OBSERVED class-token pairs; the smoothing
  * mass folds into the per-class constant ln(c_s + V) times doc length.
  * No dense token×class grid is ever materialized: at 100 TB the heavy
  * tables are (doc,token) counts and (class,token) counts, both
  * map-side-combined natural-key aggregations, joined on the token key.
  *
  * Prediction is argmax on the 6-decimal-ROUNDED score with the label as
  * tie-break (the text_tfidf pattern: libm last-ulp differences cannot
  * flip ranks), so the whole operator sits under the DuckDB oracle.
  */
object Classify {

  /** Train on `labelCol` and predict every non-blank document. Returns
    * (idCol, labelCol, pred, margin) — `pred` the argmax class, `margin`
    * the 3-decimal best-minus-runner-up score gap (a confidence signal
    * for downstream filtering; also what certifies the argmax is far
    * from any float boundary). */
  def naiveBayes(df: DataFrame, labelCol: String = "source",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // r14: train-then-serve. The relational window form below
    // ([[naiveBayesRelational]]) re-aggregated the corpus through ~6
    // shuffle stages and a per-doc rank window per query (measured 80+
    // task-s warm at sf0.1 — the shuffle-write and cache machinery, not
    // the math); the model path is the classify_nb_stream serving shape:
    // TWO small driver collects train the NbModel, then ONE stateless
    // broadcast-hash pass scores every row (no shuffle at all). Output
    // is row-for-row identical (same IEEE association order — the
    // classifyStream contract, pinned by StreamingSpec's stateless-fold
    // == grouped-sum test and by the shared classify_nb oracle SQL both
    // entries already hash-match).
    nbServe(df, trainNbModel(df, labelCol, textCol, idCol),
      labelCol, textCol, idCol)
  }

  /** Score every non-blank document against an already-trained
    * [[NbModel]] — the serving half of [[naiveBayes]], split out so
    * callers sharing one model across several queries (batch + stream +
    * evaluation) train once (the lmModelM pattern). */
  def nbServe(df: DataFrame, model: NbModel, labelCol: String = "source",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    graft.streaming.StreamingPipeline.classifyStream(
        df.select(col(idCol).cast("long").as("doc_id"),
          col(labelCol).as(labelCol), col(textCol).as("text")),
        model, labelCol)
      .select(col("doc_id").as(idCol), col(labelCol), col("pred"), col("margin"))

  /** The pre-r14 fully relational form (docTok → classTok → log-count
    * join → rank window) — kept as the REFERENCE implementation the
    * serving path is pinned against (StreamingSpec / ClassifySpec); the
    * production entry points above now train-then-serve. */
  private[graft] def naiveBayesRelational(df: DataFrame, labelCol: String = "source",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val nonBlank = df.filter(length(trim(col(textCol))) > 0)
    val toks = TextAnalysis.tokensCol(col(textCol))
    // (doc, token, n) — one map-side-combined shuffle on (doc, token)
    val docTok = nonBlank
      .select(col(idCol), col(labelCol).as("__lbl"), explode(toks).as("t"))
      .filter(col("t") =!= "")
      .groupBy(col(idCol), col("__lbl"), col("t"))
      .agg(count(lit(1)).as("n"))
    nbFromDocTok(docTok, idCol)
      .select(col(idCol), col("__lbl").as(labelCol), col("pred"), col("margin"))
  }

  /** The NB core over a pre-tokenized (doc, label, feature, count)
    * table — any feature extractor (whitespace tokens, char n-grams …)
    * plugs in above it. Doc counts/priors derive from the feature table
    * itself (== the doc-level counts whenever every included doc has
    * ≥ 1 feature, which each caller's filter guarantees). Returns
    * [idCol, __lbl, pred, margin]. */
  private[graft] def nbFromDocTok(docTok0: DataFrame, idCol: String): DataFrame = {
    // r14: the r13 persist barrier here was REMOVED with measurements:
    // at sf0.1 the docTok recompute costs ~0.6 task-s where ONE
    // InMemoryTableScan read of the same table costs ~10 task-s and the
    // cache write ~8 (columnar encode/decode of the string columns
    // dwarfs the tokenize+groupBy it saves) — the barrier also leaked
    // its two pinned cache entries for the session (r13 ADVICE #1).
    // Re-inlining is the cheaper plan at every scale here because every
    // consumer AGGREGATES docTok further before joining: the rows that
    // flow are count tables, never the corpus. (This form is now the
    // test reference — production scoring is train-then-serve above.)
    val docTok = docTok0
    // (class, token, c_st) — vocabulary-sized
    val classTok = docTok.groupBy(col("__lbl").as("cls"), col("t"))
      .agg(sum("n").as("c_st"))
    // per-class constants: ln prior, ln(c_s + V); a handful of rows
    val v = classTok.select(countDistinct("t").as("v"))
    val totalDocs = docTok.select(countDistinct(col(idCol)).as("total"))
    val classConst = classTok.groupBy("cls").agg(sum("c_st").as("c_s"))
      .join(docTok.groupBy(col("__lbl").as("cls"))
        .agg(countDistinct(col(idCol)).as("n_docs")), "cls")
      .crossJoin(v).crossJoin(totalDocs)
      .select(col("cls"),
        (log(col("n_docs").cast("double")) -
          log(col("total").cast("double"))).as("ln_prior"),
        log(col("c_s").cast("double") + col("v").cast("double")).as("ln_denom"))
    // Σ n_dt·ln(c_st+1) over observed (token, class) pairs only
    val partial = docTok.join(classTok.withColumnRenamed("t", "t2"),
        col("t") === col("t2"))
      .groupBy(col(idCol), col("cls"))
      .agg(sum(col("n").cast("double") * log(col("c_st").cast("double") + 1.0))
        .as("hit_sum"))
    val docLen = docTok.groupBy(col(idCol), col("__lbl"))
      .agg(sum("n").as("len"))
    // every doc × every class (classes are a broadcast handful)
    val scored = docLen
      .crossJoin(broadcast(classConst))
      .join(partial, Seq(idCol, "cls"), "left")
      .withColumn("score", col("ln_prior") -
        col("len").cast("double") * col("ln_denom") +
        coalesce(col("hit_sum"), lit(0.0)))
    val w = Window.partitionBy(idCol)
      .orderBy(round(col("score"), 6).desc, col("cls"))
    scored
      .withColumn("rk", row_number().over(w))
      .withColumn("margin",
        round(col("score") - lead("score", 1).over(w), 3))
      .where(col("rk") === 1)
      .select(col(idCol), col("__lbl"), col("cls").as("pred"), col("margin"))
  }

  /** A broadcastable trained NB model: per-class constants + the
    * ln(c_st + 1) table as a map. Vocabulary × classes sized — the
    * serving contract (at 100 TB vocab, cap to the top-K discriminative
    * tokens before broadcasting; unseen tokens contribute ln 1 = 0
    * anyway, so capping only coarsens scores, never crashes). */
  final case class NbClass(cls: String, lnPrior: Double, lnDenom: Double,
    lnCounts: Map[String, Double])
  final case class NbModel(classes: Seq[NbClass])

  /** Train the broadcastable model (same counts as [[naiveBayes]]; the
    * constants are computed driver-side with the same Math.log the
    * codegen'd scoring uses). */
  def trainNbModel(df: DataFrame, labelCol: String = "source",
      textCol: String = "text", idCol: String = "doc_id"): NbModel = {
    val nonBlank = df.filter(length(trim(col(textCol))) > 0)
    val docTok = nonBlank
      .select(col(idCol), col(labelCol).as("__lbl"),
        explode(TextAnalysis.tokensCol(col(textCol))).as("t"))
      .filter(col("t") =!= "")
      .groupBy(col(idCol), col("__lbl"), col("t"))
      .agg(count(lit(1)).as("n"))
    nbModelFromDocTok(docTok, idCol)
  }

  /** [[trainNbModel]] over CHAR N-GRAM features — the
    * [[graft.pipeline.TextAnalysis.languageIdNgram]] feature space as a
    * broadcastable serving artifact (the train-batch half of streamed
    * n-gram language ID). Same normalization and substr gram spans as
    * the batch scorer. */
  def trainNbModelNgram(df: DataFrame, n: Int, labelCol: String = "lang",
      textCol: String = "text", idCol: String = "doc_id"): NbModel = {
    val norm = regexp_replace(trim(lower(col(textCol))), "\\s+", " ")
    // r14: no persist — the native CharNgrams extractor (r13) evaluates
    // the normalization once per row under codegen, so the two collects'
    // recomputes cost less than one columnar cache write of the text.
    val base = df
      .select(col(idCol), col(labelCol).as("__lbl"), norm.as("nt"))
      .filter(length(col("nt")) >= n)
    val grams = base.select(col(idCol), col("__lbl"),
      explode(TextAnalysis.charNgramsCol(col("nt"), n)).as("t"))
    val docTok = grams.groupBy(col(idCol), col("__lbl"), col("t"))
      .agg(count(lit(1)).as("n"))
    nbModelFromDocTok(docTok, idCol)
  }

  /** The driver-side model assembly shared by the word- and n-gram
    * trainers (same counts as [[naiveBayes]]; constants use the same
    * Math.log the codegen'd scoring uses). */
  private def nbModelFromDocTok(docTok0: DataFrame, idCol: String): NbModel = {
    // r14: the persist barrier between the two collects was removed with
    // measurements (the nbFromDocTok rationale): the docTok recompute is
    // ~0.6 task-s where the cache write alone is ~8 — integer counts, so
    // both plans are value-identical.
    val docTok = docTok0
    val classTok = docTok.groupBy(col("__lbl").as("cls"), col("t"))
      .agg(sum("n").as("c_st")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val v = classTok.map(_._2).distinct.length.toDouble
    val nDocs = docTok.groupBy(col("__lbl"))
      .agg(countDistinct(col(idCol)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = nDocs.values.sum.toDouble
    val classes = classTok.groupBy(_._1).toSeq.sortBy(_._1).map { case (cls, rows) =>
      val cS = rows.map(_._3).sum.toDouble
      NbClass(cls,
        lnPrior = math.log(nDocs(cls).toDouble) - math.log(total),
        lnDenom = math.log(cS + v),
        lnCounts = rows.map { case (_, t, c) => t -> math.log(c.toDouble + 1.0) }
          .toMap)
    }
    NbModel(classes)
  }

  /** Per-row class-score array for a token-array column against a
    * broadcast [[NbModel]] — STATELESS (no aggregation), which is what
    * makes NB inference runnable on an unbounded stream in append mode:
    * the per-doc token sum folds inside the row instead of a groupBy.
    * Entries sort best-first by (6-dec-rounded score desc, class asc) —
    * the batch argmax's exact order. Fold order differs from the batch
    * grouped sum only in summation order (absorbed by the rounding, as
    * everywhere). */
  def nbScoreArray(toks: Column, model: NbModel): Column = {
    val entries = model.classes.map { c =>
      val m = typedLit(c.lnCounts)
      val raw = lit(c.lnPrior) -
        size(toks).cast("double") * lit(c.lnDenom) +
        aggregate(transform(toks, t => coalesce(element_at(m, t), lit(0.0))),
          lit(0.0), (acc, x) => acc + x)
      struct((-round(raw, 6)).as("nr"), lit(c.cls).as("cls"), raw.as("raw"))
    }
    array_sort(array(entries: _*))
  }

  /** Per-class precision/recall/F1 over a (true-label, prediction)
    * table — the evaluation half of the classifier family (with
    * [[graft.pipeline.Regression.auc]] covering threshold-free
    * ranking). One row per ACTUAL class; a class the model never
    * predicts reports n_predicted = 0 with null precision/F1 rather
    * than a division error. F1 composes the UNROUNDED precision/recall
    * (2pr/(p+r)) and rounds once — a fixed double expression tree, so
    * the report is engine- and partitioning-deterministic.
    *
    * Shape at scale: the confusion matrix is one map-side-combined
    * (label, pred) count — #classes² rows out of a corpus-sized input;
    * everything after runs on that tiny table. */
  def confusionReport(pred: DataFrame, labelCol: String,
      predCol: String = "pred"): DataFrame = {
    val cm = pred.groupBy(col(labelCol).as("label"), col(predCol).as("p"))
      .agg(count(lit(1)).as("n"))
    val act = cm.groupBy(col("label"))
      .agg(sum(col("n")).as("n_actual"),
        sum(when(col("p") === col("label"), col("n")).otherwise(0L))
          .as("n_correct"))
    val prd = cm.groupBy(col("p").as("label"))
      .agg(sum(col("n")).as("n_predicted"))
    val j = act.join(prd, Seq("label"), "left")
      .withColumn("n_predicted", coalesce(col("n_predicted"), lit(0L)))
    val p = col("n_correct").cast("double") / col("n_predicted")
    val r = col("n_correct").cast("double") / col("n_actual")
    j.select(col("label"), col("n_actual"), col("n_predicted"),
      col("n_correct"),
      when(col("n_predicted") === 0L, lit(null))
        .otherwise(round(p, 6)).as("prec"),
      round(r, 6).as("rec"),
      when(col("n_predicted") === 0L || col("n_correct") === 0L, lit(null))
        .otherwise(round(lit(2.0) * p * r / (p + r), 6)).as("f1"))
  }
}
