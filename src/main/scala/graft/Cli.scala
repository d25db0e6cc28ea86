package graft

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Doc
import graft.operators._
import graft.regularizers._
import graft.sources.{BatchIO, ModelIO}

/** Command-line driver mirroring the reference `bigartm` CLI
  * (src/bigartm/srcmain.cc, option table :393-470) on Spark. One run =
  * parse corpus → gather/filter dictionary → (cooc/PPMI job) →
  * initialize-or-load → fit offline/online → scores → writers, the same
  * phase order as the reference's `execute()` (srcmain.cc:1117-1351).
  *
  * Supported options (reference names, reference defaults where sane):
  *
  * {{{
  * Input:
  *   --read-vw-corpus F       VowpalWabbit text corpus (one doc per line)
  *   --read-uci-docword F     UCI bag-of-words docword file
  *   --read-uci-vocab F       UCI vocab file
  *   --use-batches DIR        parquet batches written by --save-batches
  *   --save-batches DIR       persist the parsed corpus as parquet batches
  * Dictionary:
  *   --dictionary-min-df X --dictionary-max-df X --dictionary-size N
  *   --save-dictionary P --use-dictionary P
  * Cooc/PPMI job (positional VW tokens, same-window pairs):
  *   --cooc-window W --cooc-min-tf X --cooc-min-df X
  *   --write-cooc-tf F --write-cooc-df F --write-ppmi-tf F --write-ppmi-df F
  * Model:
  *   --topics N | --topics name1,name2,...
  *   --rand-seed N --dense-init-rate X --guaranteed-zeros-rate X
  *   --use-modality c1:w1,c2:w2     (class weights; empty = @default_class)
  *   --load-model P --save-model P
  * Learning:
  *   --num-collection-passes N --num-document-passes N
  *   --update-every N --tau0 X --kappa X   (online when update-every > 0)
  *   --asynchronous --reuse-theta
  *   --regularizer "tau Type [@class,...]"  (repeatable; types as in the
  *     reference: SmoothPhi SparsePhi SmoothTheta SparseTheta
  *     Decorrelation TopicSelection LabelRegularization ImproveCoherence
  *     Biterms — SparsePhi/SparseTheta negate tau, srcmain.cc:563-567)
  * Inference / output:
  *   --predict-class C
  *   --write-model-readable F --write-predictions F
  *   --write-class-predictions F --write-scores F
  *   --write-vw-corpus F --write-dictionary-readable F
  *   --csv-separator S
  *   --score NAME (repeatable: Perplexity SparsityPhi SparsityTheta
  *     TopTokens ThetaSnippet TopicKernel — printed after fitting,
  *     srcmain.cc:884-939 prints the same set)
  *   --threads N     (local[N] when the CLI owns the session; a real
  *                    cluster deploy passes --master via spark-submit)
  * }}}
  *
  * Differences from the reference, by design: batches are parquet (not
  * protobuf), model export is parquet (ModelIO), and there is no
  * --disk-cache-folder (Spark spills shuffles itself). */
object Cli {

  case class Opts(m: Map[String, List[String]]) {
    def str(k: String): Option[String] = m.get(k).flatMap(_.headOption)
    def all(k: String): List[String] = m.getOrElse(k, Nil)
    def int(k: String, d: Int): Int = str(k).map(_.toInt).getOrElse(d)
    def dbl(k: String, d: Double): Double = str(k).map(_.toDouble).getOrElse(d)
    def flt(k: String, d: Float): Float = str(k).map(_.toFloat).getOrElse(d)
    def flag(k: String): Boolean = m.contains(k)
  }

  def parseArgs(args: Array[String]): Opts = {
    val m = scala.collection.mutable.Map.empty[String, List[String]]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      require(a.startsWith("--"), s"expected --option, got '$a'")
      val k = a.drop(2)
      val hasValue = i + 1 < args.length && !args(i + 1).startsWith("--")
      val v = if (hasValue) { i += 1; args(i) } else ""
      m.update(k, m.getOrElse(k, Nil) :+ v)
      i += 1
    }
    Opts(m.toMap)
  }

  /** "tau Type [@c1,c2]" → (PhiRegularizer, tau) or theta agent spec.
    * Mirrors srcmain.cc:505-712 (tau sign flip for Sparse*; '@' class
    * list; TopicSelection gets its per-topic value recomputed every pass
    * like the Python wrapper, artm_model.py:73-103). */
  sealed trait RegSpec
  case class PhiSpec(reg: PhiRegularizer, tau: Float) extends RegSpec
  case class ThetaSpec(tau: Float) extends RegSpec
  case class TopicSelSpec(tau: Float) extends RegSpec

  def parseRegularizer(s: String, numTopics: Int): RegSpec = {
    val parts = s.trim.split("\\s+").toList
    require(parts.length >= 2, s"regularizer '$s': expected 'tau Type [...]'")
    val tau0 = parts.head.toFloat
    val classIds = parts.drop(2).collectFirst {
      case p if p.startsWith("@") => p.drop(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    }.getOrElse(Nil)
    parts(1).toLowerCase match {
      case "smoothphi" => PhiSpec(SmoothSparsePhi(classIds = classIds), tau0)
      case "sparsephi" => PhiSpec(SmoothSparsePhi(classIds = classIds), -tau0)
      case "smooththeta" => ThetaSpec(tau0)
      case "sparsetheta" => ThetaSpec(-tau0)
      case "decorrelation" => PhiSpec(DecorrelatorPhi(classIds = classIds), tau0)
      case "topicselection" => TopicSelSpec(tau0)
      case "labelregularization" => PhiSpec(LabelRegularizationPhi(classIds = classIds), tau0)
      case "improvecoherence" => PhiSpec(ImproveCoherencePhi(), tau0)
      case "biterms" => PhiSpec(BitermsPhi(), tau0)
      case other => throw new IllegalArgumentException(s"unknown regularizer type '$other'")
    }
  }

  def main(args: Array[String]): Unit = {
    val o = parseArgs(args)
    val spark = SparkSession.builder()
      .master(s"local[${o.int("threads", Runtime.getRuntime.availableProcessors())}]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        math.max(8, o.int("threads", 32)).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, o) finally spark.stop()
  }

  /** Session-reusing body (tests drive this directly). */
  def run(spark: SparkSession, o: Opts): Unit = {
    val sep = o.str("csv-separator").getOrElse(",")

    // ---- standalone SQL mode (the graft_* SQL surface on the CLI) ----
    // --sql "QUERY" [--sql-tables DIR] [--write-sql-result F]
    // Every parquet under DIR becomes a view named by its file stem;
    // GraftFunctions.install exposes the full curation vocabulary
    // (graft_quality, graft_minhash, graft_cosine, ...) to the query.
    o.str("sql").foreach { query =>
      GraftFunctions.install(spark)
      o.str("sql-tables").foreach { dir =>
        val d = new java.io.File(dir)
        val parts = Option(d.listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.endsWith(".parquet"))
        parts.foreach { f =>
          // best-effort registration: one unreadable file (e.g. a parquet
          // type Spark rejects) must not take down the whole SQL session
          try spark.read.parquet(f.getPath)
            .createOrReplaceTempView(f.getName.stripSuffix(".parquet"))
          catch { case e: org.apache.spark.sql.AnalysisException =>
            System.err.println(
              s"[graft-sql] skipping ${f.getName}: ${e.getMessage.linesIterator.next()}")
          }
        }
      }
      val out = spark.sql(query)
      o.str("write-sql-result") match {
        case Some(f) => out.coalesce(1).write.mode(SaveMode.Overwrite)
          .option("header", "true").option("sep", sep).csv(f)
        case None => out.show(100, truncate = false)
      }
      return
    }

    // ---- corpus (Parse dispatcher) ----
    val docsOpt: Option[Dataset[Doc]] =
      o.str("read-vw-corpus").map(f => BatchIO.parse(spark, "vowpal_wabbit", f))
        .orElse(o.str("read-uci-docword").map(f =>
          BatchIO.parse(spark, "bow_uci", f, o.str("read-uci-vocab"))))
        .orElse(o.str("use-batches").map(d => BatchIO.parse(spark, "batches", d)))
    docsOpt.foreach(d => o.str("save-batches").foreach(p => BatchIO.write(d, p)))

    // ---- cooc / PPMI job (reference gathers during VW parse; here it is
    // its own dataflow over positional tokens — SURVEY §2.7) ----
    val coocNeeded = o.flag("write-cooc-tf") || o.flag("write-cooc-df") ||
      o.flag("write-ppmi-tf") || o.flag("write-ppmi-df") ||
      o.all("regularizer").exists(r => { val t = r.trim.split("\\s+")(1).toLowerCase
        t == "improvecoherence" || t == "biterms" })
    val coocSym: Option[DataFrame] =
      if (!coocNeeded) None
      else docsOpt.map { d =>
        val pos = Corpus2.positional(d)
        val sym = Cooc.symmetrize(Cooc.gather(pos, windowWidth = o.int("cooc-window", 5)))
          .filter(col("cooc_tf") >= o.dbl("cooc-min-tf", 0.0) &&
            col("cooc_df") >= o.dbl("cooc-min-df", 0.0))
        sym.persist()
      }
    def writeCsv(df: DataFrame, path: String): Unit =
      df.coalesce(1).write.mode(SaveMode.Overwrite)
        .option("header", "true").option("sep", sep).csv(path)
    coocSym.foreach { sym =>
      o.str("write-cooc-tf").foreach(p => writeCsv(
        sym.select("token_a", "token_b", "cooc_tf"), p))
      o.str("write-cooc-df").foreach(p => writeCsv(
        sym.select("token_a", "token_b", "cooc_df"), p))
      o.str("write-ppmi-tf").foreach(p => writeCsv(Cooc.ppmi(sym, "tf"), p))
      o.str("write-ppmi-df").foreach { p =>
        val d = docsOpt.get
        writeCsv(Cooc.ppmi(sym, "df", totalDocs = DictionaryOps.numItems(d),
          tokenDf = Some(DictionaryOps.gather(d))), p)
      }
    }

    // ---- regularizers ----
    val numTopicsOrNames = o.str("topics").getOrElse("16")
    val topicNames: Seq[String] =
      if (numTopicsOrNames.forall(_.isDigit)) Nil
      else numTopicsOrNames.split(",").map(_.trim).toSeq
    val numTopics =
      if (topicNames.nonEmpty) topicNames.length else numTopicsOrNames.toInt
    val regSpecs = o.all("regularizer").map(parseRegularizer(_, numTopics))
    val phiRegs = regSpecs.collect { case PhiSpec(r, t) => (r, t) }
    val thetaTaus = regSpecs.collect { case ThetaSpec(t) => t }
    val topicSelTau = regSpecs.collectFirst { case TopicSelSpec(t) => t }
    val classWeights = o.str("use-modality").map(_.split(",").map { kv =>
      kv.split(":") match {
        case Array(c, w) => c.trim -> w.trim.toFloat
        case Array(c) => c.trim -> 1.0f
      }
    }.toMap).getOrElse(Map.empty[String, Float])

    val thetaAgents: Seq[ThetaAgent] =
      thetaTaus.map(t => SmoothSparseTheta(tau = t, numTopics = numTopics))

    // ---- model: load or gather+initialize ----
    val model = o.str("load-model") match {
      case Some(p) =>
        Artm.load(spark, p, numDocumentPasses = o.int("num-document-passes", 10),
          classWeights = classWeights, phiRegularizers = phiRegs)
      case None =>
        val m = new Artm(spark, numTopics, topicNames,
          seed = o.int("rand-seed", -1),
          numDocumentPasses = o.int("num-document-passes", 10),
          classWeights = classWeights, phiRegularizers = phiRegs,
          thetaAgents = thetaAgents, reuseTheta = o.flag("reuse-theta"))
        o.str("use-dictionary") match {
          case Some(p) =>
            val (d, n, c) = ModelIO.importDictionary(spark, p)
            m.useDictionary(d, n, c)
          case None =>
            val docs = docsOpt.getOrElse(
              throw new IllegalArgumentException("no corpus: pass --read-* or --use-batches"))
            m.gatherDictionary(docs)
            val fa = DictionaryOps.FilterArgs(
              minDf = o.str("dictionary-min-df").map(_.toFloat),
              maxDfRate = o.str("dictionary-max-df").map(_.toFloat),
              maxDictionarySize = o.str("dictionary-size").map(_.toInt))
            if (fa.minDf.isDefined || fa.maxDfRate.isDefined || fa.maxDictionarySize.isDefined)
              m.filterDictionary(fa)
        }
        coocSym.foreach(m.attachCooc)
        o.str("save-dictionary").foreach(p => m.dictionary.foreach(d =>
          ModelIO.exportDictionary(d, m.numItemsInCollection, p, coocSym)))
        m.initialize(denseInitRate = o.flt("dense-init-rate", 1.0f),
          guaranteedZerosRate = o.flt("guaranteed-zeros-rate", 0.0f))
        m
    }

    // ---- fit ----
    val passes = o.int("num-collection-passes", 0)
    val updateEvery = o.int("update-every", 0)
    if (passes > 0) {
      val docs = docsOpt.getOrElse(
        throw new IllegalArgumentException("fitting needs a corpus"))
      if (topicSelTau.isDefined) {
        model.fitOfflineTopicSelection(docs, passes, topicSelTau.get)
      } else if (updateEvery > 0) {
        // reference semantics: merge the model every `update-every`
        // BATCHES (srcmain.cc --update-every); a batch is `batch-size`
        // docs (messages.proto:492 default 1000), so one online chunk =
        // update-every × batch-size consecutive doc ids
        val ids = docs.select(col("doc_id")).distinct().orderBy(col("doc_id"))
          .collect().map(_.getLong(0))
        val chunkSz = math.max(1, updateEvery * o.int("batch-size", 1000))
        val chunks = ids.grouped(chunkSz).map { g =>
          val set = g.toSet
          docs.filter(d => set.contains(d.doc_id))
        }.toSeq
        model.fitOnline(chunks, tau0 = o.dbl("tau0", 1024.0),
          kappa = o.dbl("kappa", 0.7), async = o.flag("asynchronous"))
      } else {
        model.fitOffline(docs, passes)
      }
    }

    // ---- scores (srcmain.cc:884-939 prints the same set) ----
    val wanted = (o.all("score") ++ o.all("final-score")).map(_.toLowerCase)
    def p(s: String): Unit = Console.out.println(s)
    if (wanted.contains("perplexity"))
      model.scoreTracker.foreach(ps => p(f"Perplexity pass ${ps.pass}: ${ps.perplexity}%.4f"))
    if (wanted.contains("sparsitytheta"))
      model.scoreTracker.foreach(ps => p(f"SparsityTheta pass ${ps.pass}: ${ps.sparsityTheta}%.4f"))
    if (wanted.contains("sparsityphi")) p(f"SparsityPhi = ${model.sparsityPhi}%.4f")
    if (wanted.contains("toptokens"))
      model.topTokens(10).collect().foreach(r => p(s"TopTokens ${r.mkString(" ")}"))
    if (wanted.contains("thetasnippet"))
      model.getTheta.limit(10).collect().foreach(r => p(s"ThetaSnippet ${r.mkString(" ")}"))
    if (wanted.contains("topickernel"))
      model.topicKernel().collect().foreach(r => p(s"TopicKernel ${r.mkString(" ")}"))

    // ---- writers ----
    o.str("save-model").foreach(model.save)
    o.str("write-model-readable").foreach { f =>
      ModelIO.writeModelCsv(model.getPhi, model.resolvedTopicNames, f)
    }
    o.str("write-predictions").foreach { f =>
      val docs = docsOpt.getOrElse(throw new IllegalArgumentException(
        "--write-predictions needs a corpus"))
      ModelIO.writeThetaCsv(model.transform(docs), model.resolvedTopicNames, f)
    }
    o.str("write-class-predictions").foreach { f =>
      val cls = o.str("predict-class").getOrElse(throw new IllegalArgumentException(
        "--write-class-predictions needs --predict-class"))
      val docs = docsOpt.getOrElse(throw new IllegalArgumentException(
        "--write-class-predictions needs a corpus"))
      val preds = model.transformPredict(docs, cls)
        .groupBy(col("doc_id"))
        .agg(max_by(col("label_token"), col("p")).as("predicted"))
        .orderBy(col("doc_id"))
      writeCsv(preds, f)
    }
    o.str("write-scores").foreach { f =>
      import spark.implicits._
      writeCsv(model.scoreTracker.toDF(), f)
    }
    o.str("write-vw-corpus").foreach { f =>
      graft.sources.VwReader.write(docsOpt.getOrElse(throw new IllegalArgumentException(
        "--write-vw-corpus needs a corpus")), f)
    }
    o.str("write-dictionary-readable").foreach { f =>
      model.dictionary.foreach(d => writeCsv(
        d.select(col("class_id"), col("token"), col("value"), col("tf"), col("df")), f))
    }
    coocSym.foreach(_.unpersist())
  }
}

/** Positional re-tokenization for the cooc job (the VW/UCI readers emit
  * bag-of-words Docs; cooc needs positions — same split the readers use). */
private[graft] object Corpus2 {
  def positional(docs: Dataset[Doc]): Dataset[Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.map { d =>
      // expand each token's count back into consecutive positions; exact
      // positions are corpus-order within the doc, which bag-of-words has
      // already collapsed — window cooc over the expansion matches the
      // reference's VW-order gather only for weight-1 tokens, documented
      d.copy(tokens = d.tokens.flatMap(t =>
        Array.fill(math.max(1, t.weight.toInt))(t.copy(weight = 1.0f))))
    }
  }
}
