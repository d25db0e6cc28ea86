package graft

import org.apache.spark.sql.functions._
import graft.core.{Doc, TokenEntry, Txn}
import graft.operators._

/** Transaction (product-of-phis) E-step pinned to the DuckDB-verified
  * relational transaction mirror: same consecutive-pair transactions, same
  * md5 init, numDocumentPasses = 0 (one theta replacement). */
class TxnParitySpec extends SparkSpec {

  test("kernel transaction E-step matches the relational transaction EM") {
    val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = RelationalEm.txnPairs(docsTable).cache()
    val (_, relPwt) = RelationalEm.txnFit(pairs, numTopics = 8)

    // kernel-side docs: positional tokens truncated to pairs, one Txn per
    // consecutive pair — identical structure to txnPairs
    import spark.implicits._
    val docs = pairs.as[(Long, Long, String, String)]
      .groupByKey(_._1)
      .mapGroups { (id, it) =>
        val ps = it.toArray.sortBy(_._2)
        val toks = ps.flatMap(p => Seq(
          TokenEntry(graft.functions.Rng.DefaultClass, p._3, 1.0f),
          TokenEntry(graft.functions.Rng.DefaultClass, p._4, 1.0f)))
        val txns = ps.indices.map(i => Txn("@default_transaction", i * 2, 2)).toArray
        Doc(id, s"doc$id", toks, txns)
      }

    val vocab = pairs.select(col("tok_a").as("token"))
      .unionByName(pairs.select(col("tok_b").as("token")))
    val pwt0 = RelationalEm.toPhiRows(RelationalEm.initPhi(vocab, 8))
    val bPhi = spark.sparkContext.broadcast(PhiOps.collectPhi(pwt0, 8))
    val out = EStep.run(docs, bPhi, EStepConfig(numDocumentPasses = 0))
      .persist()
    val kernPwt = PhiOps.normalizeModel(EStep.nwt(out))

    val kern = PhiOps.explodePhi(kernPwt, sparseEps = -1.0)
      .select(col("token"), col("topic").cast("long").as("topic"),
        col("weight").cast("double").as("pk"))
    val joined = relPwt.join(kern, Seq("token", "topic"), "full")
      .select(coalesce(col("p"), lit(0.0)).as("p"), coalesce(col("pk"), lit(0.0)).as("pk"))
    val row = joined.agg(max(abs(col("p") - col("pk"))), count(lit(1))).head()
    info(f"${row.getLong(1)} cells, max |relational - kernel| = ${row.getDouble(0)}%.2e")
    assert(row.getLong(1) > 0)
    assert(row.getDouble(0) < 5e-4)
  }

  test("kernel k-token transactions with typename weights match the general relational mirror") {
    // 3-token transactions, two alternating typenames at weights 1.0/0.7 —
    // the full reference path (processor_transaction_helpers.cc:68-161):
    // k-token phi products, typename weight in n_td AND n_wt, per-position
    // n_wt stores
    val docsTable = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val k = 3
    val ttWeights = Map("tt0" -> 1.0, "tt1" -> 0.7)
    val txns = RelationalEm.txnK(docsTable, k, numTypenames = 2).cache()
    val relPwt = RelationalEm.txnFitK(txns, numTopics = 8, ttWeights)

    import spark.implicits._
    val docs = txns.as[(Long, Long, String, Long, String)]
      .groupByKey(_._1)
      .mapGroups { (id, it) =>
        val rows = it.toArray.sortBy(r => (r._2, r._4)) // (txn_id, pos)
        val toks = rows.map(r =>
          TokenEntry(graft.functions.Rng.DefaultClass, r._5, 1.0f))
        val byTxn = rows.map(_._2).distinct.sorted
        val txnArr = byTxn.zipWithIndex.map { case (txnId, i) =>
          Txn(rows.find(_._2 == txnId).get._3, i * k, k)
        }
        Doc(id, s"doc$id", toks, txnArr)
      }

    val pwt0 = RelationalEm.toPhiRows(RelationalEm.initPhi(txns.select(col("token")), 8))
    val bPhi = spark.sparkContext.broadcast(PhiOps.collectPhi(pwt0, 8))
    val out = EStep.run(docs, bPhi, EStepConfig(numDocumentPasses = 0,
      transactionWeights = ttWeights.map { case (n, w) => n -> w.toFloat }))
      .persist()
    val kernPwt = PhiOps.normalizeModel(EStep.nwt(out))

    val kern = PhiOps.explodePhi(kernPwt, sparseEps = -1.0)
      .select(col("token"), col("topic").cast("long").as("topic"),
        col("weight").cast("double").as("pk"))
    val joined = relPwt.join(kern, Seq("token", "topic"), "full")
      .select(coalesce(col("p"), lit(0.0)).as("p"), coalesce(col("pk"), lit(0.0)).as("pk"))
    val row = joined.agg(max(abs(col("p") - col("pk"))), count(lit(1))).head()
    info(f"k-token: ${row.getLong(1)} cells, max |relational - kernel| = ${row.getDouble(0)}%.2e")
    assert(row.getLong(1) > 0)
    assert(row.getDouble(0) < 5e-4)
    out.unpersist()

    // typename missing from the weight map weighs 0 on BOTH sides
    // (reference: tt_name_to_weight miss → 0; EStepConfig.getOrElse 0):
    // tt1 transactions must contribute nothing
    val relPwt0 = RelationalEm.txnFitK(txns, numTopics = 8, Map("tt0" -> 1.0))
    val out0 = EStep.run(docs, bPhi, EStepConfig(numDocumentPasses = 0,
      transactionWeights = Map("tt0" -> 1.0f))).persist()
    val kern0 = PhiOps.explodePhi(PhiOps.normalizeModel(EStep.nwt(out0)), sparseEps = -1.0)
      .select(col("token"), col("topic").cast("long").as("topic"),
        col("weight").cast("double").as("pk"))
    val joined0 = relPwt0.join(kern0, Seq("token", "topic"), "full")
      .select(coalesce(col("p"), lit(0.0)).as("p"), coalesce(col("pk"), lit(0.0)).as("pk"))
    val row0 = joined0.agg(max(abs(col("p") - col("pk"))), count(lit(1))).head()
    info(f"k-token missing-typename: ${row0.getLong(1)} cells, max diff = ${row0.getDouble(0)}%.2e")
    assert(row0.getLong(1) > 0 && row0.getDouble(0) < 5e-4)
    out0.unpersist()
    txns.unpersist()
  }
}
