package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join shapes — the companion ACTIONS to
  * [[Diagnostics.keySkew]]'s salt-factor report.
  *
  * Spark's AQE re-plans skewed SORT-MERGE joins by splitting oversized
  * partitions, but that only helps when both sides can be re-split; a
  * hot key joining a dimension still lands every probe row of that key
  * in one task when the join degenerates (or when the engine runs
  * without AQE). Salting is the storage-independent fix: the fact side
  * spreads each key over `salts` pseudo-keys, the dimension side
  * REPLICATES each of its rows once per salt, and the join runs on
  * (key, salt) — the hot key's rows now land on `salts` tasks. Output
  * is EXACTLY the plain join's (each fact row meets each matching dim
  * row exactly once, under exactly one salt), which is what the oracle
  * row pins. */
object Joins {

  /** Salted equi-join of a (possibly skewed) fact side against a SMALL
    * dimension side on `key`: fact rows get a deterministic salt
    * (md5-derived from `saltExpr`, so replays are stable), the dim side
    * explodes ×`salts`, and the join key becomes (key, salt). The dim
    * side should be broadcast-sized after replication (dim × salts
    * rows) — it is broadcast-hinted here, so the salted join is one
    * narrow probe stage with NO shuffle of the fact side at all.
    *
    * `saltExpr` must be deterministic per row (an id column) — never
    * `rand()`, which breaks retry idempotency (a re-executed task would
    * re-salt differently, and speculative execution could double rows).
    *
    * Returns the plain `fact.join(dim, key)` result (inner), column
    * order = fact columns then dim's non-key columns. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltExpr: Column, salts: Int = 16): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    // deterministic salt in [0, salts): first 8 md5 hex chars of the
    // row expression — uniform, replay-stable
    val salted = fact.withColumn("_salt",
      (conv(substring(md5(saltExpr.cast("string")), 1, 8), 16, 10)
        .cast("long") % salts).cast("int"))
    val replicated = dim.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted
      .join(broadcast(replicated), Seq(key, "_salt"))
      .drop("_salt")
  }
}
