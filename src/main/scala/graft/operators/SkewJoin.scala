package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic skew mitigation for equi-joins against a small table.
  *
  * A shuffle join hash-partitions both sides on the key, so a hot key (a
  * dominant language, a boilerplate host, the null-surrogate id) lands
  * every one of its rows in ONE reduce task — the classic straggler at
  * 100 TB. AQE's skew-join rule re-splits oversized partitions at
  * runtime, but only for sort-merge joins it can re-plan (it cannot help
  * when the join output feeds a co-partitioned aggregation, when the
  * plan is cached, or in a streaming micro-batch); salting is the
  * plan-level guarantee that no task ever sees more than ~1/saltFactor
  * of any key.
  *
  * Shape: the big side tags each row with `salt = hash(row id) mod s`;
  * the small side replicates s× (one scan-stage `explode(sequence)` —
  * no extra shuffle of the big side beyond the join's own, and the small
  * side's shuffle grows s×, the price of the spread). The join key
  * becomes (keys…, salt), so each hot key spreads over s tasks. The
  * result is identical to the plain equi-join for ANY salt assignment —
  * the salt is derived but never filters — so correctness is
  * partition-independent and the oracle is the plain join.
  *
  * The salt hash is Spark's xxhash64 (not the portable md5 family):
  * nothing downstream depends on which salt a row gets, so engine
  * portability buys nothing and the cheaper hash wins.
  *
  * @param keys       equi-join key columns (must exist on both sides)
  * @param saltFactor number of ways to spread each key (1 = plain join)
  */
object SkewJoin {

  def saltedEquiJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                     saltFactor: Int, leftIdCol: String = "doc_id"): DataFrame = {
    require(keys.nonEmpty, "saltedEquiJoin: need at least one join key")
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    val l = left.withColumn("_salt", pmod(xxhash64(col(leftIdCol)), lit(saltFactor.toLong)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1L))))
    l.join(r, keys :+ "_salt").drop("_salt")
  }
}
