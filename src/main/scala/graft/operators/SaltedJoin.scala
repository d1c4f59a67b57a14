package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A shuffle join routes every row of a key to one task, so one hot key
  * (the null-ish default, the boilerplate document, the firehose topic)
  * serializes its whole row set through a single straggler. The standard
  * remedies in preference order: broadcast the small side (no shuffle at
  * all), let AQE's skew-join split oversized sort-merge partitions at
  * runtime, and — when skew is known and extreme, or the hot side must
  * hash-join — salt explicitly:
  *
  *  - the skewed (fact) side gets a DETERMINISTIC salt in [0, salts) —
  *    content-hashed, so replays and retries salt identically;
  *  - the other (dim) side is replicated `salts` times;
  *  - the join key becomes (key, salt): each hot key fans out over `salts`
  *    tasks, at the cost of |dim| x salts shuffle volume.
  *
  * Multiplicities are preserved exactly (each fact row meets each matching
  * dim row exactly once — under its own salt), so the result is
  * bag-identical to the unsalted join; SaltedJoinSpec asserts that and the
  * hot key actually spreading across partitions.
  */
object SaltedJoin {

  def inner(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(salts.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
