package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.JoinedRow
import org.apache.spark.sql.graft.InternalBridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Exact distributed prefix scan: the inclusive running total of a Long
  * column under a given total order — the weighted generalization of
  * [[ContiguousId]] (which is the weight ≡ 1 case), and the primitive
  * under global budget sharding, cumulative-quota cuts, and exact
  * token-offset assignment.
  *
  * A `sum() OVER (ORDER BY ...)` window forces every row through one
  * partition (the ContiguousId scaladoc's pathology); this instead runs
  * the classic two-phase scan:
  *   1. range-repartition + sort on the order keys (one shuffle, globally
  *      ordered end-to-end),
  *   2. per-partition weight totals — ONE Long per partition crosses the
  *      driver, never rows,
  *   3. per-partition running sums seeded with the broadcast exclusive
  *      offsets (no second shuffle; the sorted cache from step 1 is
  *      reused, so the expensive upstream runs exactly once).
  *
  * The order keys MUST form a total order (unique tiebreaker), exactly as
  * for ContiguousId — otherwise rows equal under the ordering may land on
  * either side of a range boundary and the scan is nondeterministic.
  */
object PrefixSum {

  /** `df` plus `cumCol` = the inclusive prefix sum of `weightCol` (Long,
    * non-null) in the total order `order`.
    */
  def withRunningTotal(df: DataFrame, weightCol: String, cumCol: String,
      order: Seq[Column]): DataFrame =
    withRunningTotals(df, Seq(weightCol), Seq(cumCol), order)

  /** The k-weight generalization: one range shuffle, one sorted cache, and
    * k running totals carried through the same two-phase scan (k Longs per
    * partition cross the driver). A rank column is the weight ≡ 1 case, so
    * rank + weighted prefix (the Lorenz-curve pair) costs ONE scan instead
    * of two.
    */
  def withRunningTotals(df: DataFrame, weightCols: Seq[String],
      cumCols: Seq[String], order: Seq[Column]): DataFrame = {
    require(weightCols.length == cumCols.length && weightCols.nonEmpty)
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = StructType(
      sorted.schema.fields ++
        cumCols.map(c => StructField(c, LongType, nullable = false)))
    val wIdxs = weightCols.map(sorted.schema.fieldIndex).toArray
    val k = wIdxs.length
    // copy: scan/codegen output rows are reused buffers (see ContiguousId)
    val base = InternalBridge.toInternalRdd(sorted)
      .map(_.copy())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val partSums = base
      .mapPartitionsWithIndex { (i, it) =>
        val s = new Array[Long](k)
        it.foreach { r =>
          var j = 0
          while (j < k) { s(j) += r.getLong(wIdxs(j)); j += 1 }
        }
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(new Array[Long](k)) { (acc, p) =>
      Array.tabulate(k)(j => acc(j) + p(j)) // exclusive offsets per partition
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val scanned = base.mapPartitionsWithIndex { (i, it) =>
      val run = bc.value(i).clone()
      it.map { r =>
        var j = 0
        while (j < k) { run(j) += r.getLong(wIdxs(j)); j += 1 }
        new JoinedRow(r, InternalRow(run.toIndexedSeq: _*)): InternalRow
      }
    }
    InternalBridge.internalCreateDataFrame(spark, scanned, schema)
  }
}
