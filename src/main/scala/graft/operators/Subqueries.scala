package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables

/** Correlated-subquery coverage — the classical Catalyst rewrites
  * (SURVEY §4.2) none of the pre-joined relational queries exercised:
  * RewriteCorrelatedScalarSubquery (a per-outer-row scalar aggregate
  * decorrelated to ONE aggregate + equi-join) and
  * RewritePredicateSubquery (correlated EXISTS / NOT EXISTS planned as
  * semi / anti joins).
  *
  * Both queries are spelled ONCE in engine-neutral ANSI SQL and run
  * verbatim on both engines — the Spark side registers the parquet
  * tables as temp views and `spark.sql`s the SAME string the DuckDB
  * oracle executes, so the semantics cannot drift by construction.
  *
  * Exactness: the TPC-H-Q17 "below 0.2x the part's average quantity"
  * predicate is cross-multiplied into pure integers
  * (`5*qty*count < sum` ⇔ `qty < 0.2*avg` for positive counts) — no
  * division, no doubles crossing a comparison, so the boundary can never
  * flip between engines. l_quantity is integral-valued; CAST to BIGINT
  * agrees (DuckDB rounds, Spark truncates — identical on integers).
  *
  * Scale shape (pinned by SubqueriesSpec on the optimized plan): the
  * correlated scalar pair decorrelates to ONE per-partkey aggregate over
  * lineitem joined back on l_partkey — no per-row subquery execution
  * artifacts survive optimization (zero SubqueryExpressions in the
  * optimized plan), every join is an equi-join (shuffle- or
  * broadcast-hash; never a nested loop), and at 100 TB the rewrite is
  * exactly the plan a hand-written aggregate-then-join would produce.
  * The EXISTS form plans as LeftSemi + LeftAnti equi-joins with the
  * quantity predicate pushed below the anti join's build side.
  */
object Subqueries {

  /** The one selective dimension slice (Q17 keeps one brand). */
  val Brand = "Brand#11"

  /** Quantity threshold for the NOT EXISTS form — 48 of the 1..50 quantity
    * domain, so "never ordered in bulk" keeps ~10% of parts at every test
    * scale (21 / 357 / 3297 rows at sf0.001/0.01/0.1; lower thresholds go
    * vacuous at sf0.001 where each part carries ~30 lineitems).
    */
  val BulkQty = 48

  /** Per-partkey tally of this brand's lineitems priced below 0.2x the
    * part's average order quantity — TPC-H Q17's correlated-scalar shape
    * with integer-exact arithmetic and per-partkey (not single-row)
    * output so the oracle hash certifies the whole distribution.
    */
  val correlatedScalarSql: String =
    s"""SELECT l.l_partkey AS partkey,
       |  CAST(count(*) AS BIGINT) AS n_below,
       |  CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
       |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
       |WHERE p.p_brand = '$Brand'
       |  AND 5 * CAST(l.l_quantity AS BIGINT) *
       |      (SELECT count(*) FROM lineitem l2
       |       WHERE l2.l_partkey = l.l_partkey)
       |    < (SELECT CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
       |       FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
       |GROUP BY l.l_partkey
       |ORDER BY partkey""".stripMargin

  /** Parts that were ordered at least once but never in bulk (quantity >=
    * [[BulkQty]]) — correlated EXISTS + NOT EXISTS, the predicate-subquery
    * rewrite pair (semi + anti join).
    */
  val existsSql: String =
    s"""SELECT p.p_partkey AS partkey, p.p_brand AS brand
       |FROM part p
       |WHERE EXISTS (SELECT 1 FROM lineitem l
       |              WHERE l.l_partkey = p.p_partkey)
       |  AND NOT EXISTS (SELECT 1 FROM lineitem l
       |                  WHERE l.l_partkey = p.p_partkey
       |                    AND l.l_quantity >= $BulkQty)
       |ORDER BY partkey""".stripMargin

  /** Runs `sql` in a child session (`spark.newSession()` — shared
    * SparkContext, cache, and extensions, but an ISOLATED temp-view
    * catalog) with the named tables registered from `dir`. Every other
    * operator passes DataFrames explicitly; these queries resolve table
    * names at action time, so registering `lineitem`/`part` in the
    * session-global catalog would let two calls against different data
    * dirs race or silently rebind each other's tables. The child session
    * scopes the views to this call while the engine-neutral SQL still
    * resolves plain names.
    */
  private def run(spark: SparkSession, dir: String, sql: String,
      names: Seq[String]): DataFrame = {
    val s = spark.newSession()
    names.foreach(n => Tables.table(s, dir, n).createOrReplaceTempView(n))
    s.sql(sql)
  }

  /** Driver query: the Q17-shaped correlated scalar aggregate. */
  def correlatedScalar(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, correlatedScalarSql, Seq("lineitem", "part"))

  /** Driver query: the correlated EXISTS / NOT EXISTS pair. */
  def existsPair(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, existsSql, Seq("lineitem", "part"))

  /** Jumbo-order threshold for the NOT IN form — keeps ~5% of customers
    * at every test scale (8 / 59 / ~600 at sf0.001/0.01/0.1); lower
    * thresholds go near-vacuous at sf0.001.
    */
  val JumboPrice = 350000

  /** Customers with an open order who never placed a jumbo one — the
    * uncorrelated IN / NOT IN pair, completing the predicate-subquery
    * rewrite family next to the EXISTS forms: IN plans as a LeftSemi
    * equi-join; NOT IN (the null-aware form — o_custkey's parquet schema
    * is nullable even though the data carries no nulls, so Catalyst must
    * preserve three-valued semantics) plans as a null-aware LeftAnti
    * BroadcastHashJoin on the single key.
    *
    * Scale note: Spark's null-aware anti join REQUIRES a broadcastable
    * right side (a non-broadcastable NOT IN degrades to a nested-loop —
    * SubqueriesSpec pins that this one stays hash). The distinct-custkey
    * set a NOT IN carries is dimension-sized here; for a fact-sized
    * exclusion set the scale-safe spelling is the NOT EXISTS form above
    * (plain LeftAnti, shuffle-partitionable), which is why both live in
    * this operator family.
    */
  val inSql: String =
    s"""SELECT c.c_custkey AS custkey, c.c_mktsegment AS segment,
       |  c.c_acctbal AS acctbal
       |FROM customer c
       |WHERE c.c_custkey IN (SELECT o_custkey FROM orders
       |                      WHERE o_orderstatus = 'O')
       |  AND c.c_custkey NOT IN (SELECT o_custkey FROM orders
       |                          WHERE o_totalprice > $JumboPrice)
       |ORDER BY custkey""".stripMargin

  /** Driver query: the IN / NOT IN pair. */
  def inPair(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, inSql, Seq("customer", "orders"))
}
