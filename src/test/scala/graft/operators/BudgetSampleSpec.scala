package graft.operators

import graft.SparkSpec

/** The bucket construction must equal the greedy windowed prefix, with
  * the boundary branch exercised hard, and the budget honored exactly.
  */
class BudgetSampleSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side greedy model under the same salted order. */
  private def model(rows: Seq[(Long, String, Long)],
      hv: Map[Long, Long]): Set[Long] =
    rows.groupBy(_._2).flatMap { case (_, ds) =>
      var cum = 0L
      ds.sortBy(d => (hv(d._1), d._1)).flatMap { d =>
        cum += d._3
        if (cum <= BudgetSample.BudgetTokens) Some(d._1) else None
      }
    }.toSet

  test("kept set equals the greedy prefix model on seeded random corpora") {
    (1 to 8).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val rows = (0L until 150L).map { d =>
        (d, s"s${rnd.nextInt(3)}", "tok " * (rnd.nextInt(40) + 1))
      }
      val docs = rows.toDF("doc_id", "source", "text")
      val got = BudgetSample.sample(docs).select("doc_id").as[Long].collect().toSet
      import org.apache.spark.sql.functions.{col, concat, lit}
      val hv = docs.select(col("doc_id"),
        graft.functions.TextFunctions.hash60(concat(lit(BudgetSample.BudgetSalt),
          col("doc_id").cast("string"))))
        .as[(Long, Long)].collect().toMap
      val toks = rows.map { case (d, s, t) => (d, s, t.trim.split(" +").length.toLong) }
      assert(got == model(toks, hv), s"seed $seed diverged")
    }
  }

  test("every source's kept tokens fit the budget and the next doc would overflow") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val kept = BudgetSample.sample(docs)
      .as[(Long, String, Long)].collect()
    assert(kept.nonEmpty)
    val bySrc = kept.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    bySrc.foreach { case (s, tok) =>
      assert(tok <= BudgetSample.BudgetTokens, s"$s over budget: $tok")
    }
    // non-vacuous both ways: something kept, something dropped per source
    val total = docs.count()
    assert(kept.length.toLong < total, "budget dropped nothing — vacuous")
    assert(bySrc.size == 20, "some source kept nothing at sf0.001")
  }
}
