package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** RepetitionStats vs an independent Scala model (groupBy multiplicity —
  * written from the definition, not from the expression's one-pass loop),
  * over generated texts with forced token collisions.
  */
object RepetitionStatsProperties extends Properties("RepetitionStats") {

  // small token pool forces duplicate tokens and repeated bigrams; pads
  // include tabs/newlines, which space-only trim must NOT strip (the
  // Java-String.trim divergence the review caught)
  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 40)
    toks <- Gen.listOfN(n, Gen.oneOf("a", "bb", "ccc", "dd", "e"))
    pad <- Gen.oneOf("", " ", "  ", "\t", "\n ")
  } yield pad + toks.mkString(" ") + pad

  private def model(text: String): (Long, Long, Long) = {
    // space-only trim, written independently of SpaceTokens
    val toks = text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ')
      .reverse.split(" +").toSeq
    val maxBigram =
      if (toks.length < 2) 0L
      else toks.sliding(2).toSeq.groupBy(identity).values.map(_.size).max.toLong
    (toks.length.toLong, toks.distinct.length.toLong, maxBigram)
  }

  private def eval(text: String): (Long, Long, Long) = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    val r = RepetitionStats(Literal(text)).eval(InternalRow.empty)
      .asInstanceOf[InternalRow]
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  property("matches the multiplicity model") = forAll(textGen) { text =>
    eval(text) == model(text)
  }
}
