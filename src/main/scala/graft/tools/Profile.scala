package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.operators.Dedup
import graft.sources.Tables

/** Ad-hoc stage profiler for the heavy dedup operators (not driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val docs = Tables.documents(spark, dir)
    time("docs.count")(docs.count())
    val sets = Dedup.shingleSets(docs)
    time("shingleSets")(sets.count())
    val inv = sets.select(col("doc_id"), explode(col("sh")).as("s0"))
      .select(col("doc_id"), TF.hash60(col("s0")).as("s"))
    time("inverted index")(inv.count())
    val common = inv.as("a")
      .join(inv.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count("*").as("common"))
    time("common pairs")(common.count())
    time("ngramJaccard full")(Dedup.ngramJaccard(docs).count())
    val cachedSets = graft.operators.Caching.cached(Dedup.hashedShingleSets(docs))
    time("cached sets materialize")(cachedSets.count())
    time("minhash signatures")(Dedup.minhashSignatures(cachedSets).count())
    time("minhashLsh full")(Dedup.minhashLsh(docs).count())
    spark.stop()
  }
}
