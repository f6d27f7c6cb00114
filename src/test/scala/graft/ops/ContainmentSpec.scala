package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Containment vs Jaccard at length skew: the embedded-document case. */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  test("a short document embedded in a long one: containment ~1, Jaccard small") {
    val short = "alpha beta gamma delta epsilon zeta"
    val long = short + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val df = Seq((short, long)).toDF("a", "b")
      .select(Dedup.shingles(col("a"), 3).as("sa"),
        Dedup.shingles(col("b"), 3).as("sb"))
    val r = df.select(
      Dedup.containment(col("sa"), col("sb")).as("c_ab"),
      Dedup.containment(col("sb"), col("sa")).as("c_ba"),
      Dedup.jaccard(col("sa"), col("sb")).as("j")).collect()(0)
    assert(r.getDouble(0) == 1.0, "the short side is fully contained")
    assert(r.getDouble(1) < 0.2 && r.getDouble(2) < 0.2,
      "reverse containment and Jaccard must stay small at this skew")
  }

  test("disjoint and empty sets score 0") {
    val df = Seq((Seq("a b c"), Seq("x y z"), Seq.empty[String]))
      .toDF("sa", "sb", "se")
    val r = df.select(
      Dedup.containment(col("sa"), col("sb")),
      Dedup.containment(col("se"), col("sa"))).collect()(0)
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0)
  }

  test("containmentOverPairs scores exactly the given pairs, both " +
      "directions, matching the direct computation") {
    val short = "alpha beta gamma delta epsilon zeta"
    val long = short + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, short), (2L, long), (3L, "totally other words " +
      "here that share nothing with anyone at all"),
      (4L, "never a candidate so never shingled")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val r = Dedup.containmentOverPairs(docs, "doc_id", "text", pairs)
      .orderBy("id_a", "id_b").collect()
    assert(r.length == 2, "one output row per candidate pair")
    assert(r(0).getAs[Double]("c_ab") == 1.0,
      "short-in-long pair: full containment of the short side")
    assert(r(0).getAs[Double]("c_ba") < 0.2)
    assert(r(1).getAs[Double]("c_ab") == 0.0 &&
      r(1).getAs[Double]("c_ba") == 0.0, "disjoint pair scores 0 both ways")
    // pair columns beyond the ids ride through untouched
    val withExtra = pairs.withColumn("est", lit(0.75))
    val cols = Dedup.containmentOverPairs(docs, "doc_id", "text", withExtra)
      .columns.toSet
    assert(Set("id_a", "id_b", "est", "c_ab", "c_ba").subsetOf(cols))
  }

  test("a pair referencing a document absent from df fails loudly " +
      "instead of silently vanishing") {
    val docs = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val stale = Seq((1L, 99L)).toDF("id_a", "id_b") // 99 not in docs
    val e = intercept[Exception] {
      Dedup.containmentOverPairs(docs, "doc_id", "text", stale)
        .select("c_ab", "c_ba").collect()
    }
    assert(e.getMessage != null)
  }

  test("a PRESENT document with NULL text scores 0 (empty shingle " +
      "set), not a spurious absence failure") {
    val docs = Seq((1L, Some("alpha beta gamma delta epsilon")),
      (2L, None: Option[String])).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = Dedup.containmentOverPairs(docs, "doc_id", "text", pairs)
      .select("c_ab", "c_ba").collect()(0)
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0)
  }
}
