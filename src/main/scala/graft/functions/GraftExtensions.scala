package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL registration for the engine's native Catalyst expressions, so a
  * pure-SQL user gets the same codegen'd kernels the DataFrame API uses:
  *
  * {{{
  *   SELECT graft_cosine(embedding, query_vec)        -- array<double> x2
  *   SELECT graft_dot(a, b)
  *   SELECT graft_sig_agree(sig_a, sig_b)             -- array<bigint> x2
  *   SELECT graft_lsh_bucket(vec, 64, 10)             -- dims, planes literal
  * }}}
  *
  * Two wiring paths, same function table:
  *  - config: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (applies at session build — the standard deployment);
  *  - runtime: [[GraftExtensions.register]] on a live session (tests,
  *    notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  import VectorExpressions._

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new IllegalArgumentException(
      s"$what must be an INTEGER literal, got $e")
  }

  private def arity(name: String, n: Int)(es: Seq[Expression]): Unit =
    require(es.length == n, s"$name expects $n arguments, got ${es.length}")

  /** (identifier, info, builder) rows for SparkSessionExtensions /
    * FunctionRegistry — ONE table for both wiring paths. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - deterministic sequential dot " +
        "product of two array<double> vectors"),
      (es: Seq[Expression]) => {
        arity("graft_dot", 2)(es); DotProduct(es(0), es(1))
      }),
    (FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of " +
        "two array<double> vectors"),
      (es: Seq[Expression]) => {
        arity("graft_cosine", 2)(es); CosineSim(es(0), es(1))
      }),
    (FunctionIdentifier("graft_sig_agree"),
      info("graft_sig_agree", "graft_sig_agree(a, b) - count of equal " +
        "positions in two array<bigint> signatures"),
      (es: Seq[Expression]) => {
        arity("graft_sig_agree", 2)(es); ArrayEqCount(es(0), es(1))
      }),
    (FunctionIdentifier("graft_lsh_bucket"),
      info("graft_lsh_bucket", "graft_lsh_bucket(vec, dim, nPlanes) - " +
        "hyperplane LSH bucket id of an array<double> vector; dim and " +
        "nPlanes are integer literals"),
      (es: Seq[Expression]) => {
        arity("graft_lsh_bucket", 3)(es)
        LshBucket(es(0), intLit(es(1), "dim"), intLit(es(2), "nPlanes"))
      }),
    (FunctionIdentifier("graft_psl_domain"),
      info("graft_psl_domain", "graft_psl_domain(host) - registrable " +
        "domain of a hostname under the full committed Public Suffix " +
        "List (publicsuffix.org algorithm; unicode and punycode IDN " +
        "forms both resolve); lowercases and strips port / trailing " +
        "FQDN dots first, exactly like the Column API form"),
      (es: Seq[Expression]) => {
        arity("graft_psl_domain", 1)(es)
        // the Column-side form's EXACT strip chain (lower → port strip
        // → FQDN-dot strip), authored as raw Catalyst nodes — a Column
        // round-trip here would hand PslDomain an unresolved
        // ColumnNodeExpression; the builder runs pre-analysis. Defaults
        // to the session-wide PslFullTrie plan reference.
        import org.apache.spark.sql.catalyst.expressions.{Lower, RegExpReplace}
        PslDomain(
          RegExpReplace(
            RegExpReplace(Lower(es(0)),
              Literal(":[0-9]+$"), Literal("")),
            Literal("\\.+$"), Literal("")),
          graft.ops.UrlOps.PslFullTrie)
      }))

  /** Register the function table on a LIVE session (the config path does
    * the same at build time). Idempotent: re-registration overwrites. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
