package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL registration for the engine's native Catalyst expressions, so a
  * pure-SQL user gets the same kernels the DataFrame API uses:
  *
  * {{{
  *   SELECT graft_cosine(embedding, query_vec)        -- array<double> x2
  *   SELECT graft_dot(a, b)
  *   SELECT graft_sig_agree(sig_a, sig_b)             -- array<bigint> x2
  *   SELECT graft_lsh_bucket(vec, 64, 10)             -- dims, planes literal
  *   SELECT graft_rp_project(vec, 64, 16)             -- JL projection
  *   SELECT graft_psl_domain(host)                    -- full-list PSL trie
  *   SELECT graft_nfc(text), graft_deflate_ratio(text)
  *   SELECT graft_minhash_sig(text, 3, 32)            -- shingle family
  *   SELECT graft_simhash(text, 3), graft_winnow_sig(text, 3, 4)
  *   SELECT graft_shingle_hashes(text, 3), graft_shingle_hashes_pos(text, 3)
  *   SELECT graft_repetition_sig(text, 10)            -- quality features
  * }}}
  *
  * NOT registered (and why): `PqEncodeSig` and `HouseholderRotate`
  * take trained artifacts (a codebook / a reflection direction) as
  * constructor data — a SQL surface would need a literal-encoded
  * artifact format, and their callers always hold the staged artifact
  * object anyway; `PolygonContains` takes parsed polygon geometry
  * (same reasoning — the mask DSL is the user surface there).
  * `UrlOps.normalize` and `HtmlOps.htmlToText` are COMPOSITIONS of
  * built-in expressions (regexp/when/struct chains), not single
  * Expression classes — registering them would mean re-authoring each
  * chain as raw pre-analysis Catalyst nodes (builders run BEFORE
  * analysis, so the Column API is unavailable — see the strip-chain
  * note below) and maintaining two copies of pinned normalization
  * rules. A SQL user composes them from builtins (the chains are
  * documented + oracle-replayed), or calls the Column API — the
  * decision boundary is: one native kernel class → registered; a
  * builtin composition → stays a Column/def.
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
    (FunctionIdentifier("graft_nfc"),
      info("graft_nfc", "graft_nfc(text) - Unicode NFC normalization " +
        "(java.text.Normalizer; fast no-alloc path for already-NFC text)"),
      (es: Seq[Expression]) => {
        arity("graft_nfc", 1)(es); NfcNormalize(es(0))
      }),
    (FunctionIdentifier("graft_deflate_ratio"),
      info("graft_deflate_ratio", "graft_deflate_ratio(text) - DEFLATE " +
        "compressed/raw size ratio, 6dp (low = template/boilerplate, " +
        "~1.0 = incompressible); rerun-stable, not a cross-engine " +
        "constant"),
      (es: Seq[Expression]) => {
        arity("graft_deflate_ratio", 1)(es); DeflateRatio(es(0))
      }),
    (FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", "graft_minhash_sig(text, n, k) - " +
        "k-hash minhash signature over word n-gram shingles as " +
        "array<bigint>; n and k are integer literals; null when the " +
        "document has fewer than n words"),
      (es: Seq[Expression]) => {
        arity("graft_minhash_sig", 3)(es)
        MinhashSig(es(0), intLit(es(1), "n"), intLit(es(2), "k"))
      }),
    (FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(text, n) - 64-bit SimHash " +
        "fingerprint over distinct word n-gram shingles; n is an " +
        "integer literal; null when the document has fewer than n words"),
      (es: Seq[Expression]) => {
        arity("graft_simhash", 2)(es)
        SimhashSig(es(0), intLit(es(1), "n"))
      }),
    (FunctionIdentifier("graft_winnow_sig"),
      info("graft_winnow_sig", "graft_winnow_sig(text, n, window) - " +
        "winnowing (MOSS) fingerprint set: distinct sliding-window " +
        "minima of positional n-gram shingle hashes, sorted ascending; " +
        "n and window are integer literals; null without a full window"),
      (es: Seq[Expression]) => {
        arity("graft_winnow_sig", 3)(es)
        WinnowSig(es(0), intLit(es(1), "n"), intLit(es(2), "window"))
      }),
    (FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes", "graft_shingle_hashes(text, n) - " +
        "distinct word n-gram shingle hashes (xxhash64 family) as " +
        "array<bigint>; n is an integer literal"),
      (es: Seq[Expression]) => {
        arity("graft_shingle_hashes", 2)(es)
        DistinctShingleHashes(es(0), intLit(es(1), "n"))
      }),
    (FunctionIdentifier("graft_shingle_hashes_pos"),
      info("graft_shingle_hashes_pos", "graft_shingle_hashes_pos(text, " +
        "n) - positional word n-gram shingle hashes in document order " +
        "(winnowing's input granularity); n is an integer literal"),
      (es: Seq[Expression]) => {
        arity("graft_shingle_hashes_pos", 2)(es)
        PositionalShingleHashes(es(0), intLit(es(1), "n"))
      }),
    (FunctionIdentifier("graft_repetition_sig"),
      info("graft_repetition_sig", "graft_repetition_sig(text, n) - " +
        "(dup_token_frac, dup_ngram_frac, top_token_frac) repetition " +
        "features in one row-local pass; n is an integer literal"),
      (es: Seq[Expression]) => {
        arity("graft_repetition_sig", 2)(es)
        RepetitionSig(es(0), intLit(es(1), "n"))
      }),
    (FunctionIdentifier("graft_rp_project"),
      info("graft_rp_project", "graft_rp_project(vec, dim, rDim) - " +
        "Johnson-Lindenstrauss random projection of an array<double> " +
        "vector to rDim dims (deterministic sin-table directions, " +
        "bit-identical to the Column form); dim and rDim are integer " +
        "literals"),
      (es: Seq[Expression]) => {
        arity("graft_rp_project", 3)(es)
        RandomProject(es(0), intLit(es(1), "dim"), intLit(es(2), "rDim"))
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
      }),
    (FunctionIdentifier("graft_idn_ascii"),
      info("graft_idn_ascii", "graft_idn_ascii(host) - per-label " +
        "IDNA/punycode canonicalization of a hostname (unicode labels " +
        "to their xn-- ACE form; ASCII hosts pass through untouched)"),
      (es: Seq[Expression]) => {
        arity("graft_idn_ascii", 1)(es); IdnAscii(es(0))
      }),
    (FunctionIdentifier("graft_c4_clean_lines"),
      info("graft_c4_clean_lines", "graft_c4_clean_lines(text, " +
        "minWords) - the C4 line rules (terminal punctuation, >= " +
        "minWords words, no 'javascript') in one byte-level pass: " +
        "surviving lines joined by newline; minWords is an integer " +
        "literal"),
      (es: Seq[Expression]) => {
        arity("graft_c4_clean_lines", 2)(es)
        C4CleanLines(es(0), intLit(es(1), "minWords"))
      }),
    (FunctionIdentifier("graft_psl_domain_ascii"),
      info("graft_psl_domain_ascii", "graft_psl_domain_ascii(host) - " +
        "graft_psl_domain over the ACE-canonicalized host: unicode and " +
        "punycode spellings of one domain key identically (output " +
        "always the on-the-wire xn-- form)"),
      (es: Seq[Expression]) => {
        arity("graft_psl_domain_ascii", 1)(es)
        import org.apache.spark.sql.catalyst.expressions.{Lower, RegExpReplace}
        PslDomain(IdnAscii(
          RegExpReplace(
            RegExpReplace(Lower(es(0)),
              Literal(":[0-9]+$"), Literal("")),
            Literal("\\.+$"), Literal(""))),
          graft.ops.UrlOps.PslFullTrie)
      }))

  /** Register the function table on a LIVE session (the config path does
    * the same at build time). Idempotent: re-registration overwrites. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
