package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled Public Suffix List: the rule set as a reversed-label trie,
  * so one host resolves in O(host labels) hash probes instead of the
  * O(|rules|) per-row probe fan the generated-expression form pays —
  * at the real list's ~9.5k rules that is the difference between ~10
  * map lookups and ~19k endsWith calls per row (and between a ~40-node
  * and a ~40k-node Catalyst tree; the measured curve is SCALE_r13 §1).
  *
  * Semantics are the publicsuffix.org algorithm, pinned exactly as
  * [[graft.ops.UrlOps.registrableDomainPsl]] documents them:
  *  - a rule matches when its labels right-align with the host's; a
  *    wildcard's `*` must consume one REAL extra label;
  *  - an exception rule prevails over everything and names a public
  *    suffix one label shorter than itself (ties to the longest);
  *  - otherwise the matching rule with the most labels prevails
  *    (wildcard counting its star); no match falls to the default
  *    rule `*` (public suffix = the rightmost label);
  *  - registrable domain = public suffix + one label; a host that IS
  *    a public suffix yields NULL.
  * Envelope (asserted at build): `*` appears only as a rule's leftmost
  * label — true of every published list revision. The list carries IDN
  * rules as unicode labels; [[graft.ops.UrlOps.trieOf]] inserts each
  * IDN rule's punycode (`xn--`) twin at build, so hosts resolve in
  * EITHER canonical form — unicode or on-the-wire ACE — to the same
  * registrable domain (the generated form and the DuckDB oracle expand
  * the same twins from the same artifact). A host mixing forms ACROSS
  * its own labels (one label unicode, another punycode) is outside the
  * envelope: rules match whole-host-form-consistently, as after any
  * single-pass canonicalization.
  *
  * Build is driver-side, once per rule set (~10 ms for the full list);
  * the trie ships to executors as ONE plan reference object, not per
  * row and not per task. */
final class PslTrie private (root: PslTrie.Node) extends Serializable {

  /** Prevailing public-suffix label count for an already-stripped,
    * lowercased host split into labels. */
  def publicSuffixLabels(labels: Array[String]): Int = {
    val n = labels.length
    var best = 1 // the default rule `*`
    var exc = -1
    var node = root
    var d = 0
    while (node != null && d < n) {
      // a `*` hanging under this node consumes the (d+1)-th label from
      // the right — which exists, since d < n
      if (node.wildChild && d + 1 > best) best = d + 1
      node = node.children.get(labels(n - 1 - d))
      if (node != null) {
        d += 1
        if (node.normalEnd && d > best) best = d
        if (node.excEnd && d - 1 > exc) exc = d - 1
      }
    }
    if (exc >= 0) exc else best
  }

  /** Registrable domain of a stripped host (lowercase, no port, no
    * trailing dots) — null for an empty host, the host itself for an
    * IPv4 literal, null when the host IS a public suffix. */
  def domainOf(host: UTF8String): UTF8String = {
    if (host == null) return null
    val h = host.toString
    if (h.isEmpty) return null
    if (PslTrie.isIpv4(h)) return host
    val labels = h.split("\\.", -1)
    val ps = publicSuffixLabels(labels)
    val n = labels.length
    if (n <= ps) return null
    // the last ps+1 labels — as a substring of the input, which equals
    // their '.'-join because labels are exactly the split parts
    var idx = 0
    var skip = n - ps - 1
    while (skip > 0) { idx = h.indexOf('.', idx) + 1; skip -= 1 }
    UTF8String.fromString(h.substring(idx))
  }
}

object PslTrie {

  private[functions] final class Node extends Serializable {
    val children = new java.util.HashMap[String, Node]()
    var normalEnd = false
    var wildChild = false
    var excEnd = false
  }

  /** Same shape as the generated form's IPv4 probe
    * (`^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$`): four non-empty all-digit
    * dot-separated groups, values unchecked. */
  private[functions] def isIpv4(h: String): Boolean = {
    var groups = 1
    var digitsInGroup = 0
    var i = 0
    while (i < h.length) {
      val c = h.charAt(i)
      if (c == '.') {
        if (digitsInGroup == 0) return false
        groups += 1
        digitsInGroup = 0
      } else if (c >= '0' && c <= '9') digitsInGroup += 1
      else return false
      i += 1
    }
    groups == 4 && digitsInGroup > 0
  }

  /** Build from (suffix, wildcard, exception) rows — the
    * [[graft.ops.UrlOps.PslRule]] fields, kept as a plain tuple so the
    * expression layer does not depend on the ops layer. A wildcard
    * row's suffix is the PARENT (labels after the `*`), per the
    * parser's contract, and must not itself contain `*` (the
    * leftmost-star envelope). */
  def build(rules: Seq[(String, Boolean, Boolean)]): PslTrie = {
    val root = new Node
    rules.foreach { case (suffix, wild, exc) =>
      require(!suffix.contains("*"),
        s"PSL rule '$suffix' carries a non-leading '*' — outside the " +
          "published list's shape and this trie's envelope")
      val labels = suffix.split("\\.", -1)
      var node = root
      var i = labels.length - 1
      while (i >= 0) {
        node = node.children.computeIfAbsent(labels(i), _ => new Node)
        i -= 1
      }
      if (exc) node.excEnd = true
      else if (wild) node.wildChild = true
      else node.normalEnd = true
    }
    new PslTrie(root)
  }
}

/** Row-local registrable-domain expression over a compiled [[PslTrie]]:
  * the full-list scale path for PSL-exact domain keying. The child is
  * the STRIPPED host (lowercase, port and trailing FQDN dots removed —
  * the caller's column-side strips, shared with the generated form and
  * replayed verbatim by the oracle). Null-safe: null/empty host → null,
  * IPv4 → itself, bare public suffix → null.
  *
  * Runs inside whole-stage codegen via one reference-object call — the
  * expression tree is ONE node whatever |rules| is, so neither the
  * optimizer nor the 64KB codegen method limit ever sees the rule
  * count. */
case class PslDomain(child: Expression, trie: PslTrie)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "psl_domain"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column")

  override protected def nullSafeEval(v: Any): Any =
    trie.domainOf(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("pslTrie", trie,
      classOf[PslTrie].getName)
    nullSafeCodeGen(ctx, ev, v => {
      s"""
      ${ev.value} = $t.domainOf($v);
      ${ev.isNull} = ${ev.value} == null;
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): PslDomain =
    copy(child = c)
}
