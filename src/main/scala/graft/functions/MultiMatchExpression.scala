package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matcher (Aho & Corasick, CACM 1975) —
  * the scale path for large blocklists: ONE pass over the text finds
  * all of K patterns simultaneously, where the literal-array spelling
  * (`filter(lit(patterns), p => contains(text, p))`) pays O(K·n) per
  * row. The automaton is built ONCE at plan time from the literal
  * pattern list and ships to executors as a plan reference object;
  * matching allocates nothing until the first hit.
  *
  * The trie is byte-level (patterns and text are matched on their
  * UTF-8 bytes — exact substring semantics, same as `contains`).
  * Transitions use a per-node sorted byte array + binary search:
  * dense-array nodes would cost 256 ints per node, painful for
  * 100k-pattern lists; binary search keeps the automaton compact and
  * cache-resident.
  */
final class AhoCorasick(patterns: Array[Array[Byte]]) extends Serializable {

  // trie as growable parallel arrays; node 0 is the root
  private var childKeys = new Array[Array[Byte]](16)
  private var childVals = new Array[Array[Int]](16)
  private var fail = new Array[Int](16)
  private var out = new Array[Array[Int]](16) // pattern ids ending here
  private var nNodes = 1
  childKeys(0) = new Array[Byte](0)
  childVals(0) = new Array[Int](0)
  out(0) = new Array[Int](0)

  private def ensure(n: Int): Unit = {
    if (n > childKeys.length) {
      val cap = math.max(n, childKeys.length * 2)
      childKeys = java.util.Arrays.copyOf(childKeys, cap)
      childVals = java.util.Arrays.copyOf(childVals, cap)
      fail = java.util.Arrays.copyOf(fail, cap)
      out = java.util.Arrays.copyOf(out, cap)
    }
  }

  private def childOf(node: Int, b: Byte): Int = {
    val keys = childKeys(node)
    var lo = 0
    var hi = keys.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (keys(mid) == b) return childVals(node)(mid)
      else if (keys(mid) < b) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  private def addChild(node: Int, b: Byte): Int = {
    val existing = childOf(node, b)
    if (existing >= 0) return existing
    ensure(nNodes + 1)
    val nw = nNodes
    nNodes += 1
    childKeys(nw) = new Array[Byte](0)
    childVals(nw) = new Array[Int](0)
    out(nw) = new Array[Int](0)
    // insert keeping keys sorted
    val keys = childKeys(node)
    val vals = childVals(node)
    var pos = 0
    while (pos < keys.length && keys(pos) < b) pos += 1
    val nk = new Array[Byte](keys.length + 1)
    val nv = new Array[Int](keys.length + 1)
    System.arraycopy(keys, 0, nk, 0, pos)
    System.arraycopy(vals, 0, nv, 0, pos)
    nk(pos) = b
    nv(pos) = nw
    System.arraycopy(keys, pos, nk, pos + 1, keys.length - pos)
    System.arraycopy(vals, pos, nv, pos + 1, keys.length - pos)
    childKeys(node) = nk
    childVals(node) = nv
    nw
  }

  // build trie
  {
    var pid = 0
    while (pid < patterns.length) {
      var node = 0
      val p = patterns(pid)
      var i = 0
      while (i < p.length) { node = addChild(node, p(i)); i += 1 }
      out(node) = out(node) :+ pid
      pid += 1
    }
    // BFS failure links; merge output sets along fail chains
    val queue = new java.util.ArrayDeque[Integer]()
    var ci = 0
    while (ci < childVals(0).length) {
      val c = childVals(0)(ci)
      fail(c) = 0
      queue.add(c)
      ci += 1
    }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      var k = 0
      while (k < childKeys(u).length) {
        val b = childKeys(u)(k)
        val v = childVals(u)(k)
        var f = fail(u)
        var nxt = childOf(f, b)
        while (f != 0 && nxt < 0) { f = fail(f); nxt = childOf(f, b) }
        fail(v) = if (nxt >= 0 && nxt != v) nxt else 0
        if (out(fail(v)).nonEmpty) out(v) = out(v) ++ out(fail(v))
        queue.add(v)
        k += 1
      }
    }
  }

  /** Distinct pattern ids found in `text`, ascending. */
  def matchedIds(text: UTF8String): ArrayData = {
    val b = text.getBytes
    var node = 0
    var found: java.util.TreeSet[Integer] = null
    var i = 0
    while (i < b.length) {
      val c = b(i)
      var nxt = childOf(node, c)
      while (node != 0 && nxt < 0) { node = fail(node); nxt = childOf(node, c) }
      if (nxt >= 0) node = nxt
      val o = out(node)
      if (o.nonEmpty) {
        if (found == null) found = new java.util.TreeSet[Integer]()
        var j = 0
        while (j < o.length) { found.add(o(j)); j += 1 }
        if (found.size == patterns.length) {
          // every pattern already seen: stop scanning
          i = b.length
        }
      }
      i += 1
    }
    if (found == null) new GenericArrayData(Array.emptyIntArray)
    else {
      val arr = new Array[Int](found.size)
      val it = found.iterator()
      var j = 0
      while (it.hasNext) { arr(j) = it.next().intValue(); j += 1 }
      new GenericArrayData(arr)
    }
  }
}

/** multi_contains(text, patterns) → array<int>: ascending ids of the
  * literal patterns occurring in `text` as substrings. Patterns fixed
  * at plan time; one text pass regardless of pattern count. */
case class MultiContains(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty, "multi_contains needs at least one pattern")
  require(patterns.forall(_.nonEmpty), "multi_contains patterns must be non-empty")

  @transient private lazy val ac =
    new AhoCorasick(patterns.map(_.getBytes("UTF-8")).toArray)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"multi_contains expects a string argument, got $t")
  }

  override def nullSafeEval(s: Any): Any =
    ac.matchedIds(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ac", ac, classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $acRef.matchedIds($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MultiContains = copy(child = newChild)
}
