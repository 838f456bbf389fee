package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern automaton (Aho & Corasick 1975) — ONE pass
  * over the text counts every occurrence of every pattern, regardless of
  * how many patterns there are. The scale rationale: a K-phrase
  * blocklist scanned with per-pattern search costs K passes over 100 TB
  * of text; the automaton costs one. Built once at plan time on the
  * driver (the pattern list is a literal), shipped to executors inside
  * the expression, O(Σ|p|) states.
  *
  * Counting semantics: ALL occurrences per pattern, overlapping
  * included, summed over patterns (the dictionary-suffix chain is
  * pre-collapsed into a per-state count, so the scan itself never walks
  * links). For patterns with no border (no proper prefix that is also a
  * suffix) this equals the non-overlapping count a replace()-based
  * oracle computes.
  */
final class AhoCorasick(patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "AhoCorasick needs non-empty patterns")

  // --- trie build (driver-side, tiny) ---
  private val children = scala.collection.mutable.ArrayBuffer(
    new java.util.HashMap[Character, Integer]())
  private val failBuf = scala.collection.mutable.ArrayBuffer(0)
  private val endCount = scala.collection.mutable.ArrayBuffer(0L)

  private def newNode(): Int = {
    children += new java.util.HashMap[Character, Integer]()
    failBuf += 0
    endCount += 0L
    children.size - 1
  }

  for (p <- patterns) {
    var node = 0
    for (c <- p) {
      val nxt = children(node).get(c)
      node = if (nxt != null) nxt.intValue()
      else { val n = newNode(); children(node).put(c, n); n }
    }
    endCount(node) += 1L
  }

  // BFS failure links; outCount pre-collapses the dictionary-suffix sum
  private val outCount: Array[Long] = {
    val out = endCount.toArray
    val queue = scala.collection.mutable.Queue.empty[Int]
    children(0).forEach((_, v) => { failBuf(v) = 0; queue += v.intValue() })
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      out(u) += out(failBuf(u))
      children(u).forEach { (c, v) =>
        var f = failBuf(u)
        while (f != 0 && !children(f).containsKey(c)) f = failBuf(f)
        val t = children(f).get(c)
        failBuf(v) = if (t != null && t.intValue() != v.intValue())
          t.intValue() else 0
        queue += v.intValue()
      }
    }
    out
  }
  private val fail: Array[Int] = failBuf.toArray
  private val kids: Array[java.util.HashMap[Character, Integer]] =
    children.toArray

  /** Total occurrences of all patterns in `text` (see class doc). */
  def countOccurrences(text: UTF8String): Long = {
    val s = text.toString
    var node = 0
    var total = 0L
    var i = 0
    while (i < s.length) {
      val c = Character.valueOf(s.charAt(i))
      var n = node
      while (n != 0 && !kids(n).containsKey(c)) n = fail(n)
      val t = kids(n).get(c)
      node = if (t != null) t.intValue() else 0
      total += outCount(node)
      i += 1
    }
    total
  }
}

/** `multi_count(text, 'p1', 'p2', …)` — total occurrences of any of the
  * literal patterns, via one Aho–Corasick pass (codegen'd; the automaton
  * is a plan-time reference object, not rebuilt per row).
  */
case class MultiCountExpression(child: Expression, patterns: Seq[String])
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "multi_count"

  @transient private lazy val ac = new AhoCorasick(patterns)

  override def nullSafeEval(input: Any): Any =
    ac.countOccurrences(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("graftAc", ac,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.countOccurrences($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiCountExpression =
    copy(child = newChild)
}
