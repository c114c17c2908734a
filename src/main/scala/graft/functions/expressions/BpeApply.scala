package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_apply(toks, merges)` — the BPE merge chain applied per WORD as
  * a native kernel: each input word is split into code points and each
  * ranked merge runs one left-to-right non-overlapping pass over the
  * word's symbol list ([[graft.operators.Bpe.mergePass]] semantics —
  * the list form of the `" a  b " → " ab "` string-replace pass, same
  * argument as `tokenizeViaWords`' row-identity); the output is the
  * concatenation of every word's subtokens in document order.
  *
  * r21 optimization (guide §1.2 step 2): the r20 apply path ran
  * `nMerges` chained `replace` calls over the WHOLE document's spaced
  * symbol string — ~3× the document's characters scanned AND
  * reallocated per merge (24 merges → ~72 full-document string copies
  * per doc). The kernel touches each DISTINCT word once per task (a
  * bounded per-expression cache exploits the Zipf word distribution —
  * the `tokenizeViaWords` insight without its two exchanges) and
  * per-word passes early-exit once the word is a single symbol.
  * Row-identical to the replace chain (`BpeKernelSpec` pins it on
  * multilevel merges, supplementary-plane code points, and
  * overlapping-pair words).
  *
  * Null token ARRAY → null (callers coalesce to empty, matching the
  * replace chain's "" behavior on null text). Null elements cannot
  * occur (`tokens()` filters empties) and fail loud.
  */
object BpeApplyExpr {

  /** One word's subtokens under the ranked merges — mergePass chain
    * over the word's code points.
    */
  def applyWord(w: String, mA: Array[String], mB: Array[String]): Array[String] = {
    // split into code points
    val cps = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val cc = Character.charCount(cp)
      cps.add(w.substring(i, i + cc))
      i += cc
    }
    var cur = cps.toArray(new Array[String](cps.size))
    var m = 0
    while (m < mA.length && cur.length > 1) {
      val a = mA(m)
      val b = mB(m)
      var out: Array[String] = null
      var oi = 0
      var j = 0
      while (j < cur.length) {
        if (j < cur.length - 1 && cur(j) == a && cur(j + 1) == b) {
          if (out == null) {
            out = new Array[String](cur.length)
            System.arraycopy(cur, 0, out, 0, j)
            oi = j
          }
          out(oi) = a + b
          oi += 1
          j += 2
        } else {
          if (out != null) { out(oi) = cur(j); oi += 1 }
          j += 1
        }
      }
      if (out != null) cur = java.util.Arrays.copyOf(out, oi)
      m += 1
    }
    cur
  }

  def bpeApply(toks: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeApplyExpr(Bridge.expression(toks), merges.toIndexedSeq))
}

case class BpeApplyExpr(child: Expression, merges: IndexedSeq[(String, String)])
    extends UnaryExpression {

  @transient private lazy val mA: Array[String] = merges.map(_._1).toArray
  @transient private lazy val mB: Array[String] = merges.map(_._2).toArray

  /** Per-instance (hence per-task after deserialization) word →
    * subtokens cache; vocabulary-bounded in practice, capped hard.
    */
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[UTF8String]]()
  private val CacheCap = 1 << 16

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_apply requires ARRAY<STRING>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_apply"

  /** Shared by interpreted eval and codegen (via the instance ref). */
  def run(a: ArrayData): ArrayData = {
    val nw = a.numElements()
    val parts = new java.util.ArrayList[AnyRef](nw * 2)
    var i = 0
    while (i < nw) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          "bpe_apply: null word in token array — tokens() never emits nulls")
      val w = a.getUTF8String(i).toString
      var sub = cache.get(w)
      if (sub == null) {
        sub = BpeApplyExpr.applyWord(w, mA, mB).map(UTF8String.fromString)
        if (cache.size < CacheCap) cache.put(w, sub)
      }
      var j = 0
      while (j < sub.length) { parts.add(sub(j)); j += 1 }
      i += 1
    }
    new GenericArrayData(parts.toArray(new Array[AnyRef](parts.size)))
  }

  override protected def nullSafeEval(a: Any): Any =
    run(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeApplyExpr", this,
      "graft.functions.expressions.BpeApplyExpr")
    defineCodeGen(ctx, ev, a => s"$self.run($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApplyExpr =
    copy(child = newChild)
}
