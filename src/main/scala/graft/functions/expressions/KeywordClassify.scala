package graft.functions.expressions

import graft.classify.KeywordClassifier
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `keyword_classify(text)` — the deterministic [[KeywordClassifier]] as
  * a native codegen expression: the streaming topology's category
  * branch (S9/U1 surface with the local default model) runs UDF-free,
  * the same promotion the batch registry paths got in round 9. The
  * kernel IS `clf.classify` — the exact method the UDF twin
  * (`TextClassifier.asUdf`) calls — so label outputs are byte-identical
  * by construction; `classifyBatch`-overriding RPC implementations keep
  * the partition-batched UDF path (`classifyPartitioned`), which is the
  * right shape for a remote model (amortized connection, one request
  * per batch), not a per-row expression.
  *
  * Null semantics mirror the UDF twin: null text → EMPTY label array
  * (the wrapper's explicit branch), so the output is non-nullable —
  * null-tolerant `eval`/codegen, [[FalseLiteral]] isNull.
  *
  * The classifier (a small case class of label → keyword lists) rides
  * the generated class as one reference object; expression equality is
  * the classifier's case-class equality.
  */
case class KeywordClassifyExpr(child: Expression, clf: KeywordClassifier)
    extends TextStatsBase {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "keyword_classify"

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    KeywordClassifyExpr.run(if (t == null) null else t.asInstanceOf[UTF8String], clf)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cref = ctx.addReferenceObj("keywordClassifier", clf,
      "graft.classify.KeywordClassifier")
    val c = child.genCode(ctx)
    val resultCode =
      code"""
         ${c.code}
         org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
           graft.functions.expressions.KeywordClassifyExpr.run(
             ${c.isNull} ? null : ${c.value}, $cref);
       """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): KeywordClassifyExpr =
    copy(child = newChild)
}

object KeywordClassifyExpr {

  /** Called from generated code — must stay a simple static-style method. */
  def run(text: UTF8String, clf: KeywordClassifier): ArrayData = {
    val labels =
      if (text == null) Seq.empty[String] else clf.classify(text.toString)
    val out = new Array[Any](labels.length)
    var i = 0
    while (i < labels.length) { out(i) = UTF8String.fromString(labels(i)); i += 1 }
    new GenericArrayData(out)
  }

  def keywordClassify(c: Column, clf: KeywordClassifier): Column =
    Bridge.column(KeywordClassifyExpr(Bridge.expression(c), clf))
}
