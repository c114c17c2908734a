package graft

import graft.functions.expressions.{DotProductFloat, HeavyHittersAgg, Md5Hash60Expr, Norm2Float, ShingleHashSetExpr, ShingleModHashesExpr, SortedIntersectCountLong}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graftbridge.Bridge

/** SparkSessionExtensions entry point — makes the engine's native
  * expressions callable from SQL:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *   // or: spark.sql.extensions=graft.GraftExtensions
  *   spark.sql("SELECT md5_hash60(text) FROM docs")
  *   spark.sql("SELECT dot_f(embedding, embedding) FROM embeddings")
  * }}}
  *
  * [[GraftFunctions.register]] does the same on an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (
        FunctionIdentifier("md5_hash60"),
        new ExpressionInfo(classOf[Md5Hash60Expr].getName, "md5_hash60"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          Md5Hash60Expr(exprs.head)))
    e.injectFunction(
      (
        FunctionIdentifier("dot_f"),
        new ExpressionInfo(classOf[DotProductFloat].getName, "dot_f"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          DotProductFloat(exprs.head, exprs(1))))
    // norm2_f alongside dot_f: the scan-side cosine
    // dot_f(a, b) / (norm2_f(a) * norm2_f(b)) is expressible from pure
    // SQL, matching the Column-API surface
    e.injectFunction(
      (
        FunctionIdentifier("norm2_f"),
        new ExpressionInfo(classOf[Norm2Float].getName, "norm2_f"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          Norm2Float(exprs.head)))
    e.injectFunction(
      (
        FunctionIdentifier("sorted_intersect_count"),
        new ExpressionInfo(classOf[SortedIntersectCountLong].getName, "sorted_intersect_count"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          SortedIntersectCountLong(exprs.head, exprs(1))))
    e.injectFunction(
      (
        FunctionIdentifier("heavy_hitters"),
        new ExpressionInfo(classOf[HeavyHittersAgg].getName, "heavy_hitters"),
        GraftFunctions.heavyHittersBuilder))
    e.injectFunction(
      (
        FunctionIdentifier("shingle_hash_set"),
        new ExpressionInfo(classOf[ShingleHashSetExpr].getName, "shingle_hash_set"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          ShingleHashSetExpr(exprs.head, GraftFunctions.intLit(exprs(1), "shingle_hash_set n"))))
    e.injectFunction(
      (
        FunctionIdentifier("shingle_mod_hashes"),
        new ExpressionInfo(classOf[ShingleModHashesExpr].getName, "shingle_mod_hashes"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          ShingleModHashesExpr(exprs.head, GraftFunctions.intLit(exprs(1), "shingle_mod_hashes n"))))
  }
}

object GraftFunctions {

  /** `heavy_hitters(item, capacity, k)` — capacity/k must be integer
    * literals (the summary is sized at plan time).
    */
  private[graft] def intLit(
      e: org.apache.spark.sql.catalyst.expressions.Expression, name: String): Int =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$name must be an INT literal, got $other")
    }

  private[graft] def heavyHittersBuilder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression =
    exprs =>
      HeavyHittersAgg(exprs.head,
        intLit(exprs(1), "heavy_hitters capacity"), intLit(exprs(2), "heavy_hitters k"))

  def register(spark: SparkSession): Unit = {
    Bridge.registerTempFunction(spark, "md5_hash60", exprs => Md5Hash60Expr(exprs.head))
    Bridge.registerTempFunction(spark, "dot_f", exprs => DotProductFloat(exprs.head, exprs(1)))
    Bridge.registerTempFunction(spark, "norm2_f", exprs => Norm2Float(exprs.head))
    Bridge.registerTempFunction(spark, "sorted_intersect_count",
      exprs => SortedIntersectCountLong(exprs.head, exprs(1)))
    Bridge.registerTempFunction(spark, "heavy_hitters", heavyHittersBuilder)
    Bridge.registerTempFunction(spark, "shingle_hash_set",
      exprs => ShingleHashSetExpr(exprs.head, intLit(exprs(1), "shingle_hash_set n")))
    Bridge.registerTempFunction(spark, "shingle_mod_hashes",
      exprs => ShingleModHashesExpr(exprs.head, intLit(exprs(1), "shingle_mod_hashes n")))
  }
}
