package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{ArrayCosine, ArrayDot, JaroWinklerSim, TokenShingles, UnicodeNfc}

/** `SparkSessionExtensions` hook: registers the graft native functions
  * so SQL users get `array_dot`/`array_cosine` without touching the
  * Scala API. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("array_dot"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[ArrayDot].getName, "array_dot"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          ArrayDot(exprs(0), exprs(1))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("array_cosine"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[ArrayCosine].getName, "array_cosine"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          ArrayCosine(exprs(0), exprs(1))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("unicode_nfc"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[UnicodeNfc].getName, "unicode_nfc"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          UnicodeNfc(exprs(0))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("jaro_winkler"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[JaroWinklerSim].getName, "jaro_winkler"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          JaroWinklerSim(exprs(0), exprs(1))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("token_shingles"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[TokenShingles].getName, "token_shingles"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          TokenShingles(exprs(0), exprs(1))))
    // whole-operator surface: plans the AsofJoinPlan logical node onto
    // the sorted-merge AsofJoinExec
    e.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    // opt-in rewrite: exact count(distinct) -> HLL++ sketch when
    // spark.graft.approxCountDistinct=true (off by default)
    e.injectOptimizerRule(_ => graft.plans.ApproxDistinctRewrite)
  }
}
