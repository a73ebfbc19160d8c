package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions hook registering the custom expressions as SQL
  * functions, so `spark.sql("SELECT shingles(text, 3) …")` works alongside
  * the Column API (the standard extension-injection path; wire with
  * `.withExtensions(new GraftExtensions)` — [[graft.Sessions]] does).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Expression-optimization rule: declarative squared-distance HOF →
    // codegen'd kernel (see RewriteSqDist).
    ext.injectOptimizerRule(_ => RewriteSqDist)
    ext.injectFunction((
      new FunctionIdentifier("vec_sqdist_long"),
      new ExpressionInfo(classOf[SqDistExpr].getName, "vec_sqdist_long"),
      (args: Seq[Expression]) => SqDistExpr(args.head, args(1))))
    ext.injectFunction((
      new FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[ShinglesExpr].getName, "shingles"),
      (args: Seq[Expression]) =>
        ShinglesExpr(args.head, intArg(args(1), "shingle size n"))))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
      (args: Seq[Expression]) =>
        MinHashSigExpr(args.head, intArg(args(1), "signature size k"))))
    ext.injectFunction((
      new FunctionIdentifier("bigrams_arr"),
      new ExpressionInfo(classOf[BigramsExpr].getName, "bigrams_arr"),
      (args: Seq[Expression]) => BigramsExpr(args.head,
        withPos = args.length > 1 && (args(1) match {
          case Literal(b: Boolean, _) => b
          case other => throw new IllegalArgumentException(
            s"withPos must be a boolean literal, got $other")
        }))))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "simhash64"),
      (args: Seq[Expression]) => SimHashExpr(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("md5_bucket"),
      new ExpressionInfo(classOf[Md5BucketExpr].getName, "md5_bucket"),
      (args: Seq[Expression]) =>
        Md5BucketExpr(args.head, intArg(args(1), "buckets").toLong)))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotExpr].getName, "vec_dot"),
      (args: Seq[Expression]) => DotExpr(args.head, args(1))))
    ext.injectFunction((
      new FunctionIdentifier("vec_l2_normalize"),
      new ExpressionInfo(classOf[L2NormalizeExpr].getName, "vec_l2_normalize"),
      (args: Seq[Expression]) => L2NormalizeExpr(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("srp_signature"),
      new ExpressionInfo(classOf[LshSignatureExpr].getName, "srp_signature"),
      (args: Seq[Expression]) => LshSignatureExpr(args.head,
        intArg(args(1), "planes"), intArg(args(2), "dims"))))
  }
}
