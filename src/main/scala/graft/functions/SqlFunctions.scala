package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.IntegerType

/** SQL names for the codegen'd kernel expressions — the piece that makes
  * the kernels a LIBRARY surface rather than a Scala-only convenience: a
  * SQL-first user (the reference's own audience runs on declarative
  * config) can call `word_shingles(text, 4)` or `float_dot(a, b)` from
  * `spark.sql(...)` exactly like a built-in, with the same whole-stage
  * codegen the Column API gets.
  *
  * Two registration paths, same catalog:
  *   - config time: `spark.sql.extensions=graft.plans.GraftExtensions`
  *     (injectFunction — new sessions get the names automatically);
  *   - runtime: [[SqlFunctions.register]] on an existing session.
  *
  * Size/seed parameters (`n`, `k`, `tables`, `planes`) must be INTEGER
  * LITERALS — they parametrize codegen, a per-row value cannot.
  */
object SqlFunctions {

  type Description =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def intLit(fn: String, arg: String)(e: Expression): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an INTEGER literal (it parametrizes codegen), " +
        s"got $other")
  }

  private def fn(name: String, usage: String)(
      b: PartialFunction[Seq[Expression], Expression]): Description = {
    val builder = (args: Seq[Expression]) =>
      b.applyOrElse(args, (as: Seq[Expression]) =>
        throw new IllegalArgumentException(
          s"$name: wrong number of arguments (${as.size}) — usage: $usage"))
    (FunctionIdentifier(name),
      new ExpressionInfo(VecOps.getClass.getName, name),
      builder)
  }

  /** The full SQL-name catalog. */
  val all: Seq[Description] = Seq(
    fn("word_shingles", "word_shingles(text, n)") {
      case Seq(t, n) => WordShingles(t, intLit("word_shingles", "n")(n))
    },
    fn("simhash64", "simhash64(features_array)") {
      case Seq(a) => SimHash64(a)
    },
    fn("minhash_sig", "minhash_sig(features_array, k)") {
      case Seq(a, k) => MinHashSig(a, intLit("minhash_sig", "k")(k))
    },
    fn("float_dot", "float_dot(array_of_float, array_of_float)") {
      case Seq(a, b) => FloatDot(a, b)
    },
    fn("double_dot", "double_dot(array_of_double, array_of_double)") {
      case Seq(a, b) => DoubleDot(a, b)
    },
    fn("rph_buckets", "rph_buckets(array_of_float, tables, planes)") {
      case Seq(v, t, p) => RphBuckets(v,
        intLit("rph_buckets", "tables")(t), intLit("rph_buckets", "planes")(p))
    },
    fn("deflate_len", "deflate_len(text)") {
      case Seq(a) => DeflateLen(a)
    },
    fn("char_fold", "char_fold(text)") {
      case Seq(a) => CharFold(a)
    },
    fn("dyadic_lsh_code", "dyadic_lsh_code(array_of_float, planes)") {
      case Seq(v, p) =>
        DyadicLshCode(v, intLit("dyadic_lsh_code", "planes")(p))
    })

  /** Register every kernel on an existing session (idempotent — a
    * re-registration overwrites with the identical builder). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, info, builder) =>
      Shim.registerFunction(spark, name, info, builder)
    }
}
