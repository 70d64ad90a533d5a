package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

import graft.text.StemExpression

/** SQL surface for the engine's native Catalyst kernels: every codegen
  * expression the Column API exposes is also registered as a SQL function,
  * so `spark.sql("SELECT vec_cosine_distance(a, b) ...")` works — the
  * Spark-idiomatic analogue of the reference's wire-level query surface.
  * Register per-session via [[GraftFunctionRegistry.register]] or
  * cluster-wide with `spark.sql.extensions=graft.GraftExtensions`.
  */
object GraftFunctionRegistry {

  private def litInt(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer argument, got $other")
  }

  private def litStr(e: Expression, fn: String): String = e match {
    case Literal(s: UTF8String, _) => s.toString
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal string argument, got $other")
  }

  private def arity(n: Int, fn: String)(args: Seq[Expression]): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${args.length}")

  private def fn(name: String, usage: String)(
      builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft", null, name, usage, ""),
      builder)

  /** (identifier, info, builder) triples in SparkSessionExtensions'
    * injectFunction shape.
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    fn("vec_cosine_distance",
      "vec_cosine_distance(a, b) - cosine distance between float vectors") {
      args => arity(2, "vec_cosine_distance")(args)
        CosineDistance(args(0), args(1))
    },
    fn("vec_euclidean_sq",
      "vec_euclidean_sq(a, b) - squared euclidean distance") { args =>
      arity(2, "vec_euclidean_sq")(args)
      EuclideanSqDistance(args(0), args(1))
    },
    fn("vec_dot", "vec_dot(a, b) - dot product") { args =>
      arity(2, "vec_dot")(args)
      DotProduct(args(0), args(1))
    },
    fn("vec_normalize", "vec_normalize(v) - L2-normalize a float vector") {
      args => arity(1, "vec_normalize")(args)
        NormalizeVector(args(0))
    },
    fn("vec_int8_cosine",
      "vec_int8_cosine(codes_a, codes_b, norm_a, norm_b) - int8-domain " +
        "cosine distance") { args =>
      arity(4, "vec_int8_cosine")(args)
      Int8CosineDistance(args(0), args(1), args(2), args(3))
    },
    fn("poly_hash", "poly_hash(s) - deterministic polynomial string hash") {
      args => arity(1, "poly_hash")(args)
        PolyHash(args(0))
    },
    fn("word_shingles",
      "word_shingles(s, n) - distinct word n-gram shingles") { args =>
      arity(2, "word_shingles")(args)
      WordShingles(args(0), litInt(args(1), "word_shingles"))
    },
    fn("pack_sign_bits",
      "pack_sign_bits(v) - 1-bit sign quantization into packed longs") {
      args => arity(1, "pack_sign_bits")(args)
        PackSignBitsExpr(args(0))
    },
    fn("hamming_packed",
      "hamming_packed(a, b) - Hamming distance between packed sign words") {
      args => arity(2, "hamming_packed")(args)
        HammingPackedExpr(args(0), args(1))
    },
    fn("hyperplane_bucket",
      "hyperplane_bucket(v, planes) - SimHash hyperplane sign bucket") {
      args => arity(2, "hyperplane_bucket")(args)
        HyperplaneBucketExpr(args(0), litInt(args(1), "hyperplane_bucket"))
    },
    fn("f16_pack", "f16_pack(v) - pack float vector into IEEE binary16") {
      args => arity(1, "f16_pack")(args)
        graft.functions.F16PackExpr(args(0))
    },
    fn("f16_unpack", "f16_unpack(b) - unpack binary16 back to floats") {
      args => arity(1, "f16_unpack")(args)
        graft.functions.F16UnpackExpr(args(0))
    },
    fn("f16_euclidean_sq",
      "f16_euclidean_sq(a, b) - squared euclidean over packed binary16") {
      args => arity(2, "f16_euclidean_sq")(args)
        graft.functions.F16EuclideanSqDistance(args(0), args(1))
    },
    fn("stem", "stem(s, lang) - Snowball stem (english/italian)") { args =>
      arity(2, "stem")(args)
      StemExpression(args(0), litStr(args(1), "stem"))
    },
    fn("topk_by_distance",
      "topk_by_distance(id, dist, k) - bounded top-k aggregate: " +
        "array<struct<id, distance, rank>> of the group's k smallest") {
      args => arity(3, "topk_by_distance")(args)
        TopKByDistance(args(0), args(1), litInt(args(2), "topk_by_distance"))
    })

  /** Register every function into an existing session's registry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
