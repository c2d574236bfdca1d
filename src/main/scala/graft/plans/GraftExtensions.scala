package graft.plans

import graft.functions.expressions.{BlockHash64, DecodeStats, DotProduct, HyperplaneBuckets, ImageDims, NfcNormalize, NormalizeVec, QuantizeInt8, SimHashWords, WavMeta}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{BooleanType, IntegerType}

/** SparkSessionExtensions entry point: registers graft's native Catalyst
  * expressions as SQL functions (`graft_dot`, `graft_normalize`,
  * `graft_quantize_int8`, `graft_simhash`, `graft_hyperplane_buckets`) so
  * they work from `spark.sql(...)` anywhere the Column API does, and
  * injects [[RewriteDeclarativeDot]] so plain-Spark HOF dot folds get the
  * native loop automatically.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * programmatically via `SparkSession.builder.withExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def register(
      ext: SparkSessionExtensions,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      builder))

  /** A foldable literal argument (SQL-side parameters like band counts). */
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new IllegalArgumentException(s"$what must be an integer literal")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // plain-Spark HOF dot folds rewrite to the codegen'd native loop
    ext.injectOptimizerRule(_ => RewriteDeclarativeDot)
    // whole-operator as-of join: AsOfMergeJoinNode -> AsOfMergeJoinExec
    ext.injectPlannerStrategy(_ => AsOfMergeJoinStrategy)
    register(ext, "graft_dot", { args =>
      require(args.length == 2, "graft_dot(a, b) takes exactly two array arguments")
      DotProduct(args.head, args(1))
    })
    register(ext, "graft_normalize", { args =>
      require(args.length == 1, "graft_normalize(vec) takes one array argument")
      NormalizeVec(args.head)
    })
    register(ext, "graft_quantize_int8", { args =>
      require(args.length == 1, "graft_quantize_int8(vec) takes one array argument")
      QuantizeInt8(args.head)
    })
    register(ext, "graft_nfc", { args =>
      require(args.length == 1, "graft_nfc(s) takes one string argument")
      NfcNormalize(args.head)
    })
    register(ext, "graft_simhash", { args =>
      // graft_simhash(words) = xxhash64 token hash; graft_simhash(words, true) = md5
      require(args.nonEmpty && args.length <= 2,
        "graft_simhash(words[, md5]) takes one array argument and an optional boolean literal")
      val md5 = args.lift(1).map {
        case Literal(b: Boolean, BooleanType) => b
        case _ => throw new IllegalArgumentException("graft_simhash: md5 must be a boolean literal")
      }.getOrElse(false)
      SimHashWords(args.head, md5)
    })
    register(ext, "graft_image_dims", { args =>
      require(args.length == 1, "graft_image_dims(payload) takes one binary argument")
      ImageDims(args.head)
    })
    register(ext, "graft_wav_meta", { args =>
      require(args.length == 1, "graft_wav_meta(payload) takes one binary argument")
      WavMeta(args.head)
    })
    register(ext, "graft_blockhash64", { args =>
      require(args.length == 1, "graft_blockhash64(payload) takes one binary argument")
      BlockHash64(args.head)
    })
    register(ext, "graft_decode_stats", { args =>
      require(args.length == 1, "graft_decode_stats(payload) takes one binary argument")
      DecodeStats(args.head)
    })
    register(ext, "graft_hyperplane_buckets", { args =>
      require(args.length == 3,
        "graft_hyperplane_buckets(vec, bands, planesPerBand) takes an array and two int literals")
      HyperplaneBuckets(args.head,
        intLit(args(1), "bands"), intLit(args(2), "planesPerBand"))
    })
  }
}
