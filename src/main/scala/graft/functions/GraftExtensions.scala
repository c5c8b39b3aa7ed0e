package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration of graft's custom Catalyst expressions —
  * the production path (`spark.sql.extensions=graft.functions.GraftExtensions`
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`), making
  * `encode_uri` a first-class SQL function at session build time.
  * [[GraftFunctions.register]] remains as the runtime fallback for sessions
  * built elsewhere (e.g. the driver's).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("encode_uri"),
      new ExpressionInfo(classOf[EncodeUri].getName, "encode_uri"),
      (exprs: Seq[Expression]) => EncodeUri(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("hp_signatures"),
      new ExpressionInfo(classOf[HyperplaneSignatures].getName, "hp_signatures"),
      (exprs: Seq[Expression]) => HyperplaneSignatures(exprs.head, exprs(1), exprs(2))))
    e.injectFunction((
      FunctionIdentifier("nearest_cells"),
      new ExpressionInfo(classOf[NearestCells].getName, "nearest_cells"),
      (exprs: Seq[Expression]) => NearestCells(exprs.head, exprs(1), exprs(2))))
    e.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("char_entropy_nano_sum"),
      new ExpressionInfo(classOf[CharEntropyNanoSum].getName, "char_entropy_nano_sum"),
      (exprs: Seq[Expression]) => CharEntropyNanoSum(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("char_ngram_distinct"),
      new ExpressionInfo(classOf[CharNgramDistinct].getName, "char_ngram_distinct"),
      (exprs: Seq[Expression]) => CharNgramDistinct(exprs.head,
        exprs(1).eval().asInstanceOf[Int])))
    e.injectFunction((
      FunctionIdentifier("char_ngram_max_count"),
      new ExpressionInfo(classOf[CharNgramMaxCount].getName, "char_ngram_max_count"),
      (exprs: Seq[Expression]) => CharNgramMaxCount(exprs.head,
        exprs(1).eval().asInstanceOf[Int])))
    e.injectFunction((
      FunctionIdentifier("winnow_distinct"),
      new ExpressionInfo(classOf[WinnowDistinct].getName, "winnow_distinct"),
      (exprs: Seq[Expression]) => WinnowDistinct(exprs.head,
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int])))
    e.injectFunction((
      FunctionIdentifier("jaro_winkler_milli"),
      new ExpressionInfo(classOf[JaroWinklerMilli].getName, "jaro_winkler_milli"),
      (exprs: Seq[Expression]) => JaroWinklerMilli(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("damerau_levenshtein"),
      new ExpressionInfo(classOf[DamerauLevenshtein].getName, "damerau_levenshtein"),
      (exprs: Seq[Expression]) => DamerauLevenshtein(exprs.head, exprs(1))))
    // EAV self-join-chain -> single-shuffle pivot (opt-in via
    // spark.graft.eav.pivotJoinChains AND spark.graft.eav.entityColumn
    // naming the declared-unique link column; see the rule's scaladoc)
    e.injectOptimizerRule(_ => graft.plans.EavPivotRule)
  }
}
