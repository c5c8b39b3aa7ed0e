package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Test bridge into `private[operators]` members (PropertySpec lives in
  * package graft, outside the operators subpackage). */
object DedupOpsTestAccess {
  def md5Buckets(df: DataFrame, c: Column, k: Int, mod: Int): DataFrame =
    DedupOps.md5Buckets(df, c, k, mod)
}
