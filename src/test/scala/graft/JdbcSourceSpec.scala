package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JdbcCatalog

/** End-to-end exercise of the JDBC catalog (the reference's primary
  * source — libs/utils/helper.js:43-51) against an embedded Derby
  * database: bounds probe, partitioned parallel read, predicate
  * pushdown into the remote scan, and the numeric-type tolerance of
  * the probe (drivers return Integer / Long / BigDecimal depending on
  * the declared PK type — MySQL's BIGINT UNSIGNED maps to BigDecimal).
  */
class JdbcSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val url = "jdbc:derby:memory:wpjdbc;create=true"
  private val props = new java.util.Properties()

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.executeUpdate(
      """CREATE TABLE wp_posts (
        |  ID INT PRIMARY KEY,
        |  post_title VARCHAR(100),
        |  post_status VARCHAR(20))""".stripMargin)
    (1 to 500).foreach { i =>
      val status = if (i % 5 == 0) "draft" else "publish"
      st.executeUpdate(
        s"INSERT INTO wp_posts VALUES ($i, 'title $i', '$status')")
    }
    // DECIMAL-typed PK — the numeric class MySQL BIGINT UNSIGNED maps to
    st.executeUpdate(
      """CREATE TABLE wp_terms (
        |  term_id DECIMAL(20,0) PRIMARY KEY,
        |  name VARCHAR(50))""".stripMargin)
    (1 to 40).foreach(i =>
      st.executeUpdate(s"INSERT INTO wp_terms VALUES ($i, 'term $i')"))
    // empty table — bounds probe must fall back to an unpartitioned read
    st.executeUpdate(
      """CREATE TABLE wp_options (
        |  option_id BIGINT PRIMARY KEY,
        |  option_name VARCHAR(50))""".stripMargin)
    st.close()
    conn.close()
  }

  test("partitioned read over an INT PK: bounds probe + parallel scan") {
    seeded
    val cat = new JdbcCatalog(url, props, numPartitions = 8)
    val df = cat.table(spark, "posts")
    assert(df.count() == 500)
    assert(df.rdd.getNumPartitions == 8)
  }

  test("filters and projection push down into the JDBC scan") {
    seeded
    val cat = new JdbcCatalog(url, props, numPartitions = 4)
    val filtered = cat.table(spark, "posts")
      .filter(col("post_status") === "publish")
      .select(col("ID"))
    assert(filtered.count() == 400)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.toUpperCase.contains("PUSHEDFILTERS") &&
      plan.toUpperCase.contains("POST_STATUS"),
      s"expected pushed filter on post_status in:\n$plan")
    // projection pruning: only the PK column reaches the scan schema
    assert(!filtered.queryExecution.executedPlan.schema.fieldNames
      .map(_.toUpperCase).contains("POST_TITLE"))
  }

  test("bounds probe tolerates a DECIMAL-typed PK") {
    seeded
    val cat = new JdbcCatalog(url, props, numPartitions = 4)
    val df = cat.table(spark, "terms")
    assert(df.count() == 40)
    assert(df.rdd.getNumPartitions == 4)
  }

  test("empty table falls back to an unpartitioned read") {
    seeded
    val cat = new JdbcCatalog(url, props)
    assert(cat.table(spark, "options").count() == 0)
  }

  test("MySQL dialect contracts: unsigned-PK mapping and backtick quoting") {
    // The reference speaks to MySQL (libs/utils/helper.js:43-51); no
    // MySQL/MariaDB engine exists in this zero-egress sandbox, so this
    // pins the SPARK DIALECT contracts the catalog's live paths assume,
    // and the Derby tests above exercise those paths end-to-end:
    //  - wp PKs declared BIGINT UNSIGNED surface as DECIMAL(20,0) —
    //    exactly the BigDecimal-shaped bounds the probe's Number
    //    tolerance handles (live-tested on the DECIMAL(20,0) PK above);
    //  - identifier quoting is backticks, so Spark-generated partition
    //    predicates/column lists stay valid MySQL.
    // A Spark upgrade that changes either mapping fails here loudly
    // instead of at a customer's database.
    import org.apache.spark.sql.jdbc.JdbcDialects
    import org.apache.spark.sql.types.{IntegerType, MetadataBuilder}
    val mysql = JdbcDialects.get("jdbc:mysql://db.example:3306/wordpress")
    // sanity: the URL really selected the MySQL dialect, not the default
    assert(mysql.getClass.getName.toLowerCase.contains("mysql"))
    assert(mysql.quoteIdentifier("meta_key") == "`meta_key`")
    // unsigned handling, dialect level: MEDIUMINT UNSIGNED (max 2^24-1,
    // fits Int) maps to INTEGER — the dialect recognizes MySQL's
    // unsigned type names at all. (BIGINT UNSIGNED -> DECIMAL(20,0)
    // happens in Spark's generic JDBC mapping off ResultSetMetaData
    // .isSigned, unreachable without a live MySQL — the BigDecimal
    // bounds it produces are what the DECIMAL(20,0) Derby test above
    // feeds through the probe end-to-end.)
    val unsignedMedium = mysql.getCatalystType(
      java.sql.Types.INTEGER, "MEDIUMINT UNSIGNED", 4, new MetadataBuilder())
    assert(unsignedMedium.contains(IntegerType),
      s"MEDIUMINT UNSIGNED should map to INTEGER, got $unsignedMedium")
  }
}
