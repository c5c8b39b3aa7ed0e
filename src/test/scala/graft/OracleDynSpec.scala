package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the contract stated in [[graft.catalog.Q]]: for every query
  * carrying a scale-adaptive oracle (`oracleDyn`), the SQL it resolves
  * at the sf0.01 verification dir must be byte-identical to the static
  * `oracle` snapshot — otherwise the driver's gate (which runs the
  * dynamic form) and the recorded snapshot could silently diverge and
  * a sizing regression would hash-match its own drifted oracle.
  */
class OracleDynSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf001 = "/root/testdata/sf0.01"

  test("every oracleDyn resolves at sf0.01 to exactly the static snapshot") {
    val dyn = SparkEntry.modules.filter(_.oracleDyn.isDefined)
    assert(dyn.nonEmpty) // the ANN family must carry dynamic oracles
    dyn.foreach { q =>
      val static = q.oracle.getOrElse(
        fail(s"${q.name}: oracleDyn without a static snapshot"))
      val resolved = q.oracleDyn.get(spark, sf001)
      assert(resolved.trim == static.trim,
        s"${q.name}: oracleDyn at sf0.01 differs from the static oracle")
    }
  }

  test("dynamic oracles resolve to DIFFERENT sql at a different scale") {
    // the whole point of oracleDyn is scale adaptation: sf0.1's corpus
    // (2000 embeddings vs 500 at sf0.01/sf0.001 — the smaller two
    // share a size, so sf0.1 is the scale that must move the sizing)
    // must change the derived constants for at least the LSH family
    val dyn = SparkEntry.modules.filter(_.oracleDyn.isDefined)
    val changed = dyn.count { q =>
      q.oracleDyn.get(spark, "/root/testdata/sf0.1").trim !=
        q.oracle.get.trim
    }
    assert(changed > 0,
      "no dynamic oracle changed between sf0.01 and sf0.1 — " +
        "the sizing replay is not actually scale-adaptive")
  }
}
