package graft

import graft.tools.RegenGolden
import scala.io.Source

/** NO-ORACLE queries are pinned to committed golden outputs on sf0.001
  * (SURVEY §5.5) — the drift net the DuckDB gate can't provide for them.
  * Intentional behavior changes: run `sbt "runMain graft.tools.RegenGolden"`
  * and review the diff. */
class GoldenSpec extends SparkSpec {

  RegenGolden.NoOracle.foreach { name =>
    test(s"$name matches committed golden output") {
      val expected = {
        val src = Source.fromResource(s"golden/$name.csv")
        try src.mkString finally src.close()
      }
      val actual = RegenGolden.render(SparkEntry.queries(name)(spark, sf0001))
      assert(actual == expected,
        s"$name drifted from golden; if intended, regenerate via graft.tools.RegenGolden")
    }
  }
}
