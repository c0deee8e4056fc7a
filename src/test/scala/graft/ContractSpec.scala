package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: every oracle key has a query, names are
  * unique, and the flagship entry returns rows on sf0.001. */
class ContractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("registry names are unique") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size === names.size)
  }

  test("every oracle key exists in queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every ShuffleAudit entry names a live query and real tables") {
    val known = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    ShuffleAudit.Audited.foreach { case (name, tables) =>
      assert(SparkEntry.queries.contains(name), s"audit names unknown query $name")
      tables.foreach(t => assert(known.contains(t), s"$name audits unknown table $t"))
    }
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs on sf0.001 and returns a non-degenerate schema") {
    val failures = SparkEntry.registry.flatMap { q =>
      try {
        val df = q.fn(spark, SparkTestSession.sfDir)
        if (df.columns.isEmpty) Some(s"${q.name}: no columns") else None
      } catch { case e: Exception => Some(s"${q.name}: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
