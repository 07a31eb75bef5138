package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the per-domain registry split (round 8): the aggregate the
  * driver consumes must stay exactly the union of the domain files —
  * a future move/merge that drops, duplicates, or de-oracles a query
  * should fail HERE, not in the driver's correctness gate. */
class RegistrySpec extends AnyFunSuite {

  test("registry names are unique and every query carries an oracle") {
    val names = SparkEntry.registry.map(_.name)
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(",")}")
    val unoracled = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name)
    assert(unoracled.isEmpty,
      s"queries without oracle SQL (driver downgrades them to rows-only): ${unoracled.mkString(",")}")
  }

  test("every domain registry is non-empty and disjoint") {
    val domains = Map(
      "Relational" -> queries.Relational.all,
      "Tpch" -> queries.Tpch.all,
      "VersionedTables" -> queries.VersionedTables.all,
      "DataQuality" -> queries.DataQuality.all,
      "Documents" -> queries.Documents.all,
      "Dedup" -> queries.Dedup.all,
      "StreamIngest" -> queries.StreamIngest.all,
      "Similarity" -> queries.Similarity.all,
      "Zk" -> queries.Zk.all)
    domains.foreach { case (n, qs) => assert(qs.nonEmpty, s"$n is empty") }
    val union = domains.values.flatten.map(_.name).toSeq
    assert(union.size == union.distinct.size, "a query is registered in two domain files")
    assert(SparkEntry.registry.map(_.name).toSet == union.toSet,
      "SparkEntry.registry does not aggregate exactly the domain files")
  }

  test("the split kept the expected domain membership") {
    def names(qs: Seq[QueryDef]) = qs.map(_.name).toSet
    assert(names(queries.Dedup.all).forall(_.startsWith("dd")))
    assert(names(queries.Tpch.all).forall(_.matches("q\\d+_.*")))
    assert(names(queries.DataQuality.all).forall(n => n.startsWith("dq") || n == "st9_stream_drift"))
    assert(names(queries.VersionedTables.all).forall(_.startsWith("vt")))
    assert(names(queries.StreamIngest.all).forall(n => n.startsWith("st") || n.startsWith("src_")))
  }
}
