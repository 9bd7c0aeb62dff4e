package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-registry injection: the native expressions must be reachable from
  * plain SQL in a session built with the extension (spark-submit
  * `--conf spark.sql.extensions=graft.StareExtensions`). */
class ExtensionsSpec extends AnyFunSuite {

  test("stare_sid / stare_clear usable from spark.sql via extensions") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .withExtensions(new StareExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        "SELECT stare_sid(20.0d, 10.5d, 27) AS sid, stare_clear(stare_sid(20.0d, 10.5d, 20)) AS cleared")
        .collect()(0)
      assert(r.getLong(0) === 4598246232954051067L) // golden point encode
      assert(r.getLong(1) === graft.core.Sid.clearToLevel(4598246232954051060L))
      // null path through SQL
      val n = spark.sql("SELECT stare_sid(CAST(NULL AS DOUBLE), 10.5d, 27)").collect()(0)
      assert(n.isNullAt(0))
      // cover predicate against a literal cover: the point's own cleared
      // cell must intersect, a distant cell must not
      val sid = 4598246232954051067L
      val cell = graft.core.Sid.clearToLevel(graft.core.Sid.coerceLevel(sid, 8))
      val hit = spark.sql(
        s"SELECT stare_intersects_cover(stare_sid(20.0d, 10.5d, 27), array(${cell}L)), " +
          s"stare_intersects_cover(stare_sid(-20.0d, -110.5d, 27), array(${cell}L))").collect()(0)
      assert(hit.getBoolean(0) && !hit.getBoolean(1))
    } finally spark.stop()
  }
}
