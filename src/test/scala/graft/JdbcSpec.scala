package graft

import java.sql.DriverManager

import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Sink
import graft.sources.Source

/** JDBC source/sink paths (S5 partitioned scan, S6 fetchsize, S10 plain
  * read, K7 bulk write) against EMBEDDED Derby — the same DataFrameReader
  * /Writer.jdbc code paths a MySQL URL takes, minus the network. Closes
  * the "needs a live database" gap for everything except MySQL-dialect
  * specifics (quoting is pinned separately in SourceSpec).
  */
class JdbcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dbDir =
    java.nio.file.Files.createTempDirectory("graft-jdbc").toString
  private lazy val url = s"jdbc:derby:$dbDir/db;create=true"

  private def exec(sqls: String*): Unit = {
    val c = DriverManager.getConnection(url)
    try sqls.foreach { s => val st = c.createStatement(); try st.execute(s) finally st.close() }
    finally c.close()
  }

  private lazy val seeded: Unit = {
    exec("CREATE TABLE T1 (K INT NOT NULL, V VARCHAR(16))")
    val c = DriverManager.getConnection(url)
    try {
      val ps = c.prepareStatement("INSERT INTO T1 VALUES (?, ?)")
      for (i <- 0 until 100) { ps.setInt(1, i); ps.setString(2, s"v$i"); ps.addBatch() }
      ps.executeBatch()
    } finally c.close()
  }

  test("S10/S6: plain jdbc read (with fetchsize) round-trips all rows and values") {
    seeded
    val got = Source.jdbc(spark, url, "T1")
      .select("K", "V").as[(Int, String)].collect().toMap
    assert(got.size == 100 && got(7) == "v7" && got(99) == "v99")
  }

  test("S5: jdbcPartitioned covers the key range exactly across its splits") {
    seeded
    val df = Source.jdbcPartitioned(spark, url, "T1", "K", lower = 0, upper = 99, splits = 4)
    assert(df.rdd.getNumPartitions == 4) // one task per range slice
    val ks = df.select("K").as[Int].collect().sorted
    assert(ks.toSeq == (0 until 100)) // no boundary row dropped or duplicated
  }

  test("S5: rows OUTSIDE [lower, upper) still arrive (bounds split, they don't filter)") {
    seeded
    // Spark's JDBC partitioning contract: lower/upper only shape the
    // stride; first/last predicates are open-ended
    val df = Source.jdbcPartitioned(spark, url, "T1", "K", lower = 20, upper = 80, splits = 3)
    assert(df.count() == 100)
  }

  test("K7: jdbc sink overwrite + append round-trip through the same URL") {
    seeded
    val df = Seq((1, "a"), (2, "b")).toDF("K", "V")
    Sink.jdbc(df, url, "T2", SaveMode.Overwrite)
    assert(Source.jdbc(spark, url, "T2").count() == 2)
    Sink.jdbc(Seq((3, "c")).toDF("K", "V"), url, "T2", SaveMode.Append)
    val got = Source.jdbc(spark, url, "T2").select("K").as[Int].collect().sorted
    assert(got.toSeq == Seq(1, 2, 3))
  }
}
