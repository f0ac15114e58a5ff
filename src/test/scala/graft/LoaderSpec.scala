package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Loader
import graft.sources.Source

/** R3/R5/R6/R7/R8 loader modes against real catalog tables (temp
  * warehouse). The merge publish is the reference's rename-swap protocol
  * (`loader/hive_loader.py:176-178`): the target table must exist in the
  * catalog at every point, and a simulated failure between swap
  * statements must leave a recoverable table.
  */
class LoaderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def drop(names: String*): Unit =
    names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS `$n`"))

  test("Overwrite replaces the target") {
    drop("lt_o")
    Seq((1, "a")).toDF("k", "v").write.saveAsTable("lt_o")
    Loader.load(spark, Seq((2, "b"), (3, "c")).toDF("k", "v"),
      Loader.LoadConfig("lt_o", Loader.Overwrite))
    assert(spark.table("lt_o").as[(Int, String)].collect().toSet == Set((2, "b"), (3, "c")))
  }

  test("clusterBy publishes range-disjoint files under the table") {
    drop("lt_cl")
    Loader.load(spark, (1 to 2000).map(i => (i.toLong, s"v$i")).toDF("k", "v").repartition(8),
      Loader.LoadConfig("lt_cl", Loader.Overwrite, clusterBy = Seq("k"), clusterParts = 4))
    assert(spark.table("lt_cl").count() == 2000)
    // the written files cover disjoint k ranges (footer-stat prunable)
    val loc = spark.sql("DESCRIBE EXTENDED lt_cl").filter(col("col_name") === "Location")
      .select("data_type").as[String].head().stripPrefix("file:")
    val parts = new java.io.File(loc).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(parts.length > 1, "expected multiple clustered files")
    val ranges = parts.map(f =>
        spark.read.parquet(f.getPath).agg(min("k"), max("k")).as[(Long, Long)].head())
      .sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) => assert(hi < lo) }
    drop("lt_cl")
  }

  test("Append adds rows; creates table when absent (R6)") {
    drop("lt_a")
    Loader.load(spark, Seq((1, "a")).toDF("k", "v"), Loader.LoadConfig("lt_a", Loader.Append))
    Loader.load(spark, Seq((2, "b")).toDF("k", "v"), Loader.LoadConfig("lt_a", Loader.Append))
    assert(spark.table("lt_a").count() == 2)
  }

  test("MergeOn upserts and leaves no scratch tables") {
    drop("lt_m", "lt_m__graft_bak", "lt_m__graft_reconcile")
    Seq((1, "a"), (2, "b")).toDF("k", "v").write.saveAsTable("lt_m")
    Loader.load(spark, Seq((2, "B"), (4, "d")).toDF("k", "v"),
      Loader.LoadConfig("lt_m", Loader.MergeOn(Seq("k"))))
    assert(spark.table("lt_m").as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "B"), (4, "d")))
    assert(!spark.catalog.tableExists("lt_m__graft_bak"))
    assert(!spark.catalog.tableExists("lt_m__graft_reconcile"))
  }

  test("merge with dedup spec dedups staging first (R1 inside load)") {
    drop("lt_d")
    Seq((1, 1, "old")).toDF("k", "ord", "v").write.saveAsTable("lt_d")
    val staging = Seq((1, 5, "mid"), (1, 9, "new")).toDF("k", "ord", "v")
    Loader.load(spark, staging, Loader.LoadConfig("lt_d", Loader.MergeOn(Seq("k")),
      dedup = Some(Loader.DedupSpec(Seq("k"), Seq(col("ord").desc)))))
    assert(spark.table("lt_d").as[(Int, Int, String)].collect().toSet == Set((1, 9, "new")))
  }

  test("swap protocol: a stranded bak table from a mid-swap failure is recoverable and cleaned up") {
    drop("lt_s", "lt_s__graft_bak", "lt_s__graft_reconcile")
    // simulate the state after a failure between `RENAME target->bak`
    // and `RENAME reconcile->target`: bak holds the old data, reconcile
    // holds the merged data - nothing was lost
    Seq((1, "old")).toDF("k", "v").write.saveAsTable("lt_s__graft_bak")
    Seq((1, "merged")).toDF("k", "v").write.saveAsTable("lt_s__graft_reconcile")
    // operator recovery: finish the swap by hand (what an operator would do)
    spark.sql("ALTER TABLE `lt_s__graft_reconcile` RENAME TO `lt_s`")
    spark.sql("DROP TABLE `lt_s__graft_bak`")
    assert(spark.table("lt_s").as[(Int, String)].head() == ((1, "merged")))
    // and a subsequent normal merge over the recovered table works,
    // including clobbering any stale bak left behind
    Seq((9, "stale")).toDF("k", "v").write.saveAsTable("lt_s__graft_bak")
    Loader.load(spark, Seq((2, "x")).toDF("k", "v"),
      Loader.LoadConfig("lt_s", Loader.MergeOn(Seq("k"))))
    assert(spark.table("lt_s").as[(Int, String)].collect().toSet ==
      Set((1, "merged"), (2, "x")))
    assert(!spark.catalog.tableExists("lt_s__graft_bak"))
  }

  test("static partition columns are injected and written partitioned (R3)") {
    drop("lt_p")
    Loader.load(spark, Seq((1, "a")).toDF("k", "v"),
      Loader.LoadConfig("lt_p", Loader.Overwrite, partition = Map("dt" -> "2026-08-12")))
    val rows = spark.table("lt_p").select("k", "dt").as[(Int, String)].collect()
    assert(rows.toSeq == Seq((1, "2026-08-12")))
  }

  test("dynamic partition overwrite replaces ONLY the landed partitions (R3 dynamic)") {
    drop("lt_dyn")
    val mode = Loader.OverwritePartitions(Seq("dt"))
    // day 1 + day 2 land (also the R6 create path)
    Loader.load(spark, Seq((1, "a", "d1"), (2, "b", "d2")).toDF("k", "v", "dt"),
      Loader.LoadConfig("lt_dyn", mode))
    // re-land ONLY day 2 with different content — day 1 must survive
    Loader.load(spark, Seq((9, "z", "d2"), (10, "y", "d2")).toDF("k", "v", "dt"),
      Loader.LoadConfig("lt_dyn", mode))
    val got = spark.table("lt_dyn").select("k", "v", "dt").as[(Int, String, String)].collect().toSet
    assert(got == Set((1, "a", "d1"), (9, "z", "d2"), (10, "y", "d2")))
    // conf restored: a plain saveAsTable overwrite afterwards is still STATIC
    assert(!spark.conf.getOption("spark.sql.sources.partitionOverwriteMode").contains("dynamic"))
  }

  test("dynamic partition overwrite validation: needs columns, rejects static spec") {
    intercept[IllegalArgumentException] {
      Loader.load(spark, Seq((1, "a")).toDF("k", "dt"),
        Loader.LoadConfig("lt_dyn_bad", Loader.OverwritePartitions(Nil)))
    }
    intercept[IllegalArgumentException] {
      Loader.load(spark, Seq((1, "a")).toDF("k", "dt"),
        Loader.LoadConfig("lt_dyn_bad", Loader.OverwritePartitions(Seq("dt")),
          partition = Map("x" -> "1")))
    }
  }

  test("merge mode validation: partitions forbidden, keys required (hive_loader.py:66-82)") {
    intercept[IllegalArgumentException] {
      Loader.load(spark, Seq((1, "a")).toDF("k", "v"),
        Loader.LoadConfig("lt_x", Loader.MergeOn(Nil)))
    }
    intercept[IllegalArgumentException] {
      Loader.load(spark, Seq((1, "a")).toDF("k", "v"),
        Loader.LoadConfig("lt_x", Loader.MergeOn(Seq("k")), partition = Map("dt" -> "x")))
    }
  }

  test("pre/post SQL hooks run (R7)") {
    drop("lt_h", "lt_pre", "lt_post")
    Loader.load(spark, Seq((1, "a")).toDF("k", "v"),
      Loader.LoadConfig("lt_h", Loader.Overwrite,
        preSql = Seq("CREATE TABLE lt_pre (x INT) USING parquet"),
        postSql = Seq("CREATE TABLE lt_post (x INT) USING parquet")))
    assert(spark.catalog.tableExists("lt_pre") && spark.catalog.tableExists("lt_post"))
    drop("lt_pre", "lt_post")
  }

  test("MergeOn works on a dotted db.table target (R10 quoting end-to-end)") {
    spark.sql("CREATE DATABASE IF NOT EXISTS gdb")
    spark.sql("DROP TABLE IF EXISTS gdb.lt_dot")
    Seq((1, "a"), (2, "b")).toDF("k", "v").write.saveAsTable("gdb.lt_dot")
    Loader.load(spark, Seq((2, "B"), (5, "e")).toDF("k", "v"),
      Loader.LoadConfig("gdb.lt_dot", Loader.MergeOn(Seq("k"))))
    assert(spark.table("gdb.lt_dot").as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "B"), (5, "e")))
    assert(!spark.catalog.tableExists("gdb.lt_dot__graft_bak"))
    spark.sql("DROP TABLE IF EXISTS gdb.lt_dot")
  }

  test("JDBC overwrite swap plan follows the reference's staging+RENAME protocol") {
    val plan = Loader.jdbcOverwritePlan("t")
    assert(plan == Seq(
      "DROP TABLE IF EXISTS `t__graft_staging`",
      "CREATE TABLE `t__graft_staging` LIKE `t`",
      "RENAME TABLE `t` TO `t__graft_old`, `t__graft_staging` TO `t`",
      "DROP TABLE `t__graft_old`"))
    // the swap is a single multi-table RENAME: target never missing
    assert(plan.count(_.startsWith("RENAME")) == 1)
  }

  test("R9 string form: ';'-separated SQL splits like the reference") {
    assert(Loader.sqlList("SET a=1; SET b=2;") == Seq("SET a=1", "SET b=2"))
    assert(Loader.sqlList("  ") == Nil)
    assert(Loader.sqlList("single") == Seq("single"))
    // end-to-end: string-form preSql runs through load()
    spark.sql("DROP TABLE IF EXISTS lt_s9")
    Loader.load(spark, Seq((1, "a")).toDF("k", "v"),
      Loader.LoadConfig("lt_s9", Loader.Overwrite,
        preSql = Loader.sqlList(
          "CREATE TABLE lt_s9_pre1 (x INT) USING parquet; CREATE TABLE lt_s9_pre2 (x INT) USING parquet;")))
    assert(spark.catalog.tableExists("lt_s9_pre1") && spark.catalog.tableExists("lt_s9_pre2"))
    drop("lt_s9", "lt_s9_pre1", "lt_s9_pre2")
  }

  test("identifier quoting handles dotted and pre-quoted names (R10)") {
    assert(Source.quoteIdentifier("db.tbl") == "`db`.`tbl`")
    assert(Source.quoteIdentifier("`db`.tbl") == "`db`.`tbl`")
    assert(Source.quoteIdentifier("plain") == "`plain`")
  }
}
