package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Layout}

/** Dev-only phase profiler for the durable-LSH trickle append: builds
  * a mult× store (a fresh fixture per run — the session catalog is
  * in-memory, so a bucketed table cannot be re-registered across JVMs
  * and "reuse via a fixed dir" was never real), then times each phase
  * of the append path for a 2-doc batch.
  * Usage: runMain graft.tools.ProfileTrickle [sfDir] [mult] */
object ProfileTrickle {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(100)
    val spark = graft.GraftSession.local("graft-profile",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val db = s"profile_lsh_$mult"
    // under the janitor's graft-* prefix so stale profile stores are
    // reaped like every other fixture (GraftSession.reapStaleFixtures)
    val loc = java.nio.file.Files.createTempDirectory(s"graft-profile-lsh-")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$loc'")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[phase] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val replicas = spark.range(mult).select(col("id").cast("int").as("r"))
    val docs = graft.Tables.documents(spark, sfDir)
      .crossJoin(replicas)
      .select(
        (col("doc_id") + col("r").cast("long") * 10000000L).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          x => concat(x, lit("~"), col("r"))), " ").as("text"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .persist()
    val cut = (mult - 1).toLong * 10000000L
    t("build (one-off)") {
      Dedup.lshBuildIndex(docs.filter(col("doc_id") < cut),
        "doc_id", "text", s"$db.idx", numBuckets = 64)
    }
    val table = s"$db.idx"
    val proj = docs.filter(col("doc_id") >= cut && col("doc_id") < cut + 2)
      .select(col("doc_id"), col("text"))
    val arriving = proj.collect()
    val trickle = spark.createDataFrame(
      java.util.Arrays.asList(arriving: _*), proj.schema)
    val id = "doc_id"
    // replicate lshIndexAppend phase by phase
    val (n, k, bands, numBuckets) = t("storedLshParams") {
      Dedup.storedLshParams(spark, table)
    }
    val newIndex = t("indexDocs(batch)") {
      val x = Dedup.indexDocs(trickle, id, "text", n, k).localCheckpoint(true)
      x.count(); x
    }
    val batchIds = t("batchIds ckpt") {
      val x = newIndex.select(col(id)).distinct().localCheckpoint(true)
      x.count(); x
    }
    val batchBuckets = t("batchBuckets collect") {
      batchIds.select(pmod(hash(col(id)), lit(numBuckets)).as("b"))
        .distinct().collect().map(_.getInt(0)).toSet
    }
    val overlap = t("overlap (file-pruned id lookup)") {
      val x = Layout.readBucketSubset(spark, table, batchBuckets)
        .select(col(id))
        .join(broadcast(batchIds), Seq(id), "leftsemi").localCheckpoint(true)
      x.count(); x
    }
    val fresh = t("fresh anti-join") {
      val x = newIndex.join(broadcast(overlap), Seq(id), "leftanti")
        .localCheckpoint(true)
      x.count(); x
    }
    val bandedNew = t("bandedNew ckpt") {
      val x = Dedup.bandedWithSets(fresh, id, k, bands).localCheckpoint(true)
      x.count(); x
    }
    val pruned = t("storedBandsPruned") {
      val x = Dedup.storedBandsPruned(spark, table, bandedNew, id)
        .localCheckpoint(true)
      x.count(); x
    }
    // round 15: the verification sets ride the pruned twin rows — no
    // main-table read on the append path at all
    val sets = t("sets (from pruned twin rows)") {
      val x = pruned.select(col(id), col("hs")).dropDuplicates(id)
      x.count(); x
    }
    val pairs = t("incrementalPairsFromBanded") {
      val x = Dedup.incrementalPairsFromBanded(sets, pruned.drop("hs"),
        bandedNew.drop("hs"), fresh.select(col(id), col("hs")), id, 0.5,
        Dedup.DefaultMaxBucketSize)
      x.count(); x
    }
    t("ledger double-hop + append") {
      val pt = Dedup.lshPairsTableName(table)
      val already = spark.table(pt).select(col("id_a"), col("id_b"))
        .join(broadcast(pairs.select(col("id_a"), col("id_b"))),
          Seq("id_a", "id_b"), "leftsemi")
      pairs.join(broadcast(already), Seq("id_a", "id_b"), "leftanti")
        .write.mode("append").format("parquet").saveAsTable(pt)
    }
    t("bands append") {
      Layout.appendBucketed(
        bandedNew.withColumn("bkey",
          pmod(hash(col("band"), col("sig")), lit(1024))),
        Dedup.lshBandsTableName(table), bucketCols = Seq("bkey"),
        numBuckets = numBuckets)
    }
    t("main append") {
      Layout.appendBucketed(fresh, table, bucketCols = Seq(id),
        numBuckets = numBuckets)
    }
    spark.stop()
  }
}
