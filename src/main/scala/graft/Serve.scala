package graft

import org.apache.spark.sql.SparkSession

import graft.query.{PgWireServer, QueryServer}

/** Serving entry — the reference's compose stack in one JVM
  * (`docker-compose.yaml:8-12`: the Evidence dashboard + the Buena
  * Vista postgres proxy on 5433 in front of one shared warehouse).
  *
  * Boots a session over an sf directory (every table registered as a
  * view), then both gateway faces against that ONE SparkSession:
  *  - HTTP (`QueryServer`): `GET /api/{route}.json`, `/api/status`,
  *    `GET /page/{route}.html` (rendered dashboard), `POST /sql`;
  *  - postgres-wire (`PgWireServer`): psql/JDBC/dbt-shaped clients.
  *
  * Usage: `runMain graft.Serve [sfDir] [httpPort] [pgPort]`
  * (defaults sf0.001, 3000, 5433 — the reference's ports). Blocks
  * until killed. DDL issued through either face (temp views, cached
  * tables) is visible to the other — the shared-warehouse concurrency
  * the reference runs a proxy to get.
  */
object Serve {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val httpPort = args.lift(1).map(_.toInt).getOrElse(3000)
    val pgPort = args.lift(2).map(_.toInt).getOrElse(5433)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark: SparkSession = GraftSession.local("graft-serve", cpus)
    Tables.names.foreach { n =>
      val t = Tables.table(spark, sfDir, n)
      t.createOrReplaceTempView(n)
      // also published under `global_temp.<name>`: global temp views
      // cross newSession() boundaries, so gateways running with
      // per-connection isolation still see the warehouse
      t.createOrReplaceGlobalTempView(n)
    }

    val pages = Map("index" ->
      """# Warehouse
        |```sql tables
        |SHOW VIEWS
        |```
      """.stripMargin)
    // opt-in gateway credentials (both faces stay trust when unset —
    // the reference proxy's default; see DEPLOY.md for the TLS story)
    val http = new QueryServer(spark, pages,
      bearerToken = sys.env.get("SPARK_GRAFT_HTTP_TOKEN"))
    val boundHttp = http.start(httpPort)
    val pg = new PgWireServer(spark,
      password = sys.env.get("SPARK_GRAFT_PG_PASSWORD"),
      // SCRAM-SHA-256 by default when a password is set — the password
      // then never crosses the wire; set =cleartext for a legacy client
      scram = !sys.env.get("SPARK_GRAFT_PG_AUTH").contains("cleartext"))
    val boundPg = pg.start(pgPort)
    println(s"""{"serve":"up","http":$boundHttp,"pg":$boundPg,"sf":"$sfDir"}""")
    Thread.currentThread().join() // serve until the process is killed
  }
}
