package graft.query

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, IOException}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, to_json}
import org.apache.spark.sql.types._

/** PostgreSQL wire-protocol (v3) front end for the SQL gateway —
  * SURVEY §2.10 Q8 closed natively.
  *
  * The reference fronts DuckDB with the Buena Vista postgres proxy so
  * dbt and the dashboard can query ONE warehouse concurrently over the
  * postgres protocol (`dbt/profiles.yml:7-14` — host 0.0.0.0 port 5433,
  * `docker-compose.yaml:11`). This is the same surface speaking to
  * Spark: a listener implementing the publicly documented protocol
  * (postgresql.org/docs/current/protocol-message-formats.html) straight
  * over `ServerSocket` — no driver jar, no framework.
  *
  * Supported flow, enough for real clients (psql, JDBC, psycopg):
  *  - SSLRequest → refused with 'N' (cleartext localhost gateway);
  *    GSSENCRequest likewise; CancelRequest → the target session's
  *    Spark job group is cancelled iff the BackendKeyData secret
  *    matches (postgres's out-of-band Ctrl-C, wired to
  *    `cancelJobGroup` with task interruption).
  *  - StartupMessage(3.0) → AuthenticationOk (trust — same trust model
  *    as the HTTP gateway and Buena Vista's default), ParameterStatus
  *    basics, BackendKeyData, ReadyForQuery.
  *  - Simple protocol: 'Q' → RowDescription / DataRow* /
  *    CommandComplete / ReadyForQuery; empty string →
  *    EmptyQueryResponse; failures → ErrorResponse then ReadyForQuery
  *    (a bad query is a result — the connection stays usable).
  *  - Extended protocol: Parse/Bind/Describe/Execute/Close/Flush/Sync
  *    for unparameterized statements (dbt compiles literals into its
  *    SQL, so $n binding is not needed; a Bind carrying parameters gets
  *    a clean ErrorResponse). Errors put the connection in the
  *    protocol's skip-until-Sync state.
  *
  * Execution: every statement runs `spark.sql` on the connection's
  * handler thread — concurrent clients interleave inside one
  * SparkContext exactly like the HTTP gateway's request pool (that
  * concurrency is the one thing the reference added the proxy FOR).
  * All values ship in text format; complex columns (array/map/struct)
  * are serialized to JSON server-side before collect. Driver safety:
  * collects are capped at `maxRows` with a NoticeResponse when the cap
  * fires — same bounded-collect contract as QueryServer, since the
  * protocol has no `truncated` flag.
  */
final class PgWireServer(spark: SparkSession, maxRows: Int = 10000) {

  private var server: Option[ServerSocket] = None
  @volatile private var running = false
  private val connections =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Socket]()

  /** Bind 127.0.0.1:`port` (0 = ephemeral) and serve until `stop()`.
    * Returns the bound port. One daemon accept thread; one daemon
    * thread per connection (a gateway fronting dbt + a dashboard holds
    * a handful of connections, not thousands — C10K belongs to Spark
    * Connect's grpc tier). */
  def start(port: Int = 0): Int = synchronized {
    require(server.isEmpty, "PgWireServer already started")
    val ss = new ServerSocket(port, 50, InetAddress.getByName("127.0.0.1"))
    server = Some(ss)
    running = true
    val acceptor = new Thread(() => {
      // loop on THIS listener's liveness, not the shared `running` flag:
      // a stop()/start() cycle flips `running` back to true and a
      // flag-guarded loop would then busy-spin on its closed socket
      while (!ss.isClosed) {
        try {
          val sock = ss.accept()
          connections.add(sock)
          if (!running) {
            // stop() ran between accept and add and may have missed this
            // socket in its close sweep — honor the stop guarantee
            connections.remove(sock)
            try sock.close() catch { case _: IOException => }
          } else {
            val t = new Thread(() => handleConnection(sock), "graft-pgwire-conn")
            t.setDaemon(true)
            t.start()
          }
        } catch {
          case _: IOException => // socket closed by stop()
        }
      }
    }, "graft-pgwire-accept")
    acceptor.setDaemon(true)
    acceptor.start()
    ss.getLocalPort
  }

  def stop(): Unit = synchronized {
    running = false
    server.foreach(s => try s.close() catch { case _: IOException => })
    server = None
    // live handler threads block in readByte(); closing their sockets is
    // what actually ends the sessions (and the daemon threads with them)
    connections.forEach(s => try s.close() catch { case _: IOException => })
    connections.clear()
  }

  // ---- protocol constants (public wire format) ----
  private val ProtocolV3 = 196608      // 3 << 16
  private val SslRequestCode = 80877103
  private val GssEncRequestCode = 80877104
  private val CancelRequestCode = 80877102

  /** Cancel registry: backend pid → (secret, Spark job group). A
    * CancelRequest arrives on its OWN connection (that's the protocol —
    * the session socket is busy executing), so the key data must
    * resolve to something cancellable out-of-band: the session's job
    * group, which `cancelJobGroup` kills with interruptOnCancel. */
  private val backendSeq = new java.util.concurrent.atomic.AtomicInteger(0)
  private val cancelKeys =
    new java.util.concurrent.ConcurrentHashMap[Int, (Int, String)]()
  private val secretRng = new java.security.SecureRandom()

  private def handleConnection(sock: Socket): Unit = {
    sock.setTcpNoDelay(true)
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    val pid = backendSeq.incrementAndGet()
    val secret = secretRng.nextInt()
    val jobGroup = s"graft-pgwire-$pid"
    try {
      if (!handshake(in, out)) return
      cancelKeys.put(pid, (secret, jobGroup))
      sendAuthAndReady(out, pid, secret)
      messageLoop(in, out, jobGroup)
    } catch {
      case _: EOFException => // client hung up
      case _: IOException  =>
    } finally {
      cancelKeys.remove(pid)
      connections.remove(sock)
      try sock.close() catch { case _: IOException => }
    }
  }

  /** Pre-startup negotiation: refuse SSL/GSS encryption (respond 'N',
    * client retries cleartext on the same socket), honor cancel
    * requests (kill the target session's Spark job group iff the
    * secret matches — then drop, no response, per protocol), accept a
    * v3 StartupMessage. Returns false when the connection should end
    * without a session. */
  @annotation.tailrec
  private def handshake(in: DataInputStream, out: DataOutputStream): Boolean = {
    val len = in.readInt()
    if (len < 8 || len > (1 << 20)) return false
    val code = in.readInt()
    code match {
      case SslRequestCode | GssEncRequestCode =>
        out.writeByte('N'); out.flush()
        handshake(in, out)
      case CancelRequestCode =>
        // the frame must declare its own key data (len 16 = len + code +
        // pid + secret): reading past a shorter frame would block the
        // handler thread on bytes the client never promised to send
        if (len == 16) {
          val pid = in.readInt()
          val secret = in.readInt()
          Option(cancelKeys.get(pid)).foreach { case (expected, group) =>
            if (expected == secret) spark.sparkContext.cancelJobGroup(group)
          }
        }
        false // cancel connections carry no response and close immediately
      case ProtocolV3 =>
        in.skipBytes(len - 8) // user/database params — trust auth, single catalog
        true
      case _ =>
        writeError(out, "08P01", s"unsupported protocol code $code")
        out.flush()
        false
    }
  }

  private def sendAuthAndReady(out: DataOutputStream, pid: Int, secret: Int): Unit = {
    writeMsg(out, 'R') { b => b.writeInt(0) } // AuthenticationOk
    Seq(
      "server_version" -> "15.0 (graft)",
      "server_encoding" -> "UTF8",
      "client_encoding" -> "UTF8",
      "DateStyle" -> "ISO, MDY",
      "integer_datetimes" -> "on",
      "standard_conforming_strings" -> "on").foreach { case (k, v) =>
      writeMsg(out, 'S') { b => writeCStr(b, k); writeCStr(b, v) }
    }
    // real key data: what a libpq client sends back in a CancelRequest
    writeMsg(out, 'K') { b => b.writeInt(pid); b.writeInt(secret) }
    writeReady(out)
    out.flush()
  }

  /** Per-connection extended-protocol state: named prepared statements
    * and portals (sql text only — no parameter binding). */
  private final class SessionState {
    val statements = mutable.Map.empty[String, String]
    val portals = mutable.Map.empty[String, String]
    var skipUntilSync = false
  }

  private def messageLoop(in: DataInputStream, out: DataOutputStream,
      jobGroup: String): Unit = {
    val st = new SessionState
    // every Spark action this session runs happens on THIS thread, so
    // one thread-local job group makes the whole session cancellable by
    // an out-of-band CancelRequest (interruptOnCancel reaches into
    // running tasks); a cancelled collect surfaces as an ErrorResponse
    // on the session connection, exactly like postgres's "canceling
    // statement due to user request"
    spark.sparkContext.setJobGroup(jobGroup,
      s"pg-wire session $jobGroup", interruptOnCancel = true)
    try messageLoopInner(in, out, st)
    finally spark.sparkContext.clearJobGroup()
  }

  private def messageLoopInner(in: DataInputStream, out: DataOutputStream,
      st: SessionState): Unit = {
    while (true) {
      val tpe = in.readByte().toChar
      val len = in.readInt()
      if (len < 4 || len > (64 << 20)) throw new IOException("bad frame length")
      val payload = new Array[Byte](len - 4)
      in.readFully(payload)
      // after an extended-protocol error, discard until Sync (protocol's
      // error-recovery rule); Sync and Terminate always processed
      if (st.skipUntilSync && tpe != 'S' && tpe != 'X') ()
      else tpe match {
        case 'Q' => simpleQuery(out, new String(payload, 0,
          math.max(0, payload.length - 1), StandardCharsets.UTF_8))
        case 'P' => parse(st, out, payload)
        case 'B' => bind(st, out, payload)
        case 'D' => describe(st, out, payload)
        case 'E' => execute(st, out, payload)
        case 'C' => closeTarget(st, out, payload)
        case 'H' => out.flush() // Flush
        case 'S' => // Sync: clear error state, end the implicit transaction
          st.skipUntilSync = false
          writeReady(out); out.flush()
        case 'X' => return // Terminate
        case other =>
          writeError(out, "08P01", s"unsupported message type '$other'")
          st.skipUntilSync = true
      }
    }
  }

  // ---- simple protocol ----

  /** One Query message may carry several ';'-separated statements (psql
    * ships a whole `SELECT 1; SELECT 2` line as one message): run each
    * in order with its own result cycle, stop at the first error
    * (postgres's implicit-transaction abort skips the remainder), one
    * ReadyForQuery at the end. */
  private def simpleQuery(out: DataOutputStream, sql: String): Unit = {
    val stmts = splitStatements(sql)
    if (stmts.isEmpty) {
      writeMsg(out, 'I') { _ => } // EmptyQueryResponse
    } else {
      var failed = false
      val it = stmts.iterator
      while (!failed && it.hasNext) {
        val stmt = it.next()
        try {
          val df = textualize(spark.sql(stmt))
          val schema = df.schema
          if (schema.nonEmpty) writeRowDescription(out, schema)
          val n = if (schema.nonEmpty) writeRows(out, df) else 0L
          writeMsg(out, 'C') { b => writeCStr(b, commandTag(stmt, n)) }
        } catch {
          case e: Exception =>
            writeError(out, "42601", String.valueOf(e.getMessage))
            failed = true
        }
      }
    }
    writeReady(out)
    out.flush()
  }

  /** Split on top-level ';' only — quoted strings ('' escape), quoted
    * identifiers, line comments and block comments are opaque, matching
    * how the postgres frontend lexes a simple-query string. */
  private[query] def splitStatements(sql: String): Seq[String] = {
    val segments = Vector.newBuilder[(String, Boolean)]
    val cur = new StringBuilder
    var hasContent = false // any non-comment, non-whitespace char seen
    var i = 0
    var state: Char = 'n' // n-ormal, s-ingle quote, d-ouble quote, l-ine comment, b-lock comment
    while (i < sql.length) {
      val c = sql.charAt(i)
      val next = if (i + 1 < sql.length) sql.charAt(i + 1) else '\u0000'
      state match {
        case 'n' =>
          if (c == '\'') { state = 's'; cur += c; hasContent = true }
          else if (c == '"') { state = 'd'; cur += c; hasContent = true }
          else if (c == '-' && next == '-') { state = 'l'; cur += c }
          else if (c == '/' && next == '*') { state = 'b'; cur += c }
          else if (c == ';') {
            segments += ((cur.toString, hasContent)); cur.clear(); hasContent = false
          } else {
            cur += c
            if (!c.isWhitespace) hasContent = true
          }
        case 's' =>
          cur += c
          if (c == '\'') {
            if (next == '\'') { cur += next; i += 1 } // '' escape stays inside
            else state = 'n'
          }
        case 'd' =>
          cur += c
          if (c == '"') state = 'n'
        case 'l' =>
          cur += c
          if (c == '\n') state = 'n'
        case 'b' =>
          cur += c
          if (c == '*' && next == '/') { cur += next; i += 1; state = 'n' }
      }
      i += 1
    }
    segments += ((cur.toString, hasContent))
    // comment-only segments are NOT statements: psql ships
    // `SELECT 1; -- done` as one message, and the trailing comment must
    // not reach spark.sql as a bogus second statement
    segments.result().collect { case (s, true) => s.trim }.filter(_.nonEmpty)
  }

  // ---- extended protocol ----

  private def parse(st: SessionState, out: DataOutputStream,
      payload: Array[Byte]): Unit = {
    val r = new PayloadReader(payload)
    val name = r.cstr()
    val sql = r.cstr()
    val nParamTypes = r.int16()
    (0 until nParamTypes).foreach(_ => r.int32())
    st.statements(name) = sql
    writeMsg(out, '1') { _ => } // ParseComplete
  }

  private def bind(st: SessionState, out: DataOutputStream,
      payload: Array[Byte]): Unit = {
    val r = new PayloadReader(payload)
    val portal = r.cstr()
    val stmt = r.cstr()
    val nFmt = r.int16(); (0 until nFmt).foreach(_ => r.int16())
    val nParams = r.int16()
    // with zero parameters the next section is the result-format codes;
    // this server only speaks text, so a binary request must be REFUSED
    // — silently shipping text a client will parse as binary is garbage
    // data, not degraded service (pgJDBC asks for binary once a
    // statement crosses its prepareThreshold)
    val binaryRequested = nParams == 0 && {
      val nResFmt = r.int16()
      (0 until nResFmt).exists(_ => r.int16() == 1)
    }
    if (nParams > 0) {
      // dbt/Evidence never bind parameters against the proxy; a client
      // that does gets the standard feature-not-supported error
      writeError(out, "0A000", "parameter binding not supported")
      st.skipUntilSync = true
    } else if (binaryRequested) {
      writeError(out, "0A000", "binary result format not supported (text only)")
      st.skipUntilSync = true
    } else st.statements.get(stmt) match {
      case Some(sql) =>
        st.portals(portal) = sql
        writeMsg(out, '2') { _ => } // BindComplete
      case None =>
        writeError(out, "26000", s"prepared statement \"$stmt\" does not exist")
        st.skipUntilSync = true
    }
  }

  private def describe(st: SessionState, out: DataOutputStream,
      payload: Array[Byte]): Unit = {
    val r = new PayloadReader(payload)
    val kind = r.byte().toChar // 'S' statement | 'P' portal
    val name = r.cstr()
    val sql = if (kind == 'S') st.statements.get(name) else st.portals.get(name)
    sql match {
      case None =>
        writeError(out, "26000", s"unknown ${if (kind == 'S') "statement" else "portal"} \"$name\"")
        st.skipUntilSync = true
      case Some(s) =>
        try {
          if (kind == 'S') // statements also advertise their (empty) param list
            writeMsg(out, 't') { b => b.writeShort(0) } // ParameterDescription
          // Describe must not EXECUTE (spark.sql runs DDL/DML eagerly
          // inside the call — a Describe that inserts rows would insert
          // them AGAIN at Execute) yet must return the exact
          // RowDescription Execute will stream (pgJDBC Describes
          // `SET extra_float_digits=3` at startup and expects its
          // (key, value) row). Parse + analyze with command execution
          // skipped gives both. Complex columns need no schema rewrite:
          // they ship as JSON text and their pg OID is already 25.
          val schema = org.apache.spark.sql.GraftBridge
            .analyzedSchemaNoExec(spark, s)
          if (schema.nonEmpty) writeRowDescription(out, schema)
          else writeMsg(out, 'n') { _ => } // NoData
        } catch {
          case e: Exception =>
            writeError(out, "42601", String.valueOf(e.getMessage))
            st.skipUntilSync = true
        }
    }
  }

  private def execute(st: SessionState, out: DataOutputStream,
      payload: Array[Byte]): Unit = {
    val r = new PayloadReader(payload)
    val portal = r.cstr()
    // max-rows field ignored: the server-side cap governs
    st.portals.get(portal) match {
      case None =>
        writeError(out, "34000", s"portal \"$portal\" does not exist")
        st.skipUntilSync = true
      case Some(sql) =>
        try {
          val df = textualize(spark.sql(sql))
          val n = if (df.schema.nonEmpty) writeRows(out, df) else 0L
          writeMsg(out, 'C') { b => writeCStr(b, commandTag(sql, n)) }
        } catch {
          case e: Exception =>
            writeError(out, "42601", String.valueOf(e.getMessage))
            st.skipUntilSync = true
        }
    }
  }

  private def closeTarget(st: SessionState, out: DataOutputStream,
      payload: Array[Byte]): Unit = {
    val r = new PayloadReader(payload)
    val kind = r.byte().toChar
    val name = r.cstr()
    if (kind == 'S') st.statements.remove(name) else st.portals.remove(name)
    writeMsg(out, '3') { _ => } // CloseComplete
  }

  // ---- execution helpers ----

  /** Complex columns can't ride the text format as scala toString —
    * serialize array/map/struct to JSON in-plan (codegen'd `to_json`),
    * so the collect ships strings and the client sees valid JSON. */
  private def textualize(df: DataFrame): DataFrame = {
    val needsJson = df.schema.fields.exists(f => isComplex(f.dataType))
    if (!needsJson) df
    else df.select(df.schema.fields.map { f =>
      if (isComplex(f.dataType)) to_json(col(s"`${f.name}`")).as(f.name)
      else col(s"`${f.name}`")
    }.toSeq: _*)
  }

  private def isComplex(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => true
    case _ => false
  }

  /** Text-format rendering per postgres conventions (bool t/f,
    * `yyyy-MM-dd HH:mm:ss[.ffffff]` timestamps — NEVER
    * LocalDateTime.toString, which uses a 'T' separator and drops :00
    * seconds, neither of which postgres text parsers accept — plain
    * decimals, hex bytea); everything else toString. */
  private def renderCell(v: Any): String = v match {
    case b: Boolean => if (b) "t" else "f"
    case t: java.sql.Timestamp => pgTimestamp(t.toLocalDateTime)
    case d: java.time.LocalDateTime => pgTimestamp(d) // TIMESTAMP_NTZ collects as this
    case i: java.time.Instant =>
      pgTimestamp(java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC))
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal => d.bigDecimal.toPlainString
    case bytes: Array[Byte] => // bytea hex format
      "\\x" + bytes.map(b => f"$b%02x").mkString
    case other => String.valueOf(other)
  }

  private def pgTimestamp(d: java.time.LocalDateTime): String = {
    val base = f"${d.getYear}%04d-${d.getMonthValue}%02d-${d.getDayOfMonth}%02d " +
      f"${d.getHour}%02d:${d.getMinute}%02d:${d.getSecond}%02d"
    if (d.getNano == 0) base else base + f".${d.getNano / 1000}%06d"
  }

  /** Collect capped at maxRows (+1 probe row to detect truncation) and
    * stream DataRow messages; NoticeResponse when the cap fires — the
    * wire protocol's equivalent of the HTTP gateway's `truncated`. */
  private def writeRows(out: DataOutputStream, df: DataFrame): Long = {
    val rows = df.limit(maxRows + 1).collect()
    val emit = rows.take(maxRows)
    emit.foreach { row =>
      writeMsg(out, 'D') { b =>
        b.writeShort(row.length)
        (0 until row.length).foreach { i =>
          if (row.isNullAt(i)) b.writeInt(-1)
          else {
            val bytes = renderCell(row.get(i)).getBytes(StandardCharsets.UTF_8)
            b.writeInt(bytes.length)
            b.write(bytes)
          }
        }
      }
    }
    if (rows.length > maxRows)
      writeNotice(out, s"result truncated at $maxRows rows")
    emit.length.toLong
  }

  /** pg_type OIDs for the types Spark emits; unknowns ship as text. */
  private def pgType(dt: DataType): (Int, Int) = dt match { // (oid, size)
    case BooleanType => (16, 1)
    case ShortType | ByteType => (21, 2)
    case IntegerType => (23, 4)
    case LongType => (20, 8)
    case FloatType => (700, 4)
    case DoubleType => (701, 8)
    case _: DecimalType => (1700, -1)
    case DateType => (1082, 4)
    case TimestampType | TimestampNTZType => (1114, 8)
    case BinaryType => (17, -1)
    case _ => (25, -1) // text
  }

  private def writeRowDescription(out: DataOutputStream, schema: StructType): Unit =
    writeMsg(out, 'T') { b =>
      b.writeShort(schema.length)
      schema.fields.foreach { f =>
        val (oid, size) = pgType(f.dataType)
        writeCStr(b, f.name)
        b.writeInt(0)   // table oid
        b.writeShort(0) // column attr number
        b.writeInt(oid)
        b.writeShort(size)
        b.writeInt(-1)  // type modifier
        b.writeShort(0) // text format
      }
    }

  /** Postgres-style command tag: SELECT gets its row count; DDL/utility
    * statements echo their leading verb(s) the way postgres does
    * ("CREATE VIEW", "DROP TABLE", ...). Verbs are read past leading
    * comments/whitespace, so `/* dbt */ SELECT 1` tags as a SELECT. */
  private def commandTag(sql: String, rows: Long): String = {
    val words = leadingKeywords(sql, 2)
    words.headOption match {
      case Some("SELECT") | Some("WITH") | Some("VALUES") | Some("SHOW") |
           Some("DESCRIBE") | Some("DESC") | Some("EXPLAIN") |
           Some("TABLE") => s"SELECT $rows"
      case Some(v) if words.length > 1 &&
          (v == "CREATE" || v == "DROP" || v == "ALTER") =>
        s"$v ${words(1)}"
      // DML tags carry a row count in postgres ("INSERT 0 N" — the 0 is
      // a legacy OID slot — "UPDATE N", "DELETE N"); tag-parsing clients
      // (pgJDBC executeUpdate, psycopg2 rowcount) split on that format,
      // so a bare verb mis-parses. Spark SQL commands don't report
      // affected counts, so N is 0 — documented-format over accuracy.
      case Some("INSERT") => "INSERT 0 0"
      case Some("UPDATE") => "UPDATE 0"
      case Some("DELETE") => "DELETE 0"
      case Some("MERGE") => "MERGE 0"
      case Some(v) => v
      case None => "SELECT 0"
    }
  }

  /** First `n` word tokens of `sql`, uppercased, skipping leading
    * whitespace and SQL comments — the one place "what statement is
    * this" sniffing lives. */
  private def leadingKeywords(sql: String, n: Int): Seq[String] = {
    val words = Vector.newBuilder[String]
    var count = 0
    var i = 0
    while (i < sql.length && count < n) {
      val c = sql.charAt(i)
      val next = if (i + 1 < sql.length) sql.charAt(i + 1) else ' '
      if (c.isWhitespace) i += 1
      else if (c == '-' && next == '-') {
        while (i < sql.length && sql.charAt(i) != '\n') i += 1
      } else if (c == '/' && next == '*') {
        i += 2
        while (i + 1 < sql.length &&
          !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
        i = math.min(i + 2, sql.length)
      } else {
        val start = i
        while (i < sql.length && !sql.charAt(i).isWhitespace &&
          sql.charAt(i) != ';' && sql.charAt(i) != '(') i += 1
        if (i > start) { words += sql.substring(start, i).toUpperCase; count += 1 }
        else i += 1
      }
    }
    words.result()
  }

  // ---- frame writers ----

  private def writeMsg(out: DataOutputStream, tpe: Char)(
      body: DataOutputStream => Unit): Unit = {
    val buf = new java.io.ByteArrayOutputStream()
    val b = new DataOutputStream(buf)
    body(b)
    b.flush()
    out.writeByte(tpe)
    out.writeInt(4 + buf.size())
    buf.writeTo(out)
  }

  private def writeReady(out: DataOutputStream): Unit =
    writeMsg(out, 'Z') { b => b.writeByte('I') } // idle, no transactions

  private def writeError(out: DataOutputStream, code: String, msg: String): Unit = {
    writeMsg(out, 'E') { b =>
      b.writeByte('S'); writeCStr(b, "ERROR")
      b.writeByte('V'); writeCStr(b, "ERROR")
      b.writeByte('C'); writeCStr(b, code)
      b.writeByte('M'); writeCStr(b, msg)
      b.writeByte(0)
    }
    out.flush()
  }

  private def writeNotice(out: DataOutputStream, msg: String): Unit =
    writeMsg(out, 'N') { b =>
      b.writeByte('S'); writeCStr(b, "NOTICE")
      b.writeByte('V'); writeCStr(b, "NOTICE")
      b.writeByte('C'); writeCStr(b, "01000")
      b.writeByte('M'); writeCStr(b, msg)
      b.writeByte(0)
    }

  private def writeCStr(out: DataOutputStream, s: String): Unit = {
    out.write(s.getBytes(StandardCharsets.UTF_8))
    out.writeByte(0)
  }

  /** Cursor over a received payload (big-endian, NUL-terminated strings
    * — the protocol's field encodings). */
  private final class PayloadReader(bytes: Array[Byte]) {
    private var pos = 0
    def byte(): Byte = { val v = bytes(pos); pos += 1; v }
    def int16(): Int = { val v = ((bytes(pos) & 0xff) << 8) | (bytes(pos + 1) & 0xff); pos += 2; v }
    def int32(): Int = {
      val v = ((bytes(pos) & 0xff) << 24) | ((bytes(pos + 1) & 0xff) << 16) |
        ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      pos += 4; v
    }
    def cstr(): String = {
      val start = pos
      while (pos < bytes.length && bytes(pos) != 0) pos += 1
      val s = new String(bytes, start, pos - start, StandardCharsets.UTF_8)
      pos += 1
      s
    }
  }
}
