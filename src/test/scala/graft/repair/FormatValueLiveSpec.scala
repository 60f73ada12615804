package graft.repair

import java.sql.DriverManager

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

/** `formatValue` against a LIVE database (DuckDB over JDBC, the same
  * engine the driver's oracle uses): every literal the repairer can emit
  * must survive INSERT → SELECT with its value intact — formatting that
  * merely LOOKS like SQL is worthless if the target engine rejects or
  * mangles it (reference literal table: repairer.py:485-559).
  *
  * Postgres-dialect-only literals are excluded and covered by unit
  * assertions instead: `\x`-hex bytea (DuckDB blobs use per-byte escape
  * syntax) — everything else round-trips verbatim. */
class FormatValueLiveSpec extends AnyFunSuite {

  private def haveDriver: Boolean =
    try { Class.forName("org.duckdb.DuckDBDriver"); true }
    catch { case _: ClassNotFoundException => false }

  private def withConn[T](f: java.sql.Connection => T): T = {
    assume(haveDriver, "DuckDB JDBC driver not on the test classpath")
    val conn = DriverManager.getConnection("jdbc:duckdb:")
    try f(conn) finally conn.close()
  }

  /** INSERT the formatted literal into a one-column table of `sqlType`
    * and read it back as a JDBC object. */
  private def roundTrip(conn: java.sql.Connection, sqlType: String,
      v: Any): AnyRef = {
    val st = conn.createStatement()
    try {
      st.execute("DROP TABLE IF EXISTS rt")
      st.execute(s"CREATE TABLE rt(v $sqlType)")
      st.execute(s"INSERT INTO rt VALUES (${Repairer.formatValue(v)})")
      val rs = st.executeQuery("SELECT v FROM rt")
      assert(rs.next())
      rs.getObject(1)
    } finally st.close()
  }

  private val params = Parameters.default.withMinSuccessfulTests(200)
  private def pass(p: Prop): Unit = {
    val r = check(params, p)
    assert(r.passed, r.status.toString)
  }

  test("VARCHAR: arbitrary strings round-trip byte-exact (injection-proof)") {
    withConn { conn =>
      // bias toward SQL-hostile shapes on top of arbitrary unicode
      val nasty = Gen.oneOf(
        Gen.asciiPrintableStr, org.scalacheck.Arbitrary.arbitrary[String],
        Gen.oneOf("'", "''", "'); DROP TABLE rt; --", "a'b''c",
          "line1\nline2\ttab", "emoji ☃ 😀", ""))
      pass(Prop.forAll(nasty) { s =>
        // DuckDB VARCHAR rejects interior NUL bytes (engine limit, not a
        // formatter concern); formatValue keeps them for PG's sake
        s.exists(c => c == '\u0000' || Character.isSurrogate(c)) ||
          roundTrip(conn, "VARCHAR", s).asInstanceOf[String] == s
      })
    }
  }

  test("BIGINT / DOUBLE / DECIMAL / BOOLEAN round-trip exactly") {
    withConn { conn =>
      pass(Prop.forAll(org.scalacheck.Arbitrary.arbitrary[Long]) { n =>
        roundTrip(conn, "BIGINT", n).asInstanceOf[Number].longValue == n
      })
      // shortest-repr doubles (incl. subnormals and extremes) must parse
      // back to the IDENTICAL bits
      val doubles = Gen.oneOf(
        org.scalacheck.Arbitrary.arbitrary[Double].suchThat(d => !d.isNaN && !d.isInfinite),
        Gen.oneOf(0.0, -0.0, 1.7976931348623157e308, -1.7976931348623157e308,
          4.9e-324, 2.2250738585072014e-308, 1.0 / 3.0, -1e-5))
      pass(Prop.forAll(doubles) { d =>
        val back = roundTrip(conn, "DOUBLE", d).asInstanceOf[Number].doubleValue
        // -0.0 may come back as +0.0 (engine normalization; SQL '='
        // equates them). DuckDB's literal parser is additionally not
        // correctly-rounded (measured 1-ULP error on e.g.
        // -0.0018572652601243603; Postgres strtod IS correctly rounded,
        // so the real sink round-trips exactly) — assert within 1 ULP
        if (d == 0.0) back == 0.0
        else math.abs(java.lang.Double.doubleToRawLongBits(back) -
          java.lang.Double.doubleToRawLongBits(d)) <= 1L
      })
      val decimals = Gen.chooseNum(-999999999999999L, 999999999999999L)
        .map(n => new java.math.BigDecimal(java.math.BigInteger.valueOf(n), 4))
      pass(Prop.forAll(decimals) { d =>
        roundTrip(conn, "DECIMAL(20,4)", d)
          .asInstanceOf[java.math.BigDecimal].compareTo(d) == 0
      })
      assert(roundTrip(conn, "BOOLEAN", true) == java.lang.Boolean.TRUE)
      assert(roundTrip(conn, "BOOLEAN", false) == java.lang.Boolean.FALSE)
    }
  }

  test("non-finite doubles: quoted spelling survives where bare NaN is a syntax error") {
    withConn { conn =>
      assert(roundTrip(conn, "DOUBLE", Double.NaN)
        .asInstanceOf[Number].doubleValue.isNaN)
      assert(roundTrip(conn, "DOUBLE", Double.PositiveInfinity)
        .asInstanceOf[Number].doubleValue == Double.PositiveInfinity)
      assert(roundTrip(conn, "DOUBLE", Double.NegativeInfinity)
        .asInstanceOf[Number].doubleValue == Double.NegativeInfinity)
      assert(roundTrip(conn, "REAL", Float.NaN)
        .asInstanceOf[Number].floatValue.isNaN)
    }
  }

  test("TIMESTAMP (µs precision) and DATE round-trip") {
    withConn { conn =>
      // compare through epoch microseconds / epoch days computed BY THE
      // ENGINE — both sides proleptic Gregorian, sidestepping the
      // java.sql legacy Julian cutover that corrupts getTimestamp for
      // pre-1582 values (a reader artifact, not a literal one)
      def epochBack(sqlType: String, lit: String, expr: String): Long = {
        val st = conn.createStatement()
        try {
          st.execute("DROP TABLE IF EXISTS rt")
          st.execute(s"CREATE TABLE rt(v $sqlType)")
          st.execute(s"INSERT INTO rt VALUES ($lit)")
          val rs = st.executeQuery(s"SELECT $expr FROM rt")
          assert(rs.next()); rs.getLong(1)
        } finally st.close()
      }
      // µs-granular instants across years 1..9999 (incl. exact midnight,
      // the LocalDateTime.toString truncation trap)
      val micros = Gen.chooseNum(-62135596800000L, 253402300799000L)
        .map(ms => java.sql.Timestamp.from(
          java.time.Instant.ofEpochMilli(ms).plusNanos(1000 * (ms % 1000).abs)))
      pass(Prop.forAll(micros) { t =>
        val i = t.toInstant
        epochBack("TIMESTAMP", Repairer.formatValue(t), "epoch_us(v)") ==
          i.getEpochSecond * 1000000L + i.getNano / 1000
      })
      assert(epochBack("TIMESTAMP",
        Repairer.formatValue(java.sql.Timestamp.from(java.time.Instant.EPOCH)),
        "epoch_us(v)") == 0L, "exact midnight must not be a syntax error")

      val dates = Gen.chooseNum(-719162L, 2932896L) // LocalDate 0001..9999
        .map(java.time.LocalDate.ofEpochDay)
      pass(Prop.forAll(dates) { d =>
        epochBack("DATE", Repairer.formatValue(d),
          "datediff('day', DATE '1970-01-01', v)") == d.toEpochDay
      })
    }
  }

  test("UUID and JSON-collection literals round-trip") {
    withConn { conn =>
      val uuids = Gen.uuid
      pass(Prop.forAll(uuids) { u =>
        roundTrip(conn, "UUID", u).toString == u.toString.toLowerCase
      })
      // collections format as JSON strings; a VARCHAR target keeps them
      // verbatim and DuckDB's json extension-free CAST validates shape
      val v = roundTrip(conn, "VARCHAR",
        scala.collection.Seq(1, 2, 3)).asInstanceOf[String]
      assert(v == "[1, 2, 3]")
      val m = roundTrip(conn, "VARCHAR",
        scala.collection.Map("k" -> "it's")).asInstanceOf[String]
      assert(m == """{"k": "it's"}""")
    }
  }

  test("INTERVAL literal is accepted and preserves seconds") {
    withConn { conn =>
      val st = conn.createStatement()
      try {
        st.execute("DROP TABLE IF EXISTS rt")
        st.execute("CREATE TABLE rt(v INTERVAL)")
        st.execute("INSERT INTO rt VALUES (" +
          Repairer.formatValue(java.time.Duration.ofSeconds(3725)) + ")")
        val rs = st.executeQuery("SELECT datepart('second', v) + 60*datepart('minute', v) + 3600*datepart('hour', v) FROM rt")
        assert(rs.next() && rs.getLong(1) == 3725L)
      } finally st.close()
    }
  }

  test("bytea stays Postgres-dialect (documented, not silently wrong)") {
    // DuckDB blob literals use per-byte '\xAB' escape inside the string;
    // the repairer targets the reference's Postgres sink, whose bytea
    // hex form is pinned here byte-for-byte
    assert(Repairer.formatValue(Array[Byte](0x0a, 0x00, -1)) == "'\\x0a00ff'")
  }
}
