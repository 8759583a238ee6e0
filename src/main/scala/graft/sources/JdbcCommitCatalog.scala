package graft.sources

import java.sql.{Connection, DriverManager, SQLException}

/** [[Catalog]] backed by any JDBC database — the production binding of
  * the commit catalog, playing exactly the role the reference hands to
  * DuckLake's catalog database (a real Postgres:
  * /root/reference/dags/utils_db.py:6-60 opens the Neon connection the
  * DAGs commit through). Point it at `jdbc:postgresql://…` in
  * production or an embedded database in tests; the SQL is ANSI and
  * the claim primitive is portable: one INSERT into a table with a
  * PRIMARY KEY on (root, version) succeeds for exactly one writer —
  * the database's unique-key enforcement IS the CAS, the same
  * mechanism DuckLake, Iceberg catalogs, and Delta commit services
  * rely on.
  *
  * Connection-per-operation: commits are rare (one per table version)
  * and the catalog row is tiny, so pooling is the caller's concern if
  * it ever matters; stateless connections also make the catalog safe
  * under many concurrent writer threads/processes with zero shared
  * mutable state in this class.
  *
  * @param url    JDBC URL (driver resolved via JDBC 4 ServiceLoader)
  * @param props  connection properties (user, password, …)
  * @param table  catalog table name; created on first use if absent
  */
final class JdbcCommitCatalog(url: String,
    props: java.util.Properties = new java.util.Properties(),
    table: String = "graft_commits") extends Catalog {

  // the table name is interpolated into SQL — restrict it to a plain
  // identifier so a config value can never smuggle in SQL
  require(table.matches("[A-Za-z][A-Za-z0-9_]{0,120}"),
    s"catalog table name must be a plain SQL identifier, got '$table'")

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(url, props)
    try f(c) finally c.close()
  }

  // Create the catalog table if this database doesn't have it yet.
  // "IF NOT EXISTS" isn't portable (Derby lacks it), so attempt the
  // CREATE and swallow exactly the duplicate-object error. Losing a
  // concurrent-create race lands in the same arm.
  withConn { c =>
    val st = c.createStatement()
    try st.executeUpdate(
      s"""CREATE TABLE $table (
         |  root VARCHAR(1024) NOT NULL,
         |  version BIGINT NOT NULL,
         |  objkey VARCHAR(512) NOT NULL,
         |  PRIMARY KEY (root, version))""".stripMargin)
    catch {
      case e: SQLException if isDuplicateObject(e) => ()
    } finally st.close()
  }

  /** Table-already-exists, across dialects: Derby X0Y32, Postgres
    * 42P07 (duplicate_table), MySQL/H2 42S01.
    */
  private def isDuplicateObject(e: SQLException): Boolean =
    Set("X0Y32", "42P07", "42S01")(e.getSQLState)

  /** Unique-key violation — SQLState class 23 (integrity constraint)
    * in every mainstream dialect; the lost claim race.
    */
  private def isDuplicateKey(e: SQLException): Boolean =
    Option(e.getSQLState).exists(_.startsWith("23"))

  override def claim(root: String, version: Long, key: String): Boolean =
    withConn { c =>
      val ps = c.prepareStatement(
        s"INSERT INTO $table (root, version, objkey) VALUES (?, ?, ?)")
      try {
        ps.setString(1, root); ps.setLong(2, version); ps.setString(3, key)
        ps.executeUpdate()
        true
      } catch {
        case e: SQLException if isDuplicateKey(e) => false
      } finally ps.close()
    }

  override def versions(root: String): Seq[Long] = withConn { c =>
    val ps = c.prepareStatement(
      s"SELECT version FROM $table WHERE root = ?")
    try {
      ps.setString(1, root)
      val rs = ps.executeQuery()
      val out = Seq.newBuilder[Long]
      while (rs.next()) out += rs.getLong(1)
      rs.close()
      out.result()
    } finally ps.close()
  }

  override def keyFor(root: String, version: Long): Option[String] =
    withConn { c =>
      val ps = c.prepareStatement(
        s"SELECT objkey FROM $table WHERE root = ? AND version = ?")
      try {
        ps.setString(1, root); ps.setLong(2, version)
        val rs = ps.executeQuery()
        val out = if (rs.next()) Some(rs.getString(1)) else None
        rs.close()
        out
      } finally ps.close()
    }

  override def drop(root: String, version: Long): Unit = withConn { c =>
    val ps = c.prepareStatement(
      s"DELETE FROM $table WHERE root = ? AND version = ?")
    try {
      ps.setString(1, root); ps.setLong(2, version)
      ps.executeUpdate()
      ()
    } finally ps.close()
  }
}
