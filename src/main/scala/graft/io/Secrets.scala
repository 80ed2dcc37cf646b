package graft.io

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Credential resolution (SURVEY.md §2 O2). The reference pulls one
  * JSON blob per tenant from AWS Secrets Manager
  * (`gule_test_job.py:44-51`) with keys `username`, `password`,
  * `db_name`, `table_name` (`configs.json:4-9`). The engine keeps the
  * same lookup contract behind a trait; this zero-egress environment
  * ships map- and file-backed implementations, and a cloud deployment
  * would add an API-backed one with the same signature.
  */
trait SecretsProvider {
  /** Returns the named secret's key/value blob; throws
    * NoSuchElementException with the secret named when absent.
    */
  def secret(name: String): Map[String, String]
}

/** In-memory provider (tests, programmatic use). */
final case class MapSecretsProvider(secrets: Map[String, Map[String, String]])
    extends SecretsProvider {
  def secret(name: String): Map[String, String] =
    secrets.getOrElse(name,
      throw new NoSuchElementException(s"secret '$name' not found"))
}

/** File-backed provider: one JSON object of named secret blobs,
  * `{"tenant-secret": {"username": "...", "password": "...", ...}}` —
  * the local analogue of a secrets store.
  */
final class FileSecretsProvider(path: String) extends SecretsProvider {
  private val all: Map[String, Map[String, String]] = {
    val root = new ObjectMapper()
      .readTree(new String(Files.readAllBytes(Paths.get(path)), "UTF-8"))
    root.properties().asScala.map { e =>
      e.getKey -> e.getValue.properties().asScala
        .map(f => f.getKey -> f.getValue.asText()).toMap
    }.toMap
  }
  def secret(name: String): Map[String, String] =
    all.getOrElse(name,
      throw new NoSuchElementException(s"secret '$name' not found in $path"))
}

/** Provider used when no secrets are configured: any lookup is an
  * explicit error, never an empty credential.
  */
object NoSecretsProvider extends SecretsProvider {
  def secret(name: String): Map[String, String] =
    throw new NoSuchElementException(
      s"secret '$name' requested but no secrets provider is configured")
}

object Secrets {
  /** Assembles JDBC options the way the reference assembles them: URL
    * from the Database block's endpoint/port + the secret's db_name
    * (`data.tf:17-21`), table and credentials from the secret
    * (`gule_test_job.py:82-94`).
    */
  def jdbcFromSecret(
      endpoint: String,
      port: String,
      secret: Map[String, String],
      driver: String = "org.mariadb.jdbc.Driver"): JdbcOptions = {
    def req(k: String): String = secret.getOrElse(k,
      throw new IllegalArgumentException(s"secret is missing required key '$k'"))
    // MariaDB Connector/J 3.x rejects the jdbc:mysql scheme unless
    // permitMysqlScheme is set (2.x accepted it); the reference's URL
    // template uses the mysql scheme, so keep it and add the flag when
    // the MariaDB driver will serve it
    val params =
      if (driver.startsWith("org.mariadb")) "?permitMysqlScheme" else ""
    JdbcOptions(
      url = s"jdbc:mysql://$endpoint:$port/${req("db_name")}$params",
      dbtable = req("table_name"),
      user = req("username"),
      password = req("password"),
      driver = driver)
  }
}
