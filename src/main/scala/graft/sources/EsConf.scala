package graft.sources

import org.apache.spark.sql.SparkSession

/** Typed builder for the elasticsearch-hadoop connector's session conf
  * block — the TLS / auth / batching settings the reference hardcodes
  * on its SparkSession (HouseholdRetentionProcessing.scala:104-115:
  * `es.net.ssl`, `es.net.ssl.cert.allow.self.signed`,
  * `es.index.auto.create`, `es.nodes`, `es.nodes.wan.only`,
  * `es.write.operation`, `es.batch.size.bytes`,
  * `es.batch.size.entries`, `es.http.timeout`, `es.http.retries`) and
  * feeds from the pod env contract (pod.yaml:14-31). A migration off
  * the reference keeps its deployment env untouched: `EsConf.fromEnv`
  * reads the same variable names, `settings` emits the same keys for
  * the same public connector, and [[applyTo]] installs them on a
  * session builder exactly where the reference put them.
  *
  * Defaults mirror the reference's (HouseholdRetentionProcessing
  * .scala:42-53) except `ssl`/`allowSelfSigned`, which default OFF —
  * the reference ships `es.net.ssl.cert.allow.self.signed=true`
  * unconditionally with a checked-in CA (`es_ca.cer`), which disables
  * the protection TLS exists for; here trusting a private CA is the
  * explicit `truststore(...)` path and self-signed tolerance is an
  * explicit opt-in.
  *
  * Pure settings assembly — no connector types, so it compiles and
  * tests in this sandbox (zero egress, no ES jar) and hands a plain
  * `Map[String, String]` to `EsSpark.esJsonRDD` / `saveToEsWithMeta`
  * through the [[EsTransport]] seam.
  */
final case class EsConf(
    nodes: String = "localhost",
    port: Int = 9200,
    ssl: Boolean = false,
    allowSelfSigned: Boolean = false,
    truststoreLocation: Option[String] = None,
    truststorePass: Option[String] = None,
    authUser: Option[String] = None,
    authPass: Option[String] = None,
    wanOnly: Boolean = false,
    autoCreate: Boolean = false,
    writeOperation: String = "upsert",
    batchSizeBytes: String = "1mb",
    batchSizeEntries: Int = 1000,
    httpTimeout: String = "1m",
    httpRetries: Int = 3) {

  require(nodes.nonEmpty, "es nodes must be non-empty")
  require(port > 0 && port <= 65535, s"es port out of range: $port")
  require(batchSizeEntries > 0,
    s"es.batch.size.entries must be positive: $batchSizeEntries")
  require(httpRetries >= 0, s"es.http.retries must be >= 0: $httpRetries")
  require(Set("index", "create", "update", "upsert")(writeOperation),
    s"unknown es.write.operation: $writeOperation")
  require(authUser.isEmpty == authPass.isEmpty,
    "es auth needs BOTH user and pass (or neither)")
  require(truststorePass.isEmpty || truststoreLocation.nonEmpty,
    "truststore pass without a truststore location")

  /** The `es.*` settings map — the same keys the reference sets,
    * minus defaults-only noise (every key is emitted explicitly so a
    * diff against the reference's block is 1:1). */
  def settings: Map[String, String] = {
    val base = Map(
      "es.nodes" -> nodes,
      "es.port" -> port.toString,
      "es.nodes.wan.only" -> wanOnly.toString,
      "es.index.auto.create" -> autoCreate.toString,
      "es.write.operation" -> writeOperation,
      "es.batch.size.bytes" -> batchSizeBytes,
      "es.batch.size.entries" -> batchSizeEntries.toString,
      "es.http.timeout" -> httpTimeout,
      "es.http.retries" -> httpRetries.toString,
      "es.net.ssl" -> ssl.toString) ++
      (if (ssl && allowSelfSigned)
        Map("es.net.ssl.cert.allow.self.signed" -> "true") else Map.empty)
    base ++
      truststoreLocation.map("es.net.ssl.truststore.location" -> _) ++
      truststorePass.map("es.net.ssl.truststore.pass" -> _) ++
      authUser.map("es.net.http.auth.user" -> _) ++
      authPass.map("es.net.http.auth.pass" -> _)
  }

  /** Install on a session builder — the reference's `.config(...)`
    * block (HouseholdRetentionProcessing.scala:104-115) as one call. */
  def applyTo(b: SparkSession.Builder): SparkSession.Builder =
    settings.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}

object EsConf {

  /** The reference's env contract (pod.yaml:14-31,
    * HouseholdRetentionProcessing.scala:70-87), plus the TLS/auth
    * variables the hardcoded block kept out of it: `ES_SSL`,
    * `ES_SSL_ALLOW_SELF_SIGNED`, `ES_CA_TRUSTSTORE`(`_PASS`),
    * `ES_USER`/`ES_PASS`. Unset variables keep the defaults, exactly
    * like the reference's `envOrElse` chain. */
  def fromEnv(env: String => Option[String] = sys.env.get): EsConf = {
    val d = EsConf()
    EsConf(
      nodes = env("ES_HOST").getOrElse(d.nodes),
      port = env("ES_PORT").map(_.toInt).getOrElse(d.port),
      ssl = env("ES_SSL").map(_.toBoolean).getOrElse(d.ssl),
      allowSelfSigned = env("ES_SSL_ALLOW_SELF_SIGNED").map(_.toBoolean)
        .getOrElse(d.allowSelfSigned),
      truststoreLocation = env("ES_CA_TRUSTSTORE"),
      truststorePass = env("ES_CA_TRUSTSTORE_PASS"),
      authUser = env("ES_USER"),
      authPass = env("ES_PASS"),
      writeOperation = env("ES_WRITE_OPERATION").getOrElse(d.writeOperation),
      batchSizeBytes = env("ES_WRITE_BATCH_SIZE_BYTES")
        .getOrElse(d.batchSizeBytes),
      batchSizeEntries = env("ES_WRITE_BATCH_SIZE_ENTRIES").map(_.toInt)
        .getOrElse(d.batchSizeEntries),
      httpTimeout = env("ES_REQUEST_TIMEOUT").getOrElse(d.httpTimeout),
      httpRetries = env("ES_REQUEST_RETRY_COUNT").map(_.toInt)
        .getOrElse(d.httpRetries))
  }
}
