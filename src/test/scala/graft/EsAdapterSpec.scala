package graft

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.sources._

import graft.sources.{EsAdapter, EsConf, EsDsl, EsTransport}

/** Contract tests for the ES adapter seam: generated query DSL must
  * match the reference's structures node-for-node (parsed JSON
  * equality, not string diffs), the pushdown translation must keep
  * untranslatable residuals, and reads/writes must cross the
  * transport with the connector's exact shapes. No live ES exists in
  * the sandbox — the transport is the mock; a deployment binds the
  * same trait to elasticsearch-spark (EsAdapter scaladoc). */
class EsAdapterSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()
  private def assertJson(actual: String, expected: String): Unit =
    assert(mapper.readTree(actual) == mapper.readTree(expected),
      s"\nactual:   $actual\nexpected: $expected")

  // ---- DSL structure vs the reference (:170-221, :315-341, :352-391) --

  test("householdsWithoutRetention matches the reference probe verbatim") {
    assertJson(EsDsl.householdsWithoutRetention("acme", 10000),
      """{
        "size": 0,
        "_source": ["household.household_id"],
        "query": { "constant_score": { "filter": { "bool": {
          "must": [
            {"term": {"client_code": "acme"}},
            {"has_child": {"type": "encounter", "query": {"bool": {
              "must": [
                {"term": {"client_code": "acme"}},
                {"range": {"admit_date": {"gte": "now-4y", "lte": "now"}}}
              ]}}}},
            {"exists": {"field": "household.household_id"}}
          ],
          "must_not": [
            {"nested": {
              "path": "household_retention_history",
              "query": {"exists":
                {"field": "household_retention_history.retained"}}}}
          ]}}}},
        "aggs": {"all_households": {"terms": {
          "field": "household.household_id",
          "size": 10000,
          "order": {"_term": "asc"}}}}
      }""")
  }

  test("encounterSourceQuery carries term+range+has_parent (S2/J9)") {
    assertJson(EsDsl.encounterSourceQuery("acme"),
      """{"query": {"constant_score": {"filter": {"bool": {"must": [
          {"term": {"client_code": "acme"}},
          {"range": {"admit_date": {"gte": "now-5y", "lte": "now"}}},
          {"has_parent": {"parent_type": "person", "query": {"bool": {
            "must": [
              {"term": {"client_code": "acme"}},
              {"exists": {"field": "household.household_id"}}],
            "must_not": [
              {"nested": {"path": "household_retention_history",
                "query": {"exists":
                  {"field": "household_retention_history.retained"}}}}]
          }}}}]}}}}}""")
  }

  test("personsWithoutRetention is the size-0 count gate (A6)") {
    val j = mapper.readTree(EsDsl.personsWithoutRetention("acme"))
    assert(j.get("size").asInt == 0)
    assert(j.at("/query/constant_score/filter/bool/must/0/term/client_code")
      .asText == "acme")
    assert(j.at("/query/constant_score/filter/bool/must_not/0/nested/path")
      .asText == "household_retention_history")
  }

  test("string values are structurally escaped, never interpolated raw") {
    assertJson(EsDsl.term("f", "a\"b\\c\nd").render,
      "{\"term\": {\"f\": \"a\\\"b\\\\c\\nd\"}}")
  }

  // ---- Spark Filter pushdown -----------------------------------------

  test("pushdown translates the P5-P7 filter classes") {
    assertJson(EsDsl.fromFilter(EqualTo("client_code", "acme")).get.render,
      """{"term": {"client_code": "acme"}}""")
    assertJson(EsDsl.fromFilter(IsNotNull("household_id")).get.render,
      """{"exists": {"field": "household_id"}}""")
    assertJson(EsDsl.fromFilter(
      And(GreaterThanOrEqual("admit_date", "2020-01-01"),
          LessThanOrEqual("admit_date", "2024-01-01"))).get.render,
      """{"bool": {"must": [
        {"range": {"admit_date": {"gte": "2020-01-01"}}},
        {"range": {"admit_date": {"lte": "2024-01-01"}}}]}}""")
    assertJson(EsDsl.fromFilter(In("seg", Array("A", "B"))).get.render,
      """{"terms": {"seg": ["A", "B"]}}""")
  }

  test("three-valued-logic hazards stay residual or null-safe") {
    // general NOT must NOT push: ES must_not(term) matches docs MISSING
    // the field, but SQL NOT(x=1) filters null-x rows — pushing it
    // would return extra rows with no residual re-check
    assert(EsDsl.fromFilter(Not(EqualTo("x", "1"))).isEmpty)
    assert(EsDsl.fromFilter(Not(GreaterThan("x", "1"))).isEmpty)
    // the null-test negations ARE safe, and translate exactly
    assertJson(EsDsl.fromFilter(Not(IsNull("x"))).get.render,
      """{"exists": {"field": "x"}}""")
    assertJson(EsDsl.fromFilter(Not(IsNotNull("x"))).get.render,
      """{"bool": {"must_not": [{"exists": {"field": "x"}}]}}""")
    // IN drops null elements (SQL IN never matches null); all-null
    // degenerates to match-nothing, not an invalid empty terms array
    assertJson(EsDsl.fromFilter(In("seg", Array("A", null))).get.render,
      """{"terms": {"seg": ["A"]}}""")
    assertJson(EsDsl.fromFilter(In("seg", Array[Any](null))).get.render,
      """{"bool": {"must_not": [{"match_all": {}}]}}""")
    // null-valued equality is never true — residual, not a term query
    assert(EsDsl.fromFilter(EqualTo("x", null)).isEmpty)
  }

  test("untranslatable filters stay residual; the rest still push") {
    val (dsl, residual) = EsDsl.fromFilters(Seq(
      EqualTo("client_code", "acme"),
      StringContains("name", "x"), // no ES equivalent here → residual
      IsNotNull("household_id")))
    assert(residual == Seq(StringContains("name", "x")))
    val j = mapper.readTree(dsl)
    val must = j.at("/query/constant_score/filter/bool/must")
    assert(must.size == 2, dsl)
  }

  test("empty filter set pushes match_all") {
    val (dsl, residual) = EsDsl.fromFilters(Nil)
    assert(residual.isEmpty)
    assertJson(dsl, """{"query": {"constant_score":
      {"filter": {"match_all": {}}}}}""")
  }

  // ---- transport contract --------------------------------------------

  private class MockTransport(canned: Seq[String]) extends EsTransport {
    var searches = Vector.empty[(String, String, Map[String, String])]
    var upserts = Vector.empty[(String, Map[String, String], Seq[(String, String)])]
    def searchJson(resource: String, query: String,
                   options: Map[String, String]): RDD[(String, String)] = {
      searches :+= ((resource, query, options))
      spark.sparkContext.parallelize(canned.zipWithIndex
        .map { case (s, i) => (i.toString, s) })
    }
    def upsertWithMeta(docs: RDD[(String, String)], resource: String,
                       conf: Map[String, String]): Unit =
      upserts :+= ((resource, conf, docs.collect().toSeq.sortBy(_._1)))
  }

  test("encounter scan crosses the seam with the esJsonRDD shape") {
    val mock = new MockTransport(Seq(
      """{"person_id": 1, "admit_date": "2023-04-01"}""",
      """{"person_id": 2, "admit_date": "2023-05-01"}"""))
    val df = new EsAdapter(spark, mock, "idx").encounters("acme")
    assert(df.count() == 2)
    assert(df.columns.sorted.toSeq == Seq("admit_date", "person_id"))
    val (resource, query, opts) = mock.searches.head
    assert(resource == "idx/encounter")
    assert(opts("es.read.source.filter") == "admit_date")
    assert(opts("es.read.metadata") == "true")
    assert(mapper.readTree(query) ==
      mapper.readTree(EsDsl.encounterSourceQuery("acme")))
  }

  test("writeRetention upserts whole-array replacement docs") {
    val history = Seq(
      (7L, 200L, 300L, "2020-01-01", "2020-06-30", true),
      (7L, 100L, 150L, "2019-01-01", "2019-05-31", false),
      (9L, 400L, 500L, "2021-01-01", "2021-06-30", true))
      .toDF("person_id", "start_date_epoch", "end_date_epoch",
            "start_date", "end_date", "retained")
    val mock = new MockTransport(Nil)
    new EsAdapter(spark, mock, "idx").writeRetention(history)
    val (resource, conf, docs) = mock.upserts.head
    assert(resource == "idx/person")
    assert(conf("es.write.operation") == "upsert")
    assert(docs.map(_._1) == Seq("7", "9"))
    // person 7: BOTH ranges in one doc (whole-array replace), ordered
    // by range start regardless of input order
    assertJson(docs.head._2,
      """{"household_retention_history": [
        {"date_range": {"gte": 100, "lte": 150},
         "date_range_alt": {"gte": "2019-01-01", "lte": "2019-05-31"},
         "retained": false},
        {"date_range": {"gte": 200, "lte": 300},
         "date_range_alt": {"gte": "2020-01-01", "lte": "2020-06-30"},
         "retained": true}]}""")
  }

  test("EsConf emits the reference's session conf block 1:1") {
    // the hardcoded block at HouseholdRetentionProcessing.scala:104-115
    // (ssl on, self-signed tolerated, defaults elsewhere)
    val s = EsConf(nodes = "es.internal", ssl = true,
      allowSelfSigned = true).settings
    assert(s("es.net.ssl") == "true")
    assert(s("es.net.ssl.cert.allow.self.signed") == "true")
    assert(s("es.index.auto.create") == "false")
    assert(s("es.nodes") == "es.internal")
    assert(s("es.nodes.wan.only") == "false")
    assert(s("es.write.operation") == "upsert")
    assert(s("es.batch.size.bytes") == "1mb")
    assert(s("es.batch.size.entries") == "1000")
    assert(s("es.http.timeout") == "1m")
    assert(s("es.http.retries") == "3")
    // self-signed tolerance is opt-in: absent unless ssl AND the flag
    assert(!EsConf().settings.contains("es.net.ssl.cert.allow.self.signed"))
    // CA truststore + basic auth (the es_ca.cer migration path)
    val t = EsConf(ssl = true, truststoreLocation = Some("file:///ca.jks"),
      truststorePass = Some("pw"), authUser = Some("u"),
      authPass = Some("p")).settings
    assert(t("es.net.ssl.truststore.location") == "file:///ca.jks")
    assert(t("es.net.ssl.truststore.pass") == "pw")
    assert(t("es.net.http.auth.user") == "u")
    assert(t("es.net.http.auth.pass") == "p")
  }

  test("EsConf.fromEnv reads the pod env contract; invalid combos loud") {
    val env = Map(
      "ES_HOST" -> "exp-elasticsearch.default.svc.cluster.local",
      "ES_PORT" -> "9200",
      "ES_REQUEST_TIMEOUT" -> "5m",
      "ES_REQUEST_RETRY_COUNT" -> "10",
      "ES_WRITE_BATCH_SIZE_BYTES" -> "1mb",
      "ES_SSL" -> "true")
    val c = EsConf.fromEnv(env.get)
    assert(c.nodes == "exp-elasticsearch.default.svc.cluster.local")
    assert(c.httpTimeout == "5m" && c.httpRetries == 10)
    assert(c.ssl && !c.allowSelfSigned)
    // unset vars keep reference defaults
    assert(c.writeOperation == "upsert" && c.batchSizeEntries == 1000)
    intercept[IllegalArgumentException] { EsConf(writeOperation = "delete") }
    intercept[IllegalArgumentException] { EsConf(authUser = Some("u")) }
    intercept[IllegalArgumentException] { EsConf(port = 0) }
    intercept[IllegalArgumentException] { EsConf(truststorePass = Some("x")) }
  }
}
