package graft

import graft.operators.AuditJson

/** Conformance port of the reference's JSON parse golden test
  * (`TestJson.java:21-33`): a realistic Ranger kafka audit record must
  * parse with `repoType == 9` and `reqUser == "wdyson"`; unknown
  * properties are ignored; malformed lines yield no rows (not errors).
  */
class AuditJsonSpec extends SparkSpec {
  import spark.implicits._

  // Ranger audit shape (Apache Ranger's AuthzAuditEvent JSON layout, as in
  // the reference's golden record audit-examples/kafka-1.json) — authored
  // here field-by-field from the Audit schema, not copied.
  private val golden =
    """{"repoType":9,"repo":"cm_kafka","reqUser":"wdyson",""" +
      """"evtTime":"2021-04-29 16:08:31.025","access":"publish","resource":"test-topic",""" +
      """"resType":"topic","action":"publish","result":1,"agent":"kafka","policy":5,""" +
      """"enforcer":"ranger-acl","cliIP":"10.0.0.1","agentHost":"broker-1.example.com",""" +
      """"logType":"RangerAudit","id":"8a6c6e32-d0ee-4e32-a39a-a6bc0a1e21c0-1",""" +
      """"seq_num":1,"event_count":1,"event_dur_ms":0,"tags":[],""" +
      """"cluster_name":"cluster","policy_version":3,"extra_unknown_key":{"x":1}}"""

  test("golden Ranger record parses with correct fields") {
    val rows = AuditJson.parse(Seq(golden).toDF("value")).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Int]("repoType") == 9)
    assert(r.getAs[String]("reqUser") == "wdyson")
    assert(r.getAs[java.sql.Timestamp]("evtTime").getTime == 1619712511025L)
    assert(r.getAs[Int]("result") == 1)
    assert(r.getSeq[String](r.fieldIndex("tags")).isEmpty)
  }

  test("malformed and user-less lines are dropped, not failed") {
    val lines = Seq(
      "not json at all {{{",
      """{"repoType":9,"result":1}""", // valid JSON, null reqUser
      golden
    ).toDF("value")
    val out = AuditJson.parse(lines).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("reqUser") == "wdyson")
  }

  test("parse accounting: corrupt / missing-user / good counted in one pass") {
    // the partially-corrupt line (bad evtTime, good reqUser) is KEPT by
    // parse under partial-results parsing, so it must count as good and
    // must NOT be quarantined — otherwise it would be double-processed
    val partial = """{"reqUser":"bob","evtTime":"not a time","repoType":1,"result":0}"""
    val lines = Seq(
      "not json at all {{{",
      "{broken",
      """{"repoType":9,"result":1}""", // valid JSON, null reqUser
      partial,
      golden
    ).toDF("value")
    val kept = AuditJson.parse(lines).count()
    val s = AuditJson.parseStats(lines).collect().head
    assert(s.getAs[Long]("n_lines") == 5L)
    assert(s.getAs[Long]("n_corrupt") == 2L)
    assert(s.getAs[Long]("n_missing_user") == 1L)
    assert(s.getAs[Long]("n_good") == 2L)
    assert(s.getAs[Long]("n_good") == kept) // reconciles with parse()

    val dead = AuditJson.corruptLines(lines).as[String].collect().toSet
    assert(dead == Set("not json at all {{{", "{broken"))
  }
}
