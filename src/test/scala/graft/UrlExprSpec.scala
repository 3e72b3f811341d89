package graft

import org.apache.spark.sql.functions._
import graft.plans.UrlExpressions

/** The one-pass url_parts kernel must agree with Spark's parse_url on
  * every part, including the degenerate shapes a real crawl corpus
  * contains (no query, fragments, missing keys, unparseable URLs). */
class UrlExprSpec extends SparkTestBase {
  import spark.implicits._

  private val edgeCases = Seq(
    "https://data.example.org/a/b?cust=7&status=O",
    "https://data.example.org/a/b?status=O&cust=7",
    "http://host.example.com",                    // no path, no query
    "https://host/path#frag",                     // fragment, no query
    "https://host/path?other=1",                  // query without the key
    "https://host/path?cust=",                    // key with empty value
    "https://user:pw@host:8443/p?cust=x%20y#f",   // userinfo, port, escapes
    "ftp://files.example.net/pub/doc.txt",
    "not a url at all",                           // unparseable
    "//relative/no/scheme",
    "https://host/path?cust=1&cust=2",            // repeated key: first wins
    // URI-ILLEGAL bytes after the authority (ADVICE r10 #3): these must
    // take the slow path and come back all-NULL like the URI fallback,
    // not be accepted by the byte scan
    "https://host/pa th?cust=1",                  // space in path
    "https://host/path?cust=a|b",                 // '|' in query
    "https://host/p\"q",                          // '"' in path
    "https://host/p?cust=<x>",                    // '<'/'>' in query
    "https://host/p%2",                           // truncated escape
    "https://host/p%zz",                          // non-hex escape
    "https://host/p#f#g",                         // '#' inside fragment
    "https://host/p{q}",                          // braces in path
    "https://host/p\\q",                          // backslash in path
    "https://host/p?cust=ok%20fine#x"             // LEGAL escapes: fast path
  )

  private def compare(urls: Seq[String]): Unit = {
    val df = urls.toDF("url")
      .withColumn("p", UrlExpressions.urlParts(col("url"), "cust"))
      .select(col("url"),
        col("p").getItem(0).as("k_scheme"),
        col("p").getItem(1).as("k_host"),
        col("p").getItem(2).as("k_path"),
        col("p").getItem(3).as("k_cust"),
        // try_parse_url: ANSI parse_url THROWS on an unparseable URL;
        // the kernel (like a curation pipeline) must tolerate it instead
        expr("try_parse_url(url, 'PROTOCOL')").as("s_scheme"),
        expr("try_parse_url(url, 'HOST')").as("s_host"),
        expr("try_parse_url(url, 'PATH')").as("s_path"),
        expr("try_parse_url(url, 'QUERY', 'cust')").as("s_cust"))
    df.collect().foreach { r =>
      Seq("scheme", "host", "path", "cust").foreach { part =>
        assert(r.getAs[String](s"k_$part") == r.getAs[String](s"s_$part"),
          s"$part mismatch for url=${r.getAs[String]("url")}")
      }
    }
  }

  test("url_parts == parse_url on edge-case URLs") { compare(edgeCases) }

  test("url_parts == parse_url on the fn_url fixture corpus") {
    val urls = Tables.orders(spark, sf)
      .select(concat(lit("https://data.example.org/"),
        lower(regexp_replace(col("o_orderpriority"), "[^A-Za-z0-9]", "-")),
        lit("/orders/"), col("o_orderkey"),
        lit("?status="), col("o_orderstatus"),
        lit("&cust="), col("o_custkey")).as("url"))
      .as[String].collect().toSeq
    compare(urls)
  }

  test("url_parts stays inside whole-stage codegen") {
    val exec = Tables.orders(spark, sf)
      .select(UrlExpressions.urlParts(
        concat(lit("https://h/p?cust="), col("o_custkey")), "cust").as("p"))
      .queryExecution.executedPlan
    val spans = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }
    assert(spans.nonEmpty, exec.toString)
  }
}
