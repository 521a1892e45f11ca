package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ext.TextAnalysis

/**
 * Pins ScrubPii (the codegen'd byte-pass scrubber) to the built-in
 * reference chain `regexp_replace×3` — values AND schema — on (a) a
 * hand-built adversarial corpus covering the chained-regex composition
 * edges, (b) a generated corpus mixing the pattern fragments, (c) the
 * real sf0.001 documents table.
 */
class ScrubSpec extends SparkSpec {
  import spark.implicits._

  private def assertParity(texts: Seq[String]): Unit = {
    val df = texts.zipWithIndex.map(_.swap).toDF("doc_id", "text")
    val fast = TextAnalysis.scrub(df)
    val ref = TextAnalysis.scrubRegex(df)
    assert(fast.schema === ref.schema, "scrubbed schema must match the regex chain")
    val f = fast.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val r = ref.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(f.keySet === r.keySet)
    for ((k, v) <- r)
      assert(f(k) === v, s"mismatch on input <${texts(k)}> (${texts(k).map(_.toInt)})")
  }

  test("adversarial edges match the chained regexp_replace exactly") {
    assertParity(Seq(
      "",
      "plain text no pii",
      // -- email pass: maximal-run + '@' semantics
      "a@b",                      // minimal match
      "a@b@c",                    // second '@' survives: <EMAIL>@c
      "a@b.c@d",                  // greedy post-run eats b.c, then @d dangles
      "..@..",                    // dots alone are in the class
      "@nope", "nope@", "a@ b", "a @b", "@@",
      "x a.b-c@d.e y",            // '-' breaks the pre-run: only c@d.e matches
      "ümlaut@host",              // 'ü' outside the class: match starts after it
      "中@文",                     // multi-byte neighbors, ASCII '@': no class run
      "a@中",                      // no post-run -> no match
      "123456789@x",              // digits eaten by the email pass, NOT <NUM>
      "abc@x456789012",           // post-run eats the digits too
      // -- url pass: protocol backtrack, [^ ]-greed, composition with <EMAIL>
      "http://x",
      "https://x",
      "httpss://x",               // greedy 's' kills the match entirely
      "http:// x",                // no [^ ]+ after :// -> no match
      "http://",                  // ditto at end of input
      "ht tp://x",
      "hhttp://x",                // match starts at the second 'h'
      "see http://a.b/c?d=e#f end",
      "http://a\tb",              // tab is NOT a space: stays inside the URL
      "http://a\nb and http://c",
      "http://user@host.com/path", // email replaced first, URL swallows <EMAIL>
      "pre http://x post http://y", // two URLs one row
      "HTTP://x",                 // pattern is case-sensitive: no match
      "url http://中文/path end",  // multi-byte inside [^ ]+
      // -- num pass: run-length boundary, composition
      "12345", "123456", "1234567",
      "a123456b",
      "12345 67890",              // two short runs, a space between: no match
      "123456 and 9876543210",
      "1.234567.8",               // dots break runs? no — '.' is not a digit: run 234567 matches
      "phone 0101010101 end",
      // -- cross-pass composition
      "email a@b then http://x then 123456",
      "http://123456789",         // digits inside URL: swallowed by <URL> first
      "123456@ no",               // '@' with no post-run: email fails, NUM fires
      "a@b123456",                // email eats the digits (post-run greedy)
      "<EMAIL> literal and 999999", // pre-existing token text stays inert
      "ΣΣ unicode Σ http://x ΣΣ"
    ))
  }

  test("generated corpus parity (800 strings of pattern fragments)") {
    val piece: Gen[String] = Gen.oneOf(
      Gen.oneOf("a", "Bc", "x.y", ".", "@", "@@", " ", "  ", "\t", "\n", ""),
      Gen.oneOf("http", "https", "://", "http://", "https://", "htt", "s"),
      Gen.oneOf("1", "12345", "123456", "99999999", "0"),
      Gen.oneOf("café", "中文", "ß", "<EMAIL>", "<NUM>", "e@f", "g@", "@h"))
    val doc: Gen[String] = Gen.choose(0, 14).flatMap(n => Gen.listOfN(n, piece)).map(_.mkString)
    val texts = (0 until 800).flatMap { i =>
      doc(Gen.Parameters.default, Seed(987L + i))
    }
    assertParity(texts)
  }

  test("sf0.001 documents: identical scrub via both forms") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val n = TextAnalysis.scrub(docs)
      .join(TextAnalysis.scrubRegex(docs).withColumnRenamed("scrubbed", "ref"), "doc_id")
      .filter(not($"scrubbed" <=> $"ref"))
      .count()
    assert(n === 0L)
  }

  test("null text passes through as null") {
    val df = Seq((1, "a@b"), (2, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.scrub(df).collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) === "<EMAIL>")
    assert(out(2) === null)
  }
}
