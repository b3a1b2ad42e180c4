package graft

import org.apache.spark.sql.functions._

class MinHashSigSpec extends SparkSpec {

  test("every oracle's inline tokenizer pattern matches TOKEN_RE") {
    // the oracle SQL strings inline the tokenizer; this pins every
    // copy to the Spark side's pattern so they can't drift apart
    val marker = "regexp_extract_all(nfc_normalize("
    val expected = functions.TextNorm.TOKEN_RE
    var found = 0
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      var i = sql.indexOf(marker)
      while (i >= 0) {
        val open = sql.indexOf("'", i)
        val close = sql.indexOf("'", open + 1)
        assert(open > 0 && close > open, s"$name: unparseable tokenizer call")
        val pat = sql.substring(open + 1, close)
        assert(pat == expected, s"$name uses tokenizer pattern '$pat'")
        found += 1
        i = sql.indexOf(marker, close)
      }
    }
    assert(found > 20, s"expected many inline tokenizer copies, found $found")
  }

  test("TextNorm tokenizes punctuated/mixed-form unicode correctly") {
    import spark.implicits._
    // "é" decomposed (e + combining acute) must normalize to the
    // composed form before tokenizing; punctuation must split tokens
    val decomposed = "cafe\u0301, bar!! 42x" // e + combining acute
    val composed = "caf\u00e9"             // precomposed
    val got = Seq(decomposed).toDF("text")
      .select(functions.TextNorm.tokens(col("text")).as("toks"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq(composed, "bar", "42x"), got.mkString("|"))
    // identity on clean space-separated ASCII: same stream as split
    val ascii = "key agg row scan"
    val t2 = Seq(ascii).toDF("text")
      .select(functions.TextNorm.tokens(col("text")).as("toks"))
      .collect()(0).getSeq[String](0)
    assert(t2 == ascii.split(" ").toSeq)
  }

  test("fused MinHashSig equals the composed array_min(transform) form") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 1)
      .withColumn("hs", transform(col("toks"), t => functions.Hashing.hash56(t)))
    val both = docs.select(
      col("doc_id"),
      functions.Hashing.minhash(col("hs"), 16).as("fused"),
      functions.Hashing.minhashComposed(col("hs"), 16).as("composed"))
    assert(both.filter(col("fused") =!= col("composed")).count() == 0)
    assert(both.count() > 0)
  }

  test("fused SimHashSig equals the composed vote-array form") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 1)
      .withColumn("hs", transform(col("toks"), t => functions.Hashing.hash48(t)))
    val both = docs.select(
      functions.Hashing.simhash48(col("hs")).as("fused"),
      functions.Hashing.simhashComposed(col("hs")).as("composed"))
    assert(both.filter(col("fused") =!= col("composed")).count() == 0)
    assert(both.count() > 0)
  }

  test("fused MinHashSig survives whole-stage codegen and interpreted eval") {
    val df = spark.range(1, 50).select(
      transform(sequence(lit(1), col("id") % 7 + 1),
        i => functions.Hashing.hash56(concat(lit("tok"), i))).as("hs"))
    val withCodegen = df.select(functions.Hashing.minhash(col("hs"), 8)).collect()
    val saved = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interpreted = df.select(functions.Hashing.minhash(col("hs"), 8)).collect()
      assert(withCodegen.map(_.toString).sameElements(interpreted.map(_.toString)))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", saved)
  }
}
