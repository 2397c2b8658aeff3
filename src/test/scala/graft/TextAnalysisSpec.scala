package graft

import graft.ext.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val stop = Seq("the", "a", "of")

  test("token counts and ratios") {
    val df = Seq("a a b", "ab cd").toDF("t")
    val got = df.select(
      TextAnalysis.tokenCount(col("t")),
      TextAnalysis.typeTokenRatio(col("t")),
      TextAnalysis.meanTokenLen(col("t")))
      .as[(Int, Double, Double)].collect().toSeq
    assert(got(0) == ((3, 2.0 / 3, 1.0))) // "a a b": 3 toks, 2 distinct, len (5-2)/3
    assert(got(1) == ((2, 1.0, 2.0)))     // "ab cd": (5-1)/2 = 2
  }

  test("stopword ratio and quality score bounds") {
    val df = Seq("the a of", "paris hosts exhibitions yearly").toDF("t")
    val got = df.select(
      TextAnalysis.stopwordRatio(col("t"), stop),
      TextAnalysis.qualityScore(col("t"), stop))
      .as[(Double, Double)].collect().toSeq
    assert(got(0)._1 == 1.0) // all stopwords
    assert(got(1)._1 == 0.0)
    assert(got.forall { case (_, q) => q >= 0.0 && q <= 1.0 })
    assert(got(1)._2 > got(0)._2) // real sentence scores higher than stuffing
  }

  test("repetition metrics: duplicate-gram and top-gram fractions") {
    // "a b a b c": bigrams [a b, b a, a b, b c] → 4 slots, 3 distinct
    //   dup = 1 − 3/4 = 0.25; top gram "a b" ×2 → 0.5
    // "w x y z": all bigrams unique → dup 0, top 1/3
    // "solo": shorter than n tokens → both 0 by contract
    val df = Seq("a b a b c", "w x y z", "solo").toDF("t")
    val got = df.select(
      TextAnalysis.duplicateGramRatio(col("t"), 2),
      TextAnalysis.topGramRatio(col("t"), 2))
      .as[(Double, Double)].collect().toSeq
    assert(got(0) == ((0.25, 0.5)))
    assert(got(1) == ((0.0, 1.0 / 3)))
    assert(got(2) == ((0.0, 0.0)))
  }

  test("roughTokenCount splits subword boundaries") {
    val df = Seq("abc123def", "hello-world").toDF("t")
    val got = df.select(TextAnalysis.roughTokenCount(col("t"))).as[Int].collect().toSeq
    assert(got == Seq(3, 2)) // abc|123|def ; hello|world
  }

  test("langId predicts marker-dominant language with stable ties") {
    val df = Seq(
      "the cat sat on the mat of doom",
      "el perro y la casa de los gatos",
      "le chien et les chats des villes",
      "zzz yyy xxx").toDF("t") // no markers at all -> first language wins ties
    val got = df.select(TextAnalysis.langId(col("t"))).as[String].collect().toSeq
    assert(got == Seq("en", "es", "fr", "en"))
  }

  test("hashEmbedding: token counts land in hash slots; near-dup texts stay close") {
    val df = Seq("alpha beta gamma delta", "alpha beta gamma delta",
      "alpha beta gamma epsilon").toDF("t")
    val vecs = df.select(TextAnalysis.hashEmbedding(col("t"), 16))
      .as[Seq[Float]].collect()
    assert(vecs(0) == vecs(1)) // deterministic
    assert(vecs(0).map(_.toDouble).sum == 4.0) // one count per token
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    assert(cos(vecs(0), vecs(2)) > 0.7) // 3/4 shared tokens
    assert(cos(vecs(0), vecs(2)) < 1.0)
  }

  test("modelQualityScore: degenerate dim-1 model reduces to token count") {
    // one slot → every token lands in it → score = bias + w0 · n_tokens;
    // the cleanest view of the linear-gate threshold behavior
    val df = Seq((1L, "one two three"), (2L, "one")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextAnalysis.modelQualityScore(col("text"), Seq(1.0), bias = -2.0)
          .as("score"))
      .as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 1.0, 2L -> -1.0)) // 3 tokens pass, 1 token fails
  }

  test("modelQualityScore: portable fixture weights gate hand-computed docs") {
    import graft.queries.TextQueries.fixtureWeights
    // "a": charFold = 97, slot 97 % 64 = 33, w33 = (33·2654435761) % 2001
    // − 1000 = 812 → keep. "@": charFold = 64, slot 0, w0 = −1000 → drop.
    assert(fixtureWeights(33) == 812.0 && fixtureWeights(0) == -1000.0)
    val df = Seq((1L, "a"), (2L, "@"), (3L, "a a a")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextAnalysis.modelQualityScore(col("text"), fixtureWeights,
          bias = 0.0, portable = true).as("score"))
      .withColumn("keep", col("score") >= 0)
      .as[(Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((812.0, true)))
    assert(got(2L) == ((-1000.0, false)))
    assert(got(3L) == ((2436.0, true))) // counts scale the weight linearly
  }

  test("fingerprint is deterministic, order-sensitive, and within [0, p)") {
    val df = Seq("alpha beta gamma", "gamma beta alpha", "alpha beta gamma").toDF("t")
    val got = df.select(TextAnalysis.fingerprint(col("t"))).as[Long].collect().toSeq
    assert(got(0) == got(2))
    assert(got(0) != got(1))
    assert(got.forall(f => f >= 0 && f < 1000000007L))
  }

  test("native charFold == composable HOF form on every tricky shape") {
    val cases = Seq("", "x", "hello", "käse", "東京", "a東b", "straße")
    val df = cases.toDF("t")
    val composable = aggregate(
      transform(sequence(lit(1), length(col("t"))),
        i => ascii(substring(col("t"), i, lit(1))).cast("long")),
      lit(0L), (acc, c) => (acc * 31L + c) % 1000000007L)
    val rows = df.select(
      graft.functions.TextExpressions.charFold(col("t"), 31L, 1000000007L).as("native"),
      composable.as("hof")).as[(Long, Long)].collect()
    cases.zip(rows).foreach { case (s, (n, h)) =>
      assert(n == h, s"mismatch on '$s': native=$n hof=$h")
    }
  }

  test("native fingerprint == composable HOF form on every tricky shape") {
    // the codegen'd byte-walk must agree with the reference expression it
    // replaced: empty string, single token, trailing/consecutive spaces
    // (split keeps empty tokens), and 2- and 3-byte UTF-8 first chars
    val cases = Seq("", "x", "hello world", "trailing space ", " leading",
      "two  spaces", "käse straße", "東京 大阪", "mixed ascii 東 tail", "   ")
    val df = cases.toDF("t")
    val composable = {
      val p = lit(1000000007L)
      val termHash = transform(split(col("t"), " "),
        t => ascii(substring(t, 1, 1)).cast("long") * 100L + length(t))
      aggregate(termHash, lit(0L), (acc, h) => (acc * 31L + h) % p)
    }
    val rows = df.select(TextAnalysis.fingerprint(col("t")).as("native"),
      composable.as("hof")).as[(Long, Long)].collect()
    cases.zip(rows).foreach { case (s, (n, h)) =>
      assert(n == h, s"mismatch on '$s': native=$n hof=$h")
    }
  }

  test("tokenSegments counts maximal letter/digit runs") {
    val cases = Seq(
      ("ab12cd x.y", 5),    // ab | 12 | cd | x | y
      ("hello world", 2),
      ("...", 0), ("", 0),
      ("v2beta3", 4),       // v | 2 | beta | 3
      ("  lead", 1))
    val rows = cases.map(_._1).toDF("t")
      .select(TextAnalysis.tokenSegments(col("t"))).as[Int].collect()
    cases.zip(rows).foreach { case ((in, want), got) =>
      assert(got == want, s"on '$in'")
    }
  }

  test("redactPii masks emails, IPs and phones; counts are per-kind") {
    val cases = Seq(
      ("contact a.b+spam@example.co.uk or call 555-123-4567 now",
        "contact <EMAIL> or call <PHONE> now", 1, 0, 1),
      ("server 10.0.0.1 and 192.168.1.255 up", "server <IP> and <IP> up", 0, 2, 0),
      ("version 1.2.3 stays, x@y.io goes", "version 1.2.3 stays, <EMAIL> goes", 1, 0, 0),
      ("intl +44 123.456.7890 and bare 123 456 7890",
        "intl +44 <PHONE> and bare <PHONE>", 0, 0, 2),
      // a longer digit run must not be half-redacted from the middle
      ("ref 91555 123 4567 stays", "ref 91555 123 4567 stays", 0, 0, 0),
      ("no pii here at all", "no pii here at all", 0, 0, 0))
    val rows = cases.map(_._1).toDF("t").select(
      TextAnalysis.redactPii(col("t")),
      TextAnalysis.piiCount(col("t"), "EMAIL"),
      TextAnalysis.piiCount(col("t"), "IP"),
      TextAnalysis.piiCount(col("t"), "PHONE"))
      .as[(String, Int, Int, Int)].collect()
    cases.zip(rows).foreach { case ((in, red, e, ip, ph), got) =>
      assert(got == ((red, e, ip, ph)), s"on '$in'")
    }
  }

  test("compressionRatios: exact Deflater replay, repetitive text compresses harder") {
    val repetitive = "spam ham " * 200
    val varied = (1 to 200).map(i => s"w${i * 7919}").mkString(" ")
    val df = Seq((1L, repetitive), (2L, varied), (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextAnalysis.compressionRatios(df, "text", "doc_id")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toList
    // exact replay of the same JDK Deflater on the driver
    def ref(s: String): (Long, Long, Double) = {
      val raw = s.getBytes("UTF-8")
      val d = new java.util.zip.Deflater(6)
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](64 * 1024)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      (raw.length.toLong, n, n.toDouble / raw.length)
    }
    val (r1, c1, f1) = ref(repetitive)
    val (r2, c2, f2) = ref(varied)
    assert(got(0) == ((1L, r1, c1, f1)))
    assert(got(1) == ((2L, r2, c2, f2)))
    assert(f1 < 0.05 && f2 > 0.3, s"ratios $f1 / $f2") // the signal itself
    assert(got(2) == ((3L, 0L, 0L, 1.0)))              // empty text
    assert(got(3) == ((4L, 0L, 0L, 1.0)))              // null text
  }

  test("compressionRatios at level 0: output equals closed-form zlib stored framing") {
    // the q90 oracle's whole premise: for inputs fitting one stored block,
    // level-0 DEFLATE output is exactly raw + 2 (zlib header) + 5 (stored
    // block header) + 4 (adler32) — checkable by an engine with no zlib
    val texts = Seq("x", "spam ham " * 200,
      (1 to 500).map(i => s"w${i * 7919}").mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.compressionRatios(df, "text", "doc_id", level = 0)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toList
    texts.zipWithIndex.foreach { case (t, i) =>
      val raw = t.getBytes("UTF-8").length.toLong
      assert(got(i) == ((i.toLong, raw, raw + 11, (raw + 11).toDouble / raw)))
    }
  }

  test("compressionRatios at level 0: multi-block framing past 64 KiB") {
    // the general closed form the q90 oracle computes: raw + 2 + 4 + 5
    // per stored block, ceil(raw/65535) blocks — a 150 000-byte document
    // spans 3 stored blocks, so the single-block raw+11 would be 10 short
    val raw = 150000L
    val df = Seq((1L, "a" * raw.toInt)).toDF("doc_id", "text")
    val got = TextAnalysis.compressionRatios(df, "text", "doc_id", level = 0)
      .as[(Long, Long, Long, Double)].collect().head
    val blocks = (raw + 65534) / 65535
    val expect = raw + 2 + 4 + 5 * blocks
    assert(blocks == 3L)
    assert(got == ((1L, raw, expect, expect.toDouble / raw)))
  }

  test("compressionRatios at level 0: exact at the stored-block boundaries") {
    // the hard window: a fixed-output-buffer deflate loop splits stored
    // blocks at the buffer remainder, so sizes within 6 bytes under a
    // 65535 multiple gained an extra 5-byte block header (measured with
    // the old 64 KiB loop: 65530..65535 each came out 5 bytes over the
    // closed form). The single-full-buffer call must match the formula
    // on BOTH sides of every boundary.
    val sizes = Seq(65529L, 65530L, 65535L, 65536L, 131066L, 131071L)
    val df = sizes.zipWithIndex
      .map { case (n, i) => (i.toLong, "a" * n.toInt) }.toDF("doc_id", "text")
    val got = TextAnalysis.compressionRatios(df, "text", "doc_id", level = 0)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toList
    sizes.zipWithIndex.foreach { case (n, i) =>
      val expect = n + 2 + 4 + 5 * ((n + 65534) / 65535)
      assert(got(i) == ((i.toLong, n, expect, expect.toDouble / n)),
        s"size $n")
    }
  }

  test("gopher rule metrics: symbol ratio, alpha-word fraction, stop count") {
    val df = Seq(
      "see # section ... below",   // 1 '#' + 1 '...' over 5 words
      "the cat sat with the dog",  // 3 gopher stopwords (the, with, the)
      "123 456 abc",               // 1 of 3 words contains a letter
      "a1 2b 33").toDF("t")
    val got = df.select(
      TextAnalysis.symbolWordRatio(col("t")),
      TextAnalysis.alphaWordFrac(col("t")),
      TextAnalysis.stopwordCount(col("t"), TextAnalysis.gopherStopwords))
      .as[(Double, Double, Int)].collect().toSeq
    assert(got(0) == ((2.0 / 5, 3.0 / 5, 0)))
    assert(got(1) == ((0.0, 1.0, 3)))
    assert(got(2) == ((0.0, 1.0 / 3, 0)))
    assert(got(3) == ((0.0, 2.0 / 3, 0))) // letters mid-token still count
  }

  test("fleschMilli replays the integerized formula; NULL on empty/NULL text") {
    // "the cat sat. it ran!" → W=5, S=2 ([.!]), vowel runs: e,a,a,i,a = 5
    // → 206835 − (1015·5) div 2 − (84600·5) div 5 = 206835 − 2537 − 84600
    val rows = Seq((1L, "the cat sat. it ran!"), (2L, ""), (3L, null),
      (4L, "aeiou")) // one word, one vowel run, zero sentence marks → S=1
      .toDF("doc_id", "text")
    val got = rows.select(col("doc_id"),
      graft.ext.TextAnalysis.fleschMilli(col("text")).as("f"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(1L).contains(206835L - 5075L / 2 - 84600L))
    assert(got(2L).isEmpty && got(3L).isEmpty)
    assert(got(4L).contains(206835L - 1015L - 84600L))
  }
}
