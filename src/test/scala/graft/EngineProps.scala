package graft

import graft.model.{Capture, FillPolicy, SigParams, TrendQuery}
import graft.operators.Trend
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based testing (SURVEY §5.2): randomized capture streams —
  * arbitrary day spread, same-second ties, revisit records, junk status
  * codes — must score identically to the reference port under any fill
  * policy, with the structural invariants holding on every output.
  */
object EngineProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val AsOf = "2024-02-15"
  private val params = SigParams.defaults.map { case (k, q) => k -> (q.shift, q.slope, q.spread) }

  private val genLine: Gen[(String, String, String)] = for {
    d <- Gen.choose(0, 24)
    sec <- Gen.choose(0, 86399)
    st <- Gen.frequency(
      8 -> Gen.const("200"), 2 -> Gen.const("301"), 2 -> Gen.const("404"),
      2 -> Gen.const("503"), 3 -> Gen.const("-"), 1 -> Gen.const("30x"),
      1 -> Gen.const("junk"))
    dg <- Gen.choose(0, 5)
  } yield (
    f"202401${d + 1}%02d${sec / 3600}%02d${(sec / 60) % 60}%02d${sec % 60}%02d",
    st,
    s"DIGESTNO${dg}_PADDING")

  private val genCase: Gen[(Seq[(String, String, String)], FillPolicy, Int)] = for {
    n <- Gen.choose(1, 120)
    lines <- Gen.listOfN(n, genLine)
    policy <- Gen.oneOf(FillPolicy.all)
    fill <- Gen.oneOf(-1, 0, 2)
  } yield (lines.sortBy(_._1), policy, fill)

  private val genSeries: Gen[(Seq[(String, String)], FillPolicy, Int)] = for {
    n <- Gen.choose(1, 30)
    days <- Gen.listOfN(n, Gen.choose(0, 59))
    specs <- Gen.listOfN(n, Gen.oneOf("2xx", "3xx", "4xx", "5xx", "~"))
    policy <- Gen.oneOf(FillPolicy.all)
    fill <- Gen.oneOf(-1, 0, 1, 3)
  } yield (
    days.distinct.sorted
      .map(d => java.time.LocalDate.of(2024, 1, 1).plusDays(d.toLong).toString)
      .zip(specs),
    policy,
    fill)

  property("fillDays equals the DataFrame fill operator on random series") =
    forAll(genSeries) { case (obs, policy, fill) =>
      val spark = TestSpark.spark
      import spark.implicits._
      val dailyDf = obs
        .map { case (d, sp) =>
          ("u", d, "20240101000000", 1L, 0L, 0L, 0L, sp, "DGXXXXXX", "Changed",
            Some(0.5), Some(0.5))
        }
        .toDF("url", "day", "datetime", "c2xx", "c3xx", "c4xx", "c5xx",
          "specimen", "digest", "content", "chaos", "chaosn")
      val dfFills = graft.operators.GapFill.fill(dailyDf, fill, policy)
        .filter(org.apache.spark.sql.functions.col("datetime") === "~")
        .select("day", "specimen").collect()
        .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      val pure = graft.operators.GapFill.fillDays(obs.toIndexedSeq, fill, policy)
        .sorted
      Prop(pure == dfFills) :|
        s"fillDays != fill [n=${obs.length} policy=${policy.name} fill=$fill]\n pure=$pure\n df=$dfFills"
    }

  property("pipeline parity + invariants on random streams") = forAll(genCase) {
    case (lines, policy, fill) =>
      val spark = TestSpark.spark
      import spark.implicits._
      val caps = lines.zipWithIndex.map { case ((t, s, d), i) => Capture("u", t, s, d, i.toLong) }
      val got = Trend.run(caps.toDF(), TrendQuery(fill, policy, AsOf))
        .collect().sortBy(_.day)
      val want = ReferencePort.loadData(lines, fill, policy.name, AsOf, params)

      val sameLen = got.length == want.length
      val parity = sameLen && got.zip(want).forall { case (g, w) =>
        g.day == w.day && g.specimen == w.specimen && g.content == w.content &&
        g.c2xx == w.c2xx && g.c3xx == w.c3xx && g.c4xx == w.c4xx && g.c5xx == w.c5xx &&
        g.filled == w.filled &&
        math.abs(g.resilience - w.resilience) < 1e-12 &&
        math.abs(g.fixity - w.fixity) < 1e-12 &&
        math.abs(g.chaos - w.chaos) < 1e-12 &&
        math.abs(g.chaosn - w.chaosn) < 1e-12
      }
      val bounds = got.forall(r =>
        r.resilience >= 0 && r.resilience <= 1 && r.fixity >= 0 && r.fixity <= 1 &&
        r.call == r.c2xx + r.c3xx + r.c4xx + r.c5xx && (!r.filled || r.call == 0))
      val contiguous = got.zip(got.drop(1)).forall { case (a, b) =>
        java.time.LocalDate.parse(b.day) == java.time.LocalDate.parse(a.day).plusDays(1)
      }
      val label = s"n=${lines.length} policy=${policy.name} fill=$fill days=${got.length}"
      Prop.all(
        Prop(parity) :| s"parity mismatch [$label]",
        Prop(bounds) :| s"bounds violated [$label]",
        Prop(contiguous) :| s"calendar holes [$label]")
  }

  /** Random near-dup corpora: groups of 12-word template variants (each
    * doc perturbs one slot, so group members pairwise share >=10 words)
    * plus the group-count/size randomness that shapes the pair graph.
    */
  private val genCorpus: Gen[Seq[(Long, String)]] = for {
    g <- Gen.choose(1, 4)
    sizes <- Gen.listOfN(g, Gen.choose(1, 5))
  } yield sizes.zipWithIndex.flatMap { case (m, k) =>
    (0 until m).map { j =>
      val words = (0 until 12).map(w => if (w == j % 12) s"g${k}v${j}w$w" else s"g${k}w$w")
      (k * 10L + j, words.mkString(" "))
    }
  }

  property("dedupClusters equals a local union-find over the discovered pair graph") =
    forAll(genCorpus) { docsSeq =>
      val spark = TestSpark.spark
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val df = docsSeq.toDF("doc_id", "text")
      val pairs = graft.operators.Dedup.nearDupPairs(df)
        .filter(col("jaccard") >= graft.operators.Corpus.ClusterJaccard)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      // reference union-find; larger roots point at smaller, so each
      // tree's root is the component minimum — the operator's label rule
      val parent = scala.collection.mutable.Map(docsSeq.map(d => d._1 -> d._1): _*)
      def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = docsSeq.map(d => d._1 -> find(d._1)).toMap
      val got = graft.operators.Corpus.dedupClusters(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      Prop(got == want) :|
        s"cluster labels != union-find [docs=${docsSeq.length} pairs=${pairs.length}]\n got=$got\n want=$want"
    }

  /** Random corpora mixing a shared 8-word header (boilerplate once
    * enough docs carry it) with unique per-doc bodies of varying
    * segment counts (including partial last segments).
    */
  private val genBoilerCorpus: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(1, 8)
    withHeader <- Gen.listOfN(n, Gen.oneOf(true, false))
  } yield withHeader.zipWithIndex.map { case (h, i) =>
    val body = (0 until (i % 3) * 8 + 5).map(w => s"d${i}w$w").mkString(" ")
    val header = "shared header words common to many docs here"
    (i.toLong, if (h) s"$header $body" else body)
  }

  // random corpora over a 4-letter alphabet: substrings repeat heavily,
  // so the trained vocab is dense and the greedy walk takes real
  // multi-char steps; occasional double spaces exercise empty tokens
  private val genTokCorpus: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(2, 25)
    docs <- Gen.listOfN(n, for {
      m <- Gen.choose(1, 20)
      ws <- Gen.listOfN(m, for {
        l <- Gen.choose(1, 9)
        cs <- Gen.listOfN(l, Gen.oneOf('a', 'b', 'c', 'd'))
      } yield cs.mkString)
      sep <- Gen.frequency(9 -> Gen.const(" "), 1 -> Gen.const("  "))
    } yield ws.mkString(sep))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("subword tokenization equals a local reference (training + greedy walk)") =
    forAll(genTokCorpus) { docsSeq =>
      val spark = TestSpark.spark
      import spark.implicits._
      val ts = graft.operators.TextStats
      // independent local reference: train the same top-k substring
      // vocab, then walk each word greedily — none of the engine's
      // code is reused here
      val wcnt = docsSeq.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val freq = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for {
        (w, c) <- wcnt
        l <- ts.SubwordMinLen to ts.SubwordMaxLen
        if w.length >= l
        p <- 0 to w.length - l
      } freq(w.substring(p, p + l)) += c
      val vocab = freq.toSeq.sortBy { case (s, f) => (-f, s) }
        .take(ts.SubwordVocabK).map(_._1).toSet
      def count(w: String): Long = {
        var pos = 0
        var n = 0L
        while (pos < w.length) {
          val step = (math.min(ts.SubwordMaxLen, w.length - pos) to ts.SubwordMinLen by -1)
            .find(l => vocab(w.substring(pos, pos + l))).getOrElse(1)
          pos += step
          n += 1
        }
        n
      }
      val want = docsSeq.map { case (id, t) =>
        val ws = t.split(" ", -1)
        id -> ((ws.length.toLong, ws.filter(_.nonEmpty).map(count).sum))
      }.toMap
      val got = ts.tokenStatsSubword(docsSeq.toDF("doc_id", "text")
        .withColumn("n_chars", org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text"))))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      Prop(got == want) :| s"subword != local reference\n got=$got\n want=$want"
    }

  property("true-BPE training + tokenization equals an independent local implementation") =
    forAll(genTokCorpus) { docsSeq =>
      val spark = TestSpark.spark
      import spark.implicits._
      val ts = graft.operators.TextStats
      val M = 12
      // independent local reference: classic BPE (Sennrich et al.) —
      // word-frequency table, per-round adjacent-pair count (all
      // positions, weighted), argmax merge (ties: count desc, then
      // left, then right), left-to-right non-overlapping sweep. None
      // of the engine's code is reused.
      val wcnt = docsSeq.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      var table: Map[List[String], Long] =
        wcnt.map { case (w, c) => w.map(_.toString).toList -> c }
          .groupBy(_._1).view.mapValues(_.values.sum).toMap
      val refMerges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      var stop = false
      while (refMerges.length < M && !stop) {
        val pc = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
        table.foreach { case (syms, c) =>
          syms.zip(syms.drop(1)).foreach(p => pc(p) += c)
        }
        if (pc.isEmpty) stop = true
        else {
          val ((l, r), cnt) = pc.minBy { case ((a, b), c) => (-c, a, b) }
          refMerges += ((l, r, cnt))
          def sweep(syms: List[String]): List[String] = syms match {
            case a :: b :: rest if a == l && b == r => (a + b) :: sweep(rest)
            case a :: rest => a :: sweep(rest)
            case Nil => Nil
          }
          table = table.toSeq.map { case (s, c) => sweep(s) -> c }
            .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        }
      }
      def refTok(w: String): Long = {
        var syms = w.map(_.toString).toList
        refMerges.foreach { case (l, r, _) =>
          def sweep(ss: List[String]): List[String] = ss match {
            case a :: b :: rest if a == l && b == r => (a + b) :: sweep(rest)
            case a :: rest => a :: sweep(rest)
            case Nil => Nil
          }
          syms = sweep(syms)
        }
        syms.length.toLong
      }
      val df = docsSeq.toDF("doc_id", "text")
      val merges = ts.bpeMerges(df, M)
      val mergesOk =
        merges.map(m => (m.left, m.right, m.freq)).toSeq == refMerges.toSeq
      val want = docsSeq.map { case (id, t) =>
        id -> t.split(" ", -1).filter(_.nonEmpty).map(refTok).sum
      }.toMap
      val got = ts.tokenStatsBpeTrue(df, merges)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      Prop(mergesOk && got == want) :|
        s"bpe != local reference\n merges ok=$mergesOk\n engine=${merges.toSeq}\n ref=$refMerges\n got=$got\n want=$want"
    }

  property("stripBoilerplate equals a local recomputation on random corpora") =
    forAll(genBoilerCorpus) { docsSeq =>
      val spark = TestSpark.spark
      import spark.implicits._
      val k = graft.operators.Corpus.SegmentWords
      def segs(t: String) = t.split(" ").grouped(k).map(_.mkString(" ")).toVector
      val segDf = docsSeq.flatMap { case (_, t) => segs(t).distinct }
        .groupBy(identity).view.mapValues(_.size).toMap
      val want = docsSeq.map { case (id, t) =>
        val ss = segs(t)
        val kept = ss.filter(s => segDf(s) < graft.operators.Corpus.BoilerplateDf)
        id -> ((ss.length.toLong, (ss.length - kept.length).toLong, kept.mkString(" ")))
      }.toMap
      val got = graft.operators.Corpus.stripBoilerplate(docsSeq.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      Prop(got == want) :| s"boilerplate scrub != local twin\n got=$got\n want=$want"
    }

  private def localLmCounts(docsSeq: Seq[(Long, String)]) = {
    val uni = docsSeq.flatMap(_._2.split(" ", -1))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = docsSeq
      .flatMap(_._2.split(" ", -1).sliding(2).filter(_.length == 2).map(a => (a(0), a(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    (bi, uni)
  }

  private def localNll(
      t: String,
      bi: Map[(String, String), Long],
      uni: Map[String, Long],
      v: Long): (Long, Long) = {
    val terms = t.split(" ", -1).sliding(2).filter(_.length == 2).map { a =>
      val lp = -math.log(
        (bi.getOrElse((a(0), a(1)), 0L) + 1).toDouble /
          (uni.getOrElse(a(0), 0L) + v).toDouble) * 1000000d
      BigDecimal(lp).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }.toVector
    (terms.length.toLong, terms.sum)
  }

  property("bigram LM: engine counts and kernel NLL equal a local recomputation") =
    forAll(genTokCorpus) { docsSeq =>
      val spark = TestSpark.spark
      import spark.implicits._
      val ts = graft.operators.TextStats
      val df = docsSeq.toDF("doc_id", "text")
      val (bi, uni, v) = ts.lmCounts(df)
      val biM = bi.collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
      val uniM = uni.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val vN = v.collect().head.getLong(0)
      val (locBi, locUni) = localLmCounts(docsSeq)
      val countsOk = biM == locBi && uniM == locUni && vN == locUni.size.toLong
      val want = docsSeq.map { case (id, t) => id -> localNll(t, locBi, locUni, locUni.size.toLong) }.toMap
      val got = ts.lmScoreStored(df, biM, uniM, vN)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      Prop(countsOk && got == want) :|
        s"LM != local reference\n counts ok=$countsOk\n got=$got\n want=$want"
    }

  /** Independent local reference for the unigram-LM tokenizer: same
    * published algorithm (seed spans → EM forward-backward → prune →
    * Viterbi), none of the engine's code reused. Quantization points
    * (per-(word,piece) micro expected counts; add-one micro-nat
    * scores) follow the engine's documented determinism contract.
    */
  private object LocalUnigram {
    val MaxLen = graft.operators.TextStats.UnigramMaxPieceLen
    val Unk = graft.operators.TextStats.UnigramUnkMicro
    private def q(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def rescore(counts: Seq[(String, Long)]): Map[String, (Long, Long)] = {
      val total = counts.map(_._2).sum
      val v = counts.length.toLong
      counts.map { case (p, c) =>
        p -> ((c, q(math.log((c + 1000000L).toDouble / (total + v * 1000000L).toDouble) * 1e6)))
      }.toMap
    }
    def prune(counts: Seq[(String, Long)], keepMulti: Int): Seq[(String, Long)] = {
      val (s, m) = counts.partition(_._1.length == 1)
      s.sortBy(_._1) ++ m.sortBy { case (p, c) => (-c, p) }.take(keepMulti)
    }
    def seed(wcnt: Map[String, Long]): Seq[(String, Long)] =
      wcnt.toSeq.flatMap { case (w, c) =>
        for {
          i <- 0 until w.length
          l <- 1 to math.min(MaxLen, w.length - i)
        } yield (w.substring(i, i + l), c * 1000000L)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    def expected(w: String, sc: Map[String, Long]): Seq[(String, Long)] = {
      val n = w.length
      val alpha = Array.fill(n + 1)(0.0); alpha(0) = 1.0
      for (j <- 1 to n; l <- 1 to math.min(MaxLen, j))
        sc.get(w.substring(j - l, j)).foreach(m => alpha(j) += alpha(j - l) * math.exp(m / 1e6))
      val z = alpha(n)
      if (z <= 0 || z.isNaN || z.isInfinite) Seq.empty
      else {
        val beta = Array.fill(n + 1)(0.0); beta(n) = 1.0
        for (i <- (n - 1) to 0 by -1; l <- 1 to math.min(MaxLen, n - i))
          sc.get(w.substring(i, i + l)).foreach(m => beta(i) += math.exp(m / 1e6) * beta(i + l))
        val acc = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
        for (i <- 0 until n; l <- 1 to math.min(MaxLen, n - i)) {
          val s = w.substring(i, i + l)
          sc.get(s).foreach(m => acc(s) += alpha(i) * math.exp(m / 1e6) * beta(i + l) / z)
        }
        acc.toSeq.sortBy(_._1).map { case (s, e) => (s, q(e * 1e6)) }
      }
    }
    def train(wcnt: Map[String, Long]): Map[String, (Long, Long)] = {
      var pieces = rescore(prune(seed(wcnt), graft.operators.TextStats.UnigramSeedK))
      for (_ <- 1 to graft.operators.TextStats.UnigramEmRounds) {
        val sc = pieces.map { case (p, (_, s)) => p -> s }
        val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
        wcnt.foreach { case (w, c) =>
          expected(w, sc).foreach { case (s, e) => counts(s) += e * c }
        }
        pieces = rescore(prune(counts.toSeq, graft.operators.TextStats.UnigramVocabK))
      }
      pieces
    }
    def tokenize(w: String, sc: Map[String, Long]): (Long, Long) = {
      val n = w.length
      val dp = Array.fill[(Long, Long)](n + 1)((Long.MinValue, Long.MaxValue))
      dp(0) = (0L, 0L)
      for (j <- 1 to n; l <- 1 to math.min(MaxLen, j)) {
        val s = w.substring(j - l, j)
        val m = if (l == 1) Some(sc.getOrElse(s, Unk)) else sc.get(s)
        m.foreach { mm =>
          val cand = (dp(j - l)._1 + mm, dp(j - l)._2 + 1)
          if (cand._1 > dp(j)._1 || (cand._1 == dp(j)._1 && cand._2 < dp(j)._2))
            dp(j) = cand
        }
      }
      (dp(n)._2, dp(n)._1)
    }
  }

  property("unigram-LM EM training + Viterbi tokenization equal an independent local implementation") =
    forAll(genTokCorpus) { docsSeq =>
      val spark = TestSpark.spark
      import spark.implicits._
      val ts = graft.operators.TextStats
      val df = docsSeq.toDF("doc_id", "text")
      val engine = ts.unigramPieces(df)
      val wcnt = docsSeq.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val want = LocalUnigram.train(wcnt)
      val got = engine.map(p => p.piece -> ((p.cnt_micro, p.score_micro))).toMap
      val vocabOk = got == want
      val sc = want.map { case (p, (_, s)) => p -> s }
      val wantStats = docsSeq.map { case (id, t) =>
        val ws = t.split(" ", -1)
        var tok = 0L
        var s = 0L
        ws.filter(_.nonEmpty).foreach { w =>
          val (tt, ss) = LocalUnigram.tokenize(w, sc)
          tok += tt
          s += ss
        }
        id -> ((ws.length.toLong, tok, s))
      }.toMap
      val gotStats = ts.tokenStatsUnigram(df, engine)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      Prop(vocabOk && gotStats == wantStats) :|
        s"unigram != local\n vocabOk=$vocabOk\n got=$got\n want=$want\n gotStats=$gotStats\n wantStats=$wantStats"
    }

  property("bigram LM: pruning the bigram tier never lowers any document's NLL") =
    forAll(genTokCorpus, Gen.choose(0, 10)) { (docsSeq, k) =>
      val (locBi, locUni) = localLmCounts(docsSeq)
      val v = locUni.size.toLong
      val pruned = locBi.toSeq
        .sortBy { case ((w1, w2), c) => (-c, w1, w2) }.take(k).toMap
      Prop(docsSeq.forall { case (_, t) =>
        localNll(t, pruned, locUni, v)._2 >= localNll(t, locBi, locUni, v)._2
      }) :| s"pruning to $k lowered an NLL"
    }
}
