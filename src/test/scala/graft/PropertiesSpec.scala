package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.engine.{DiffEngine, SkewTools}

/** ScalaCheck properties for the diff engine (SURVEY §5 test plan) plus
  * salted-join equivalence. Generators are driven manually with fixed seeds
  * (the scalatest-scalacheck bridge isn't on the offline classpath) — 8
  * deterministic samples per property. */
class PropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    (0 until 8).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    (0 until 8).foreach { i =>
      body(ga.pureApply(Gen.Parameters.default, Seed(42L + i)),
        gb.pureApply(Gen.Parameters.default, Seed(1042L + i)))
    }

  private val rowsGen: Gen[List[(Int, String, Option[Int])]] =
    Gen.listOfN(12, for {
      k <- Gen.choose(1, 20)
      v <- Gen.alphaLowerStr.map(_.take(4))
      o <- Gen.option(Gen.choose(0, 5))
    } yield (k, v, o)).map(_.distinctBy(_._1)) // unique keys

  test("property: diff(x, x) is all-zero and profiles match per side") {
    forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "v", "o")
      val r = DiffEngine.diff(df, df, keys = Seq("k"))
      val rd = r.rowDiff.get
      assert(rd.added == 0 && rd.removed == 0 && rd.changed == 0)
      r.columnProfiles.foreach(cp => assert(cp.base == cp.head))
    }
  }

  test("property: added(a,b) == removed(b,a) for arbitrary splits") {
    forAll(rowsGen, Gen.choose(1, 20)) { (rows, pivot) =>
      val df = rows.toDF("k", "v", "o")
      val a = df.filter($"k" <= pivot)
      val b = df.filter($"k" % 2 === 0)
      assert(DiffEngine.added(a, b, Seq("k")).count() ==
        DiffEngine.removed(b, a, Seq("k")).count())
    }
  }

  test("property: salted-digest diff equals the default diff on unique keys; row-exact on dups") {
    // unique keys: identical (added, removed, changed, rowcounts) for any
    // random base/head derivation
    forAll(rowsGen, Gen.choose(1, 20)) { (rows, pivot) =>
      val df = rows.toDF("k", "v", "o")
      val base = df.filter($"k" <= pivot)
      val head = df.filter($"k" % 2 === 0)
        .withColumn("v", when($"k" % 3 === 0, concat($"v", lit("!"))).otherwise($"v"))
      val d0 = DiffEngine.diff(base, head, keys = Seq("k"), computeProfiles = false)
      val d1 = DiffEngine.diff(base, head, keys = Seq("k"), computeProfiles = false,
        saltSkewBuckets = Some(4))
      val (r0, r1) = (d0.rowDiff.get, d1.rowDiff.get)
      assert((r0.added, r0.removed, r0.changed) == ((r1.added, r1.removed, r1.changed)))
      assert(d0.rowcounts == d1.rowcounts)
      assert(r0.sampleChangedKeys == r1.sampleChangedKeys)
    }
    // duplicated keys: added/removed/rowcounts stay ROW-exact (vs driver-
    // computed truth); changed counts keys whose content multiset moved
    forAll(Gen.listOfN(30, for {
      k <- Gen.choose(1, 6); v <- Gen.alphaLowerStr.map(_.take(3))
    } yield (k, v)), Gen.choose(1, 6)) { (rows, cut) =>
      val base = rows.toDF("k", "v")
      val head = rows.filter(_._1 != cut).toDF("k", "v")
      val d = DiffEngine.diff(base, head, keys = Seq("k"), computeProfiles = false,
        saltSkewBuckets = Some(4)).rowDiff.get
      assert(d.removed == rows.count(_._1 == cut)) // every dropped ROW counted
      assert(d.added == 0 && d.changed == 0)
    }
  }

  test("property: rowcounts partition into removed + matched; added symmetric") {
    forAll(rowsGen, Gen.choose(1, 20)) { (rows, pivot) =>
      val df = rows.toDF("k", "v", "o")
      val base = df.filter($"k" <= pivot)
      val head = df.filter($"k" > 3)
      val r = DiffEngine.diff(base, head, keys = Seq("k")).rowDiff.get
      val matchedBase = base.join(head.select("k"), Seq("k"), "left_semi").count()
      assert(r.removed == base.count() - matchedBase)
      assert(r.added == head.count() - matchedBase) // keys unique per side
      assert(r.changed <= matchedBase)
    }
  }

  test("property: row hash invariant under row order, sensitive to value change") {
    forAll(rowsGen) { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("k", "v", "o")
        val h1 = df.orderBy("k").select(DiffEngine.rowHash(Seq("v", "o")).as("h"))
          .collect().map(_.getString(0)).sorted.toSeq
        val h2 = df.orderBy(desc("k")).select(DiffEngine.rowHash(Seq("v", "o")).as("h"))
          .collect().map(_.getString(0)).sorted.toSeq
        assert(h1 == h2)
        val mutated = df.withColumn("v", concat($"v", lit("_x")))
        val h3 = mutated.select(DiffEngine.rowHash(Seq("v", "o")).as("h"))
          .collect().map(_.getString(0)).toSet
        assert(h3.intersect(h1.toSet).isEmpty)
      }
    }
  }

  test("salted join returns the same rows as a plain join") {
    val fact = (1 to 500).map(i => (if (i % 3 == 0) 1 else i % 50, s"row$i")).toDF("k", "payload")
    val dim = (0 to 49).map(i => (i, s"dim$i")).toDF("k", "attr")
    val plain = fact.join(dim, Seq("k")).select("k", "payload", "attr")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = SkewTools.saltedJoin(fact, dim, Seq("k"), buckets = 8)
      .select("k", "payload", "attr")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(plain.sameElements(salted))
  }

  test("salted two-phase aggregation matches direct aggregation") {
    val df = (1 to 1000).map(i => (i % 7, i.toLong)).toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("sum_v"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val salted = SkewTools.saltedSumCount(df, Seq("k"), "v", buckets = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(direct == salted)
  }

  test("property: sorted-merge intersect count equals set intersection (strings and longs)") {
    graft.functions.GraftFunctions.register(spark)
    val setsGen = Gen.listOfN(2, Gen.listOfN(30, Gen.choose(0, 40)))
    forAll(setsGen) { case List(xs, ys) =>
      val expected = xs.toSet.intersect(ys.toSet).size.toLong
      val df = Seq((xs.distinct.sorted.map(_.toLong).toArray,
        ys.distinct.sorted.map(_.toLong).toArray,
        xs.distinct.map(_.toString).sorted.toArray,
        ys.distinct.map(_.toString).sorted.toArray))
        .toDF("la", "lb", "sa", "sb")
      val row = df.select(
        graft.functions.GraftFunctions.sortedIntersectCount($"la", $"lb"),
        graft.functions.GraftFunctions.sortedIntersectCount($"sa", $"sb")).head()
      assert(row.getLong(0) == expected, "long merge")
      // string sort order differs from numeric, but set-intersection size doesn't
      assert(row.getLong(1) == expected, "string merge")
    case other => fail(s"generator shape: $other")
    }
  }

  test("property: as-of direction laws on random event/quote streams") {
    import graft.operators.AsofJoin
    val streamGen = for {
      quotes <- Gen.listOfN(15, Gen.zip(Gen.choose(1, 3), Gen.choose(0, 100)))
      trades <- Gen.listOfN(15, Gen.zip(Gen.choose(1, 3), Gen.choose(0, 100)))
    } yield (quotes.distinct, trades.distinct)
    forAll(streamGen) { case (qs, ts) =>
      val quotes = qs.zipWithIndex.map { case ((k, t), i) => (k.toLong, t.toLong, 100L + i) }
        .toDF("k", "qt", "quote_id")
      val trades = ts.zipWithIndex.map { case ((k, t), i) => (k.toLong, t.toLong, i.toLong) }
        .toDF("k", "tt", "trade_id")
      def run(direction: String) =
        AsofJoin.asofJoin(trades, "k", "tt", quotes, "k", "qt", Seq("quote_id"),
          direction = direction)
          .collect().map(r => r.getAs[Long]("trade_id") ->
            Option(r.getAs[Any]("asof_qt")).map(_.asInstanceOf[Long])).toMap
      val (back, fwd, near) = (run("backward"), run("forward"), run("nearest"))
      val tradeTime = ts.zipWithIndex.map { case ((_, t), i) => i.toLong -> t.toLong }.toMap
      back.keys.foreach { id =>
        // direction bounds
        back(id).foreach(t => assert(t <= tradeTime(id)))
        fwd(id).foreach(t => assert(t >= tradeTime(id)))
        // nearest picks the closer of the two (backward on ties), and is
        // null only when both directions are null
        (back(id), fwd(id)) match {
          case (None, f) => assert(near(id) == f)
          case (b, None) => assert(near(id) == b)
          case (Some(b), Some(f)) =>
            val expectBack = (tradeTime(id) - b) <= (f - tradeTime(id))
            assert(near(id).contains(if (expectBack) b else f))
        }
      }
    }
  }

  test("property: hashed jaccard pairs equal string-form pairs on random corpora") {
    import graft.operators.Dedup
    val docsGen = Gen.listOfN(10, Gen.listOfN(12, Gen.choose(0, 25)))
    forAll(docsGen) { wordLists =>
      val docs = wordLists.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.map(w => s"w$w").mkString(" ")) }
        .toDF("doc_id", "text")
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
      val str = pairs(Dedup.jaccardPairs(docs, "doc_id", "text", Seq(lit(1)), 30))
      val hashed = pairs(Dedup.jaccardPairsHashed(docs, "doc_id", "text", Seq(lit(1)), 30))
      assert(str == hashed)
    }
  }

  test("property: boilerplate scrub with a permissive cap is the identity") {
    import graft.operators.Dedup
    val docsGen = Gen.listOfN(8, Gen.listOfN(11, Gen.choose(0, 30)))
    forAll(docsGen) { wordLists =>
      val docs = wordLists.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.map(w => s"w$w").mkString(" ")) }
      val df = docs.toDF("doc_id", "text")
      // maxDocs >= corpus size -> no span can exceed it -> full reassembly
      val r = Dedup.removeBoilerplateSpans(df, "doc_id", "text", spanWords = 4,
        maxDocs = docs.size.toLong)
        .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("clean_text")).toMap
      docs.foreach { case (id, text) =>
        assert(r(id) == text, s"doc $id not reassembled identically")
      }
    }
  }

  test("property: grouped quantiles match a driver-side sorted scan") {
    import graft.operators.Stats
    val gen = Gen.listOfN(40, for {
      g <- Gen.oneOf("a", "b", "c"); v <- Gen.choose(-50L, 50L)
    } yield (g, v))
    forAll(gen) { rows =>
      val r = Stats.groupedQuantiles(rows.toDF("g", "v"), "g", "v", Seq(10, 50, 90, 100))
        .collect().map(x => (x.getString(0), x.getLong(1)) -> x.getLong(2)).toMap
      rows.groupBy(_._1).foreach { case (g, grp) =>
        val sorted = grp.map(_._2).sorted
        Seq(10, 50, 90, 100).foreach { p =>
          val want = sorted((sorted.size * p + 99) / 100 - 1)
          assert(r((g, p.toLong)) == want, s"group $g p$p")
        }
      }
      // p100 is the max; quantiles are monotone in p
      rows.groupBy(_._1).keys.foreach { g =>
        assert(r((g, 100L)) == rows.filter(_._1 == g).map(_._2).max)
        assert(Seq(10L, 50L, 90L, 100L).map(p => r((g, p))).sliding(2).forall(s => s(0) <= s(1)))
      }
    }
  }

  test("property: topKPerGroup output is a subset with at most k rows per group") {
    import graft.operators.Sampling
    val gen = Gen.listOfN(30, for {
      g <- Gen.oneOf("x", "y"); q <- Gen.choose(0, 9)
    } yield (g, q))
    forAll(gen) { raw =>
      val rows = raw.zipWithIndex.map { case ((g, q), i) => (i.toLong, g, q) }
      val df = rows.toDF("id", "g", "q")
      val out = Sampling.topKPerGroup(df, "g", k = 4, order = Seq(col("q").desc, col("id").asc))
        .collect().map(x => (x.getLong(0), x.getString(1), x.getInt(2)))
      val byG = out.groupBy(_._2)
      byG.foreach { case (_, g) => assert(g.length <= 4) }
      assert(out.map(o => (o._1, o._2, o._3)).toSet.subsetOf(rows.toSet))
      // the cut is the true top by (q desc, id asc)
      rows.groupBy(_._2).foreach { case (g, grp) =>
        val want = grp.sortBy(t => (-t._3, t._1)).take(4).map(_._1).toSet
        assert(byG.get(g).map(_.map(_._1).toSet).getOrElse(Set.empty) == want)
      }
    }
  }

  test("AQE splits a skewed sort-merge join (first-line defense before salting)") {
    // SURVEY §7.3 risk 7 / SkewTools scaladoc claim: AQE's skew-join split
    // is the first line of defense. Prove it engages: one hot key carrying
    // ~95% of rows, broadcast disabled so the join is SMJ, skew thresholds
    // lowered to demo scale. The final adaptive plan must mark the SMJ as a
    // skew join (partition split at runtime), with results identical to the
    // non-adaptive join.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    import s2.implicits._
    val facts = ((1L to 40000L).map(i => (1L, i)) ++ (1L to 2000L).map(i => (i % 40 + 2, i)))
      .toDF("k", "v")
    val dims = (1L to 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val joined = facts.join(dims, "k")
    // execute THIS dataset (count() would plan a separate query execution,
    // and AQE only finalizes the plan of the query that actually ran)
    assert(joined.collect().length == 42000)
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("isSkewJoin=true") || finalPlan.contains("skew=true"),
      s"AQE did not mark the join as skewed:\n${finalPlan.take(800)}")
  }

  test("property: bloom incremental dedup equals the exact path on random corpora") {
    import graft.operators.Dedup
    val docGen = Gen.listOfN(20, Gen.choose(0, 6)
      .map(i => s"content variant $i with shared words"))
    forAll(docGen, docGen) { (corpusTexts, batchTexts) =>
      val corpus = corpusTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val batch = batchTexts.zipWithIndex.map { case (t, i) => (100L + i, t) }
        .toDF("doc_id", "text")
      def ids(df: org.apache.spark.sql.DataFrame) =
        df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      val exact = ids(Dedup.dedupAgainstCorpus(batch, corpus, "doc_id", "text"))
      // tiny saturated sketch AND a roomy one: both must equal exact
      assert(ids(Dedup.dedupAgainstCorpusBloom(batch, corpus, "doc_id", "text", 4L, 0.5)) == exact)
      assert(ids(Dedup.dedupAgainstCorpusBloom(batch, corpus, "doc_id", "text", 1000L, 0.01)) == exact)
    }
  }

  test("property: scrub keeps exactly the tokens outside duplicated windows; stats agree") {
    import graft.operators.Dedup
    // small vocab forces cross-doc window collisions
    val docGen = Gen.listOfN(8, Gen.listOfN(9, Gen.oneOf("a", "b", "c")).map(_.mkString(" ")))
    forAll(docGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val n = 3
      val scrub = Dedup.scrubDuplicatedSpans(df, "doc_id", "text", n)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
      // reference model computed directly in Scala
      val toks = texts.map(_.split("\\s+").filter(_.nonEmpty).toSeq)
      val gramDocs = toks.zipWithIndex
        .flatMap { case (t, d) => t.sliding(n).filter(_.size == n).map(g => (g.mkString(" "), d)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      toks.zipWithIndex.foreach { case (t, d) =>
        val covered = t.indices.filter { j =>
          (math.max(0, j - n + 1) to math.min(j, t.size - n))
            .exists(i => gramDocs.getOrElse(t.slice(i, i + n).mkString(" "), 0) >= 2)
        }.toSet
        val expectKept = t.indices.filterNot(covered).map(t(_))
        val (nt, kept, clean) = scrub(d.toLong)
        assert(nt == t.size.toLong)
        assert(kept == expectKept.size.toLong, s"doc $d kept mismatch")
        assert(clean == expectKept.mkString(" "), s"doc $d text mismatch")
      }
      // the stats operator must count covered-window docs consistently:
      // dup_grams counts flagged STARTS, which is  <= covered positions
      val stats = Dedup.duplicatedSpanStats(df, "doc_id", "text", n)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      toks.zipWithIndex.foreach { case (t, d) =>
        val flaggedStarts = t.sliding(n).filter(_.size == n).zipWithIndex
          .count { case (g, _) => gramDocs.getOrElse(g.mkString(" "), 0) >= 2 }
        assert(stats(d.toLong) == flaggedStarts.toLong, s"doc $d stats mismatch")
      }
    }
  }

  test("property: budget cut is the exact running-total prefix under any partitioning") {
    import graft.operators.Sampling
    val gen = Gen.listOfN(25, Gen.choose(1L, 50L))
    forAll(gen, Gen.choose(1, 8)) { (toks, parts) =>
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("ord", "toks").repartition(parts)
      val budget = toks.sum / 2 max 1L
      val got = Sampling.selectByTokenBudget(df, "ord", "toks", budget)
        .collect().map(r => r.getAs[Long]("ord") -> r.getAs[Long]("cum_tokens")).toMap
      var acc = 0L
      val want = toks.zipWithIndex.flatMap { case (t, i) =>
        acc += t; if (acc <= budget) Some(i.toLong -> acc) else None
      }.toMap
      assert(got == want, s"budget $budget parts $parts")
    }
  }

  test("property: no byte parser ever throws — arbitrary bytes decode to None/empty") {
    import graft.operators.{Multimodal, Robots, Warc}
    val bytesGen = Gen.choose(0, 600).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte)).map(_.toArray))
    forAll(bytesGen) { raw =>
      // a malformed payload must yield an empty/None result, NEVER an
      // exception — at corpus scale one bad record must not kill a task
      Multimodal.decodePpm(raw); Multimodal.resizePpm(raw, 2, 2)
      Multimodal.decodePpmStats(raw); Multimodal.aHashPpm(raw)
      Multimodal.decodeWav(raw); Multimodal.decodeBmp(raw); Multimodal.decodePng(raw)
      Multimodal.decodeJpeg(raw); Multimodal.decodeGif(raw)
      Multimodal.parseExif(raw); Multimodal.parseMp4Meta(raw)
      Multimodal.parseFlacMeta(raw); Multimodal.parseMp3Meta(raw)
      Multimodal.ppmResize(raw, 2)
      Warc.parseWarc(raw)
      Robots.parse(new String(raw, "ISO-8859-1"), "bot")
    }
    // adversarial prefixes: real magic bytes followed by garbage — the
    // parsers get past the signature and must still bail cleanly
    val magics = Seq(
      "P6\n".getBytes("US-ASCII"),
      "BM".getBytes("US-ASCII"),
      "RIFF".getBytes("US-ASCII"),
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
      Array(0xff, 0xd8, 0xff).map(_.toByte),
      "GIF89a".getBytes("US-ASCII"),
      Array[Byte](0, 0, 0, 20) ++ "ftypisom".getBytes("US-ASCII"),
      Array(0xff, 0xd8, 0xff, 0xe1, 0x00, 0x40).map(_.toByte) ++
        "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0),
      "WARC/1.0\r\n".getBytes("US-ASCII"),
      "fLaC".getBytes("US-ASCII") ++ Array[Byte](0x00, 0x00, 0x00, 0x22),
      "ID3".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0))
    forAll(bytesGen) { tail =>
      magics.foreach { m =>
        val payload = m ++ tail
        Multimodal.decodePpm(payload); Multimodal.aHashPpm(payload)
        Multimodal.decodeBmp(payload); Multimodal.decodeWav(payload)
        Multimodal.decodePng(payload); Multimodal.decodeJpeg(payload)
        Multimodal.decodeGif(payload)
        Multimodal.parseExif(payload); Multimodal.parseMp4Meta(payload)
        Multimodal.parseFlacMeta(payload); Multimodal.parseMp3Meta(payload)
        Multimodal.ppmResize(payload, 2)
        Warc.parseWarc(payload)
      }
    }
    // crafted BMP whose width passes the Int.MaxValue/3 area guard with
    // h=1 but overflows (w*3+3) in Int arithmetic — the rowSize/bounds
    // math must run in Long so this is a clean None, not an AIOOBE
    val evil = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil.put('B'.toByte).put('M'.toByte).putInt(64).putInt(0).putInt(54)
      .putInt(40).putInt(715827882).putInt(1)
      .putShort(1).putShort(24).putInt(0).putInt(0)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    assert(Multimodal.decodeBmp(evil.array()).isEmpty)
  }

  test("property: sniffMime dispatch table enumerated — every branch classified and fuzzed") {
    import graft.operators.Multimodal
    // the FULL dispatch table of Multimodal.sniffMime, one row per `when`
    // branch variant (both GIF signatures, all four PPM whitespace forms),
    // each paired with the decoder that branch routes to — so a new
    // signature added to sniffMime without a row here fails the count check
    val wavMagic = "RIFF".getBytes("US-ASCII") ++ Array[Byte](16, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII")
    val table: Seq[(String, Array[Byte], Array[Byte] => Any)] = Seq(
      ("image/png", Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte), Multimodal.decodePng(_)),
      ("image/jpeg", Array(0xff, 0xd8, 0xff).map(_.toByte), Multimodal.decodeJpeg(_)),
      ("image/gif", "GIF87a".getBytes("US-ASCII"), Multimodal.decodeGif(_)),
      ("image/gif", "GIF89a".getBytes("US-ASCII"), Multimodal.decodeGif(_)),
      ("image/bmp", "BM".getBytes("US-ASCII"), Multimodal.decodeBmp(_)),
      ("audio/wav", wavMagic, Multimodal.decodeWav(_)),
      ("image/x-portable-pixmap", "P6\n".getBytes("US-ASCII"), Multimodal.decodePpm(_)),
      ("image/x-portable-pixmap", "P6\r".getBytes("US-ASCII"), Multimodal.decodePpm(_)),
      ("image/x-portable-pixmap", "P6\t".getBytes("US-ASCII"), Multimodal.decodePpm(_)),
      ("image/x-portable-pixmap", "P6 ".getBytes("US-ASCII"), Multimodal.decodePpm(_)))
    // the sniffer has exactly these non-default outcomes — a dispatch-table
    // drift (new mime, dropped mime) breaks this enumeration loudly
    assert(table.map(_._1).distinct.sorted ==
      Seq("audio/wav", "image/bmp", "image/gif", "image/jpeg", "image/png",
        "image/x-portable-pixmap"))
    // 1) classification: every branch's magic (padded) hits its mime
    val rows = table.zipWithIndex.map { case ((mime, magic, _), i) =>
      (i, mime, magic ++ Array.fill[Byte](16)(0x41)) }
    rows.toDF("i", "want", "payload")
      .select(col("i"), col("want"), Multimodal.sniffMime(col("payload")).as("got"))
      .collect().foreach(r =>
        assert(r.getString(1) == r.getString(2), s"branch ${r.getInt(0)}"))
    // null payload and near-miss magics fall through to octet-stream
    val nearMiss = Seq(Array[Byte](), "P6X".getBytes("US-ASCII"),
      "RIFF0000JUNK".getBytes("US-ASCII"), "GIF88a".getBytes("US-ASCII"),
      Array(0x89, 0x50, 0x4e, 0x48).map(_.toByte))
    nearMiss.zipWithIndex.map { case (b, i) => (i, b) }.toDF("i", "payload")
      .union(Seq((99, null.asInstanceOf[Array[Byte]])).toDF("i", "payload"))
      .select(Multimodal.sniffMime(col("payload")).as("m")).collect()
      .foreach(r => assert(r.getString(0) == "application/octet-stream"))
    // 2) fuzz: each branch's decoder must survive its magic + arbitrary tail
    val tailGen = Gen.choose(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte)).map(_.toArray))
    forAll(tailGen) { tail =>
      table.foreach { case (_, magic, dec) => dec(magic ++ tail) }
    }
  }

  test("property: misra-gries never overcounts and keeps every heavy item") {
    import graft.functions.HeavyHitters
    val gen = Gen.listOfN(200, Gen.choose(0, 15))
    forAll(gen) { raw =>
      val items = raw.map(i => if (i < 4) "hot" + i else "cold" + i) // skew mass onto 4 items
      val cap = 7
      val sketch = items.foldLeft(Map.empty[String, Long])(HeavyHitters.offer(_, _, cap))
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      sketch.foreach { case (k, c) => assert(c <= truth(k), s"$k overcounted") }
      val bound = items.size.toLong / (cap + 1)
      truth.filter(_._2 > bound).keys.foreach { k =>
        assert(sketch.contains(k), s"heavy item $k missing (bound $bound)")
        assert(sketch(k) >= truth(k) - bound, s"$k below certified bound")
      }
    }
  }

  test("property: digest-narrowed diff counts equal the full diff on random mutations") {
    forAll(rowsGen, Gen.choose(1, 20)) { (rows, pivot) =>
      val base = rows.toDF("k", "v", "o")
      val head = base.filter($"k" > pivot % 7)
        .withColumn("v", when($"k" % 3 === 0, concat($"v", lit("!"))).otherwise($"v"))
        .unionByName(base.filter($"k" % 4 === 0)
          .select(($"k" + 100).as("k"), $"v", $"o"))
      val full = (
        DiffEngine.added(base, head, Seq("k")).count(),
        DiffEngine.removed(base, head, Seq("k")).count(),
        DiffEngine.changed(base, head, Seq("k"), Seq("v", "o")).count())
      val nar = DiffEngine.diffBySegments(base, head, "k", Seq("v", "o"), 8)
        .collect().head
      assert((nar.getLong(2), nar.getLong(3), nar.getLong(4)) == full)
    }
  }

  test("property: string parsers never throw on arbitrary garbage (quarantine contract)") {
    import graft.operators.{NetTools, TextAnalysis, UrlTools}
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    // arbitrary unicode-ish strings plus adversarial prefixes that LOOK
    // like the grammars (half a log line, a dotted quad with junk, a '?')
    val garbage: Gen[String] = Gen.oneOf(
      Gen.asciiPrintableStr.map(_.take(60)),
      Gen.listOfN(20, Gen.choose(0, 0x2fff)).map(_.map(_.toChar).mkString),
      Gen.asciiPrintableStr.map(s => "1.2.3." + s.take(10)),
      Gen.asciiPrintableStr.map(s => "10.0.0.1 - u [x] \"GET " + s.take(12)),
      Gen.asciiPrintableStr.map(s => "http://a/?" + s.take(20) + "&=&x"))
    forAll(Gen.listOfN(24, garbage)) { strs =>
      val df = strs.toDF("s")
      // every parser must evaluate every row without a task failure
      val out = df.select(
        NetTools.ipv4ToLong(col("s")).as("ip"),
        map_keys(UrlTools.queryParams("s")).as("pk"),
        TextAnalysis.ibanCounts("s")._1.as("ic"))
      assert(out.count() == strs.size)
      val logs = TextAnalysis.parseAccessLog(df.withColumnRenamed("s", "line"), "line")
      // and the log parser marks them all cleanly parsed-or-not
      assert(logs.select(sum(col("parsed"))).collect().head.getLong(0) >= 0)
    }
  }

  test("property: JVM langid normalization and trigram counts match the SQL twins on hostile unicode") {
    import graft.operators.TextAnalysis
    // the doc-local langid re-plan (r11) rests on triNormJvm ==
    // triNorm(Column) — exercise the divergence surface deliberately:
    // 1:N lowercase mappings (U+0130 -> i + combining dot), combining
    // marks, supplementary-plane chars, every ASCII whitespace class,
    // runs of junk at the ends (trim), and digits/underscores
    val piece: Gen[String] = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString),
      Gen.oneOf(" ", "\t", "\n", "\r", "", "\f", "  ", " \t "),
      Gen.oneOf("é", "Ü", "ß", "İ", "ı", "Ñ", "Ω", "з", "̇"),
      Gen.oneOf(new String(Character.toChars(0x1D54F)), new String(Character.toChars(0x1F600)),
        new String(Character.toChars(0x10348))),
      Gen.oneOf(".", ",", "!", "#", "@", "_", "-", "'", "\"", "()"))
    val textGen: Gen[String] = Gen.listOfN(60, piece).map(_.mkString)
    forAll(Gen.listOfN(12, textGen)) { strs =>
      val sqlNorm = strs.toDF("t")
        .select(TextAnalysis.triNorm("t").as("n")).collect().map(_.getString(0))
      strs.zip(sqlNorm).foreach { case (s, viaSql) =>
        val viaJvm = TextAnalysis.triNormJvm(s)
        assert(viaJvm == viaSql, s"norm diverged on ${s.take(40).map(c => f"\\u${c.toInt}%04x").mkString}")
        // packed trigram counts == a direct sliding-window recount
        val expected = (if (viaJvm.length >= 3) viaJvm.sliding(3).toSeq else Seq.empty)
          .groupBy(identity).map { case (t, g) => t -> g.size }
        val got = TextAnalysis.triCountsPacked(s).map { case (k, n) =>
          val t = new String(Array(((k >> 16) & 0x7f).toChar, ((k >> 8) & 0x7f).toChar, (k & 0x7f).toChar))
          t -> n
        }.toMap
        assert(got == expected, s"counts diverged on '$viaJvm'")
      }
    }
  }

  test("property: kmv sketch is a pure function of the input set across any split") {
    // merge(fold(A), fold(B)) == fold(A ++ B) == fold(shuffled, deduped) —
    // the invariant that makes the estimate layout/order/dup-independent
    val hashGen: Gen[List[Long]] =
      Gen.listOfN(60, Gen.choose(0L, 1L << 20)) // dense: forces duplicates
    forAll(hashGen, hashGen) { (a, b) =>
      val agg = new graft.functions.KmvAggregator(8)
      def fold(xs: Seq[Long]) = xs.foldLeft(agg.zero)(agg.reduce)
      val merged = agg.merge(fold(a), fold(b))
      val direct = fold(a ++ b)
      val viaSet = fold(scala.util.Random.shuffle((a ++ b).distinct))
      assert(merged.toSeq == direct.toSeq, "merge != sequential fold")
      assert(viaSet.toSeq == direct.toSeq, "order/dup sensitivity")
      assert(direct.toSeq == direct.toSeq.distinct.sorted && direct.length <= 8,
        "buffer must stay sorted, distinct, bounded")
    }
  }

  test("property: char entropy HOF fold equals an independent JVM histogram on arbitrary text") {
    // the oracle gate certifies the fold against DuckDB on the fixture
    // corpus; this pins it against a SECOND independent truth (JVM-side
    // codepoint histogram) on arbitrary generated text incl. whitespace
    // runs and repeated chars
    val textGen: Gen[String] = Gen.listOfN(80,
      Gen.frequency(6 -> Gen.alphaLowerChar, 2 -> Gen.const(' '),
        1 -> Gen.const('z'), 1 -> Gen.numChar)).map(_.mkString)
    def hb(n: Long): Long = java.lang.Long.toBinaryString(n * n).length - 1L
    forAll(textGen) { text =>
      val counts = text.codePoints().toArray.groupBy(identity)
        .map(_._2.length.toLong)
      val n = counts.sum
      val expNumer = if (n == 0) 0L else n * hb(n) - counts.map(c => c * hb(c)).sum
      val row = graft.operators.TextAnalysis
        .charEntropyHalfBits(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
        .collect()(0)
      assert(row.getAs[Long]("n_cp") == n)
      assert(row.getAs[Long]("ent_numer_hb") == expNumer, s"text=$text")
      assert(row.getAs[Long]("ent_numer_hb") >= 0L)
    }
  }

  test("property: blocklist hits equal brute-force membership counts on random token streams") {
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val toksGen: Gen[List[String]] = Gen.listOfN(14, Gen.oneOf(vocab))
    val phrases = Seq("bb", "ee", "aa cc", "dd dd")
    forAll(toksGen) { toks =>
      val text = toks.mkString(" ")
      val uni = toks.count(t => t == "bb" || t == "ee").toLong
      val bi = toks.sliding(2).count(p =>
        p.length == 2 && (p.mkString(" ") == "aa cc" || p.mkString(" ") == "dd dd")).toLong
      val r = graft.operators.TextAnalysis
        .blocklistHits(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", phrases)
        .collect()(0)
      assert(r.getAs[Long]("n_uni_hits") == uni, s"uni on '$text'")
      assert(r.getAs[Long]("n_bi_hits") == bi, s"bi on '$text'")
      assert(r.getAs[Long]("blocked") == (if (uni + bi > 0) 1L else 0L))
    }
  }

  test("property: semantic boundary outputs respect their structural invariants") {
    val textGen: Gen[String] = Gen.listOfN(30,
      Gen.oneOf("ant", "bee", "cat", "dog", "eel", "fox")).map(_.mkString(" "))
    forAll(textGen) { text =>
      val bt = 4
      val nt = text.split("\\s+").count(_.nonEmpty).toLong
      val r = graft.operators.TextAnalysis
        .semanticBoundaries(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", bt)
        .collect()(0)
      val (nb, ng) = (r.getAs[Long]("n_blocks"), r.getAs[Long]("n_gaps"))
      assert(nb == (nt + bt - 1) / bt)
      assert(ng == math.max(nb - 1, 0L))
      assert(r.getAs[Long]("max_depth") >= 0L)
      val k = r.getAs[Long]("n_boundaries")
      assert(k >= 0L && k <= ng)
      val first = r.getAs[Long]("first_boundary")
      assert((k == 0L) == (first == -1L))
      if (k > 0L) assert(first >= 1L && first <= ng)
    }
  }

  test("property: psiDrift(x, x) is exactly zero and terms stay nonnegative on random pairs") {
    val catGen: Gen[List[Option[String]]] = Gen.listOfN(20,
      Gen.option(Gen.oneOf("a", "b", "c", "d")))
    forAll(catGen, catGen) { (xs, ys) =>
      val dx = xs.toDF("s")
      val same = DiffEngine.psiDrift(dx, dx, "s").collect()
      assert(same.forall(_.getAs[Long]("psi_term_hb") == 0L),
        "identical sides (incl. NULL categories) must score zero")
      val cross = DiffEngine.psiDrift(dx, ys.toDF("s"), "s").collect()
      assert(cross.forall(_.getAs[Long]("psi_term_hb") >= 0L))
      // one row per distinct category across BOTH sides, NULL counted once
      val union = (xs ++ ys).distinct.size
      assert(cross.length == union)
    }
  }

  test("property: advisor prefix mass equals a JVM brute-force over the same postings definition") {
    // independent truth: rebuild the rare-first prefix postings in plain
    // Scala (df order by (df, tokenHash)) and sum c*(c-1)/2 per token
    val docsGen: Gen[List[List[String]]] = Gen.listOfN(10,
      Gen.listOfN(6, Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg")))
    val pct = 50
    def tokHash(t: String): Long =
      t.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 144115188075855859L)
    forAll(docsGen) { docs =>
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val sets = docs.map(_.map(tokHash).distinct.sorted)
      val dfreq = sets.flatten.groupBy(identity).map { case (h, xs) => h -> xs.size }
      val prefixPost = sets.flatMap { ts =>
        val n = ts.size
        val keep = n - (n * pct + 99) / 100 + 1
        ts.sortBy(h => (dfreq(h), h)).take(keep)
      }.groupBy(identity).map(_._2.size.toLong)
      val expected = prefixPost.map(c => c * (c - 1) / 2).sum
      val row = graft.operators.Dedup
        .similarityJoinAdvisor(df, "doc_id", "text", pct).collect()(0)
      assert(row.getAs[String]("pred_pairs_prefix").toLong == expected,
        s"docs=$docs")
      assert(row.getAs[Long]("n_prefix_postings") == prefixPost.sum)
    }
  }

  test("property: lsh mass conservation — emitted + skipped is cap-invariant and bounds distinct pairs") {
    import graft.operators.Dedup
    val docsGen: Gen[List[List[String]]] = Gen.listOfN(8,
      Gen.listOfN(5, Gen.oneOf("tok1", "tok2", "tok3", "tok4")))
    forAll(docsGen) { docs =>
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      def massAt(cap: Int) = {
        val r = Dedup.lshCandidateMass(df, "doc_id", "text", maxBucketSize = cap).collect()(0)
        (r.getAs[String]("pred_pairs_emitted").toLong,
          r.getAs[String]("pairs_skipped_capped").toLong)
      }
      val (e500, s500) = massAt(500)
      val (e2, s2) = massAt(2)
      // total bucket mass is a property of the corpus, not the cap
      assert(e500 + s500 == e2 + s2, s"docs=$docs")
      // emitted mass bounds the distinct pair output at the same cap
      assert(Dedup.minHashLshPairs(df, "doc_id", "text").count() <= e500)
      assert(Dedup.minHashLshPairs(df, "doc_id", "text", maxBucketSize = 2).count() <= e2)
    }
  }

  test("property: lm cross-entropy equals an independent JVM model on random corpora") {
    def hb(n: Long): Long = (BigInt(n) * BigInt(n)).bitLength - 1L
    val docsGen: Gen[List[List[String]]] = Gen.listOfN(6,
      Gen.listOfN(8, Gen.oneOf("u", "v", "w", "x", "y", "z")))
    forAll(docsGen) { docs =>
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val bigrams = docs.flatMap(ws => ws.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
      val c12 = bigrams.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
      val c1 = bigrams.groupBy(_._1).map { case (k, xs) => k -> xs.size.toLong }
      val v = bigrams.map(_._2).distinct.size.toLong
      val got = graft.operators.TextAnalysis
        .lmCrossEntropyHalfBits(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      docs.zipWithIndex.foreach { case (ws, i) =>
        val bg = ws.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))).toList
        val num = bg.map { b => hb(c1(b._1) + v) - hb(c12(b) + 1) }.sum
        assert(got(i.toLong) == ((bg.size.toLong, num)), s"doc $i of $docs")
        assert(num >= 0L)
      }
    }
  }

  test("property: vocab coverage equals a brute-force frequency walk on random corpora") {
    import graft.operators.TextAnalysis
    val docsGen: Gen[List[List[String]]] = Gen.listOfN(7,
      Gen.listOfN(9, Gen.oneOf("a", "b", "c", "d", "e", "f", "g")))
    val targets = Seq(3000, 7500, 10000)
    forAll(docsGen) { docs =>
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val freqs = docs.flatten.groupBy(identity).map(_._2.size.toLong).toSeq
        .sorted(Ordering[Long].reverse)
      val total = freqs.sum
      val got = TextAnalysis.vocabCoverage(df, "text", targets)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      targets.foreach { bp =>
        val need = (total * bp + 9999) / 10000
        // within-frequency ties are interchangeable, so ANY desc walk
        // reaches the same minimal k and the same covered mass
        var cum = 0L; var k = 0L
        while (cum < need) { cum += freqs(k.toInt); k += 1 }
        assert(got(bp.toLong) == ((k, cum, total)), s"bp=$bp docs=$docs")
      }
    }
  }

  test("property: canary leakage equals the set model for random plants and splits") {
    import graft.operators.TextAnalysis
    val gen: Gen[List[(Long, Int, String)]] = Gen.listOfN(10, for {
      c <- Gen.choose(0, 3) // canary id
      s <- Gen.oneOf("train", "val", "test")
    } yield (c, s)).map(_.zipWithIndex.map { case ((c, s), i) => (i.toLong, c, s) })
    forAll(gen) { rows =>
      val df = rows.map { case (id, c, s) => (id, s"filler C-$c text", s) }
        .toDF("doc_id", "text", "split")
      val got = TextAnalysis.canaryLeakage(df, "doc_id", "text", "split", "C-[0-9]+")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))).toMap
      rows.groupBy(_._2).foreach { case (c, rs) =>
        val splits = rs.map(_._3).distinct.sorted
        assert(got(s"C-$c") == ((rs.map(_._1).distinct.size.toLong,
          splits.size.toLong, splits.mkString(","),
          if (splits.size > 1) 1L else 0L)), s"canary $c of $rows")
      }
      assert(got.size == rows.map(_._2).distinct.size)
    }
  }

  test("property: cross-source dup matrix equals brute-force pair counting") {
    import graft.operators.Dedup
    val gen: Gen[List[(String, String)]] = Gen.listOfN(14, for {
      t <- Gen.oneOf("t1", "t2", "t3", "t4")
      s <- Gen.oneOf("A", "B", "C")
    } yield (t, s))
    forAll(gen) { rows =>
      val df = rows.zipWithIndex.map { case ((t, s), i) => (i.toLong, t, s) }
        .toDF("doc_id", "text", "source")
      val got = Dedup.crossSourceDupMatrix(df, "text", "source")
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      val bySrc = rows.groupBy(identity).toSeq
        .map { case ((t, s), xs) => (t, s) -> xs.size.toLong }
      val expected = (for {
        ((ta, sa), ca) <- bySrc; ((tb, sb), cb) <- bySrc
        if ta == tb && sa < sb
      } yield ((sa, sb), (1L, ca * cb, ca, cb)))
        .groupBy(_._1).map { case (k, vs) =>
          k -> vs.map(_._2).reduce[(Long, Long, Long, Long)] {
            case ((a1, b1, c1, d1), (a2, b2, c2, d2)) => (a1 + a2, b1 + b2, c1 + c2, d1 + d2)
          }
        }
      assert(got == expected, s"rows=$rows")
    }
  }

  test("property: lsh recall certificate's exact side equals brute-force shingle jaccard; counts reconcile") {
    import graft.operators.Dedup
    val P = 144115188075855859L
    def shingleSet(ws: List[String]): Set[Long] =
      ws.sliding(3).filter(_.size == 3).map { tri =>
        tri.mkString(" ").foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P)
      }.toSet
    val docsGen: Gen[List[List[String]]] = Gen.listOfN(9,
      Gen.listOfN(6, Gen.oneOf("p", "q", "r", "s")))
    forAll(docsGen) { docs =>
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val sets = docs.zipWithIndex.map { case (ws, i) => i.toLong -> shingleSet(ws) }
      val truth = (for {
        (ia, sa) <- sets; (ib, sb) <- sets
        if ia < ib && sa.nonEmpty && sb.nonEmpty
        inter = (sa & sb).size.toLong
        if inter * 150 >= (sa.size + sb.size) * 50
      } yield (ia, ib)).size.toLong
      val r = Dedup.lshRecallCertificate(df, "doc_id", "text", minJaccardPct = 50).head()
      val (ex, lsh, common, only, recall) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ex == truth, s"docs=$docs") // prefix-filter completeness, tested
      assert(common <= math.min(ex, lsh) && only == lsh - common)
      assert(recall == (if (ex == 0) 1000L else common * 1000 / ex))
    }
  }

  test("property: margin mining equals the JVM quantized-cosine model on random vectors") {
    import graft.operators.Similarity
    val vecGen: Gen[List[Array[Float]]] = Gen.listOfN(5,
      Gen.listOfN(4, Gen.choose(-4, 4)).map(_.map(_.toFloat).toArray))
        .suchThat(_.forall(_.exists(_ != 0f)))
    val k = 2
    forAll(vecGen, vecGen) { (as, bs) =>
      val a = as.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
      val b = bs.zipWithIndex.map { case (v, i) => (100L + i, v) }.toDF("vec_id", "embedding")
      val got = Similarity.marginBitextPairs(a, b, "vec_id", "embedding", k, minMarginX1k = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      def q(x: Array[Float], y: Array[Float]): Long = {
        var dot = 0.0; var nx = 0.0; var ny = 0.0
        for (i <- x.indices) {
          dot += x(i).toDouble * y(i).toDouble
          nx += x(i).toDouble * x(i).toDouble; ny += y(i).toDouble * y(i).toDouble
        }
        math.max(
          math.floor(dot / (math.sqrt(nx) * math.sqrt(ny)) * 1000000).toLong + 1000000L, 0L)
      }
      val pairs = for { (av, i) <- as.zipWithIndex; (bv, j) <- bs.zipWithIndex }
        yield (i.toLong, 100L + j, q(av, bv))
      def topSum(xs: Seq[Long]) =
        (xs.sorted(Ordering[Long].reverse).take(k).sum, math.min(k, xs.size).toLong)
      val expected = pairs.groupBy(_._1).flatMap { case (aid, ps) =>
        val scored = ps.map { case (_, bid, s) =>
          val (sa, ka) = topSum(pairs.filter(_._1 == aid).map(_._3))
          val (sb, kb) = topSum(pairs.filter(_._2 == bid).map(_._3))
          (bid, s, 2000L * s * ka * kb / (sa * kb + sb * ka))
        }
        // best by (margin desc, b_id asc) — the operator's rank order
        val best = scored.minBy { case (bid, _, m) => (-m, bid) }
        Some((aid, best._1, best._2 - 1000000L, best._3))
      }.toSet
      assert(got == expected, s"as=${as.map(_.toList)} bs=${bs.map(_.toList)}")
    }
  }

  test("property: native token-set blocklist equals the array-scan plan on random corpora and lists") {
    import graft.operators.TextAnalysis
    val word = Gen.oneOf("dup", "fast", "table", "hash", "x1", "x2", "İ")
    val docsGen: Gen[List[List[String]]] = Gen.listOfN(6, Gen.listOfN(7, word))
    val listGen: Gen[List[String]] = Gen.listOfN(5, Gen.oneOf(
      "dup", "fast", "table hash", "x1 x2", "İ", "absent", "no where"))
    forAll(docsGen, listGen) { (docs, phrases) =>
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val a = TextAnalysis.blocklistHits(df, "doc_id", "text", phrases.distinct)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val b = TextAnalysis.blocklistHitsLarge(df, "doc_id", "text", phrases.distinct)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(a == b, s"docs=$docs phrases=$phrases")
    }
  }

  test("property: histogram-merge vocab coverage equals the full recompute under any split") {
    import graft.operators.TextAnalysis
    val docsGen: Gen[List[List[String]]] = Gen.listOfN(8,
      Gen.listOfN(6, Gen.oneOf("a", "b", "c", "d", "e")))
    forAll(docsGen, Gen.choose(0, 7)) { (docs, pivot) =>
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      def hist(side: org.apache.spark.sql.DataFrame) =
        side.select(explode(TextAnalysis.tokens("text")).as("t"))
          .groupBy("t").agg(count(lit(1)).as("c"))
      val merged = hist(df.filter($"doc_id" <= pivot))
        .unionByName(hist(df.filter($"doc_id" > pivot)))
        .groupBy("t").agg(sum($"c").as("c"))
      val m = TextAnalysis.vocabCoverageFromCounts(merged, "t", "c", Seq(5000, 9900))
        .orderBy("target_bp").collect().map(_.toSeq).toSeq
      val full = TextAnalysis.vocabCoverage(df, "text", Seq(5000, 9900))
        .orderBy("target_bp").collect().map(_.toSeq).toSeq
      assert(m == full, s"docs=$docs pivot=$pivot")
    }
  }

  test("property: filter order advisor equals the JVM greedy model on random predicates") {
    import graft.operators.TextAnalysis
    val gen: Gen[List[(Long, Long)]] = Gen.listOfN(10,
      for { a <- Gen.choose(0L, 9L); b <- Gen.choose(0L, 9L) } yield (a, b))
    forAll(gen) { rows =>
      val df = rows.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("id", "a", "b")
      val preds: Seq[(String, Long, (Long, Long) => Boolean)] = Seq(
        ("f_a_even", 3L, (a, _) => a % 2 == 0),
        ("f_b_big", 7L, (_, b) => b >= 5),
        ("f_sum", 2L, (a, b) => a + b >= 9))
      val got = TextAnalysis.filterOrderAdvisor(df,
          preds.map { case (n, c, _) => (n, expr(n match {
            case "f_a_even" => "a % 2 = 0"
            case "f_b_big"  => "b >= 5"
            case "f_sum"    => "a + b >= 9"
          }), c) })
        .collect().map(r => r.getString(0) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val n = rows.size.toLong
      val model = preds.map { case (name, cost, p) =>
        val passBp = rows.count(r => p(r._1, r._2)).toLong * 10000 / n
        (name, cost, passBp, (10000 - passBp) * 1000 / cost)
      }
      val ranked = model.sortBy { case (name, _, _, dpc) => (-dpc, name) }.zipWithIndex
      ranked.foreach { case ((name, _, passBp, dpc), i) =>
        assert(got(name) == ((passBp, dpc, i + 1L)), s"$name of $rows")
      }
    }
  }

  test("property: multi-domain mixture with K=1 degrades to the single weight for any mix scale") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (mix <- Seq(1L, 250L, 1000000L)) {
      val m = graft.operators.Dsir.multiDomainWeights(docs, "doc_id", "text",
          Seq("zh" -> (col("lang") === "zh")), Seq(mix))
        .collect().map(r => r.getLong(0) ->
          ((r.getAs[Long]("w_zh_x1000"), r.getAs[Long]("mix_weight_x1000")))).toMap
      // mix = (mix * (w + 256000)) div mix - 256000 == w exactly, any scale
      m.foreach { case (id, (w, mx)) => assert(mx == w, s"doc $id mix=$mix") }
    }
  }
}
