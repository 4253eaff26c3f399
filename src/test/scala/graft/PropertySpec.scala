package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.HashingUtil

/** Property-based checks (SURVEY.md §5.4) for the pure kernels and the
  * week-of-month arithmetic. Uses scalacheck generators with fixed seeds
  * (deterministic CI) sampled manually — no scalatestplus bridge in the
  * offline cache.
  */
class PropertySpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int = 200): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val dates = for {
    y <- Gen.choose(1980, 2080)
    m <- Gen.choose(1, 12)
    d <- Gen.choose(1, 28)
    dd <- Gen.choose(d, java.time.YearMonth.of(y, m).lengthOfMonth())
  } yield java.time.LocalDate.of(y, m, dd)

  test("week-of-month formula stays in [1,5] and equals ceil(dom/7)") {
    samples(dates).foreach { d =>
      val w = (d.getDayOfMonth - 1) / 7 + 1
      assert(w >= 1 && w <= 5)
      assert(w == math.ceil(d.getDayOfMonth / 7.0).toInt)
    }
  }

  test("rolling shingle hashes: deterministic, sorted, distinct") {
    val gen = Gen.zip(Gen.alphaNumStr.map(_.take(200)), Gen.choose(2, 8))
    samples(gen).foreach { case (s, n) =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      val a = HashingUtil.rollingShingleHashes(u, n).toLongArray()
      val b = HashingUtil.rollingShingleHashes(u, n).toLongArray()
      assert(a.toSeq == b.toSeq)
      assert(a.toSeq == a.sorted.toSeq && a.distinct.length == a.length)
      if (s.nonEmpty) {
        val windows = s.length - math.min(n, s.length) + 1
        assert(a.nonEmpty && a.length <= windows)
      } else assert(a.isEmpty)
    }
  }

  test("minhash signature of a superset dominates elementwise") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val gen = Gen.zip(Gen.nonEmptyListOf(Gen.long), Gen.nonEmptyListOf(Gen.long))
    samples(gen, 100).foreach { case (xs, extra) =>
      val base = HashingUtil.minhashSignature(new GenericArrayData(xs.toArray), 16).toLongArray()
      val sup = HashingUtil.minhashSignature(new GenericArrayData((xs ++ extra).toArray), 16).toLongArray()
      base.zip(sup).foreach { case (b, s) => assert(s <= b) }
    }
  }

  test("simhash is a pure function of the token sequence") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def sig(ts: Seq[String]) = HashingUtil.simhash64(HashingUtil.hashStrings(
      new GenericArrayData(ts.map(UTF8String.fromString).toArray)))
    samples(Gen.nonEmptyListOf(Gen.identifier), 100).foreach { tokens =>
      assert(sig(tokens) == sig(tokens))
    }
  }

  test("topk buffer returns the true top-k under any insertion order") {
    val gen = Gen.zip(
      Gen.listOf(Gen.zip(Gen.choose(-100.0, 100.0), Gen.choose(0L, 50L))),
      Gen.choose(1, 10))
    samples(gen, 100).foreach { case (xs, k) =>
      val buf = new graft.functions.TopKBuffer(k)
      xs.foreach { case (s, i) => buf.add(s, i) }
      val expected = xs.sortBy { case (s, i) => (-s, i) }.take(k)
      assert(buf.sorted.toSeq == expected)
    }
  }

  test("md5 minhash: in-range, deterministic, and superset-dominated") {
    import org.apache.spark.unsafe.types.UTF8String
    val gen = Gen.zip(Gen.alphaNumStr.map(_.take(120)), Gen.alphaNumStr.map(_.take(40)))
    samples(gen, 100).foreach { case (s, suffix) =>
      val u = UTF8String.fromString(s)
      val a = HashingUtil.md5MinhashSig(u, 5, 16).toLongArray()
      val b = HashingUtil.md5MinhashSig(u, 5, 16).toLongArray()
      assert(a.toSeq == b.toSeq)
      a.foreach(v => assert(v >= 0 && v < HashingUtil.P31))
      if (s.length >= 5 && suffix.nonEmpty) {
        // appending text only ADDS shingles: mins can only decrease
        val sup = HashingUtil.md5MinhashSig(
          UTF8String.fromString(s + s.takeRight(4) + suffix), 5, 16).toLongArray()
        // (s's own shingles are all still present in the longer string)
        a.zip(sup).foreach { case (x, y) => assert(y <= x) }
      }
    }
  }

  test("word shingle kernel: distinct, sorted, count bounded by token windows") {
    import org.apache.spark.unsafe.types.UTF8String
    val word = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString.take(8))
    val gen = Gen.zip(Gen.listOf(word).map(_.take(30)), Gen.choose(2, 5))
    samples(gen, 150).foreach { case (words, n) =>
      val text = words.mkString(" ")
      val arr = HashingUtil.distinctWordShingles(UTF8String.fromString(text), n)
      val out = (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
      assert(out == out.sorted && out.distinct.size == out.size)
      if (words.size < n) assert(out == Seq(words.map(_.toLowerCase).mkString(" ")))
      else {
        assert(out.size <= words.size - n + 1)
        out.foreach(g => assert(g.split(" ").length == n))
      }
    }
  }

  test("greedy packing: bins respect the budget except oversize singletons") {
    val gen = Gen.nonEmptyListOf(Gen.choose(1L, 80L)).map(_.take(60))
    samples(gen, 60).foreach { tokens =>
      val budget = 100L
      // replay the packAssignments recurrence directly (pure logic)
      var bin = 0L; var total = 0L; var used = false; var closed = false
      val assign = tokens.zipWithIndex.map { case (t, i) =>
        if (closed || (used && total + t > budget)) { bin += 1; total = 0 }
        total += t; closed = total >= budget; used = true
        (i.toLong, bin, t)
      }
      assign.groupBy(_._2).foreach { case (_, items) =>
        val sum = items.map(_._3).sum
        assert(sum <= budget || items.size == 1, s"overfull bin: $items")
      }
      // bins are contiguous in item order
      val byOrder = assign.map(_._2)
      assert(byOrder == byOrder.sorted)
    }
  }

  test("misra-gries guarantee: items above total/k survive any merge split") {
    import graft.functions.FreqBuffer
    val gen = for {
      n <- Gen.choose(50, 400)
      k <- Gen.choose(3, 12)
      // zipf-ish: small alphabet with geometric skew so heavy items exist
      terms <- Gen.listOfN(n, Gen.frequency(
        8 -> Gen.const("a"), 4 -> Gen.const("b"), 2 -> Gen.const("c"),
        1 -> Gen.choose(0, 50).map("t" + _)))
      splits <- Gen.choose(1, 8)
    } yield (terms, k, splits)
    samples(gen, 100).foreach { case (terms, k, splits) =>
      // build per-"partition" buffers, then merge — the aggregation path
      val parts = terms.grouped(math.max(1, terms.length / splits)).toSeq
      val merged = parts.map { p =>
        val b = new FreqBuffer(k); p.foreach(b.add); b
      }.reduce { (a, b) => a.merge(b); a }
      assert(merged.total === terms.length)
      assert(merged.counts.size <= k)
      val exact = terms.groupBy(identity).view.mapValues(_.size.toLong)
      exact.foreach { case (t, c) =>
        if (c * k > terms.length)
          assert(merged.counts.containsKey(t),
            s"item $t (freq $c, n=${terms.length}, k=$k) missing from sketch")
      }
    }
  }

  test("vector-sum buffer: merge order never changes element-wise sums") {
    import graft.functions.VecSumBuffer
    val gen = for {
      dims <- Gen.choose(1, 16)
      rows <- Gen.choose(1, 60)
      data <- Gen.listOfN(rows, Gen.listOfN(dims, Gen.choose(-1000L, 1000L)))
      splits <- Gen.choose(1, 6)
    } yield (data, splits)
    samples(gen, 100).foreach { case (data, splits) =>
      val expect = data.transpose.map(_.sum)
      val parts = data.grouped(math.max(1, data.length / splits)).toSeq
      val merged = parts.map { p =>
        val b = new VecSumBuffer
        p.foreach(v => b.add(new org.apache.spark.sql.catalyst.util.GenericArrayData(v.toArray)))
        b
      }.reduce { (a, b) => a.merge(b); a }
      assert(merged.sums.toSeq === expect)
      assert(merged.n === data.length)
    }
  }

  test("gap sessionization: operator matches the reference recurrence") {
    import org.apache.spark.sql.{functions => SF}
    val spark = SparkSpec.session
    import spark.implicits._
    val gen = Gen.nonEmptyListOf(Gen.choose(0L, 120L)).map(_.take(30))
    // fewer samples than the pure properties: each drives a Spark job
    samples(gen, 8).foreach { gaps =>
      val gapUs = 30L * 60 * 1000000
      val times = gaps.scanLeft(0L)((acc, g) => acc + g * 60 * 1000000).tail.sorted
      // reference recurrence, computed independently of the operator
      var idx = 0L
      var prev = Long.MinValue
      val expected = times.zipWithIndex.map { case (t, i) =>
        if (prev == Long.MinValue || t - prev > gapUs) idx += 1
        prev = t
        (t, idx)
      }.groupBy(_._2).map { case (s, xs) =>
        (s, xs.size.toLong, xs.map(_._1).min, xs.map(_._1).max)
      }.toSet
      val ev = times.zipWithIndex
        .map { case (t, i) => (i.toLong, 1L, t) }
        .toDF("event_id", "user_id", "us")
        .select($"event_id", $"user_id",
          SF.timestamp_micros($"us").as("ts"))
      val got = graft.operators.Sessions.sessionizeBatch(ev)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(got === expected, s"gaps=$gaps")
    }
  }

  test("pickSalts: power of two, clamped, off for balanced keys, monotone in skew") {
    import graft.operators.Skew.pickSalts
    val gen = for {
      tot <- Gen.choose(1L, 1000000L)
      mx <- Gen.choose(1L, tot)
    } yield (mx, tot)
    samples(gen, 300).foreach { case (mx, tot) =>
      val k = pickSalts(mx, tot, parallelism = 32, maxSalts = 64)
      assert(k >= 1 && k <= 64 && Integer.bitCount(k) == 1, s"($mx,$tot)->$k")
      // a key within one balanced reducer's share must not pay salting
      if (mx * 32 <= tot) assert(k === 1, s"($mx,$tot)")
      // monotone: more skew never picks fewer salts
      assert(pickSalts(tot, tot, 32, 64) >= k)
    }
    assert(pickSalts(0, 0, 32, 64) === 1) // empty sample: salting off
  }

  test("solve3 recovers planted integer planes exactly, or reports singular") {
    import graft.operators.Regression
    val gen = for {
      a <- Gen.choose(-50L, 50L); b <- Gen.choose(-50L, 50L)
      c <- Gen.choose(-1000L, 1000L)
      m1 <- Gen.choose(2L, 13L); m2 <- Gen.choose(3L, 17L)
      n <- Gen.choose(8, 40)
    } yield (a, b, c, m1, m2, n)
    var solved = 0
    samples(gen, 200).foreach { case (a, b, c, m1, m2, n) =>
      // (i mod m1, i·7 mod m2) gives two decorrelated integer features
      val pts = (0 until n).map { i =>
        val x1 = i % m1; val x2 = (i * 7) % m2
        (x1, x2, a * x1 + b * x2 + c)
      }
      Regression.solve3(Regression.sketch(pts)).foreach { beta =>
        assert(beta === Seq(BigInt(a * 1000), BigInt(b * 1000), BigInt(c * 1000)),
          s"plane ($a,$b,$c) n=$n m=($m1,$m2)")
        solved += 1
      }
    }
    assert(solved > 150, s"only $solved non-singular draws — generator degenerate")
    // a constant feature makes the system singular: must be None, not a crash
    val sing = (0L until 10L).map(i => (i, 4L, 2 * i))
    assert(Regression.solve3(Regression.sketch(sing)).isEmpty)
  }

  test("upsert key invariant: concat_ws with separator is injective on field tuples") {
    // the reference's separator-free CONCAT collides ("ab","c") with
    // ("a","bc"); the hashed key must not (SURVEY.md §7.4)
    val gen = Gen.zip(Gen.alphaStr.map(_.take(10)), Gen.alphaStr.map(_.take(10)))
    val seen = scala.collection.mutable.Map[String, (String, String)]()
    samples(gen, 500).foreach { case (a, b) =>
      val key = a + "\u0001" + b
      seen.get(key).foreach(prev => assert(prev == ((a, b))))
      seen(key) = (a, b)
    }
  }
}
