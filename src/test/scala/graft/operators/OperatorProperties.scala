package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.TestSpark

/** ScalaCheck property suite over the core operators (VERDICT r1 item 3:
  * generative invariants, not just example-based tests). Spark jobs per
  * case are expensive, so generators stay small and minSuccessful modest —
  * the point is shrinking counterexamples over the invariant space.
  */
object OperatorProperties extends Properties("graft.operators") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val genRows: Gen[List[(String, String, Long)]] = for {
    nGroups <- Gen.choose(1, 5)
    rows <- Gen.listOfN(30, for {
      g <- Gen.choose(0, nGroups - 1)
      item <- Gen.choose(0, 9)
      cnt <- Gen.choose(0L, 50L)
    } yield (s"g$g", s"i$item", cnt))
  } yield rows

  property("topK emits min(k, |group|) rows per group, ranks 1..n") =
    forAll(genRows, Gen.choose(1, 8)) { (rows, k) =>
      val distinctRows = rows.distinct
      val df = distinctRows.toDF("loc", "item", "count")
      val out = TopK.perGroup(df, Seq(col("loc")),
          Seq(col("count").desc, col("item").asc), k, "r")
        .select("loc", "r").as[(String, Int)].collect()
      val perGroup = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toList)
      val expected = distinctRows.groupBy(_._1).view
        .mapValues(v => (1 to math.min(k, v.size)).toList)
      perGroup.toMap == expected.toMap
    }

  property("byKeyMin survivor is the per-key minimum under the tie-break") =
    forAll(Gen.nonEmptyListOf(for {
      k <- Gen.choose(0L, 5L); ts <- Gen.choose(0L, 100L); v <- Gen.alphaStr.map(_.take(4))
    } yield (k, ts, v))) { rows =>
      val df = rows.toDF("k", "ts", "v")
      val out = Dedup.byKeyMin(df, Seq("k"), Seq("ts", "v"))
        .as[(Long, Long, String)].collect().toSet
      val expected = rows.groupBy(_._1).values
        .map(g => g.minBy(r => (r._2, r._3))).toSet
      out == expected
    }

  property("saltedCount equals groupBy().count() for any salt fan-out") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 6L)), Gen.choose(1, 16)) { (keys, salts) =>
      val df = keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "id")
      val salted = SkewedAgg.saltedCount(df, Seq("k"), col("id"), salts)
        .as[(Long, Long)].collect().toMap
      val expected = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      salted == expected
    }

  property("connectedComponents equals union-find on arbitrary edge lists") =
    forAll(Gen.listOfN(20, for {
      a <- Gen.choose(0L, 15L); b <- Gen.choose(0L, 15L)
    } yield (a, b))) { edges =>
      val nonEmpty = edges.nonEmpty
      val cc =
        if (!nonEmpty) Map.empty[Long, Long]
        else ConnectedComponents.run(edges.toDF("id_a", "id_b"))
          .as[(Long, Long)].collect().toMap
      // driver-side union-find ground truth (min-id representative),
      // including self-loop-only vertices as their own singleton
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      cc == parent.keys.map(k => k -> find(k)).toMap
    }

  property("exactByContent keeps one min-id survivor per distinct content") =
    forAll(Gen.nonEmptyListOf(for {
      id <- Gen.choose(0L, 50L); txt <- Gen.oneOf("a", "b", "c", "dd", "")
    } yield (id, txt))) { rows =>
      val distinctIds = rows.distinct
      val df = distinctIds.toDF("id", "text")
      val out = Dedup.exactByContent(df, "id", Seq("text"))
        .as[(Long, String)].collect().toSet
      val expected = distinctIds.groupBy(_._2).values.map(_.minBy(_._1)).toSet
      out == expected
    }

  property("gapFill: spine is contiguous, obs preserved, interp bracketed") =
    forAll(Gen.nonEmptyListOf(for {
      h <- Gen.choose(0, 12); v <- Gen.choose(-50, 50)
    } yield (h, v.toDouble))) { obs =>
      val rows = obs.map { case (h, v) =>
        ("s", java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00"), v)
      }
      val out = GapFill.linear(rows.toDF("series", "ts", "value"),
          "series", "ts", "value")
        .orderBy("b")
        .as[(String, java.sql.Timestamp, Long, Option[Double], String)]
        .collect().toSeq
      val byHour = obs.groupBy(_._1).view
        .mapValues(vs => vs.map(_._2).sum / vs.size).toMap
      val (h0, h1) = (obs.map(_._1).min, obs.map(_._1).max)
      // spine covers min..max hours contiguously
      val spineOk = out.map(_._2.toLocalDateTime.getHour) == (h0 to h1)
      // observed buckets keep their (averaged) value; every filled gap
      // lies within [min, max] of its two bracketing observations
      val valuesOk = out.forall {
        case (_, t, _, Some(v), "obs") =>
          math.abs(v - byHour(t.toLocalDateTime.getHour)) < 1e-3
        case (_, t, _, Some(v), "interp") =>
          val h = t.toLocalDateTime.getHour
          val prev = byHour.keys.filter(_ < h).max
          val next = byHour.keys.filter(_ > h).min
          val (lo, hi) = (math.min(byHour(prev), byHour(next)),
            math.max(byHour(prev), byHour(next)))
          v >= lo - 1e-3 && v <= hi + 1e-3
        case _ => false
      }
      spineOk && valuesOk
    }

  private val genSnapshot: Gen[Map[Long, Long]] = for {
    keys <- Gen.someOf(0L to 9L)
    vals <- Gen.listOfN(keys.size, Gen.choose(0L, 99L))
  } yield keys.zip(vals).toMap

  property("snapshot diff -> merge reconstructs the new snapshot exactly") =
    forAll(genSnapshot, genSnapshot) { (oldM, newM) =>
      val oldDf = oldM.toSeq.toDF("k", "v")
      val newDf = newM.toSeq.toDF("k", "v")
      val d = ChangeCapture.diff(oldDf, newDf, Seq("k"), Seq("v"))
      val changes = d.select(col("k"), col("new_v").as("v"),
        when(col("change") === "insert", "I")
          .when(col("change") === "delete", "D").otherwise("U").as("op"))
      val rebuilt = ChangeCapture.merge(oldDf, changes, Seq("k"), "op")
        .as[(Long, Long)].collect().toMap
      rebuilt == newM
    }

  property("merge matches the per-key model for any target and one-op-per-key changeset") =
    forAll(genSnapshot, for {
      keys <- Gen.someOf(0L to 9L)
      rows <- Gen.listOfN(keys.size, for {
        v <- Gen.choose(0L, 99L); op <- Gen.oneOf("I", "U", "D")
      } yield (v, op))
    } yield keys.zip(rows).map { case (k, (v, op)) => (k, v, op) }.toList) {
      (target, changes) =>
        val out = ChangeCapture.merge(
            target.toSeq.toDF("k", "v"), changes.toDF("k", "v", "op"),
            Seq("k"), "op")
          .as[(Long, Long)].collect().toMap
        val expected = changes.foldLeft(target) { case (m, (k, v, op)) =>
          op match {
            case "D" => m - k
            case "U" => m + (k -> v) // upsert: replace or insert
            case "I" => if (m.contains(k)) m else m + (k -> v)
          }
        }
        out == expected
    }

  property("sortedNeighborhood equals the literal global window at any w") =
    forAll(Gen.listOfN(25, Gen.choose(0L, 40L)), Gen.choose(1, 6)) {
      (keys, w) =>
        val rows = keys.zipWithIndex.map { case (k, i) => (i.toLong, k) }
        val df = rows.toDF("id", "key")
        val got = SortedNeighborhood
          .candidates(df, "id", Seq(col("key"), col("id")), w, 4)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
        // reference: positions in the (key, id) total order
        val pos = rows.sortBy { case (id, k) => (k, id) }
          .map(_._1).zipWithIndex.toMap
        val expected = (for {
          a <- rows.map(_._1); b <- rows.map(_._1)
          d = pos(b) - pos(a)
          if d >= 1 && d <= w
        } yield (a, b)).toSet
        got == expected
    }

  property("kCore survivors all have degree >= k within the surviving subgraph") =
    forAll(Gen.listOfN(30, for {
      u <- Gen.choose(0L, 9L); v <- Gen.choose(0L, 9L)
    } yield (u, v)), Gen.choose(1, 4)) { (edges, k) =>
      val out = KCore.peel(edges.toDF("u", "v"), k, rounds = 6)
        .as[(Long, Long)].collect().toMap
      out.values.forall(_ >= k)
    }

  property("joinStats total equals the executed join cardinality") =
    forAll(Gen.listOfN(20, Gen.choose(0L, 6L)),
      Gen.listOfN(20, Gen.choose(0L, 6L))) { (as, bs) =>
      val a = as.toDF("k")
      val b = bs.toDF("k")
      val prof = JoinStats.profile(a, "k", b, "k", topK = 50).collect()
      val actual = a.as("x").join(b.as("y"),
        col("x.k") === col("y.k")).count()
      if (prof.isEmpty) actual == 0L
      else prof.head.getAs[Long]("total_pairs") == actual
    }

  property("rrf fused score is the exact sum of floor contributions") =
    forAll(Gen.nonEmptyListOf(for {
      q <- Gen.choose(1L, 2L); id <- Gen.choose(1L, 6L)
      r <- Gen.choose(1L, 10L)
    } yield (q, id, r))) { rows =>
      val out = graft.llm.Rrf.fuse(rows.toDF("qid", "id", "rank"),
          k0 = 60, topK = 100)
        .select("qid", "id", "rrf_x1e6")
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val expected = rows.groupBy(r => (r._1, r._2)).view
        .mapValues(_.map(r => 1000000L / (60L + r._3)).sum).toMap
      out == expected
    }
}
