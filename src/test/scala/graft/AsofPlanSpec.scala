package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.plans.AsofJoin

/** The custom as-of join operator (logical node → strategy → merge
  * exec) against a brute-force reference and the q38 union+window
  * encoding.
  */
class AsofPlanSpec extends SparkSpec {
  import spark.implicits._

  test("asof join matches a brute-force reference on random data") {
    val rnd = new Random(42)
    val lefts = Seq.tabulate(400) { i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong)
    } // (k, t, id)
    val rights = Seq.tabulate(300) { i =>
      (rnd.nextInt(25).toLong, rnd.nextInt(1000).toLong, i.toLong)
    } // (k, rt, rid)

    val l = lefts.toDF("k", "t", "id").repartition(5)
    val r = rights.toDF("k", "rt", "rid").repartition(3)

    val got = AsofJoin.asof(l, r, Seq("k"), Seq("k"), "t", "rt",
        rightTieBreak = Seq("rid"))
      .select($"id", $"rid")
      .as[(Long, Option[Long])].collect().toMap

    val expected = lefts.map { case (k, t, id) =>
      val matches = rights.filter(x => x._1 == k && x._2 <= t)
      val best = if (matches.isEmpty) None else {
        val maxT = matches.map(_._2).max
        Some(matches.filter(_._2 == maxT).map(_._3).max) // tie: max rid
      }
      id -> best
    }.toMap

    assert(got.size == lefts.size)
    assert(got == expected)
  }

  test("forward direction matches brute force; bad direction fails fast") {
    val rnd = new Random(7)
    val lefts = Seq.tabulate(400) { i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong)
    }
    val rights = Seq.tabulate(300) { i =>
      (rnd.nextInt(25).toLong, rnd.nextInt(1000).toLong, i.toLong)
    }
    val l = lefts.toDF("k", "t", "id").repartition(5)
    val r = rights.toDF("k", "rt", "rid").repartition(3)

    val got = AsofJoin.asof(l, r, Seq("k"), Seq("k"), "t", "rt",
        rightTieBreak = Seq("rid"), direction = "forward")
      .select($"id", $"rid")
      .as[(Long, Option[Long])].collect().toMap

    val expected = lefts.map { case (k, t, id) =>
      val matches = rights.filter(x => x._1 == k && x._2 >= t)
      val best = if (matches.isEmpty) None else {
        val minT = matches.map(_._2).min
        Some(matches.filter(_._2 == minT).map(_._3).max) // tie: max rid
      }
      id -> best
    }.toMap
    assert(got == expected)

    // helper time columns must not leak into the output schema
    val cols = AsofJoin.asof(l, r, Seq("k"), Seq("k"), "t", "rt",
      direction = "forward").columns.toSeq
    assert(!cols.exists(_.startsWith("__graft_")))

    intercept[IllegalArgumentException] {
      AsofJoin.asof(l, r, Seq("k"), Seq("k"), "t", "rt",
        direction = "sideways")
    }
  }

  test("nearest direction matches brute force incl. distance ties") {
    val rnd = new Random(13)
    // small time range on purpose: plenty of exact-distance ties and
    // equal-time duplicates to pin the tie rules
    val lefts = Seq.tabulate(500) { i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(60).toLong, i.toLong)
    }
    val rights = Seq.tabulate(400) { i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(60).toLong, i.toLong)
    }
    val l = lefts.toDF("k", "t", "id").repartition(4)
    val r = rights.toDF("k", "rt", "rid").repartition(3)

    val got = AsofJoin.asof(l, r, Seq("k"), Seq("k"), "t", "rt",
        rightTieBreak = Seq("rid"), direction = "nearest")
      .select($"id", $"rid")
      .as[(Long, Option[Long])].collect().toMap

    val expected = lefts.map { case (k, t, id) =>
      val back = rights.filter(x => x._1 == k && x._2 <= t)
      val fwd = rights.filter(x => x._1 == k && x._2 > t)
      val b = if (back.isEmpty) None else {
        val bt = back.map(_._2).max
        Some((bt, back.filter(_._2 == bt).map(_._3).max)) // max tie
      }
      val f = if (fwd.isEmpty) None else {
        val ft = fwd.map(_._2).min
        Some((ft, fwd.filter(_._2 == ft).map(_._3).min)) // min tie
      }
      val best = (b, f) match {
        case (None, None) => None
        case (Some((_, rid)), None) => Some(rid)
        case (None, Some((_, rid))) => Some(rid)
        case (Some((bt, brid)), Some((ft, frid))) =>
          if (t - bt <= ft - t) Some(brid) else Some(frid)
      }
      id -> best
    }.toMap
    assert(got == expected)
  }

  test("forward direction handles Date and TimestampNTZ time columns") {
    // Date: forward = earliest right date >= left date
    val lD = Seq((1L, "2024-01-10")).toDF("k", "d")
      .select($"k", $"d".cast("date").as("d"))
    val rD = Seq((1L, "2024-01-05", 1L), (1L, "2024-01-12", 2L),
        (1L, "2024-02-01", 3L))
      .toDF("k", "rd", "rid")
      .select($"k", $"rd".cast("date").as("rd"), $"rid")
    val gotD = AsofJoin.asof(lD, rD, Seq("k"), Seq("k"), "d", "rd",
        direction = "forward")
      .select($"rid").as[Option[Long]].collect().toSeq
    assert(gotD == Seq(Some(2L)))

    // TimestampNTZ: negation must be exact micros, not a session-zone
    // cast — micro-second adjacency pins it
    val lN = Seq((1L, "2024-01-10 00:00:00.000001")).toDF("k", "t")
      .select($"k", $"t".cast("timestamp_ntz").as("t"))
    val rN = Seq((1L, "2024-01-10 00:00:00.000000", 1L),
        (1L, "2024-01-10 00:00:00.000002", 2L),
        (1L, "2024-01-11 00:00:00.000000", 3L))
      .toDF("k", "rt", "rid")
      .select($"k", $"rt".cast("timestamp_ntz").as("rt"), $"rid")
    val gotN = AsofJoin.asof(lN, rN, Seq("k"), Seq("k"), "t", "rt",
        direction = "forward")
      .select($"rid").as[Option[Long]].collect().toSeq
    assert(gotN == Seq(Some(2L)))
  }

  test("nearest distances are exact Long arithmetic above 2^53") {
    // at 2^60 the Double ulp is 256, so both distances round to 0.0
    // and a Double compare would prefer backward; exact Long
    // arithmetic must pick the closer forward row (distance 2 < 3)
    val base = 1L << 60
    val l = Seq((1L, base, 1L)).toDF("k", "t", "id")
    val r = Seq((1L, base - 3L, 10L), (1L, base + 2L, 20L))
      .toDF("k", "rt", "rid")
    val got = AsofJoin.asof(l, r, Seq("k"), Seq("k"), "t", "rt",
        direction = "nearest")
      .select($"rid").as[Option[Long]].collect().toSeq
    assert(got == Seq(Some(20L)))
  }

  test("empty right side null-pads every left row") {
    val l = Seq((1L, 10L), (2L, 20L)).toDF("k", "t")
    val r = Seq.empty[(Long, Long)].toDF("k", "rt")
    val out = AsofJoin.asof(l, r, Seq("k"), Seq("k"), "t", "rt")
    assert(out.count() == 2)
    assert(out.filter($"rt".isNotNull).count() == 0)
  }

  test("null right times are never matched") {
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, Option.empty[Long], 7L), (1L, Some(5L), 8L))
      .toDF("k", "rt", "rid")
    val out = AsofJoin.asof(l, r, Seq("k"), Seq("k"), "t", "rt")
      .select($"rid").as[Option[Long]].collect()
    assert(out.toSeq == Seq(Some(8L)))
  }

  test("key or time type mismatch fails fast") {
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1, 5L)).toDF("k", "rt")
    intercept[IllegalArgumentException] {
      AsofJoin.asof(l, r, Seq("k"), Seq("k"), "t", "rt")
    }
  }

  test("NTZ-vs-TIMESTAMP time mismatch names both columns and the fix") {
    // the exact mismatch the round-5 testdata regeneration produced:
    // one side TIMESTAMP_NTZ, the other TIMESTAMP — must fail with an
    // actionable message, not a silent session-zone coercion
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    import org.apache.spark.sql.types.TimestampNTZType
    val l = Seq((1L, 10L)).toDF("k", "t")
      .withColumn("t", timestamp_micros(col("t")).cast(TimestampNTZType))
    val r = Seq((1L, 5L)).toDF("k", "rt")
      .withColumn("rt", timestamp_micros(col("rt")))
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asof(l, r, Seq("k"), Seq("k"), "t", "rt")
    }
    assert(e.getMessage.contains("'t' is TIMESTAMP_NTZ"))
    assert(e.getMessage.contains("'rt' is TIMESTAMP"))
    assert(e.getMessage.contains("normalizeEventTime"))
  }

  test("matches the q38 union+window encoding on events/orders") {
    val ev = graft.tables.Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"ts")
    val ord = graft.tables.Tables.orders(spark, sfDir)
      .select($"o_custkey", $"o_orderkey",
        $"o_orderdate".cast("timestamp").as("o_ts"))

    val got = AsofJoin.asof(ev, ord, Seq("user_id"), Seq("o_custkey"),
        "ts", "o_ts", rightTieBreak = Seq("o_orderkey"))
      .select($"event_id", $"o_orderkey".as("last_order"))

    val viaWindow = graft.queries.EventQueries.q38AsofJoin
      .run(spark, sfDir).select($"event_id", $"last_order")

    assert(got.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(got).isEmpty)
  }

  test("column pruning narrows both sides to referenced columns") {
    val l = Seq((1L, 10L, "a", "wide_l")).toDF("k", "t", "lval", "lunused")
    val r = Seq((1L, 5L, "b", "wide_r")).toDF("k", "rt", "rval", "runused")
    val df = AsofJoin.asof(l, r, Seq("k"), Seq("k"), "t", "rt")
      .select($"lval", $"rval")
    val aj = df.queryExecution.optimizedPlan.collectFirst {
      case p: graft.plans.AsofJoinPlan => p
    }
    assert(aj.isDefined, "AsofJoinPlan survived to the optimized plan")
    assert(aj.get.left.output.map(_.name).toSet == Set("k", "t", "lval"))
    assert(aj.get.right.output.map(_.name).toSet == Set("k", "rt", "rval"))
    // and the result is still right
    assert(df.as[(String, String)].collect().toSeq == Seq(("a", "b")))
  }

  test("self as-of join re-aliases the shared-lineage right side") {
    val df = Seq((1L, 5L, 50L), (1L, 10L, 100L), (2L, 3L, 30L))
      .toDF("k", "t", "v")
    val out = AsofJoin.asof(df, df, Seq("k"), Seq("k"), "t", "t")
      .toDF("k", "t", "v", "rk", "rt", "rv")
    // rt <= t includes equality, so every row matches itself
    assert(out.count() == 3)
    assert(out.filter($"rv" =!= $"v").count() == 0)
  }

  test("time column with a dot in its name resolves") {
    val l = Seq((1L, 10L)).toDF("k", "t.s")
    val r = Seq((1L, 5L, 7L)).toDF("k", "rt.s", "rid")
    val out = AsofJoin.asof(l, r, Seq("k"), Seq("k"), "t.s", "rt.s")
    assert(out.count() == 1)
    assert(out.select($"rid").as[Option[Long]].head() == Some(7L))
  }

  test("single hot key streams through O(1) merge state") {
    // worst-case skew: every row one key — the merge must not buffer
    // the key group (only the one candidate row)
    val n = 100000
    val l = spark.range(n).selectExpr("1L as k", "id as t", "id as id")
    val r = spark.range(n / 2).selectExpr("1L as k", "id * 2 as rt",
      "id as rid")
    val out = AsofJoin.asof(l, r, Seq("k"), Seq("k"), "t", "rt")
      .selectExpr("id", "rid")
    // for left t, latest rt = 2*floor(t/2) => rid = floor(t/2)
    val wrong = out.filter($"rid" =!= ($"id" / 2).cast("long")).count()
    assert(wrong == 0 && out.count() == n)
  }

  test("physical plan is the custom exec over two sorted exchanges") {
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L)).toDF("k", "rt")
    val plan = AsofJoin.asof(l, r, Seq("k"), Seq("k"), "t", "rt")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
