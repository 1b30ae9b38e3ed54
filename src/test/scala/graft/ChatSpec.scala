package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Chat

/** Conversation (SFT) prep: validation flags, template rendering, loss-mask
  * span alignment, prompt/transcript dedup. */
class ChatSpec extends SparkSpec {
  import spark.implicits._

  /** Hand-built fixture with every structural case:
    *   c0: sys, user, assistant            — valid, has_system
    *   c1: user, assistant                 — valid
    *   c2: user, user, assistant           — adjacency violation
    *   c3: user, assistant, user           — ends on user
    *   c4: user, ""                        — empty assistant content
    *   c5: user, assistant (same prompt as c1, different completion)
    */
  private def fixture = Seq(
    (0L, 0, "system", "be helpful"),
    (0L, 1, "user", "hello there"),
    (0L, 2, "assistant", "hi how can i help"),
    (1L, 0, "user", "what is spark"),
    (1L, 1, "assistant", "a distributed engine"),
    (2L, 0, "user", "first ask"),
    (2L, 1, "user", "second ask"),
    (2L, 2, "assistant", "one answer"),
    (3L, 0, "user", "ping"),
    (3L, 1, "assistant", "pong"),
    (3L, 2, "user", "dangling"),
    (4L, 0, "user", "say nothing"),
    (4L, 1, "assistant", ""),
    (5L, 0, "user", "What  is   SPARK"),
    (5L, 1, "assistant", "another engine")
  ).toDF("conv_id", "turn_idx", "role", "content")

  test("validate flags each structural violation exactly once") {
    val v = Chat.validate(fixture).orderBy("conv_id").collect()
    val byId = v.map(r => r.getLong(0) -> r).toMap
    def flags(id: Long) = {
      val r = byId(id)
      (r.getAs[Boolean]("has_system"), r.getAs[Long]("n_adjacent_same"),
        r.getAs[Long]("n_empty"), r.getAs[Boolean]("ends_assistant"),
        r.getAs[Boolean]("is_valid"))
    }
    assert(flags(0L) == ((true, 0L, 0L, true, true)))
    assert(flags(1L) == ((false, 0L, 0L, true, true)))
    assert(flags(2L) == ((false, 1L, 0L, true, false)))
    assert(flags(3L) == ((false, 0L, 0L, false, false)))
    assert(flags(4L) == ((false, 0L, 1L, true, false)))
    assert(byId(0L).getAs[Int]("n_turns") == 3)
  }

  test("render produces the documented template in turn order") {
    val r = Chat.render(fixture).filter($"conv_id" === 0L).collect()(0)
    assert(r.getAs[String]("text") ==
      "<|system|>\nbe helpful\n<|user|>\nhello there\n<|assistant|>\nhi how can i help")
    assert(r.getAs[Int]("n_turns") == 3)
    assert(r.getAs[Long]("n_chars") == r.getAs[String]("text").length.toLong)
  }

  test("loss-mask spans cut exactly the assistant content from the rendered text") {
    val rendered = Chat.render(fixture).select("conv_id", "text")
    val spans = Chat.lossMaskSpans(fixture)
    val joined = spans.join(rendered, "conv_id")
      .join(fixture.select($"conv_id", $"turn_idx", $"content"),
        Seq("conv_id", "turn_idx"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val text = r.getAs[String]("text")
      val s = r.getAs[Long]("start_char").toInt
      val e = r.getAs[Long]("end_char").toInt
      assert(text.substring(s, e) == r.getAs[String]("content"),
        s"conv ${r.getAs[Long]("conv_id")} turn ${r.getAs[Int]("turn_idx")}")
    }
    // only assistant turns carry spans
    assert(spans.count() ==
      fixture.filter($"role" === "assistant").count())
  }

  test("prompt dedup groups normalized first user turns across conversations") {
    val g = Chat.promptGroups(fixture)
    // c1 "what is spark" and c5 "What  is   SPARK" normalize identically
    val dup = g.filter($"n_convs" === 2).collect()
    assert(dup.length == 1)
    assert(dup(0).getAs[Long]("keeper_conv") == 1L)
    assert(g.count() == 5) // 6 convs, one merged pair
  }

  test("transcript dedup keeps the min conv_id of identical renders") {
    val dupTurns = fixture.union(
      fixture.filter($"conv_id" === 1L)
        .withColumn("conv_id", lit(7L)))
    val d = Chat.dedupTranscripts(Chat.render(dupTurns))
      .select("conv_id", "is_keeper").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(d(1L) && !d(7L))
    assert(d(0L) && d(2L) && d(3L) && d(4L) && d(5L))
  }

  test("packed loss-mask spans cut exact content from the materialized bins") {
    import graft.operators.Packing
    import graft.functions.TextFunctions
    import graft.queries.ChatQueries
    val turns = ChatQueries.chatTurns(spark, "/root/testdata/sf0.001")
    val valid = Chat.validate(turns).filter($"is_valid").select("conv_id")
    val rendered = Chat.render(turns).join(valid, Seq("conv_id"))
    val packed = Packing.packBins(rendered, "conv_id",
      TextFunctions.tokenCount($"text"), budgetTokens = 256L, shards = 8)
    // materialize each bin exactly as the gate's layout contract says:
    // renders joined by one newline in conv_id order
    val bins = packed.groupBy("shard", "bin")
      .agg(concat_ws("\n", transform(
        array_sort(collect_list(struct($"conv_id", $"text"))),
        x => x.getField("text"))).as("bin_text"))
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy("shard", "bin").orderBy("conv_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = packed.withColumn("chars_before",
      coalesce(sum($"n_chars" + lit(1L)).over(wb), lit(0L)))
    val global = offsets.join(Chat.lossMaskSpans(turns), Seq("conv_id"))
      .select($"shard", $"bin", $"conv_id", $"turn_idx",
        ($"chars_before" + $"start_char").as("g_start"),
        ($"chars_before" + $"end_char").as("g_end"))
    val rows = global.join(bins, Seq("shard", "bin"))
      .join(turns.select($"conv_id", $"turn_idx", $"content"),
        Seq("conv_id", "turn_idx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[String]("bin_text")
      assert(t.substring(r.getAs[Long]("g_start").toInt,
        r.getAs[Long]("g_end").toInt) == r.getAs[String]("content"),
        s"conv ${r.getAs[Long]("conv_id")} turn ${r.getAs[Int]("turn_idx")}")
    }
  }

  test("chat curate gate: PII redacted with counts, invalid conversations absent") {
    val out = graft.queries.ChatQueries.all.toMap.apply("q_chat_curate")
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("conv_id")
      val text = r.getAs[String]("text")
      assert(!text.contains("@example.com"), s"unredacted PII in conv $id")
      if (id % 7 == 0) {
        assert(r.getAs[Long]("n_pii") > 0, s"conv $id seeded but uncounted")
        assert(text.contains("[EMAIL]"), s"conv $id seeded but no token")
      }
    }
    // every surviving conversation is structurally valid on the SEEDED turns
    val ids = out.map(_.getAs[Long]("conv_id")).toSet
    val turns = graft.queries.ChatQueries.chatTurns(spark, "/root/testdata/sf0.001")
    val invalid = Chat.validate(turns).filter(!$"is_valid")
      .collect().map(_.getAs[Long]("conv_id"))
      .filter(id => id % 7 != 0) // seeding can only change %7 convs' flags
      .toSet
    assert(invalid.intersect(ids).isEmpty)
  }

  test("synthesized turns: roles alternate, injections land where documented") {
    val turns = graft.queries.ChatQueries.chatTurns(
      spark, "/root/testdata/sf0.001")
    val t = turns.collect()
    assert(t.nonEmpty)
    // system turn iff conv_id % 5 == 0, at idx 0 only
    t.filter(_.getAs[String]("role") == "system").foreach { r =>
      assert(r.getAs[Long]("conv_id") % 5 == 0 && r.getAs[Int]("turn_idx") == 0)
    }
    // empty content only on the %23 injection
    t.filter(r => r.getAs[String]("content").isEmpty).foreach { r =>
      assert(r.getAs[Long]("conv_id") % 23 == 0)
    }
    // a %17 conversation has a same-role adjacency; others without
    // injections are alternation-clean
    val v = Chat.validate(turns).collect()
    v.foreach { r =>
      val id = r.getAs[Long]("conv_id")
      if (id % 17 == 0 && id % 5 != 0 && r.getAs[Int]("n_turns") > 1)
        assert(r.getAs[Long]("n_adjacent_same") > 0, s"conv $id")
      if (id % 17 != 0)
        assert(r.getAs[Long]("n_adjacent_same") == 0, s"conv $id")
    }
  }
}
