package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scd

/** SCD2 merge: the four outcome classes on a hand dataset, the
  * one-open-row-per-key invariant, idempotency under an unchanged
  * snapshot, and null-vs-empty attribute discrimination. */
class ScdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val keys = Seq("id")
  private val attrs = Seq("name", "seg")

  private def hist0 = Seq(
    // (id, name, seg, valid_from, valid_to, is_current)
    (1L, "alice", "A", "d1", null.asInstanceOf[String], true),
    (2L, "bob", "B", "d1", null.asInstanceOf[String], true),
    (3L, "carol", "C", "d1", null.asInstanceOf[String], true),
    // an already-closed version that must pass through untouched
    (2L, "bob", "OLD", "d0", "d1", false)
  ).toDF("id", "name", "seg", "valid_from", "valid_to", "is_current")

  private def snap1 = Seq(
    (1L, "alice", "A"),   // unchanged
    (2L, "bob", "B2"),    // changed
    (4L, "dave", "D")     // new  (3 deleted)
  ).toDF("id", "name", "seg")

  test("four outcome classes: unchanged, changed, deleted, new") {
    val out = Scd.scd2Merge(hist0, snap1, keys, attrs, "d2")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getBoolean(5))).toSet
    assert(out == Set(
      (2L, "bob", "OLD", "d0", "d1", false),    // closed slice untouched
      (1L, "alice", "A", "d1", null, true),     // unchanged stays open
      (2L, "bob", "B", "d1", "d2", false),      // changed: old closed...
      (2L, "bob", "B2", "d2", null, true),      // ...new version open
      (3L, "carol", "C", "d1", "d2", false),    // deleted: closed
      (4L, "dave", "D", "d2", null, true)       // new key open
    ))
  }

  test("at most one open row per key; re-merging same snapshot is a no-op") {
    val h1 = Scd.scd2Merge(hist0, snap1, keys, attrs, "d2")
    val openCounts = h1.filter(col("is_current"))
      .groupBy(col("id")).count().collect().map(_.getLong(1))
    assert(openCounts.forall(_ == 1L))
    val h2 = Scd.scd2Merge(h1, snap1, keys, attrs, "d3")
    val a = h1.collect().map(_.toSeq).toSet
    val b = h2.collect().map(_.toSeq).toSet
    assert(a == b, "idempotent: identical snapshot must change nothing")
  }

  test("three-snapshot sequence accumulates a correct version chain") {
    val snap2 = Seq(
      (1L, "alice", "A3"),  // changed again
      (2L, "bob", "B2"),    // unchanged vs snap1
      (3L, "carol", "C")    // key 3 returns with its original attrs
    ).toDF("id", "name", "seg")
    val h2 = Scd.scd2Merge(
      Scd.scd2Merge(hist0, snap1, keys, attrs, "d2"),
      snap2, keys, attrs, "d3")
    // key 1: A rides through d2 unchanged (valid_from stays d1), then
    // closes at d3 when A3 arrives
    val k1 = h2.filter(col("id") === 1L)
      .collect().map(r => (r.getString(2), r.getString(3), r.getString(4),
        r.getBoolean(5))).toSet
    assert(k1 == Set(("A", "d1", "d3", false), ("A3", "d3", null, true)))
    // key 3: closed at d2 (deleted), reopened at d3
    val k3 = h2.filter(col("id") === 3L)
      .collect().map(r => (r.getString(3), r.getString(4), r.getBoolean(5)))
      .toSet
    assert(k3 == Set(("d1", "d2", false), ("d3", null, true)))
    // key 4: dropped in snap2 -> closed
    val k4 = h2.filter(col("id") === 4L && col("is_current")).count()
    assert(k4 == 0)
    // global invariant: <= 1 open row per key, all versions retained
    val opens = h2.filter(col("is_current")).groupBy(col("id")).count()
      .collect().map(_.getLong(1))
    assert(opens.forall(_ == 1L))
  }

  test("values containing separator-like control chars never collide") {
    // ADVICE r8: a concat_ws(US)/NUL-sentinel hash classified
    // ("a\u001Fb", "c") vs ("a", "b\u001Fc") as 'unchanged'. The
    // per-column-md5 token scheme cannot collide: tokens carry no value
    // bytes, so no value can impersonate a field boundary.
    val h = Seq((1L, "a\u001Fb", "c", "d1", null.asInstanceOf[String], true))
      .toDF("id", "name", "seg", "valid_from", "valid_to", "is_current")
    val s = Seq((1L, "a", "b\u001Fc")).toDF("id", "name", "seg")
    val out = Scd.scd2Merge(h, s, keys, attrs, "d2")
    assert(out.count() == 2, "shifted field boundary must classify as changed")
    // a literal NUL value is distinct from SQL NULL (the old sentinel)
    val h2 = Seq((1L, "\u0000", "x", "d1", null.asInstanceOf[String], true))
      .toDF("id", "name", "seg", "valid_from", "valid_to", "is_current")
    val s2 = Seq((1L, null.asInstanceOf[String], "x")).toDF("id", "name", "seg")
    val out2 = Scd.scd2Merge(h2, s2, keys, attrs, "d2")
    assert(out2.count() == 2, "NUL string -> SQL NULL must be a change")
  }

  test("null and empty-string attributes are distinct versions") {
    val h = Seq((1L, null.asInstanceOf[String], "A", "d1",
      null.asInstanceOf[String], true))
      .toDF("id", "name", "seg", "valid_from", "valid_to", "is_current")
    val s = Seq((1L, "", "A")).toDF("id", "name", "seg")
    val out = Scd.scd2Merge(h, s, keys, attrs, "d2")
    assert(out.filter(col("is_current")).count() == 1)
    assert(out.count() == 2, "null -> '' must be detected as a change")
  }

  test("snapshotDiff classifies added/removed/changed/unchanged with " +
      "null-safe column comparison") {
    val before = Seq(
      (1L, Some("a"), "A"), // unchanged
      (2L, Some("b"), "B"), // changed (seg)
      (3L, None, "C"),      // unchanged with a NULL attr (NULL <=> NULL)
      (4L, Some("d"), "D"), // removed
      (5L, None, "E"))      // changed: NULL -> value
      .toDF("id", "name", "seg")
    val after = Seq(
      (1L, Some("a"), "A"),
      (2L, Some("b"), "B2"),
      (3L, None, "C"),
      (5L, Some("e"), "E"),
      (6L, Some("f"), "F")) // added
      .toDF("id", "name", "seg")
    val got = Scd.snapshotDiff(before, after, Seq("id"),
        Seq("name", "seg"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "unchanged", 4L -> "removed", 5L -> "changed",
      6L -> "added"), got)
    // the delta feed drops only the unchanged keys
    val delta = Scd.snapshotDiff(before, after, Seq("id"),
        Seq("name", "seg"))
      .filter(col("change_type") =!= "unchanged").count()
    assert(delta == 4)
  }
}
