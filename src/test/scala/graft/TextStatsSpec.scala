package graft

import graft.functions.TextFunctions
import graft.functions.expressions.TextStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fused [[TextStats]] expression must be bit-identical to the
  * composed TextFunctions plan on every field — the oracle SQL replays
  * the COMPOSED definitions, so any divergence is a correctness break,
  * not just a perf delta.
  */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private def composed(df: DataFrame): DataFrame =
    df.select(
      $"doc_id",
      TextFunctions.tokenCount($"text").as("n_tokens"),
      TextFunctions.basisPoints(TextFunctions.punctRatio($"text")).as("punct_bp"),
      TextFunctions.langId($"text").as("lang_pred"),
      TextFunctions.basisPoints(TextFunctions.qualityScore($"text")).as("quality_bp"),
      TextFunctions.fingerprint($"text").as("fingerprint"))

  private def fused(df: DataFrame): DataFrame =
    df.select($"doc_id", TextStats.textStats($"text").as("_st"))
      .select($"doc_id", $"_st.n_tokens".as("n_tokens"),
        $"_st.punct_bp".as("punct_bp"), $"_st.lang_pred".as("lang_pred"),
        $"_st.quality_bp".as("quality_bp"), $"_st.fingerprint".as("fingerprint"))

  private def assertIdentical(df: DataFrame): Unit = {
    val a = composed(df).collect().map(_.toSeq).sortBy(_.head.toString)
    val b = fused(df).collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.length == b.length)
    a.zip(b).foreach { case (ra, rb) => assert(ra === rb, s"\ncomposed: $ra\nfused:    $rb") }
  }

  test("fused == composed on the whole sf0.001 documents table") {
    assertIdentical(sf("documents").select($"doc_id", $"text"))
  }

  test("fused == composed on adversarial edge cases") {
    val edges = Seq(
      1L -> "",
      2L -> "   ",
      3L -> "\t\t",
      4L -> "  \tThe AND of…  ",
      5L -> "the and of to a in is it",            // all-en markers
      6L -> "der die das und ist nicht mit ein",   // all-de markers
      7L -> "the der el le 的",                    // 1 hit everywhere: tie → en
      8L -> "und the and",                         // de marker + 2 en: en wins
      9L -> "的 是 不 我 了 在 人 有 extra words", // zh
      10L -> "no markers here just plain filler verbiage",
      11L -> "..,,!!??;;:: punct. heavy! text?",
      12L -> "\tleading tab",
      13L -> "trailing tab\t",
      14L -> "  space edges  ",
      15L -> "a\n\nb\r\nc\td   ef\ff",
      16L -> "MiXeD CaSe ThE aNd OF",
      17L -> "unicode: héllo wörld Straße ΣΊΣΥΦΟΣ 中文文本",
      18L -> "emoji 😀 pair 🎉🎉 astral 😀 done",
      19L -> (("long " * 200) + "the end."),
      20L -> "singleword",
      21L -> "the the the the and and of",         // duplicate markers: distinct hits
      22L -> "y y y y y",                          // es single marker repeated
      23L -> "wordvtab\fformfeed")
      .toDF("doc_id", "text")
    assertIdentical(edges)
  }

  test("fused == composed on null documents: lang_pred 'und', other fields null") {
    val withNulls = Seq(
      (1L, null: String),
      (2L, "the and of plain text"),
      (3L, null: String))
      .toDF("doc_id", "text")
    assertIdentical(withNulls)
    // pin the exact null contract (not just parity): langId's when-chain
    // resolves null to "und"; qualityScore's null-skipping least/greatest
    // land on 0.5 → 5000 bp; n_tokens/punct_bp/fingerprint propagate null
    val r = fused(withNulls.where($"doc_id" === 1L)).head()
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(5))
    assert(r.getString(3) === "und")
    assert(r.getLong(4) === 5000L)
  }

  test("fused stays inside whole-stage codegen") {
    // the `*(n)` prefix in toString marks a WholeStageCodegen stage; check
    // the node type directly so the assertion doesn't depend on format
    val plan = fused(sf("documents").select($"doc_id", $"text"))
      .queryExecution.executedPlan
    val wsc = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, s"no WholeStageCodegen stage in:\n$plan")
    // and the textstats projection itself sits INSIDE one of the stages
    assert(wsc.exists(_.toString.contains("textstats")),
      s"textstats not inside a codegen stage:\n$plan")
  }
}
