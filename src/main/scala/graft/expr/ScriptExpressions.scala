package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode-script profile: per-document counts of code points by writing
 * system — the script-level companion to the stopword language-ID
 * ([[MarkerKernel]]): marker words separate languages WITHIN a script
 * (en/de/fr/es), this separates scripts themselves (Latin vs Cyrillic vs
 * Han vs Arabic …), which is the first split a multilingual curation
 * pipeline makes and the only one that works on languages with no
 * marker list. Classification is the JDK's `Character.UnicodeScript`
 * (UAX #24), with digits and whitespace pulled into their own buckets
 * first (they are script-COMMON and would otherwise pollute the vote).
 *
 * One kernel pass per row ([[TextHashKernel]] discipline), surrogate-
 * pair safe, codegen'd.
 */
object ScriptKernel {
  /** Bucket order is the output contract (q145's oracle indexes it). */
  val Buckets: Array[String] = Array(
    "latin", "cyrillic", "han", "arabic", "hangul", "greek", "hebrew",
    "devanagari", "digit", "space", "other")

  private val Latin = Character.UnicodeScript.LATIN
  private val Cyrillic = Character.UnicodeScript.CYRILLIC
  private val Han = Character.UnicodeScript.HAN
  private val Arabic = Character.UnicodeScript.ARABIC
  private val Hangul = Character.UnicodeScript.HANGUL
  private val Greek = Character.UnicodeScript.GREEK
  private val Hebrew = Character.UnicodeScript.HEBREW
  private val Devanagari = Character.UnicodeScript.DEVANAGARI

  def profile(text: UTF8String): ArrayData = {
    val counts = new Array[Int](Buckets.length)
    if (text != null) {
      val s = text.toString
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        i += Character.charCount(cp)
        val b =
          if (Character.isWhitespace(cp)) 9
          else if (Character.isDigit(cp)) 8
          else Character.UnicodeScript.of(cp) match {
            case Latin => 0
            case Cyrillic => 1
            case Han => 2
            case Arabic => 3
            case Hangul => 4
            case Greek => 5
            case Hebrew => 6
            case Devanagari => 7
            case _ => 10
          }
        counts(b) += 1
      }
    }
    new GenericArrayData(counts)
  }
}

/** scriptProfile(text) → ARRAY<INT> counts in [[ScriptKernel.Buckets]] order. */
case class ScriptProfileExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    ScriptKernel.profile(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.ScriptKernel.profile($a)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
