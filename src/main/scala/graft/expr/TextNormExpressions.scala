package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[NormalizeExpr]] — referenced from generated code. */
object TextNormKernel {
  private val forms = java.text.Normalizer.Form.values()
    .map(f => f.name -> f).toMap

  /** Unicode-normalize `s` to `form` (NFC/NFD/NFKC/NFKD). Fast path: the
    * `isNormalized` check is a cheap quick-check table walk that returns
    * true for pure-ASCII and already-composed text — the overwhelming
    * majority of a web corpus — so the common row allocates nothing. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = forms(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}

/**
 * unicode_normalize(text, form) → STRING, codegen'd. Spark ships no
 * Unicode normalization function, yet canonicalization is load-bearing
 * for dedup: "café" precomposed and "cafe" + COMBINING ACUTE are
 * byte-different, so every fingerprint/shingle/minhash key downstream
 * diverges unless the corpus is normalized first. DuckDB's
 * `nfc_normalize` is the oracle twin (both sides implement UAX #15).
 */
case class NormalizeExpr(child: Expression, form: String = "NFC")
    extends UnaryExpression {
  require(java.text.Normalizer.Form.values().exists(_.name == form),
    s"unknown normalization form $form")
  override def dataType: DataType = StringType

  override def nullSafeEval(a: Any): Any =
    TextNormKernel.normalize(a.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"""graft.expr.TextNormKernel.normalize($a, "$form")""")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
