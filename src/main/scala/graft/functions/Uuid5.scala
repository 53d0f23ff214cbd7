package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM-side RFC 4122 §4.3 UUIDv5 (SHA-1, DNS namespace).
  *
  * Reference behavior: `uuid.uuid5(uuid.NAMESPACE_DNS, f"{listing_id}_{platform_id}")`
  * (reference `src/utils/types_transform.py:76-79`). Spark's built-in `uuid()` is
  * random, so this is a genuine custom-expression need. Implemented as a static
  * helper so codegen can call it directly (stays inside whole-stage codegen).
  */
object Uuid5Util {
  // RFC 4122 Appendix C: NameSpace_DNS 6ba7b810-9dad-11d1-80b4-00c04fd430c8
  private val NamespaceDnsBytes: Array[Byte] = Array(
    0x6b, 0xa7, 0xb8, 0x10, 0x9d, 0xad, 0x11, 0xd1,
    0x80, 0xb4, 0x00, 0xc0, 0x4f, 0xd4, 0x30, 0xc8).map(_.toByte)

  def v5(name: String): String = {
    val md = MessageDigest.getInstance("SHA-1")
    md.update(NamespaceDnsBytes)
    md.update(name.getBytes(UTF_8))
    val h = md.digest() // 20 bytes; take first 16
    h(6) = ((h(6) & 0x0f) | 0x50).toByte // version 5
    h(8) = ((h(8) & 0x3f) | 0x80).toByte // RFC 4122 variant
    val sb = new java.lang.StringBuilder(36)
    var i = 0
    while (i < 16) {
      if (i == 4 || i == 6 || i == 8 || i == 10) sb.append('-')
      sb.append(Character.forDigit((h(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(h(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  def v5Utf8(name: UTF8String): UTF8String = UTF8String.fromString(v5(name.toString))
}

/** Catalyst expression wrapper: `uuid5(str)` — codegen-friendly (no UDF boxing
  * beyond the UTF8String bridge; participates in whole-stage codegen). */
case class Uuid5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    Uuid5Util.v5Utf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Uuid5Util.v5Utf8($c)")
  override protected def withNewChildInternal(newChild: Expression): Uuid5 = copy(newChild)
  override def prettyName: String = "uuid5"
}

object Uuid5 {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def uuid5(c: Column): Column =
    ColumnBridge.column(Uuid5(ColumnBridge.expression(c)))
}
