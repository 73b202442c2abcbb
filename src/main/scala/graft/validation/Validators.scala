package graft.validation

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Pluggable record-validator SPI — the reference's single UDF surface
  * (Validator.scala:13-15): `isValid(record) => (valid, errorMessage)`.
  *
  * Implementations must be Serializable (they ship to executors inside a UDF).
  */
trait Validator extends Serializable {
  /** @return (isValid, errorMessage-or-null) */
  def isValid(key: Array[Byte], value: Array[Byte]): (Boolean, String)
}

/** JSON well-formedness validator — port of the reference's example validator
  * (jobtest/JsonValidationJob.scala:75-94): Jackson `readTree` over the raw bytes;
  * any parse exception ⇒ invalid with the exception rendered into the failure text.
  */
class JsonValidator extends Validator {
  @transient private lazy val mapper = new ObjectMapper()
  override def isValid(key: Array[Byte], value: Array[Byte]): (Boolean, String) = {
    if (value == null) return (false, "Invalid record: null value")
    try { mapper.readTree(value); (true, null) }
    catch {
      case e: Exception =>
        (false, s"${e.getClass.getName}: ${e.getMessage}")
    }
  }
}

/** Typed result of a validator invocation (becomes STRUCT<isValid, errMsg>). */
case class ValidationResult(isValid: Boolean, errMsg: String)

object Validators {
  /** Bridge a [[Validator]] into a single-invocation column:
    * STRUCT<isValid BOOLEAN, errMsg STRING>. A plain Scala UDF is the right
    * altitude here (SURVEY.md §7.3): validation is record-granular, side-effect-free,
    * and not the bottleneck; a custom Catalyst Expression would buy nothing.
    */
  def asColumn(v: Validator, key: Column, value: Column): Column = {
    val f = udf((k: Array[Byte], vl: Array[Byte]) => {
      val (ok, err) = v.isValid(k, vl)
      ValidationResult(ok, err)
    })
    f(key, value)
  }
}
