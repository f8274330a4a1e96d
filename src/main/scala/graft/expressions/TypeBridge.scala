package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.types.{AbstractDataType, DataType, TypeCollection}

/** `AbstractDataType`/`TypeCollection` are `private[sql]`, but an
  * expression mixing in `ImplicitCastInputTypes` must type its
  * `inputTypes` with them — the one-line adapters live inside the sql
  * package tree, like [[ColumnBridge]]. */
object TypeBridge {
  type AbstractType = AbstractDataType
  def oneOf(types: DataType*): AbstractDataType = TypeCollection(types: _*)
}
