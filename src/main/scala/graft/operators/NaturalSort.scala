package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** O2 natural sort (`setup/reformat/utils.py:139-149` natsorted): "file2" <
  * "file10". Implemented as a pure sort-KEY expression — split every digit
  * run out with regex boundaries and left-pad it to fixed width — so the
  * ordering stays inside Catalyst (orderBy on the key column, sortable in a
  * range-partitioned distributed sort) and can be mirrored by any engine
  * that orders the same key bytes (SURVEY §7.4.6).
  */
object NaturalSort {

  private val boundary = "(?<=\\D)(?=\\d)|(?<=\\d)(?=\\D)"

  /** sort key: digit runs zero-padded to 12, text runs untouched. */
  def natKey(c: Column): Column =
    concat_ws("", transform(split(c, boundary),
      t => when(t.rlike("^[0-9]+$"), lpad(t, 12, "0")).otherwise(t)))
}
