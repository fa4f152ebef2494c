package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine-portable hash primitive every oracle-replicable operator
  * composes: the first 60 bits (15 hex chars — keeps the value positive
  * and inside a BIGINT) of an md5, as a long. Any md5-capable engine
  * reproduces it; in DuckDB:
  * {{{('0x' || substr(md5(x), 1, 15))::BIGINT}}}
  *
  * One definition instead of six inline copies (sampling keys, feature
  * buckets, classifier weights, MinHash seeds, IVF init) so the bit
  * width and hex slice can never drift apart between an operator and
  * its oracle twin. `xxhash64` remains the fast non-portable default
  * where no oracle needs to replay the value.
  */
object PortableHash {

  /** First 60 bits of `md5(input)` as a non-negative long. */
  def md5Long60(input: Column): Column =
    conv(substring(md5(input), 1, 15), 16, 10).cast("long")
}
