package graft.run

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import graft.compilex.ConstraintCompiler
import graft.model.{PartitionVerdict, TokenSeq, Violation}
import graft.suite.Suite

/** Typed `Dataset` face of the engine (BASELINE.json north_star:
  * "evaluates constraint predicates as typed Dataset filters"): the
  * same compiled Column predicates as the DataFrame surface, exposed
  * as `Dataset[TokenSeq]` transformations with case-class Encoders —
  * so a caller holding typed data keeps compile-time row types across
  * the validation boundary. The typed filter adds NOTHING to the
  * physical plan beyond the predicate itself: the constraint columns
  * are Catalyst expressions on the serialized row (no object
  * round-trip), and `.as[T]` re-binds encoders lazily at the boundary
  * the caller already pays for.
  */
object TypedValidate {
  private implicit val tokenSeqEnc: Encoder[TokenSeq] = Encoders.product[TokenSeq]
  private implicit val violationEnc: Encoder[Violation] = Encoders.product[Violation]
  private implicit val verdictEnc: Encoder[PartitionVerdict] = Encoders.product[PartitionVerdict]

  /** Typed whole-suite filter: the sequences that PASS every constraint
    * (the reference's `is_valid` gate lifted to a Dataset transform).
    */
  def validSeqs(ds: Dataset[TokenSeq], suite: Suite,
                fusedIntArrays: Set[String] = Set("tokens")): Dataset[TokenSeq] =
    ConstraintCompiler.withVerdicts(ds.toDF(), suite, fusedIntArrays)
      .filter(col("row_valid"))
      .select(col("doc_id"), col("tokens"), col("n_tok"), col("source"))
      .as[TokenSeq]

  /** Typed violation stream — `iter_errors` as `Dataset[Violation]`. */
  def violationSeqs(ds: Dataset[TokenSeq], suite: Suite,
                    fusedIntArrays: Set[String] = Set("tokens")): Dataset[Violation] =
    ConstraintCompiler.violations(ds.toDF(), suite, fusedIntArrays = fusedIntArrays)
      .select(col("doc_id"), col("constraint_id"), col("observed"), col("source"))
      .as[Violation]

  /** Typed per-partition verdict table. */
  def partitionVerdicts(ds: Dataset[TokenSeq], suite: Suite,
                        fusedIntArrays: Set[String] = Set("tokens")): Dataset[PartitionVerdict] =
    ConstraintCompiler.withVerdicts(ds.toDF(), suite, fusedIntArrays)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("rows"),
        sum(when(!col("row_valid"), 1L).otherwise(0L)).as("violations"))
      .select(col("source"), col("rows"), col("violations"),
        (col("violations") === 0L).as("pass"))
      .as[PartitionVerdict]
}
