package graft.model

/** Core data model of the engine.
  *
  * The input table shape is mandated by BASELINE.json (input_hint): an
  * Iceberg-style table of pre-tokenized training sequences. One row here
  * corresponds to one "JSON instance" of the reference validator
  * (jsonschema 4.26.0 stand-in, see SURVEY.md §0): the reference validates
  * one (instance, schema) pair at a time (PJS:validators.py:381-394); we
  * validate a 10^12-row table of them in one Catalyst plan.
  */
final case class TokenSeq(
    doc_id: String,
    tokens: Array[Int],
    n_tok: Int,
    source: String
)

/** One violation row — the distributed analogue of the reference's
  * ValidationError (PJS:exceptions.py:55-91): `validator` (keyword id)
  * becomes `constraint_id`, `instance`/`json_path` become
  * `doc_id` + `observed`.
  */
final case class Violation(
    doc_id: String,
    constraint_id: String,
    observed: String,
    source: String
)

/** Per-partition verdict — the engine-level lift of the reference's
  * boolean `is_valid` (PJS:validators.py:485-500) to partition grain.
  */
final case class PartitionVerdict(
    source: String,
    rows: Long,
    violations: Long,
    pass: Boolean
)
