"""Derive a deterministic CDC change log from the driver's ``events`` table.

The driver's correctness gate compares each Spark query against ANSI SQL run by
DuckDB on the same parquet inputs. The synthetic generator (generator.py) uses
xxhash64 and therefore cannot be re-expressed in DuckDB; this module instead derives
a change feed from ``events.parquet`` with *pure arithmetic* — every expression here
has a byte-identical DuckDB equivalent (see ``LOG_CTE_SQL``), so the entire engine
(validation → quarantine → window-over-LSN LWW → tombstone MERGE) can be verified
end-to-end against a declarative SQL oracle.

Mapping (the analogue of the reference's SQS change events,
ref: aggregator/src/main/scala/weco/concepts/aggregator/SQSMain.scala:47-57):

- ``doc_id``  = cast(user_id as string)  — the changed document key
- ``lsn``     = event_id                 — monotonic, globally unique
- ``op``      = error → D, signup → I, otherwise U
- ``tokens``  = [event_id % 50257, (event_id*7+13) % 50257 (+50257 if event_id%41=0)]
               (the +50257 injects a deterministic out-of-vocab token)
- ``tokens``  = NULL when event_id % 43 = 0 (deterministic null_tokens malformation)
- ``n_tok``   = 2, +1 when event_id % 37 = 0 (deterministic n_tok_mismatch)
- ``source``  = event_type

Malformations only corrupt upserts (deletes carry no payload), mirroring
generator.py and the reference's warn+drop validation
(ref: aggregator/.../ConceptExtractor.scala:81-118).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

VOCAB = 50257


def derived_change_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change log as a DataFrame: (doc_id, lsn, op, tokens, n_tok, source)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id")
    op = (
        F.when(F.col("event_type") == "error", F.lit("D"))
        .when(F.col("event_type") == "signup", F.lit("I"))
        .otherwise(F.lit("U"))
    )
    tok2 = (eid * 7 + 13) % VOCAB + F.when(eid % 41 == 0, F.lit(VOCAB)).otherwise(F.lit(0))
    tokens = F.when(op == "D", F.lit(None).cast(ArrayType(IntegerType()))).otherwise(
        F.when(eid % 43 == 0, F.lit(None).cast(ArrayType(IntegerType()))).otherwise(
            F.array((eid % VOCAB).cast("int"), tok2.cast("int"))
        )
    )
    n_tok = F.when(op == "D", F.lit(None).cast("int")).otherwise(
        (F.lit(2) + F.when(eid % 37 == 0, F.lit(1)).otherwise(F.lit(0))).cast("int")
    )
    return ev.select(
        F.col("user_id").cast("string").alias("doc_id"),
        eid.alias("lsn"),
        op.alias("op"),
        tokens.alias("tokens"),
        n_tok.alias("n_tok"),
        F.col("event_type").alias("source"),
    )


# The byte-identical DuckDB derivation — prepend to any oracle over the change log.
# ``events`` is pre-registered as a view by the driver.
LOG_CTE_SQL = """
log AS (
  SELECT CAST(user_id AS VARCHAR) AS doc_id,
         event_id AS lsn,
         CASE WHEN event_type = 'error' THEN 'D'
              WHEN event_type = 'signup' THEN 'I'
              ELSE 'U' END AS op,
         CASE WHEN event_type = 'error' THEN NULL
              WHEN event_id % 43 = 0 THEN NULL
              ELSE [CAST(event_id % 50257 AS INT),
                    CAST((event_id * 7 + 13) % 50257
                         + CASE WHEN event_id % 41 = 0 THEN 50257 ELSE 0 END AS INT)]
         END AS tokens,
         CASE WHEN event_type = 'error' THEN NULL
              ELSE CAST(2 + CASE WHEN event_id % 37 = 0 THEN 1 ELSE 0 END AS INT)
         END AS n_tok,
         event_type AS source
  FROM events
)
"""

# Validation verdict, mirroring cdc.apply.valid_event_expr's precedence exactly:
# unknown_op → (deletes valid) → null_tokens → empty_tokens → n_tok_mismatch →
# token_out_of_vocab → valid (NULL reason).
REASON_SQL = """
  CASE WHEN op NOT IN ('I', 'U', 'D') THEN 'unknown_op'
       WHEN op = 'D' THEN NULL
       WHEN tokens IS NULL THEN 'null_tokens'
       WHEN len(tokens) = 0 THEN 'empty_tokens'
       WHEN n_tok IS NULL OR n_tok <> len(tokens) THEN 'n_tok_mismatch'
       WHEN len(list_filter(tokens, t -> t IS NULL OR t < 0 OR t >= 50257)) > 0
            THEN 'token_out_of_vocab'
       ELSE NULL END
"""

# Final-state oracle over the derived log: quarantine-filter, LWW per key over LSN,
# drop deleted keys. This is the declarative spec the whole engine must equal.
FINAL_STATE_SQL = f"""
WITH {LOG_CTE_SQL},
tagged AS (SELECT *, {REASON_SQL} AS reject_reason FROM log),
valid AS (SELECT * FROM tagged WHERE reject_reason IS NULL),
latest AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY lsn DESC) AS rn
  FROM valid
)
SELECT doc_id, tokens, n_tok, source FROM latest WHERE rn = 1 AND op <> 'D'
"""
