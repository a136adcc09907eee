"""Schema evolution: additive columns + safe type widening, and read-side conformance.

The reference rejects unknown fields via strict ES mappings
(ref: common/src/test/.../BulkUpdateFlowTest.scala:163-166 shows the strict-mapping
failure). Per the target rules we instead *evolve*: a batch may add columns or widen
types, and the table schema is merged before apply. Old data files keep their physical
schema; reads conform every file group to the current table schema (missing columns →
NULL, widened columns → cast), which is exactly Iceberg's read-side resolution model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    ByteType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StructField,
    StructType,
)

# ordered widening chains: a type may widen to anything later in its chain
_INT_CHAIN = [ByteType(), ShortType(), IntegerType(), LongType()]
_FLOAT_CHAIN = [FloatType(), DoubleType()]


def _chain_pos(dt: DataType) -> tuple[str, int] | None:
    for name, chain in (("int", _INT_CHAIN), ("float", _FLOAT_CHAIN)):
        for i, t in enumerate(chain):
            if dt == t:
                return name, i
    return None


def widen(a: DataType, b: DataType) -> DataType | None:
    """Least common widened type of a and b, or None if incompatible."""
    if a == b:
        return a
    if isinstance(a, ArrayType) and isinstance(b, ArrayType):
        elem = widen(a.elementType, b.elementType)
        if elem is None:
            return None
        return ArrayType(elem, a.containsNull or b.containsNull)
    if isinstance(a, StructType) and isinstance(b, StructType):
        try:
            return evolve_schema(a, b)
        except SchemaEvolutionError:
            return None
    pa, pb = _chain_pos(a), _chain_pos(b)
    if pa and pb and pa[0] == pb[0]:
        chain = _INT_CHAIN if pa[0] == "int" else _FLOAT_CHAIN
        return chain[max(pa[1], pb[1])]
    return None


class SchemaEvolutionError(ValueError):
    pass


def evolve_schema(table_schema: StructType, source_schema: StructType) -> StructType:
    """Merge source into table schema: keep table column order, widen shared columns,
    append new source columns (always nullable). Raise on incompatible changes."""
    by_name = {f.name: f for f in source_schema.fields}
    out: list[StructField] = []
    for f in table_schema.fields:
        s = by_name.pop(f.name, None)
        if s is None:
            out.append(f)
            continue
        w = widen(f.dataType, s.dataType)
        if w is None:
            raise SchemaEvolutionError(
                f"column {f.name!r}: cannot evolve {f.dataType.simpleString()} "
                f"-> {s.dataType.simpleString()}"
            )
        out.append(StructField(f.name, w, f.nullable or s.nullable))
    for name, s in by_name.items():
        out.append(StructField(name, s.dataType, True))
    return StructType(out)


def conform(df: DataFrame, schema: StructType) -> DataFrame:
    """Project df onto schema: missing columns become NULL, shared columns are cast.

    Used when reading old data files under an evolved table schema, and when aligning
    a merge source with the target.
    """
    have = set(df.columns)
    cols = []
    for f in schema.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
