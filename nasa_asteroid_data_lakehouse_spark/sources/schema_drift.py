"""Schema drift detection between table snapshots.

The reference's only schema-evolution handling is
``unionByName(allowMissingColumns=True)`` (`src/utils/bucket.py:80`),
which silently null-fills added/removed columns — drift is *absorbed*,
never *reported*.  At 100 TB an upstream schema change should fail (or
at least page) the pipeline before a null-filled column poisons weeks
of downstream partitions.

Pure metadata work: compares ``StructType``s field by field (no jobs,
no data read beyond the parquet footer when the caller uses
``spark.read.parquet(...).schema``).  Nested structs are flattened to
dotted paths so a drift inside ``estimated_diameter.kilometers.max``
reports precisely.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.types import ArrayType, DataType, StructType


def _flatten(schema: StructType, prefix: str = "") -> dict[str, str]:
    """Dotted path → simpleString type name, recursing through structs
    and arrays-of-struct (`element` path segment)."""
    out: dict[str, str] = {}
    for f in schema.fields:
        path = f"{prefix}{f.name}"
        dt: DataType = f.dataType
        if isinstance(dt, StructType):
            out[path] = "struct"
            out.update(_flatten(dt, path + "."))
        elif isinstance(dt, ArrayType) and isinstance(dt.elementType, StructType):
            out[path] = "array<struct>"
            out.update(_flatten(dt.elementType, path + ".element."))
        else:
            out[path] = dt.simpleString()
    return out


@dataclass
class SchemaDrift:
    added: dict[str, str] = field(default_factory=dict)
    removed: dict[str, str] = field(default_factory=dict)
    retyped: dict[str, tuple[str, str]] = field(default_factory=dict)

    @property
    def is_compatible(self) -> bool:
        """Additions are union-safe; removals and retypes are not."""
        return not self.removed and not self.retyped

    @property
    def has_drift(self) -> bool:
        return bool(self.added or self.removed or self.retyped)


def diff_schemas(old: StructType, new: StructType) -> SchemaDrift:
    """Field-level drift report between two snapshots' schemas."""
    a, b = _flatten(old), _flatten(new)
    return SchemaDrift(
        added={k: b[k] for k in sorted(set(b) - set(a))},
        removed={k: a[k] for k in sorted(set(a) - set(b))},
        retyped={
            k: (a[k], b[k]) for k in sorted(set(a) & set(b)) if a[k] != b[k]
        },
    )
