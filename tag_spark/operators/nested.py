"""Nested-structure flattening — the MP4 atom walker at table scale (S5).

The reference descends moov/udta/meta/ilst recursively, seeking past atoms
it does not understand (`readAtoms`, mp4.go:86-136). The DataFrame analog
walks the SCHEMA, not the bytes: nesting depth is a static property of the
type, so the whole descent happens at plan time — struct fields are
projected to dotted top-level columns, arrays are exploded (outer, so empty
containers keep their row like an empty atom list keeps its file), and any
type the walker does not understand (maps, binaries, scalars) is kept
as-is, exactly the seek-past-unknown-atom behavior. Catalyst sees ordinary
projections + generators; nothing here is data-dependent recursion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten_nested(
    df: DataFrame,
    sep: str = ".",
    explode_arrays: bool = True,
    max_rounds: int = 32,
) -> DataFrame:
    """Fully flatten struct and array-of-struct nesting into flat rows.

    Struct fields become ``parent<sep>child`` columns; array columns are
    ``posexplode_outer``-ed with a companion ``<name><sep>idx`` position
    column (the atom offset analog — ordering inside a container is
    meaningful, id3v2.go frame order / mp4 atom order). Rounds repeat until
    the schema is flat; ``max_rounds`` only guards against pathological
    schemas (each round strictly reduces remaining nesting depth)."""
    out = df
    for _ in range(max_rounds):
        structs = [f for f in out.schema.fields if isinstance(f.dataType, T.StructType)]
        arrays = [f for f in out.schema.fields if isinstance(f.dataType, T.ArrayType)] if explode_arrays else []
        if not structs and not arrays:
            break
        if structs:
            cols = []
            expanded = {f.name for f in structs}
            for f in out.schema.fields:
                if f.name in expanded:
                    for sub in f.dataType.fields:  # type: ignore[union-attr]
                        cols.append(F.col(f"`{f.name}`.`{sub.name}`").alias(f"{f.name}{sep}{sub.name}"))
                else:
                    cols.append(F.col(f"`{f.name}`"))
            out = out.select(*cols)
            continue
        # one array per round: posexplode_outer is a generator — Spark allows
        # only one generator per projection
        arr = arrays[0]
        others = [F.col(f"`{f.name}`") for f in out.schema.fields if f.name != arr.name]
        # depth-unique position name: array<array<...>> explodes the same
        # column name twice, so a fixed "<name>.idx" alias would produce two
        # indistinguishable columns (outer vs inner offset lost, and further
        # rounds would crash on the ambiguous reference)
        pos = f"{arr.name}{sep}idx"
        existing = {f.name for f in out.schema.fields}
        depth = 2
        while pos in existing:
            pos = f"{arr.name}{sep}idx{depth}"
            depth += 1
        out = out.select(
            *others,
            F.posexplode_outer(F.col(f"`{arr.name}`")).alias(pos, arr.name),
        )
    return out


def leaf_paths(df: DataFrame) -> list[str]:
    """Dotted paths of every leaf field in the (possibly nested) schema —
    the atom-inventory listing (what `readAtoms` would visit)."""

    def walk(prefix: str, dt: T.DataType) -> list[str]:
        if isinstance(dt, T.StructType):
            return [p for f in dt.fields for p in walk(f"{prefix}.{f.name}" if prefix else f.name, f.dataType)]
        if isinstance(dt, T.ArrayType):
            return walk(f"{prefix}[]", dt.elementType)
        return [prefix]

    return walk("", T.StructType(df.schema.fields))
