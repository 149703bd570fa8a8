"""joi_ray — a Ray-Data-native schema + constraint validation engine.

Re-expresses the declarative validation language of the reference
(@hapi/joi v16.0.0-rc2, see SURVEY.md) as vectorized Arrow-batch predicates
executed by Ray Data: schemas compile to per-column predicate chains run in
``Dataset.map_batches`` actor pools; dataset-level checks (uniqueness,
referential integrity, column-stats sketches, distribution drift) are
explicit shuffle / broadcast stages (see ``joi_ray.pipelines``).
"""

from .spec import (
    Ref,
    Schema,
    alternatives,
    any_,
    array,
    binary,
    boolean,
    build,
    compile_literal,
    date,
    from_json,
    number,
    object,
    ref,
    string,
    symbol,
    function_,
    link,
)
from .engine import (
    BatchResult,
    CompiledSchema,
    DEFAULT_PREFS,
    VIOLATION_SCHEMA,
    ValidationFailure,
    assert_,
    attempt,
    compile_schema,
)

__all__ = [
    "Ref",
    "Schema",
    "alternatives",
    "any_",
    "array",
    "binary",
    "boolean",
    "build",
    "compile_literal",
    "date",
    "from_json",
    "number",
    "object",
    "ref",
    "string",
    "BatchResult",
    "CompiledSchema",
    "compile_schema",
    "DEFAULT_PREFS",
    "VIOLATION_SCHEMA",
]

__version__ = "0.1.0"
