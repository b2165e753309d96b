from .value import F, Word, WordOrValue, Ctx, width_for_bits
from .cs import (
    ConstraintSystem,
    ConstraintUnsatFailure,
    LookupUnsatFailure,
    LookupAmbiguousFailure,
    LaneSplit,
)
